package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Quote-aware command tokenization shared by the grep and RainStorm verb
  * parsers — the analog of the reference terminal's `splitWithQuotes`
  * (`core_process_utils.go:475-496`), which groups single- or double-quoted
  * spans into one argument so operator parameters may contain spaces.
  */
object Cli {

  /** One token plus whether any part of it was quoted (quoted tokens are
    * never interpreted as flags or keywords by callers).
    */
  final case class Tok(text: String, quoted: Boolean)

  /** Split on whitespace, keeping quoted spans (single or double quotes)
    * together and stripping the quote characters. Quotes may start
    * mid-token (`ab'c d'` → `abc d`). An unterminated quote runs to the end
    * of the string.
    */
  def splitWithQuotes(s: String): Seq[Tok] = {
    val out             = ArrayBuffer.empty[Tok]
    val cur             = new StringBuilder
    var quote: Char     = 0
    var quoted          = false
    var inToken         = false
    def flush(): Unit = {
      if (inToken) out += Tok(cur.toString, quoted)
      cur.clear(); quoted = false; inToken = false
    }
    for (ch <- s) {
      if (quote != 0) {
        if (ch == quote) quote = 0 else cur.append(ch)
      } else if (ch == '\'' || ch == '"') {
        quote = ch; quoted = true; inToken = true
      } else if (ch.isWhitespace) flush()
      else { cur.append(ch); inToken = true }
    }
    flush()
    out.toSeq
  }

  /** Split on `sep` only where it appears outside quotes, preserving the
    * segment text verbatim (quotes included) for per-segment tokenization.
    */
  def splitUnquoted(s: String, sep: Char): Seq[String] = {
    val out         = ArrayBuffer.empty[String]
    val cur         = new StringBuilder
    var quote: Char = 0
    for (ch <- s) {
      if (quote != 0) {
        if (ch == quote) quote = 0
        cur.append(ch)
      } else if (ch == '\'' || ch == '"') { quote = ch; cur.append(ch) }
      else if (ch == sep) { out += cur.toString; cur.clear() }
      else cur.append(ch)
    }
    out += cur.toString
    out.toSeq
  }
}
