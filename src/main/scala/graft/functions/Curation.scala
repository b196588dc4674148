package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation projections: PII redaction and deterministic weighted
  * mixture sampling. Both are pure map-side column transforms — no shuffle,
  * no state, codegen'd end to end — so they run at corpus scale at scan
  * throughput and compose with any pipeline stage (batch or streaming).
  */
object Curation {

  /** PII patterns, deliberately RE2-compatible (no lookaround, no backrefs)
    * so the same strings run under Java regex (Spark) and RE2 (DuckDB, and
    * the common at-scale regex engines). Redaction order matters: SSN-like
    * ids and emails/IPs are replaced before phones so their digits can't be
    * re-matched by the phone shapes.
    *
    * The phone pattern is a SHAPE alternation, every branch carrying ≥7
    * digits — international `+CC …` (≥7), parenthesized-area
    * `(NNN) NNN NNNN` (10), and separated `NNN-NNN-NNNN` (10, separators
    * space/dot/dash). A generic loose digit-run class here redacted prices,
    * number columns ("100 200 300") and ISO dates; the shapes leave those
    * untouched (dates are 4-2-2 / 2-2-4, never 3-3-4, and slash separators
    * are excluded entirely).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ipRe    = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe =
    "\\+[0-9]{1,3}[ .-]?\\(?[0-9]{2,4}\\)?(?:[ .-]?[0-9]{2,4}){2,3}" +
    "|\\([0-9]{3}\\)[ .-]?[0-9]{3}[ .-]?[0-9]{4}" +
    "|[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}"

  /** Per-category match counts on the RAW text (before redaction). */
  def piiCounts(text: Column): (Column, Column, Column, Column) = (
    regexp_count(text, lit(emailRe)),
    regexp_count(text, lit(ssnRe)),
    regexp_count(text, lit(ipRe)),
    regexp_count(text, lit(phoneRe))
  )

  /** Replace every PII match with a typed placeholder token. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val s = regexp_replace(e, ssnRe, "<ID>")
    val i = regexp_replace(s, ipRe, "<IP>")
    regexp_replace(i, phoneRe, "<PHONE>")
  }

  /** The Gopher/MassiveText document-quality rules (Rae et al.,
    * arXiv:2112.11446, table A1 — the third canonical public curation recipe
    * next to C4's line rules and span dedup), as ONE map-side projection:
    *
    *   - word count in [minWords, maxWords] (paper: 50..100k);
    *   - mean word length in [3, 10];
    *   - symbol-to-word ratio (`#` or `...`) ≤ 0.1;
    *   - ≤ 90% of lines starting with a bullet, ≤ 30% ending with `...`;
    *   - ≥ 80% of words containing an alphabetic character;
    *   - ≥ 2 occurrences of the paper's 8 English stop words.
    *
    * Everything is built-ins plus the one-pass `token_counts` kernel (which
    * carries the per-word alphabetic test — the only rule that would
    * otherwise need an interpreted per-word lambda); line rules are `(?m)`
    * multiline regex counts, RE2-compatible, so the whole diagnostic row is
    * DuckDB-mirrorable. Returns (n_words, mean_word_len, symbol_ratio,
    * bullet_frac, ellipsis_frac, alpha_frac, n_stop, keep).
    */
  val gopherStopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQuality(text: Column, minWords: Long = 50L, maxWords: Long = 100000L): Seq[Column] = {
    val tc      = NativeFns.token_counts(text, gopherStopwords)
    val nWords  = tc.getField("n_tokens")
    val nStop   = tc.getField("n_stop")
    val nAlpha  = tc.getField("n_alpha")
    val nLines  = size(split(text, "\n")).cast("long")
    val meanLen = length(translate(text, " \n", "")).cast("double") / nWords.cast("double")
    val symbols = (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\."))).cast("double")
    val symRat  = symbols / nWords.cast("double")
    val bullets = regexp_count(text, lit("(?m)^[-*] ")).cast("double") / nLines.cast("double")
    val ellip   = regexp_count(text, lit("(?m)\\.\\.\\.$")).cast("double") / nLines.cast("double")
    val alphaF  = nAlpha.cast("double") / nWords.cast("double")
    val keep = nWords.between(minWords, maxWords) && meanLen.between(3.0, 10.0) &&
      symRat <= 0.1 && bullets <= 0.9 && ellip <= 0.3 && alphaF >= 0.8 && nStop >= 2
    Seq(
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symRat.as("symbol_ratio"),
      bullets.as("bullet_frac"),
      ellip.as("ellipsis_frac"),
      alphaF.as("alpha_frac"),
      nStop.as("n_stop"),
      keep.cast("long").as("keep"))
  }

  /** EXACT top-`fraction` selection by an integral score — the
    * quality-threshold data-selection step of the current curation recipes
    * (FineWeb / DCLM: "keep the top X% of documents by classifier score") —
    * WITHOUT a global sort of the corpus. A naive
    * `row_number() OVER (ORDER BY score)` ranks 100 TB through one range
    * exchange + total order; here the total order is never built:
    *
    *   1. histogram: one hash aggregation (score → count) — the frame is
    *      score-CARDINALITY-sized (model state, not corpus state);
    *   2. threshold: a running sum over the histogram (single-partition
    *      window over the small frame) finds T = the highest score whose
    *      descending cumulative count reaches K = ⌈fraction·n⌉, and
    *      `take` = how many of the boundary-score docs are still needed;
    *   3. selection: `score > T` is a broadcast map-side filter; only the
    *      docs AT the boundary score (one histogram bucket) pay a
    *      row_number to pick the `take` smallest ids.
    *
    * Deterministic and exactly engine-replayable: counts are integers, the
    * boundary tie-break is id order. |kept| == K always. The score must be
    * integral (quantize first — the repo's scores already are, see
    * `x_tfidf_keywords`/`x_quality_perplexity`); a double score here would
    * make the histogram group-by float-keyed.
    *
    * Returns the kept rows of `df` (original columns).
    */
  def selectTopFraction(df: DataFrame, idCol: String, scoreCol: String, fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction in (0,1], got $fraction")
    val cols = df.columns.map(col).toSeq
    val hist = df.groupBy(col(scoreCol).as("__s")).agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val thr = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .join(broadcast(hist.agg(ceil(lit(fraction) * sum(col("__c"))).cast("long").as("__k"))))
      .filter(col("__cum") >= col("__k"))
      .orderBy(col("__s").desc)
      .limit(1)
      .select(col("__s").as("__t"), (col("__k") - (col("__cum") - col("__c"))).as("__take"))
    val withThr = df.join(broadcast(thr))
    val above = withThr.filter(col(scoreCol) > col("__t")).select(cols: _*)
    // Only the boundary bucket flows into this window — c(T) rows, not n.
    val bw = org.apache.spark.sql.expressions.Window.orderBy(col(idCol))
    val boundary = withThr
      .filter(col(scoreCol) === col("__t"))
      .withColumn("__rn", row_number().over(bw))
      .filter(col("__rn") <= col("__take"))
      .select(cols: _*)
    above.unionByName(boundary)
  }

  /** Per-group EXACT top-`fraction` selection — the stratified form of
    * [[selectTopFraction]] (FineWeb applies its quality threshold PER
    * LANGUAGE: a single global cut lets high-resource languages absorb the
    * whole budget and deletes low-resource ones wholesale). Same
    * no-global-sort histogram shape, with every stage keyed by `groupCol`:
    * the histogram aggregates (group, score); the running sum windows
    * WITHIN each group (partitions are score-cardinality-sized, one per
    * group — never the corpus); each group gets its own K = ⌈fraction·n_g⌉
    * and boundary take; the per-group threshold frame (group-cardinality
    * rows) broadcasts back for a map-side filter. Only boundary-score docs
    * pay a per-group row_number. |kept per group| == K_g exactly; integral
    * scores, id-order tie-break — engine-replayable row-level.
    */
  def selectTopFractionByGroup(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      groupCol: String,
      fraction: Double
  ): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction in (0,1], got $fraction")
    val cols = df.columns.map(col).toSeq
    val W    = org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(groupCol).as("__g"), col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"))
    val ks = hist.groupBy("__g")
      .agg(ceil(lit(fraction) * sum(col("__c"))).cast("long").as("__k"))
    val cw = W.partitionBy(col("__g")).orderBy(col("__s").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    val rw = W.partitionBy(col("__g")).orderBy(col("__s").desc)
    val thr = hist
      .withColumn("__cum", sum(col("__c")).over(cw))
      .join(ks, "__g") // histogram-sized both sides
      .filter(col("__cum") >= col("__k"))
      .withColumn("__rn", row_number().over(rw))
      .filter(col("__rn") === 1)
      .select(col("__g"), col("__s").as("__t"),
        (col("__k") - (col("__cum") - col("__c"))).as("__take"))
    val withThr = df.join(broadcast(thr), col(groupCol) === col("__g"))
    val above   = withThr.filter(col(scoreCol) > col("__t")).select(cols: _*)
    val bw = W.partitionBy(col("__g")).orderBy(col(idCol))
    val boundary = withThr
      .filter(col(scoreCol) === col("__t"))
      .withColumn("__rn", row_number().over(bw))
      .filter(col("__rn") <= col("__take"))
      .select(cols: _*)
    above.unionByName(boundary)
  }

  /** Deterministic epoch upsampling — the half of mixture construction that
    * [[sampleMixture]] cannot express: a source weighted ABOVE 1.0 must
    * repeat (an "epoch" per integer multiple plus a fractional remainder),
    * not merely survive a keep/drop test. Each row is emitted
    * ⌊w⌋ + Bernoulli(frac(w)) times, the Bernoulli decided by the same
    * salted-md5-vs-threshold test as [[sampleMixture]] — reproducible
    * across runs, engines, and partitionings, so the exact replication
    * multiset of a trained mix is auditable. Weights < 1.0 degenerate to
    * keep/drop sampling, so one operator covers the full weight line.
    *
    * `weightPpm` is an INTEGER parts-per-million weight (2_500_000 = 2.5
    * epochs): the epoch count and the 16-bit md5 threshold are then pure
    * integer arithmetic (`div`/`%`), bit-identical on any engine — a double
    * weight would round differently under Spark's truncating cast vs
    * DuckDB's rounding cast.
    *
    * Scale shape: one map-side projection + filter + explode — no shuffle,
    * no state; output size = Σ epochs. The `epoch` column (1-based) lets
    * downstream stages distinguish copies (e.g. pack each epoch separately).
    */
  def upsampleEpochs(df: DataFrame, idCol: String, weightPpm: Column, salt: String): DataFrame = {
    val u   = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 4)
    val thr = format_string("%04x", expr("((__wp % 1000000) * 65536) div 1000000").cast("int"))
    df.withColumn("__wp", greatest(weightPpm.cast("long"), lit(0L)))
      .withColumn("__n", expr("__wp div 1000000") + when(u < thr, 1L).otherwise(0L))
      .filter(col("__n") > 0) // sequence(1,0) would generate DESCENDING [1,0]
      .select(df.columns.map(col) :+
        explode(sequence(lit(1L), col("__n"))).as("epoch"): _*)
  }

  /** Per-domain contribution cap (the RefinedWeb/CCNet move against
    * domain-level over-representation: no single site may contribute more
    * than `cap` documents): keep at most `cap` docs per domain, selected by
    * a salted-md5 priority — i.e. a REPRODUCIBLE uniform sample of `cap`
    * docs from every oversized domain, independent of partitioning and
    * engine (same determinism contract as [[sampleMixture]]).
    *
    * Scale shape: `row_number ≤ cap` rewrites to WindowGroupLimit, which
    * applies the rank cap MAP-SIDE before the window exchange — each map
    * task forwards at most `cap` rows per domain, so a hot domain (the
    * exact case the operator exists for) never concentrates its full row
    * set on one reducer.
    */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String, cap: Int, salt: String): DataFrame = {
    val pri = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(pri.asc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Deterministic weighted mixture sampling: keep each row with probability
    * `rate` (a per-row Column, typically a function of the row's
    * source/domain), decided by a salted md5 of the row id — reproducible
    * across runs, engines, and partitionings (no RNG, no sort-order
    * dependence), which is what makes a training-data mix auditable. The
    * test is a pure projection + filter: at 100 TB it runs map-side at scan
    * speed and the realized per-domain rates concentrate tightly around the
    * targets (binomial over millions of docs).
    *
    * Uniformity: the first 4 md5 hex chars are compared against
    * printf("%04x", rate·65536) — md5 is uniform per nibble and lowercase
    * hex on every engine, so string order = numeric order.
    */
  def sampleMixture(df: DataFrame, idCol: String, rate: Column, salt: String): DataFrame = {
    val u   = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 4)
    val thr = format_string("%04x", (least(greatest(rate, lit(0.0)), lit(1.0)) * 65536).cast("int"))
    df.filter(rate >= 1.0 || u < thr)
  }

  /** Sliding-window document chunking — the retrieval-corpus preparation
    * step (RAG: embed fixed-size overlapping chunks, not whole documents).
    * Each doc becomes ⌈(n_tok − overlap)/stride⌉ chunks starting at
    * 0, stride, 2·stride, …; the last chunk may be short. One map-side
    * explode — token arrays never leave their row before the explode, no
    * shuffle, linear in corpus size with output ≈ n_tok/stride·window
    * tokens. All list arithmetic (sequence starts, slices, joins) exists
    * identically in ANSI engines, so the operator is row-level
    * oracle-able.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride, s"need window >= stride > 0, got $window/$stride")
    df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__starts",
        when(size(col("__toks")) > 0,
          sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .otherwise(array().cast("array<int>")))
      .select(col(idCol), col("__toks"), explode(col("__starts")).as("__start"))
      .select(
        col(idCol),
        expr(s"__start div $stride").cast("long").as("chunk_id"),
        least(lit(window), size(col("__toks")) - col("__start")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(window)), " ").as("chunk_text"))
  }

  /** URL canonicalization — the key for the FIRST dedup stage of every
    * web-crawl pipeline (CC-style: collapse scheme/host case, http vs
    * https, `www.`, default ports, fragments, tracking params, trailing
    * slash, and query-param ORDER before exact-dedup by URL). Pure
    * column-level transform: two regexp_extracts split the URL
    * structurally into host and path+query (no backreferences anywhere, so
    * every pattern runs identically under Java regex and RE2), the
    * query-param filter/sort is an array HOF over the handful of params,
    * and everything else is lower/replace/concat — map-side at scan speed.
    *
    * Rules: scheme → `http` (https collapsed), host lowercased, leading
    * `www.` and `:80`/`:443` stripped; fragment dropped; `utm_*` params
    * dropped, the rest SORTED (param order never distinguishes documents);
    * single trailing slash stripped from non-root paths.
    */
  def canonicalizeUrl(url: Column): Column = {
    val host0 = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host  = regexp_replace(regexp_replace(host0, ":(80|443)$", ""), "^www\\.", "")
    val rest  = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path0  = regexp_replace(noFrag, "\\?.*$", "")
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val query  = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      x => x =!= "" && !x.startsWith("utm_")))
    val cq = when(size(params) > 0, concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(lit("http://"), host, path, cq)
  }

  /** HTML text extraction — the crawl-side stage that turns raw page markup
    * into the `text` column every downstream curation operator consumes
    * (the WET-extraction step of a CC-style pipeline, as a deterministic
    * regex cascade rather than a DOM parse so it runs as ONE codegen'd
    * map-side projection at scan speed):
    *
    *   1. `<script>…</script>` and `<style>…</style>` blocks drop WITH
    *      their content ((?is) dotall + case-fold, non-greedy — both
    *      supported identically by Java regex and RE2);
    *   2. `<!-- … -->` comments drop;
    *   3. every remaining tag collapses to a space (so adjacent block
    *      elements cannot weld words together);
    *   4. the five core entities decode (`&lt; &gt; &quot; &#39; &nbsp;`,
    *      then `&amp;` LAST so escaped ampersands cannot re-trigger);
    *   5. whitespace runs collapse to one space (explicit `[ \t\n\r]+`
    *      class — Java's `\s` includes `\x0B`, RE2's does not) and the
    *      result is trimmed.
    *
    * No pattern uses backreferences or lookaround, so the cascade replays
    * verbatim under RE2 (DuckDB with the 'g' flag) — row-level
    * oracle-able. A real fetch pipeline would put charset/encoding repair
    * in front; that is I/O-side, not operator-side.
    */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle  = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noCmt    = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags   = regexp_replace(noCmt, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(ent, "[ \t\n\r]+", " "))
  }

  /** `<title>` contents (first match, tags inside dropped by the body
    * cascade's rules not needed here — titles are flat), trimmed. */
  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** Outbound-link count — the page-level crawl-frontier/quality feature
    * (link farms score high, text pages low). */
  def htmlLinkCount(html: Column): Column =
    regexp_count(html, lit("(?i)<a[ \t\n\r]")).cast("long")

  /** Deterministic training-shard assignment — the corpus-writing step of a
    * training pipeline (WebDataset/TFRecord practice: documents are dealt
    * pseudo-randomly into N shard files, readers stream shards in order, so
    * the shard deal IS the global shuffle). Each row gets
    *
    *   shard_id = hex4(md5(id:salt)) mod nShards,   pos = rank of
    *   (md5, id) within the shard
    *
    * — reproducible across runs, engines, and partitionings (same salted-md5
    * determinism contract as [[sampleMixture]]), and uniform: the first 4
    * md5 hex chars are a uniform 16-bit integer, and `nShards` is required
    * to divide 65536 so the modulus is exactly unbiased. Shard sizes are
    * n/N ± binomial noise, which is the real-world contract (shard files
    * are equal-sized in expectation, not exactly).
    *
    * Scale shape: the hash is map-side; `pos` is one row_number per shard
    * partition — per-shard row counts are ~n/N, and nShards grows with the
    * corpus (a 100 TB run uses 10⁴–10⁵ shards), so no partition ever holds
    * more than a shard's worth of rows and there is no global total order
    * anywhere (the classic `row_number() OVER (ORDER BY hash)` corpus
    * enumeration ranks everything through ONE range exchange — this never
    * builds it).
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int, salt: String): DataFrame = {
    require(nShards > 0 && 65536 % nShards == 0,
      s"nShards must divide 65536 for an unbiased modulus, got $nShards")
    val hx = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__hx"), col(idCol))
    df.withColumn("__hx", hx)
      .withColumn("__shard", (conv(col("__hx"), 16, 10).cast("long") % nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard_id", col("__shard"))
      .drop("__hx", "__shard")
  }

  /** Per-shard reproducibility manifest — the audit artifact a dataloader
    * run records next to its shards: doc count, size mass, id range, and an
    * ORDER-INDEPENDENT integer checksum (the sum of each member's 32-bit
    * salted-md5 prefix — integer sums commute, so the manifest is identical
    * however the shard was partitioned, ordered, or written). Verifying a
    * later rebuild is one shard-keyed aggregation + a manifest compare — no
    * re-read of the content. One aggregation over the [[assignShards]]
    * deal; manifest size = nShards rows.
    */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      nShards: Int,
      salt: String
  ): DataFrame =
    assignShards(df, idCol, nShards, salt)
      .withColumn("__ck",
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":" + salt + ":ck"))), 1, 8),
          16, 10).cast("long"))
      .groupBy("shard_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(col("__ck")).as("checksum"))

  /** All dot-suffixes of a hostname (`a.b.c` → [`a.b.c`, `b.c`, `c`]) — the
    * join key for domain-blocklist matching, where a blocklist entry
    * `example.com` must block every subdomain. Pure array arithmetic
    * (split + sequence + slice), identical in ANSI engines.
    */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Lowercased URL host with any `:port` stripped (NOT `www.`-stripped —
    * suffix matching in [[hostSuffixes]] already covers `www.x.y` via its
    * `x.y` suffix). */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":[0-9]+$", "")

  /** URL blocklist filtering — the UT1-style stage 0 gate of a web-crawl
    * pipeline: a URL is blocked when (a) any dot-suffix of its host appears
    * in the domain blocklist (so `cdn.ads.example.com` is caught by an
    * `ads.example.com` entry), or (b) the lowercased URL matches a keyword
    * pattern. Returns `df` plus `host` and `blocked_by` ∈
    * {'host','keyword','ok'} (host wins when both hit, matching blocklist
    * precedence).
    *
    * Scale shape: the keyword test is map-side; the domain test explodes
    * each URL into its ≤ host-label-count suffixes and semi-joins the
    * blocklist — with a UT1-sized list (millions of domains) that join
    * hash-partitions both sides on the suffix string and the per-doc flag
    * comes back over ONE id-keyed shuffle; nothing is ever collected and
    * the corpus text never moves (only (id, suffix) pairs do). With a
    * small list the blocklist side broadcasts and the flag join is the
    * only exchange.
    */
  def urlBlockFilter(df: DataFrame, idCol: String, urlCol: String,
      blocklist: DataFrame, keywordRe: String): DataFrame = {
    val withHost = df.withColumn("host", urlHost(col(urlCol)))
    val hostHits = withHost
      .select(col(idCol), explode(hostSuffixes(col("host"))).as("__suf"))
      .join(blocklist.select(col("domain").as("__suf")), Seq("__suf"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__bh", lit(1L))
    withHost
      .join(hostHits, Seq(idCol), "left")
      .withColumn("blocked_by",
        when(col("__bh").isNotNull, "host")
          .when(lower(col(urlCol)).rlike(keywordRe), "keyword")
          .otherwise("ok"))
      .drop("__bh")
  }

  /** Temperature-scaled domain mixing (the multilingual/multi-source
    * rebalancing step of XLM-R / mT5: sample domain i proportional to
    * n_i^α, α < 1, so small domains are up-weighted relative to their raw
    * share). α is FIXED at 0.5: IEEE sqrt is exactly rounded on every
    * engine, where a general pow() is not — so the whole rate computation
    * stays bit-exact cross-engine (the Spark-side structure is identical
    * for any α). All arithmetic after the one sqrt is integer:
    *
    *   s_i       = ⌊√n_i · 10⁶⌋                  (exact: sqrt + one exactly-
    *                                              rounded multiply + floor)
    *   targetN   = (targetPpm · n_tot) div 10⁶
    *   rate_ppm  = min(10⁶, (10⁶ · targetN · s_i) div (Σs · n_i))
    *
    * evaluated in DECIMAL(38,0) (safe to ~10¹² docs/domain), and the
    * per-row keep decision is the salted-md5 test of [[sampleMixture]]
    * with an INTEGER threshold (⌊rate_ppm·65536/10⁶⌋) — no double appears
    * anywhere after the sqrt, so keep decisions cannot flip on FP
    * divergence and the operator is row-level oracle-able. Plan shape: one
    * tiny domain-count aggregation, broadcast rates back, map-side filter
    * — the corpus itself never shuffles.
    *
    * Expected kept total ≈ targetPpm·n_tot/10⁶ (exactly proportional
    * within each domain's binomial concentration); a domain whose fair
    * share exceeds its size saturates at rate 1 (standard α-sampling
    * behavior — the shortfall is not redistributed).
    */
  def temperatureMixture(df: DataFrame, idCol: String, domainCol: String,
      targetPpm: Long, salt: String): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__s", floor(sqrt(col("__n").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = counts.agg(sum(col("__n")).as("__ntot"), sum(col("__s")).as("__stot"))
    val rates = counts.join(broadcast(tot))
      .withColumn("__tn",
        expr(s"CAST(CAST($targetPpm AS DECIMAL(38,0)) * CAST(__ntot AS DECIMAL(38,0)) DIV 1000000 AS DECIMAL(38,0))"))
      .select(col(domainCol),
        expr("""least(CAST(1000000 AS BIGINT),
                      CAST(1000000 AS DECIMAL(38,0)) * __tn * CAST(__s AS DECIMAL(38,0))
                        DIV (CAST(__stot AS DECIMAL(38,0)) * CAST(__n AS DECIMAL(38,0))))""")
          .as("rate_ppm"))
    val u   = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 4)
    val thr = format_string("%04x", expr("(rate_ppm * 65536) div 1000000").cast("int"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(col("rate_ppm") >= 1000000L || u < thr)
  }
}
