package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Curation

/** PII redaction and deterministic mixture sampling. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Curation.redactPii(col("t"))).head().getString(0)
  }

  test("x_fuzzy_join_edit: deletion neighborhood is lossless for edit<=1 (vs quadratic truth)") {
    import spark.implicits._
    // One of each edit type at varied positions, plus distance-2 decoys and
    // an exact duplicate (distance 0 also <= 1).
    val names = Seq(
      "kitten", "sitten", "kitte", "kittens", "kitten", // sub / del / ins / dup
      "aitten",                                         // sub at position 0
      "xyzzy", "plugh",                                 // far from everything
      "sittin")                                         // 2 from kitten, 1 from sitten
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("c_custkey", "c_name").write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")

    val got = graft.queries.Extensions.fuzzyJoinEdit.run(spark, dir)
      .head()
    val truth = {
      val c = names.zipWithIndex
      (for {
        (a, i) <- c; (b, j) <- c if i < j
        if org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
          .apply(a, b) <= 1
      } yield 1).size.toLong
    }
    assert(got.getLong(1) == truth, s"verified pairs ${got.getLong(1)} != truth $truth")
    assert(got.getLong(0) >= truth, "candidates must superset true pairs")
  }

  test("redactPii: every category replaced with its typed token") {
    assert(redact("mail bob.smith+x@corp.example.org now") == "mail <EMAIL> now")
    assert(redact("ssn 123-45-6789 on file") == "ssn <ID> on file")
    assert(redact("host 192.168.0.254 down") == "host <IP> down")
    assert(redact("call +1 (555) 123-4567 today") == "call <PHONE> today")
    assert(redact("no pii here at all") == "no pii here at all")
  }

  test("redactPii: order — SSN-like ids win over the phone shape") {
    assert(redact("id 123-45-6789") == "id <ID>")
  }

  test("redactPii: phone shapes — intl, parenthesized, separated all match") {
    assert(redact("call +44 20 7946 0958 now") == "call <PHONE> now")
    assert(redact("call (555) 123-4567 now") == "call <PHONE> now")
    assert(redact("call 555-123-4567 now") == "call <PHONE> now")
    assert(redact("call 555.123.4567 now") == "call <PHONE> now")
  }

  test("redactPii: precision — prices, number columns, dates survive unredacted") {
    // The old loose digit-run phone class redacted all of these.
    for (s <- Seq(
        "total $1,234.56 and 12345678 units",
        "row 100 200 300 end",
        "on 2026-08-13 and 13-08-2026 and 2026.08.13",
        "range 100-2000 kg",
        "pi is 3.14159265358979",
        "versions 1.2.3 and 10.20.30"))
      assert(redact(s) == s, s"must survive unredacted: $s")
  }

  test("piiCounts: counts match plants on raw text") {
    import spark.implicits._
    val (e, i, p, ph) = Curation.piiCounts(col("t"))
    val r = Seq("a@b.co and c@d.org, 10.0.0.1, 123-45-6789, +1 (555) 123-4567")
      .toDF("t").select(e.as("e"), i.as("i"), p.as("p"), ph.as("ph")).head()
    // Counts are per-pattern on the RAW text. The SSN-shaped id no longer
    // matches the ≥7-digit phone shapes (3-2-4 grouping), so categories are
    // disjoint here.
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((2, 1, 1, 1)))
  }

  private def gopher(s: String): (Long, Long) = {
    import spark.implicits._
    val r = Seq(s).toDF("t")
      .select(col("t") +: Curation.gopherQuality(col("t")): _*).head()
    (r.getAs[Long]("n_words"), r.getAs[Long]("keep"))
  }

  test("gopherQuality: each rule gates independently, composite keep flag") {
    val good = (1 to 25).map(i => s"word$i also").mkString(" ") +
      " the be to of and that have with" // 58 words, stopword octet, all-alpha
    assert(gopher(good)._2 == 1L, "engineered pass must keep")
    assert(gopher(good + (" #" * 10))._2 == 0L, "symbol ratio > 0.1 must drop")
    assert(gopher(good + (" 12345" * 20))._2 == 0L, "alpha fraction < 0.8 must drop")
    assert(gopher("the be to of and that have with")._2 == 0L, "8 words < 50 must drop")
    assert(gopher(("aa " * 60) + "the be to of and that have with")._2 == 0L,
      "mean word length < 3 must drop")
    val lines = (1 to 20).map(i => s"- bullet line number $i here.").mkString("\n") +
      "\nthe be to of and that have with more padding words going on here now."
    assert(gopher(lines)._2 == 0L, "> 90% bulleted lines must drop")
    val ell = (1 to 20).map(i => s"line number $i trails off...").mkString("\n") +
      "\nthe be to of and that have with more padding words going on here now."
    assert(gopher(ell)._2 == 0L, "> 30% ellipsis-terminated lines must drop")
    val few = good.replace("the be to of and that have with", "no stop words at all present")
    assert(gopher(few)._2 == 0L, "< 2 Gopher stopwords must drop")
  }

  test("gopherQuality is a pure projection (no exchange)") {
    import spark.implicits._
    val plan = Seq("x").toDF("t")
      .select(Curation.gopherQuality(col("t")): _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  private def rep(s: String): Map[String, Long] = {
    import spark.implicits._
    val row = Seq(s).toDF("t")
      .select(graft.functions.NativeFns.repetition_signals(col("t")).as("r"))
      .select(graft.functions.RepetitionSignalsExpr.fieldNames.map(f => col(s"r.$f")): _*)
      .head()
    graft.functions.RepetitionSignalsExpr.fieldNames.zipWithIndex
      .map { case (f, i) => f -> row.getLong(i) }.toMap
  }

  test("repetitionSignals: duplicate-line fractions (closed form)") {
    val r = rep("xx\nyy\nxx")
    assert(r("dup_line_ppm") == 1000000L * 2 / 3)
    assert(r("dup_line_char_ppm") == 1000000L * 4 / 6)
    val u = rep("aa\nbb\ncc")
    assert(u("dup_line_ppm") == 0L && u("dup_line_char_ppm") == 0L)
  }

  test("repetitionSignals: top n-gram mass and lexicographic tie-break") {
    // "a b" occurs 3x among 5 bigram windows; chars 2 of 6 total.
    val r = rep("a b a b a b")
    assert(r("top2_ppm") == 1000000L * (3 * 2) / 6)
    assert(r("keep") == 0L, "top-2-gram 100% must drop")
    // All bigrams unique -> tie on count 1, smallest string "a b" wins.
    val t = rep("b a c a b c")
    assert(t("top2_ppm") == 1000000L * 2 / 6)
  }

  test("repetitionSignals: duplicate n-gram coverage is a position UNION") {
    // A 6-token run twice: the matching 5-windows cover ALL 12 positions
    // (0-4,1-5 from the first copy, 6-10,7-11 from the second) once each.
    val r = rep("p q r s t u p q r s t u")
    assert(r("dup5_ppm") == 1000000L)
    assert(r("dup6_ppm") == 1000000L)
    // n=7 windows span the copy boundary; "q r s t u p q" (1..7) vs (7..13)
    // out of range -> each distinct, zero coverage.
    assert(r("dup7_ppm") == 0L)
    assert(r("keep") == 0L)
  }

  test("repetitionSignals: short/clean docs keep, empty denominators are 0") {
    val r = rep("hi")
    assert(r("top2_ppm") == 0L && r("dup5_ppm") == 0L && r("keep") == 1L)
    assert(rep("")("keep") == 1L)
  }

  test("repetitionSignals is a pure projection (no exchange)") {
    import spark.implicits._
    val plan = Seq("x").toDF("t")
      .select(graft.functions.NativeFns.repetition_signals(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "repetition signals must not shuffle")
  }

  test("sampleMixture: deterministic, rate-monotone, map-side (no exchange)") {
    import spark.implicits._
    val df = spark.range(0, 20000).toDF("id")
    def kept(rate: Double): Set[Long] =
      Curation.sampleMixture(df, "id", lit(rate), "s42").collect().map(_.getLong(0)).toSet
    val half = kept(0.5)
    assert(kept(0.5) == half, "same salt+rate must reproduce exactly")
    assert(math.abs(half.size / 20000.0 - 0.5) < 0.02, s"realized ${half.size / 20000.0}")
    val quarter = kept(0.25)
    assert(quarter.subsetOf(half), "lower rate must be a subset (nested samples)")
    assert(kept(1.0).size == 20000, "rate 1.0 keeps everything")
    val plan = Curation.sampleMixture(df, "id", lit(0.5), "s42")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "mixture sampling must not shuffle")
  }

  test("temperatureMixture: closed-form rates, saturation, small-domain upweighting") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i, "big")) ++ (10000L until 10100L).map(i => (i, "small"))
    val in = df.toDF("id", "dom")
    val out = Curation.temperatureMixture(in, "id", "dom", 500000L, "t1")
      .select(col("id"), col("dom"), col("rate_ppm")).collect()
    val rates = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    // ntot=10100, targetN=5050, s_big=10⁸, s_small=10⁷, Σs=1.1·10⁸:
    // rate_big = ⌊10⁶·5050·10⁸/(1.1·10⁸·10⁴)⌋; small saturates at 10⁶.
    assert(rates("big") == 1000000L * 5050L * 100L / (110L * 10000L))
    assert(rates("small") == 1000000L)
    val keptSmall = out.count(_.getString(1) == "small")
    assert(keptSmall == 100, "saturated domain keeps everything")
    val keptBig = out.count(_.getString(1) == "big")
    val expect = 10000.0 * rates("big") / 1e6
    assert(math.abs(keptBig - expect) < 250, s"realized $keptBig vs expected ~$expect")
  }

  test("temperatureMixture: deterministic, sqrt-monotone, broadcast-only joins") {
    import spark.implicits._
    val in = (0L until 3000L).map(i => (i, s"d${i % 3}")).toDF("id", "dom")
      .filter(col("id") % 5 === 0 || col("dom") =!= "d0")
    val a = Curation.temperatureMixture(in, "id", "dom", 300000L, "t2")
      .select(col("id"), col("dom"), col("rate_ppm")).orderBy("id").collect().toSeq
    val b = Curation.temperatureMixture(in, "id", "dom", 300000L, "t2")
      .select(col("id"), col("dom"), col("rate_ppm")).orderBy("id").collect().toSeq
    assert(a == b, "same salt must reproduce exactly")
    val byDom = a.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byDom("d0") >= byDom("d1"), "smaller domain must get the >= rate")
    val plan = Curation.temperatureMixture(in, "id", "dom", 300000L, "t2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "rates must broadcast back onto the corpus")
  }

  private def canon(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("u").select(Curation.canonicalizeUrl(col("u"))).head().getString(0)
  }

  test("canonicalizeUrl: scheme/host/port/www collapse") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b") == "http://example.com/A/b")
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("http://sub.example.com/x") == "http://sub.example.com/x")
  }

  test("canonicalizeUrl: fragment, tracking params, param order, trailing slash") {
    assert(canon("http://e.com/p#frag") == "http://e.com/p")
    assert(canon("http://e.com/p?utm_source=a&id=7&utm_campaign=b") == "http://e.com/p?id=7")
    assert(canon("http://e.com/p?b=2&a=1") == "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p/") == "http://e.com/p")
    assert(canon("http://e.com/") == "http://e.com/")
    assert(canon("http://e.com/p?utm_only=1") == "http://e.com/p")
  }

  test("canonicalizeUrl is a pure projection (no exchange)") {
    import spark.implicits._
    val plan = Seq("http://e.com/").toDF("u")
      .select(Curation.canonicalizeUrl(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("chunkDocuments: overlap, short tail, exact boundaries (closed form)") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9: lengths 4,4,4,1.
    val df = Seq((7L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Curation.chunkDocuments(df, "id", "text", 4, 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (0L, 4L, "t1 t2 t3 t4"), (1L, 4L, "t4 t5 t6 t7"),
      (2L, 4L, "t7 t8 t9 t10"), (3L, 1L, "t10")))
    val plan = Curation.chunkDocuments(df, "id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }

  test("sampleMixture: different salts decorrelate") {
    import spark.implicits._
    val df = spark.range(0, 20000).toDF("id")
    val a = Curation.sampleMixture(df, "id", lit(0.5), "saltA").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleMixture(df, "id", lit(0.5), "saltB").collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size / 20000.0
    assert(math.abs(overlap - 0.25) < 0.02, s"independent halves overlap ~25%, got $overlap")
  }

  test("selectTopFraction: closed-form boundary ties broken by smallest id") {
    import spark.implicits._
    // Scores: 3×10, 4×5, 3×1; f=0.5 over 10 rows → K=5: all 10s + the TWO
    // smallest-id docs at the boundary score 5.
    val df = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 5L), (5L, 5L), (6L, 5L), (7L, 5L),
      (8L, 1L), (9L, 1L), (10L, 1L)
    ).toDF("id", "score")
    val kept = Curation.selectTopFraction(df, "id", "score", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L), s"got $kept")
  }

  test("selectTopFraction: |kept| == ceil(f*n) exactly; kept scores dominate dropped") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("n_chars"))
    val n = docs.count()
    Seq(0.1, 0.25, 1.0).foreach { f =>
      val kept = Curation.selectTopFraction(docs, "doc_id", "n_chars", f)
      assert(kept.count() == math.ceil(f * n).toLong, s"exact-K property failed at f=$f")
    }
    val kept = Curation.selectTopFraction(docs, "doc_id", "n_chars", 0.25)
    val minKept = kept.agg(min("n_chars")).head().getLong(0)
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDroppedAtOrAbove = dropped.filter(col("n_chars") > minKept).count()
    assert(maxDroppedAtOrAbove == 0, "no dropped doc may out-score a kept doc")
  }

  test("selectTopFraction: no global sort of the corpus (no range exchange)") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("n_chars"))
    val plan = Curation.selectTopFraction(docs, "doc_id", "n_chars", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"top-fraction selection must not build a corpus total order:\n$plan")
  }

  test("capPerDomain: exact per-domain counts, deterministic, nested in cap") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("source"))
    val capped = Curation.capPerDomain(docs, "doc_id", "source", cap = 10, salt = "cap42")
    val perDomain = capped.groupBy("source").count().collect().map(_.getLong(1))
    assert(perDomain.nonEmpty && perDomain.forall(_ == 10L),
      "every source has 25 docs at sf0.001, so each must cap at exactly 10")
    val again = Curation.capPerDomain(docs, "doc_id", "source", cap = 10, salt = "cap42")
      .collect().map(_.getLong(0)).toSet
    assert(again == capped.collect().map(_.getLong(0)).toSet, "same salt must reproduce exactly")
    // A smaller cap selects a SUBSET of the larger cap's picks (priority
    // order is fixed, the cap only truncates it).
    val five = Curation.capPerDomain(docs, "doc_id", "source", cap = 5, salt = "cap42")
      .collect().map(_.getLong(0)).toSet
    assert(five.subsetOf(again), "cap=5 picks must nest inside cap=10 picks")
  }

  test("capPerDomain: rank cap is WindowGroupLimit (map-side hot-domain bound)") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("source"))
    val plan = Curation.capPerDomain(docs, "doc_id", "source", cap = 10, salt = "cap42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=cap must rewrite to WindowGroupLimit so hot domains cap map-side:\n$plan")
  }

  test("extractHtmlText: script/style CONTENT drops, entities decode in order, whitespace collapses") {
    import spark.implicits._
    val html = "<html><head><title> T </title><style>p{x:1}</style>" +
      "<script>if (1 < 2 && 2 > 1) { var s = \"<p>\"; }</script></head>" +
      "<body><!-- note --><p>a &amp;&nbsp;b</p>\n<div>c&lt;d&gt;e</div></body></html>"
    val out = Seq(html).toDF("h")
      .select(
        Curation.extractHtmlText(col("h")).as("b"),
        Curation.htmlTitle(col("h")).as("t"),
        Curation.htmlLinkCount(col("h")).as("n"))
      .head()
    // The script's `1 < 2` / `"<p>"` content must vanish WITH the block (the
    // classic tag-stripper trap), the title text legitimately survives the
    // tag strip, and `&amp;` decodes last so it cannot re-trigger.
    assert(out.getString(0) == "T a & b c<d>e")
    assert(out.getString(1) == "T")
    assert(out.getLong(2) == 0L)
  }

  test("htmlLinkCount: counts <a> across case/whitespace, not <abbr>") {
    import spark.implicits._
    val h = "<a href=\"/x\">x</a> text <A\nhref=\"/y\">y</A> <abbr>not a link</abbr>"
    assert(Seq(h).toDF("h").select(Curation.htmlLinkCount(col("h"))).head().getLong(0) == 2L)
  }

  test("assignShards: full shard range, contiguous per-shard positions, deterministic, unbiased-ish") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    def run() = Curation.assignShards(df, "id", 8, "s1").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard_id"), r.getAs[Long]("pos")))
    val a = run()
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "positions must be 1..n contiguous within each shard")
      // 1000/8 = 125 expected; ±6σ (σ ≈ 10.5) — a modulus-bias bug lands far outside.
      assert(rows.length > 60 && rows.length < 190, s"shard size ${rows.length} implausible")
    }
    assert(run().toSet == a.toSet, "same salt must reproduce the exact deal")
    intercept[IllegalArgumentException](Curation.assignShards(df, "id", 7, "s1"))
  }

  test("assignShards: no corpus total order (no range exchange)") {
    import spark.implicits._
    val plan = Curation.assignShards((0L until 100L).toDF("id"), "id", 8, "s1")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"the shard deal must never build a global total order:\n$plan")
  }

  test("hostSuffixes: closed form") {
    import spark.implicits._
    val s = Seq("a.b.c").toDF("h").select(Curation.hostSuffixes(col("h"))).head().getSeq[String](0)
    assert(s == Seq("a.b.c", "b.c", "c"))
  }

  test("shardManifest: partitioning-invariant; checksum catches a membership change") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, (i * 3 + 1).toLong)).toDF("id", "sz")
    def m(d: org.apache.spark.sql.DataFrame) =
      Curation.shardManifest(d, "id", "sz", 4, "t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).sortBy(_._1).toSeq
    val base = m(df)
    assert(m(df.repartition(7).orderBy(col("id").desc)) === base,
      "integer-sum checksums must not depend on partitioning or order")
    val without = m(df.filter(col("id") =!= 50L))
    assert(base.count { case (sid, n, sz, ck) =>
      without.find(_._1 == sid).exists(w => (w._2, w._3, w._4) != ((n, sz, ck))) } === 1,
      "dropping one doc must change exactly its shard's manifest row")
  }

  test("selectTopFractionByGroup: exact per-group K, boundary ties by id, no cross-group leakage") {
    import spark.implicits._
    // Group a: 40 rows scores 1..40 (K=10 -> scores 31..40). Group b: 10 rows
    // ALL the same score (pure boundary: K=3 -> smallest 3 ids win).
    val df = (Seq.tabulate(40)(i => (i.toLong, "a", (i + 1).toLong)) ++
      Seq.tabulate(10)(i => ((100 + i).toLong, "b", 7L)))
      .toDF("id", "grp", "score")
    val got = Curation.selectTopFractionByGroup(df, "id", "score", "grp", 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (ga, gb) = got.partition(_._2 == "a")
    assert(ga.map(_._1).toSeq === (30L until 40L).toSeq, "group a keeps exactly its top-10 scores")
    assert(gb.map(_._1).toSeq === Seq(100L, 101L, 102L), "all-tied group keeps its 3 smallest ids")
    // Stratification vs global: a global 25% cut on this data would take 12
    // rows from 'a' (scores 29..40, since b's 7s lose) and 0-1 from 'b'.
    val global = Curation.selectTopFraction(df, "id", "score", 0.25)
      .collect().map(_.getString(1))
    assert(global.count(_ == "b") <= 1, "sanity: the global cut starves group b")
  }

  test("upsampleEpochs: integer epochs exact, fractional epochs bounded, zero drops") {
    import spark.implicits._
    val df = Seq.tabulate(400)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    // w=3.0 exactly: every 'a' row appears exactly 3 times, epochs 1..3.
    val wEx = when(col("src") === "a", 3000000L).otherwise(0L)
    val ex  = Curation.upsampleEpochs(df, "id", wEx, "t1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ex.length === 200 * 3)
    assert(ex.forall(_._2 == "a"), "weight 0 must drop every row")
    assert(ex.groupBy(_._1).forall { case (_, g) => g.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L) })
    // w=1.5: every row at least once, ~half twice; realized count within
    // binomial bounds (200 rows, p=.5 -> stddev ~7).
    val fr = Curation.upsampleEpochs(df.filter(col("src") === "a"), "id", lit(1500000L), "t1")
      .groupBy("id").count().collect().map(_.getLong(1))
    assert(fr.length === 200 && fr.forall(c => c == 1L || c == 2L))
    val twos = fr.count(_ == 2L)
    assert(twos > 60 && twos < 140, s"fraction-epoch rate off: $twos/200")
  }

  test("upsampleEpochs: deterministic across partitionings; map-side (no exchange)") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, "s")).toDF("id", "src")
    val a = Curation.upsampleEpochs(df, "id", lit(1700000L), "t2").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = Curation.upsampleEpochs(df.repartition(7), "id", lit(1700000L), "t2").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a === b)
    val plan = Curation.upsampleEpochs(df, "id", lit(1700000L), "t2")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"upsampling must be map-side:\n$plan")
  }

  test("urlBlockFilter: subdomain suffix blocks, keyword blocks, host wins on both") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://cdn.ads.example.com:8080/x"),
      (2L, "http://ok.example.org/casino-review"),
      (3L, "https://fine.example.org/page"),
      (4L, "http://tracker.net/casino")
    ).toDF("id", "url")
    val bl = Seq("ads.example.com", "tracker.net").toDF("domain")
    val got = Curation.urlBlockFilter(df, "id", "url", bl, "casino")
      .select("id", "blocked_by").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "host", 2L -> "keyword", 3L -> "ok", 4L -> "host"))
  }
}
