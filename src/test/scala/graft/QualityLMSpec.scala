package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{DedupOps, QualityLM}

/** Model-based quality scoring (CCNet perplexity, DSIR weights) and
  * SemDeDup cluster-then-prune semantic dedup.
  */
class QualityLMSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Reference corpus: heavily repetitive "common" vocabulary.
  private val ref = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the rug"),
    (2L, "the cat and the dog sat")
  ).toDF("id", "text")

  test("unigramPerplexity: reference-like text scores below OOV gibberish") {
    val docs = Seq(
      (10L, "the cat sat on the mat"),     // in-distribution
      (11L, "the dog and the cat sat"),    // in-distribution
      (12L, "zyx qwv jkl pqr mno xyz")     // all OOV
    ).toDF("id", "text")
    val r = QualityLM.unigramPerplexity(docs, ref, "id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(10) < r(12) && r(11) < r(12),
      s"in-distribution docs must have lower perplexity than OOV: $r")
    // OOV-only doc's perplexity equals the uniform unseen-mass bound:
    // every token gets p = alpha / (N + alpha(V+1)).
    val n = 18.0; val v = 8.0 // ref: 18 tokens, 8 distinct
    val pUnseen = 0.5 / (n + 0.5 * (v + 1))
    assert(math.abs(r(12) - 1.0 / pUnseen) < 1e-9)
  }

  test("unigramPerplexity: single-token docs score without crashing") {
    val docs = Seq((1L, "the"), (2L, "zzz")).toDF("id", "text")
    val r = QualityLM.unigramPerplexity(docs, ref, "id", "text").collect()
    assert(r.length == 2)
    assert(r.forall(_.getLong(1) == 1L)) // n_tokens
  }

  test("dsirWeights: target-like bigrams get positive weight, off-target negative") {
    val target = Seq(
      (0L, "spark streaming state spark streaming state"),
      (1L, "spark streaming state store")
    ).toDF("id", "text")
    val raw = Seq(
      (10L, "spark streaming state spark streaming"), // pure target bigrams
      (11L, "lorem ipsum dolor sit amet lorem"),      // pure non-target
      (12L, "spark streaming lorem ipsum")            // mixed
    ).toDF("id", "text")
    // raw pool for the denominator distribution = the union ensures the
    // non-target bigrams exist on the raw side.
    val pool = raw
    val r = QualityLM.dsirWeights(pool, target, "id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toList
    val byId = r.map(x => x._1 -> x._3).toMap
    assert(byId(10) > 0, s"target-like doc must be upweighted: $byId")
    assert(byId(11) < 0, s"off-target doc must be downweighted: $byId")
    assert(byId(10) > byId(12) && byId(12) > byId(11),
      s"mixed doc must land between: $byId")
  }

  test("dsirWeights: single-token docs produce no bigrams and drop out") {
    val target = Seq((0L, "a b")).toDF("id", "text")
    val raw    = Seq((1L, "a"), (2L, "a b")).toDF("id", "text")
    val r = QualityLM.dsirWeights(raw, target, "id", "text").collect()
    assert(r.map(_.getLong(0)).toSet == Set(2L))
  }

  test("tfidfKeywords: distinctive terms outrank ubiquitous ones; short docs emit < k rows") {
    val docs = Seq(
      (1L, "apple apple banana the the the"),
      (2L, "the the banana cherry"),
      (3L, "the dog")
    ).toDF("id", "text")
    val r = QualityLM.tfidfKeywords(docs, "id", "text", k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getString(2), x.getLong(3))).toMap
    // df: apple 1, banana 2, cherry 1, dog 1, the 3 (idf=ln(1)=0 — worthless).
    assert(r((1L, 1L))._1 == "apple", s"doc1 top keyword must be apple: $r")
    assert(r((2L, 1L))._1 == "cherry", s"rarer cherry must beat commoner banana: $r")
    assert(r((3L, 1L))._1 == "dog")
    // "the" appears in every doc -> score exactly 0, still ranked but last.
    assert(r((1L, 3L)) == ("the", 0L))
    // doc3 has only 2 distinct tokens -> exactly 2 rows, no padding.
    assert(!r.contains((3L, 3L)))
    // closed form: apple in doc1 = floor(2*ln(3/1)*1e4 + .5)
    assert(r((1L, 1L))._2 == math.floor(2 * math.log(3.0) * 10000 + 0.5).toLong)
  }

  test("quantizeInt8: closed-form values, max maps to ±127, zero vector safe, error bound holds") {
    import graft.functions.AnnSearch
    val embs = Seq(
      (1L, Array(1f, -2f, 4f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(-3f, 3f, 1.5f, -0.1f))
    ).toDF("vec_id", "embedding")
    val r = AnnSearch.quantizeInt8(embs, "vec_id", "embedding").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    // vec 1: scale 4/127; q = round_half_up(x*127/4) = 32, -63, 127, 0.
    assert(r((1L, 0L))._1 == 32L && r((1L, 1L))._1 == -63L &&
      r((1L, 2L))._1 == 127L && r((1L, 3L))._1 == 0L, s"$r")
    // max-|x| element maps to exactly +-127 (vec 3 has the max NEGATIVE).
    assert(r((3L, 0L))._1 == -127L && r((3L, 1L))._1 == 127L)
    // all-zero vector: q=0 everywhere, scale 0 — no division blowup.
    assert((0L to 3L).forall(p => r((2L, p)) == (0L, 0L)))
    // reconstruction error bound: |q*scale - x| <= scale/2 for every element.
    val sc1 = 4.0 / 127
    Seq((0, 1f), (1, -2f), (2, 4f), (3, 0f)).foreach { case (p, x) =>
      assert(math.abs(r((1L, p.toLong))._1 * sc1 - x) <= sc1 / 2 + 1e-12)
    }
  }

  test("bm25TopK: closed-form score, tf saturation, rare-term boost") {
    import graft.functions.QualityLM
    // dl: d1=3, d2=2, d3=4 → N=3, avgdl=3.0. Term "x": df=2 (d1, d2).
    val docs = Seq(
      (1L, "x x y"),
      (2L, "x z"),
      (3L, "z z z z")
    ).toDF("id", "text")
    val r = QualityLM.bm25TopK(docs, "id", "text", Seq("x"), topK = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L), "only docs containing the term score")
    def score(tf: Long, dl: Long): Long = {
      val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
      math.floor(idf * (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / 3.0)) * 1e6 + 0.5).toLong
    }
    assert(r(1L) == score(2, 3), s"closed-form mismatch: ${r(1L)} vs ${score(2, 3)}")
    assert(r(2L) == score(1, 2))
    assert(r(1L) > r(2L), "tf=2 in a near-average doc must outrank tf=1")
    // Rare-term boost: "y" (df=1) at tf=1/dl=3 must outscore "x" (df=2) at
    // the same tf and dl — idf is the only differing factor.
    val r2 = QualityLM.bm25TopK(docs, "id", "text", Seq("y"), topK = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2.keySet == Set(1L))
    assert(r2(1L) > score(1, 3), "df=1 term must outscore a df=2 term at equal tf/dl")
  }

  test("bm25TopK: registry config returns topK docs, descending, all containing a term") {
    import graft.functions.QualityLM
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val r = QualityLM.bm25TopK(docs, "doc_id", "text", Seq("hash", "join", "stream"), topK = 20)
      .collect()
    assert(r.length == 20)
    val scores = r.map(_.getLong(1))
    assert(scores.sameElements(scores.sortBy(-_)), "rows must come back rank-ordered")
    val ids = r.map(_.getLong(0)).toSet
    val withTerm = docs
      .filter(col("text").contains("hash") || col("text").contains("join") || col("text").contains("stream"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm), "every hit must contain a query term")
  }

  test("vocabCoverage: closed-form ppm, monotone curve, cutoffs beyond vocab absent") {
    import graft.functions.QualityLM
    // Counts: a=5, b=3, c=1, d=1 → total 10, types 4.
    val docs = Seq(
      (1L, "a a a b b"),
      (2L, "a a b c"),
      (3L, "d")
    ).toDF("id", "text")
    val r = QualityLM.vocabCoverage(docs, "id", "text", cutoffs = Seq(1, 2, 3, 100))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r.keySet == Set(1L, 2L, 3L), "cutoff 100 exceeds the 4-type vocab and must be absent")
    assert(r(1L) == ((500000L, 4L, 10L)), s"top-1 'a' covers 5/10 exactly: ${r(1L)}")
    assert(r(2L)._1 == 800000L, "top-2 adds b: 8/10")
    // rank 3 is the tie (c, d) broken by token order: c first -> 9/10.
    assert(r(3L)._1 == 900000L)
  }

  test("int8TopK: closed-form ranking, self-exclusion, quantized scores exact") {
    import graft.functions.AnnSearch
    // Query (1,0); corpus: exact match (excluded by id), cos 0.8 vector, orthogonal.
    val corpus = Seq(
      (0L, Array(1f, 0f)),   // same id as the query -> self-excluded
      (2L, Array(0.8f, 0.6f)),
      (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val r = AnnSearch.int8TopK(corpus, queries, "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .collect().map(x => (x.getLong(1), x.getInt(3), x.getDouble(2)))
    assert(r.map(t => (t._1, t._2)).toSeq == Seq((2L, 1), (3L, 2)),
      s"expected neighbors (2 rank1, 3 rank2), self excluded: ${r.toSeq}")
    // Exact quantized score for neighbor 2: q=(127,95), scale=0.8f/127 —
    // replay the same float->double arithmetic.
    val s2 = (1.0 / 127) * (0.8f.toDouble / 127) * (127L * 127 + 0L * 95).toDouble
    assert(r(0)._3 == s2, s"score must be exactly the quantized arithmetic: ${r(0)._3} vs $s2")
    assert(r(1)._3 == 0.0, "orthogonal vector scores exactly 0 in integer dot")
  }

  test("semDedup: planted near-identical vectors pruned within cluster, lowest id kept") {
    // 4 centroid seeds (ids 0-3) along axes; ids 10/11 ~ axis0 near-dups,
    // id 20 ~ axis1 alone, id 30 opposite axis2 (cos<=0 with everything).
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 1f)),
      (10L, Array(0.99f, 0.1f, 0f, 0f)),
      (11L, Array(0.98f, 0.12f, 0f, 0f)),
      (20L, Array(0.5f, 0.8f, 0f, 0f)), // cos vs row 1 = .848 < .9 — survives
      (30L, Array(0f, 0f, -1f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = rows.filter(col("vec_id") < 4)
    val kept = DedupOps.semDedup(rows, cents, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 and 10 share cluster 0 with cos(0,10)>0.9 => 10 dropped; 11 dropped
    // against both. 1,20 share cluster 1 but cos=0.1+... below 0.9 => kept.
    assert(!kept.contains(10L) && !kept.contains(11L), s"near-dups must drop: $kept")
    assert(kept.contains(0L) && kept.contains(1L) && kept.contains(20L), s"$kept")
    assert(kept.contains(30L), s"anti-aligned vector survives: $kept")
    // cluster assignment: 10/11 would have been cluster 0, 20 cluster 1,
    // 30's nearest-by-cosine is ambiguous among 0/1/3 (cos 0) -> ties break
    // to the lowest centroid id.
    assert(kept(20L) == 1L && kept(0L) == 0L)
  }

  test("semDedup: deterministic across runs") {
    val embs = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = embs.filter(col("vec_id") < 8)
    val a = DedupOps.semDedup(embs, cents, "vec_id", "embedding", 0.4)
      .orderBy("vec_id").collect().toSeq
    val b = DedupOps.semDedup(embs, cents, "vec_id", "embedding", 0.4)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("nbClassifier: closed-form LLR and prior (balanced classes)") {
    // md5 prefixes: good→75, bad→ba (distinct buckets). Balanced priors
    // (1 doc each) ⇒ prior_q = ⌊ln(1)·10⁶⌋ = 0. llr("good"-bucket) =
    // ln((2+1)/(2+256)) − ln((0+1)/(2+256)) = ln 3 ⇒ 1098612 micro-units;
    // the "bad" bucket is symmetric: ⌊−ln 3·10⁶⌋ = −1098613 (floor).
    val labeled = Seq((0L, "good good", 1L), (1L, "bad bad", 0L)).toDF("id", "text", "label")
    val corpus  = Seq((10L, "good"), (11L, "bad"), (12L, "good good bad")).toDF("id", "text")
    val r = QualityLM.nbClassifier(labeled, corpus, "id", "text", "label")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(10L) == ((1L, 1098612L, 1L)))
    assert(r(11L) == ((1L, -1098613L, 0L)))
    // Integer scores add exactly: 2·ln3 − ln3(floored) micro-units.
    assert(r(12L) == ((3L, 2 * 1098612L - 1098613L, 1L)))
  }

  test("nbClassifier: class-imbalanced prior shifts every score") {
    // 2 pos docs, 1 neg ⇒ prior_q = ⌊ln 2·10⁶⌋ = 693147, added to all docs.
    val labeled = Seq((0L, "good", 1L), (1L, "good", 1L), (2L, "bad", 0L))
      .toDF("id", "text", "label")
    val corpus = Seq((10L, "neutralword")).toDF("id", "text")
    val Array(row) = QualityLM.nbClassifier(labeled, corpus, "id", "text", "label").collect()
    // Unseen bucket: llr = ln((0+1)/(2+256)) − ln((0+1)/(1+256)) — only the
    // totals differ; compute it the same way the engine does.
    val expectLlr = math.floor((math.log(1.0 / 258.0) - math.log(1.0 / 257.0)) * 1e6).toLong
    assert(row.getLong(2) == 693147L + expectLlr)
  }

  test("nbClassifier: one-class labeled set fails fast") {
    val labeled = Seq((0L, "good", 1L)).toDF("id", "text", "label")
    val corpus  = Seq((10L, "x")).toDF("id", "text")
    val e = intercept[Exception] {
      QualityLM.nbClassifier(labeled, corpus, "id", "text", "label").collect()
    }
    assert(e.getMessage.contains("both classes") ||
      Option(e.getCause).exists(_.getMessage.contains("both classes")))
  }

  test("nbClassifier: model probe is broadcast, corpus never sort-merge joins") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val labeled = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("label", when(col("lang").isin("en", "de"), 1L).otherwise(0L))
    val plan = QualityLM.nbClassifier(labeled, docs, "doc_id", "text", "label")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "model join must broadcast")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge join:\n$plan")
  }
}
