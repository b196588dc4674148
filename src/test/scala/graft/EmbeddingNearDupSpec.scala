package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DedupOps

/** Gates for the scale-safe embedding near-dup path
  * (`x_dedup_embedding_neardup`): exact-parity on planted near-identical
  * vectors (the registry oracle is vacuously empty on driver testdata, whose
  * max pairwise cosine is ~0.6 — THIS is the non-vacuous proof), the
  * corpus-size-adaptive SRP geometry, and the bounded-truncation (not drop)
  * semantics of oversized LSH buckets.
  */
class EmbeddingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cos(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < x.length) {
      dot += x(i).toDouble * y(i).toDouble
      na += x(i).toDouble * x(i).toDouble
      nb += y(i).toDouble * y(i).toDouble
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  test("auto near-dup dedup exactly matches brute force on planted near-identical pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 60 base vectors, each with a planted near-identical twin (cos ~0.9999),
    // plus 120 independent noise vectors (64-dim gaussian pairs concentrate
    // near cos 0 — none qualify at 0.9).
    val rows = (0L until 60L).flatMap { i =>
      val base = Array.fill(64)(rng.nextGaussian().toFloat)
      val twin = base.map(v => v + 0.005f * rng.nextGaussian().toFloat)
      Seq(2 * i -> base, 2 * i + 1 -> twin)
    } ++ (200L until 320L).map(i => i -> Array.fill(64)(rng.nextGaussian().toFloat))

    val exact = (for {
      i <- rows.indices.iterator
      j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= 0.9
    } yield {
      val (a, b) = (rows(i)._1, rows(j)._1)
      if (a < b) (a, b) else (b, a)
    }).toSet
    assert(exact.size >= 60, s"fixture lost its planted pairs: ${exact.size}")

    val got = DedupOps
      .embeddingNearDupsAuto(rows.toDF("id", "vec"), "id", "vec", threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // Precision is exact by construction (every candidate re-verified with
    // true cosine); at targetRecall=0.999 and planted cosine ~0.9999 the
    // seed-fixed draw detects every pair — so the result IS the exact set.
    assert(got == exact,
      s"missed=${(exact -- got).take(5)} spurious=${(got -- exact).take(5)} " +
        s"(${exact.size} exact, ${got.size} got)")
  }

  test("registry query is rightly empty on driver testdata (no pairs above cosine 0.9 exist)") {
    val out = graft.queries.Extensions.dedupEmbeddingNearDup.run(spark, TestSpark.sf0001)
    assert(out.count() == 0L, "driver sf0.001 embeddings max pairwise cosine is ~0.6; found pairs?")
  }

  test("auto SRP geometry: occupancy-pinned planes, recall-pinned tables, clamps") {
    // Bucket count tracks corpus size: n/2^nPlanes ~ targetOccupancy.
    assert(DedupOps.autoSrpGeometry(500L, 0.9) == ((4, 9)))
    assert(DedupOps.autoSrpGeometry(2000L, 0.9) == ((6, 14)))
    assert(DedupOps.autoSrpGeometry(20000L, 0.9) == ((10, 29)))
    // Deeper planes at the same n for the same threshold never LOWER tables.
    val (p1, t1) = DedupOps.autoSrpGeometry(1000000L, 0.9)
    assert(p1 == 15 && t1 >= 29, s"got ($p1, $t1)")
    // Clamps: a tiny corpus floors at 4 planes; a high threshold needs few
    // tables, a low threshold hits the 64-table ceiling.
    assert(DedupOps.autoSrpGeometry(10L, 0.99) == ((4, 4)))
    assert(DedupOps.autoSrpGeometry(1000000000L, 0.9)._1 == 20)
    assert(DedupOps.autoSrpGeometry(100000L, 0.35)._2 == 64)
  }

  test("oversized buckets are truncated to the cap's smallest ids, not dropped") {
    import spark.implicits._
    // One degenerate bucket of 10 ids with cap 5: the old drop semantics
    // emitted NOTHING (recall cliff); truncation emits C(5,2) pairs over the
    // 5 smallest ids. A small healthy bucket alongside is untouched.
    val banded = ((0L until 10L).map(i => (0, 7, i)) ++ Seq((1, 3, 100L), (1, 3, 101L)))
      .toDF("band", "bucket", "id")
    val pairs = DedupOps.pairsFromBuckets(banded, "id", maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for { a <- 0L until 5L; b <- (a + 1) until 5L } yield (a, b)).toSet + ((100L, 101L))
    assert(pairs == expected, s"got $pairs")
  }

  test("embeddingNearDupsAgainstCorpus: planted cross pairs found, within-side pairs absent") {
    import spark.implicits._
    val rng  = new scala.util.Random(11)
    val base = Array.fill(64)(rng.nextGaussian().toFloat)
    val corpus = (Seq(100L -> base) ++
      (101L to 120L).map(i => i -> Array.fill(64)(rng.nextGaussian().toFloat))).toDF("id", "vec")
    val near = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val batch = (Seq(1L -> near, 2L -> base) ++ // 2 is an exact copy of corpus 100
      (3L to 10L).map(i => i -> Array.fill(64)(rng.nextGaussian().toFloat))).toDF("id", "vec")
    val got = DedupOps
      .embeddingNearDupsAgainstCorpus(corpus, batch, "id", "vec", threshold = 0.9)
      .select("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 100L)) && got.contains((2L, 100L)),
      s"planted near-copy and exact copy must pair with corpus 100: $got")
    assert(got.forall(_._2 == 100L), s"random vectors must not pair: $got")
  }
}
