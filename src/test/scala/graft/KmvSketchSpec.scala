package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KmvSketch, NativeFns, VecMath}

/** KMV distinct sketch + the hash61 universal hash: the hash is pinned
  * against an independent BigInteger reference (the whole point is exact
  * SQL replayability — any drift breaks the x_distinct_kmv oracle), the
  * sketch's exact and estimator regimes are checked closed-form, and
  * partition-invariance pins the map-side-mergeable claim.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val M = (1L << 61) - 1
  private val A = 1803442709493370165L
  private val B = 784588716359925081L

  private def refHash(x: Long): Long = {
    val m  = BigInt(M)
    val xm = ((BigInt(x) mod m) + m) mod m
    ((BigInt(A) * xm + BigInt(B)) mod m).toLong
  }

  test("hash61 == BigInteger reference, including negatives and extremes") {
    val probes = Seq(0L, 1L, -1L, 42L, -42L, M - 1, M, M + 1, Long.MaxValue, Long.MinValue,
      1234567890123456789L, -987654321098765432L) ++
      (1 to 200).map(i => i * 0x9E3779B97F4A7C15L + 17)
    probes.foreach { x =>
      assert(VecMath.hash61(x, A, B) == refHash(x), s"hash61 mismatch at x=$x")
    }
  }

  test("hash61 column expression matches the kernel and is codegen-compatible") {
    import spark.implicits._
    val xs  = Seq(7L, -7L, 0L, Long.MaxValue, 123456789L)
    val got = xs.toDF("x").select(NativeFns.hash61(col("x"), A, B)).collect().map(_.getLong(0))
    assert(got.toSeq == xs.map(refHash))
  }

  test("exact regime: fewer than k distinct values → filled == distinct, sketch is exact") {
    import spark.implicits._
    val agg = udaf(KmvSketch.sketch(64))
    val out = (1 to 40).flatMap(i => Seq(i.toLong, i.toLong)) // 40 distinct, duplicated
      .toDF("x")
      .select(NativeFns.hash61(col("x"), A, B).as("h"))
      .agg(agg(col("h")).as("s"))
      .select("s.kthMin", "s.filled").head()
    assert(out.getLong(1) == 40L)
    assert(out.getLong(0) == (1 to 40).map(i => refHash(i.toLong)).max)
  }

  test("estimator regime: n >> k within the ~1/sqrt(k) bound; empty input well-defined") {
    import spark.implicits._
    val k   = 256
    val n   = 20000
    val agg = udaf(KmvSketch.sketch(k))
    val row = (1 to n).map(_.toLong).toDF("x")
      .select(NativeFns.hash61(col("x"), A, B).as("h"))
      .agg(agg(col("h")).as("s")).select("s.kthMin", "s.filled").head()
    assert(row.getLong(1) == k)
    val est = (k - 1).toDouble * (M.toDouble / row.getLong(0).toDouble)
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k), s"estimate $est vs $n") // 4σ
    val agg8  = udaf(KmvSketch.sketch(8))
    val empty = Seq.empty[Long].toDF("x")
      .agg(agg8(col("x")).as("s")).select("s.kthMin", "s.filled").head()
    assert(empty.getLong(0) == -1L && empty.getLong(1) == 0L)
  }

  test("distinctCountStream: closed window equals a batch sketch of the same rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.RainStorm
      .distinctCountStream(in.toDF().toDF("id", "ts"), "id", "ts",
        k = 64, windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("kmv_stream").outputMode("append").start()
    try {
      // Window [00:00, 00:10): 300 distinct ids with duplicates, split
      // across two micro-batches; then a far-future event closes it.
      in.addData((1 to 200).map(i => (i.toLong, ts(1))): _*)
      q.processAllAvailable()
      in.addData((100 to 300).map(i => (i.toLong, ts(5))): _*)
      q.processAllAvailable()
      in.addData((999999L, ts(60)))
      q.processAllAvailable()
      val got = spark.table("kmv_stream").filter(col("window_start") === ts(0))
        .select("filled", "kth_min", "n_distinct_est").head()
      // Batch reference: same sketch over the same 300 distinct ids.
      val agg = udaf(KmvSketch.sketch(64))
      val ref = (1 to 300).map(_.toLong).toDF("id")
        .select(NativeFns.hash61(col("id"), A, B).as("h"))
        .agg(agg(col("h")).as("s")).select("s.filled", "s.kthMin").head()
      assert(got.getLong(0) == ref.getLong(0))
      assert(got.getLong(1) == ref.getLong(1))
      val est = math.floor(63.0 * (M.toDouble / ref.getLong(1).toDouble)).toLong
      assert(got.getLong(2) == est)
    } finally q.stop()
  }

  test("partition-invariant: same sketch at 1, 3 and 13 partitions (map-side merge exact)") {
    import spark.implicits._
    val data = (1 to 5000).map(i => (i % 1700).toLong) // dups across partitions
    def run(parts: Int): (Long, Long) = {
      val agg = udaf(KmvSketch.sketch(128))
      val r = data.toDF("x").repartition(parts)
        .select(NativeFns.hash61(col("x"), A, B).as("h"))
        .agg(agg(col("h")).as("s")).select("s.kthMin", "s.filled").head()
      (r.getLong(0), r.getLong(1))
    }
    val one = run(1)
    assert(run(3) == one && run(13) == one)
  }
}
