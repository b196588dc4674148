package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("spread16/morton2: closed-form bit interleave") {
    import spark.implicits._
    // spread(3)=0b101, spread(1)=0b1 -> morton(3,1) = 0b101 | 0b10 = 7.
    // morton(x, y) puts x bits at even positions, y bits at odd.
    val df = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.morton2(col("x"), col("y")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | x << 8) & 0x00FF00FFL
      x = (x | x << 4) & 0x0F0F0F0FL
      x = (x | x << 2) & 0x33333333L
      (x | x << 1) & 0x55555555L
    }
    val exp = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L), (255L, 255L))
      .map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(got === exp)
    assert(got.head === 7L)
    assert(got(2) === 0x55555555L, "all-ones x fills exactly the even bits")
    assert(got(3) === 0xAAAAAAAAL, "all-ones y fills exactly the odd bits")
  }

  test("spread10/morton3: closed-form three-way interleave") {
    import spark.implicits._
    def spread(v: Long): Long = {
      var x = v & 0x3FFL
      x = (x | x << 16) & 0x030000FFL
      x = (x | x << 8) & 0x0300F00FL
      x = (x | x << 4) & 0x030C30C3L
      (x | x << 2) & 0x09249249L
    }
    val cases = Seq((1L, 1L, 1L), (1023L, 0L, 0L), (0L, 1023L, 0L), (0L, 0L, 1023L), (5L, 3L, 7L))
    val got = cases.toDF("x", "y", "z")
      .select(Layout.morton3(col("x"), col("y"), col("z")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    val exp = cases.map { case (x, y, z) => spread(x) | (spread(y) << 1) | (spread(z) << 2) }
    assert(got === exp)
    assert(got.head === 7L, "morton3(1,1,1) packs the three low bits")
    assert(got(1) === 0x09249249L, "x occupies exactly bits 0,3,6,…")
  }

  test("quantileBucketMap: exact equi-depth on uniform values; heavy value keeps one bucket") {
    import spark.implicits._
    val uniform = Seq.tabulate(64)(i => i.toLong).toDF("v")
    val m = Layout.quantileBucketMap(uniform, "v", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 64).forall(i => m(i.toLong) === i / 8), "uniform -> 8 docs per bucket")
    // One value holding half the mass: it gets ONE bucket id; later values
    // start past the mass it consumed.
    val skew = (Seq.fill(32)(5L) ++ Seq.tabulate(32)(i => 100L + i)).toDF("v")
    val sm = Layout.quantileBucketMap(skew, "v", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sm(5L) === 0L)
    assert(sm(100L) === 4L, "values after the heavy one start at its cumulative rank")
  }

  test("zorder2: partitioning-invariant; write-time clustering narrows BOTH columns' per-file ranges") {
    import spark.implicits._
    // 2-D grid: two independent uniform dims.
    val rows = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong * 64 + y, x.toLong, y.toLong)
    val df = rows.toDF("id", "cx", "cy")
    val z1 = Layout.zorder2(df, "cx", "cy", 64).select("id", "zvalue")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val z2 = Layout.zorder2(df.repartition(7), "cx", "cy", 64).select("id", "zvalue")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(z1 === z2, "bucket maps + interleave must not depend on partitioning")

    // Layout benefit: split into 16 files by (a) cx order vs (b) z order and
    // compare per-file value ranges. cx-sort clusters cx perfectly but leaves
    // cy's full range in every file; z-sort narrows both.
    def fileRanges(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val withFile = sorted.withColumn("__f", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__k"))))
      val r = withFile.groupBy("__f")
        .agg((max("cx") - min("cx")).as("rx"), (max("cy") - min("cy")).as("ry"))
        .agg(avg("rx"), avg("ry")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val zdf = Layout.zorder2(df, "cx", "cy", 64)
    val (zx, zy) = fileRanges(zdf.withColumn("__k", col("zvalue")))
    val (lx, ly) = fileRanges(df.withColumn("__k", col("cx")))
    assert(lx < 8.0, s"sanity: cx-sort clusters cx tightly, got $lx")
    assert(ly > 50.0, s"sanity: cx-sort leaves cy unclustered, got $ly")
    assert(zx < 20.0 && zy < 20.0,
      s"z-order must cluster BOTH dimensions (got cx range $zx, cy range $zy vs full 63)")
  }

  test("zorder2 keeps NULL rows: null layout values land in bucket 0, not dropped") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 5L, 7L), (2L, null, 7L), (3L, 5L, null), (4L, null, null), (5L, 9L, 2L))
      .toDF("id", "cx", "cy")
    val z = Layout.zorder2(df, "cx", "cy", 4)
    assert(z.count() === 5L, "inner-joining the bucket maps must not lose NULL rows")
    val byId = z.collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("zvalue"))).toMap
    assert(byId(4L) === 0L, "all-NULL row takes bucket 0 in both dims -> zvalue 0")
    assert(z.filter(col("zvalue").isNull).count() === 0L, "zvalue is always defined")
  }

  test("near-unique column routes through the range-binned path: bounded map, monotone buckets") {
    import spark.implicits._
    // 10k distinct values with a forced tiny exact-map cap: the per-value
    // map would be "corpus-sized", so the column must pre-bin.
    val df = Seq.tabulate(10000)(i => (i.toLong, i.toLong * 1000L + 17L, (i % 16).toLong))
      .toDF("id", "ts", "cat")
    val z = Layout.zorder2(df, "ts", "cat", buckets = 16, maxExactMapCard = 100L)
    assert(z.count() === 10000L)
    // Monotone: bucket rank of ts must be non-decreasing in ts, and roughly
    // equi-depth (bin-granularity: each of 16 buckets ~625 rows).
    val (binExpr, binnedMap) = Layout.rangeBinnedBucketMap(
      df, "ts", 16, BigDecimal(17L), BigDecimal(9999L * 1000L + 17L))
    val m = binnedMap.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(m.sliding(2).forall { case Array((_, b1), (_, b2)) => b1 <= b2; case _ => true },
      "bin -> bucket map must be monotone")
    assert(m.length <= (1 << 16), "bin map stays bounded regardless of value cardinality")
    val depth = df.select(binExpr.as("__bin")).join(
        binnedMap.withColumnRenamed("__v", "__bin"), "__bin")
      .groupBy("__b").count().collect().map(_.getLong(1))
    assert(depth.forall(c => c > 300 && c < 1000),
      s"bin-granularity equi-depth: each of 16 buckets near 625 rows, got ${depth.toSeq}")
    // Invariance under input partitioning still holds on the binned path.
    val z2 = Layout.zorder2(df.repartition(7), "ts", "cat", buckets = 16, maxExactMapCard = 100L)
      .select("id", "zvalue").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val z1 = z.select("id", "zvalue").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(z1 === z2)
  }

  test("distributedPrefix keeps quantileBucketMap exact at cardinality far above one range slice") {
    import spark.implicits._
    // 5k distinct values across 8 shuffle partitions: every range slice sees
    // only its share, yet the global rank (and so the bucket) is exact.
    val df = Seq.tabulate(5000)(i => i.toLong).toDF("v")
    val m = Layout.quantileBucketMap(df, "v", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 5000).forall(i => m(i.toLong) === i / 500),
      "two-level prefix sum must equal the single-window cumulative rank")
  }

  test("twoPhaseRank == unpartitioned row_number for every frame size, asc and desc") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Sizes straddle empty, < partitions, == partitions, and multi-slice.
    for (n <- Seq(0, 1, 3, 32, 997)) {
      val df = Seq.tabulate(n)(i => ((i * 7919) % 1000).toLong -> i.toLong).toDF("v", "id")
      val got = Layout.twoPhaseRank(df, "rk", desc("v"), asc("id"))
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("rk",
          row_number().over(Window.orderBy(desc("v"), asc("id"))).cast("long"))
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("twoPhasePrefixSumBefore == unpartitioned running sum (ties included)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Duplicate sort values on purpose: rows need not be distinct as long as
    // the caller's order is a total order via the id tie-break.
    val df = Seq.tabulate(500)(i => (((i * 31) % 40).toLong, i.toLong, (i % 7 + 1).toLong))
      .toDF("v", "id", "w")
    val got = Layout.twoPhasePrefixSumBefore(df, "ps", col("w"), asc("v"), asc("id"))
      .select("id", "ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("ps", coalesce(
        sum("w").over(Window.orderBy(asc("v"), asc("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("twoPhaseRankAll == chained twoPhaseRank: one sketch job, identical ranks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq.tabulate(997)(i =>
      (((i * 7919) % 100).toLong, ((i * 31) % 250).toLong, i.toLong)).toDF("a", "b", "id")
    val got = Layout.twoPhaseRankAll(df,
        ("ra", Seq(desc("a"), asc("id"))), ("rb", Seq(asc("b"), asc("id"))))
      .select("id", "ra", "rb").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = df
      .withColumn("ra", row_number().over(Window.orderBy(desc("a"), asc("id"))).cast("long"))
      .withColumn("rb", row_number().over(Window.orderBy(asc("b"), asc("id"))).cast("long"))
      .select("id", "ra", "rb").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("twoPhaseRankAndPrefixSumBy == separate rank + running sum over one order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq.tabulate(500)(i => (((i * 31) % 40).toLong, i.toLong, (i % 7 + 1).toLong))
      .toDF("v", "id", "w")
    val got = Layout.twoPhaseRankAndPrefixSumBy(
        df, "rk", "ps", col("w"), col("v").cast("double"), true, asc("v"), asc("id"))
      .select("id", "rk", "ps").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val w = Window.orderBy(asc("v"), asc("id"))
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("ps", coalesce(
        sum("w").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "rk", "ps").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("two-phase slice keys: dates map to epoch days, strings to a binary-order prefix") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Date sort key: a raw cast('double') would be NULL for every row (one
    // silent slice); the epoch-day surrogate must keep ranks exact.
    val dates = Seq.tabulate(300)(i => (java.sql.Date.valueOf("2024-01-01").toLocalDate
        .plusDays((i * 37) % 365).toString, i.toLong))
      .map { case (d, id) => (java.sql.Date.valueOf(d), id) }.toDF("d", "id")
    val gotD = Layout.twoPhaseRank(dates, "rk", asc("d"), asc("id"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantD = dates.withColumn("rk",
        row_number().over(Window.orderBy(asc("d"), asc("id"))).cast("long"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotD === wantD)
    // String sort key: '10' < '9' in binary order but 10 > 9 as doubles —
    // the prefix8 surrogate must follow STRING order, including numeric-
    // looking strings, empty strings, and ties beyond 8 bytes.
    val strs = (Seq.tabulate(260)(i => (i.toString, i.toLong)) ++
        Seq(("", 900L), ("zzzzzzzzzzA", 901L), ("zzzzzzzzzzB", 902L))).toDF("s", "id")
    val gotS = Layout.twoPhaseRank(strs, "rk", asc("s"), asc("id"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantS = strs.withColumn("rk",
        row_number().over(Window.orderBy(asc("s"), asc("id"))).cast("long"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotS === wantS)
    // Unsupported slice-key type fails fast instead of silently funneling.
    val arr = Seq((Seq(1L), 1L)).toDF("a", "id")
    val e = intercept[IllegalArgumentException] {
      Layout.twoPhaseRank(arr, "rk", asc("a"), asc("id"))
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("ntileFromRank reproduces SQL ntile exactly, including n % k != 0 remainders") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // n=7,k=5 is the case the naive (k*(rank-1)) div n + 1 formula gets
    // WRONG (rank 4 -> bucket 3 instead of ntile's 2); pin the exact
    // first-r-buckets-get-q+1-rows arithmetic across many frame sizes.
    for (n <- Seq(1, 2, 4, 5, 6, 7, 11, 23, 150, 151, 997); k <- Seq(3, 5)) {
      val df = Seq.tabulate(n)(i => i.toLong).toDF("id")
        .crossJoin(Seq(n.toLong).toDF("__n"))
        .withColumn("rk", row_number().over(Window.orderBy("id")).cast("long"))
      val got = df.withColumn("s", Layout.ntileFromRank("rk", "__n", k))
        .select("id", "s").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("s", ntile(k).over(Window.orderBy("id")).cast("long"))
        .select("id", "s").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("truncateLineage: localCheckpoint by default, reliable checkpoint under the config switch") {
    import spark.implicits._
    import graft.functions.Layout.LineageOps
    val df = Seq(1L, 2L, 3L).toDF("v")

    val local = df.truncateLineage()
    assert(local.as[Long].collect().sorted === Array(1L, 2L, 3L))
    // default path: executor-local blocks, never the reliable checkpoint dir
    assert(local.queryExecution.analyzed.toString.contains("LogicalRDD"),
      "truncateLineage must actually truncate (plan becomes a materialized RDD scan)")

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Layout.ReliableCheckpointKey, "true")
    try {
      val reliable = df.truncateLineage()
      assert(reliable.as[Long].collect().sorted === Array(1L, 2L, 3L))
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty,
        "reliableCheckpoint=true must write blocks to the fault-tolerant checkpoint dir")
    } finally {
      spark.conf.set(Layout.ReliableCheckpointKey, "false")
    }
  }
}
