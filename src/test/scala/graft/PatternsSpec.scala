package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Patterns

/** Row-pattern family: MATCH_RECOGNIZE DFA semantics on a planted event
  * fixture (greedy V+, contiguity breaks, skip-past-last disjointness),
  * skyline vs a driver-side brute-force dominance check, and the CUSUM
  * recurrence replayed as a driver-side fold.
  */
class PatternsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("match_recognize: planted fixture matches hand-derived matches only") {
    import spark.implicits._
    val dir = "/tmp/graft_patterns_fixture"
    // user 1: V V C P (match, 2 views) then V P (no C) then V C V C P
    //   (V after C restarts the run: match with 1 view)
    // user 2: C P (no preceding V), V C O P (O breaks contiguity)
    val rows = Seq(
      (1L, ts(0), 1L, "view", 0.0, ""), (2L, ts(1), 1L, "view", 0.0, ""),
      (3L, ts(2), 1L, "click", 0.0, ""), (4L, ts(3), 1L, "purchase", 0.0, ""),
      (5L, ts(4), 1L, "view", 0.0, ""), (6L, ts(5), 1L, "purchase", 0.0, ""),
      (7L, ts(6), 1L, "view", 0.0, ""), (8L, ts(7), 1L, "click", 0.0, ""),
      (9L, ts(8), 1L, "view", 0.0, ""), (10L, ts(9), 1L, "click", 0.0, ""),
      (11L, ts(10), 1L, "purchase", 0.0, ""),
      (20L, ts(0), 2L, "click", 0.0, ""), (21L, ts(1), 2L, "purchase", 0.0, ""),
      (22L, ts(2), 2L, "view", 0.0, ""), (23L, ts(3), 2L, "click", 0.0, ""),
      (24L, ts(4), 2L, "error", 0.0, ""), (25L, ts(5), 2L, "purchase", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Patterns.matchRecognize.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_views"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
    def us(min: Int) = ts(min).getTime * 1000L
    assert(out.toSeq == Seq(
      (1L, 2L, us(0), us(3)),
      (1L, 1L, us(8), us(10))))
  }

  test("match_recognize on sf0.001 equals a driver-side scan of the sorted log") {
    val got = Patterns.matchRecognize.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_views"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSeq

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tm"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tm"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .sortBy(t => (t._1, t._2, t._3))
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var cur = Long.MinValue; var st = 0; var nV = 0L; var vs = 0L
    ev.foreach { case (u, tm, _, et) =>
      if (u != cur) { cur = u; st = 0 }
      et match {
        case "view"     => if (st == 1) nV += 1 else { st = 1; nV = 1; vs = tm }
        case "click"    => st = if (st == 1) 2 else 0
        case "purchase" => if (st == 2) expect += ((u, nV, vs, tm)); st = 0
        case _          => st = 0
      }
    }
    assert(got.nonEmpty, "pattern should fire at sf0.001")
    assert(got.sorted == expect.toSeq.sorted)
  }

  test("skyline equals brute-force dominance over the per-customer aggregates") {
    val got = Patterns.skyline.run(spark, sf).collect()
      .map(r => r.getAs[Long]("custkey")).toSet

    val per = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"),
        max(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))).as("d"))
      .collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("s"),
        r.getAs[Long]("n"), r.getAs[Int]("d").toLong))
    def dom(b: (Long, Long, Long, Long), a: (Long, Long, Long, Long)) =
      b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 &&
        (b._2 > a._2 || b._3 > a._3 || b._4 > a._4)
    val expect = per.filter(a => !per.exists(b => dom(b, a))).map(_._1).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < per.length, "frontier is a strict subset")
  }

  test("patternStream: a pattern spanning a micro-batch split completes exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val us = 1000000L
    val in = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.RainStorm.patternStream(spark, in.toDS())
      .writeStream.format("memory").queryName("pattern_stream").outputMode("append").start()
    try {
      // Batch 1: u1 mid-run (V V), u2 a complete match, u3 V C (awaiting P).
      in.addData(
        (1L, "view", 10 * us), (1L, "view", 11 * us),
        (2L, "view", 10 * us), (2L, "click", 11 * us), (2L, "purchase", 12 * us),
        (3L, "view", 10 * us), (3L, "click", 11 * us))
      q.processAllAvailable()
      val afterB1 = spark.table("pattern_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(afterB1 == Set((2L, 1L, 10 * us, 12 * us)))
      // Batch 2: u1's C and P arrive (match started in batch 1: 2 views);
      // u3's P arrives (match across the split with C already consumed);
      // u2 starts over but is broken by an error event.
      in.addData(
        (1L, "click", 20 * us), (1L, "purchase", 21 * us),
        (3L, "purchase", 20 * us),
        (2L, "view", 20 * us), (2L, "error", 21 * us), (2L, "purchase", 22 * us))
      q.processAllAvailable()
      val got = spark.table("pattern_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        (2L, 1L, 10 * us, 12 * us),
        (1L, 2L, 10 * us, 21 * us),
        (3L, 1L, 10 * us, 20 * us)))
    } finally q.stop()
  }

  test("patternStream equals the batch DFA on a replayed sf0.001 log") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tm"))
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val cut = ev(ev.length / 2)._3
    val in = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.RainStorm.patternStream(spark, in.toDS())
      .writeStream.format("memory").queryName("pattern_stream_sf").outputMode("append").start()
    try {
      in.addData(ev.filter(_._3 < cut).toIndexedSeq)
      q.processAllAvailable()
      in.addData(ev.filter(_._3 >= cut).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("pattern_stream_sf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = Patterns.matchRecognize.run(spark, sf).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_views"),
          r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("simjoin_prefix is LOSSLESS: equals exact all-pairs Jaccard at sf0.001") {
    import graft.queries.Patterns
    val got = Patterns.simjoinPrefix.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.DedupOps.shingles(col("text"), 4).as("t"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1).toSet))
    val expect = (for {
      (a, ta) <- sh; (b, tb) <- sh if a < b
      inter = (ta & tb).size.toDouble
      if inter / (ta.size + tb.size - inter) >= 0.8
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "planted near-dups should qualify at sf0.001")
  }

  test("max_concurrency: sweep closes to zero and matches brute-force on peak day") {
    import graft.queries.Patterns
    val rows = Patterns.maxConcurrency.run(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("open")))
    assert(rows.last._2 == 0L, "every shipment interval eventually closes")
    assert(rows.forall(_._2 >= 0L))
    val (peakDay, peakOpen) = rows.maxBy(_._2)
    val iv = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), to_date(col("l_shipdate")).as("ship"))
      .distinct().collect()
      .map { r =>
        val d = r.getAs[java.sql.Date]("ship").toLocalDate
        val dur = 1 + ((r.getAs[Number]("l_orderkey").longValue +
          r.getAs[Number]("l_linenumber").longValue) % 14)
        (d, d.plusDays(dur))
      }
    val pd = peakDay.toLocalDate
    val brute = iv.count { case (s0, e0) => !pd.isBefore(s0) && pd.isBefore(e0) }
    assert(brute.toLong == peakOpen)
  }

  test("skyline_incremental equals the full-recompute skyline (the maintenance contract)") {
    import graft.queries.Patterns
    val inc = Patterns.skylineIncremental.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("spend_cents"),
        r.getAs[Long]("n_orders"))).toSet
    val full = Patterns.skyline.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("spend_cents"),
        r.getAs[Long]("n_orders"))).toSet
    assert(inc == full)
    // the split must actually exercise both phases
    val n = Tables.orders(spark, sf)
      .filter(to_date(col("o_orderdate")) >= lit("1995-06-01")).count()
    val m = Tables.orders(spark, sf)
      .filter(to_date(col("o_orderdate")) < lit("1995-06-01")).count()
    assert(n > 0 && m > 0, "cutoff must split the data")
  }

  test("phrase_search counts match a driver-side scan of each doc") {
    import graft.queries.Indexing
    val got = Indexing.phraseSearch.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase"),
        r.getAs[Long]("n_matches")))
    assert(got.nonEmpty)
    val phrase = got.head._2.split(" ")
    assert(phrase.length == 3)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").split(" ").filter(_.nonEmpty)))
      .toMap
    got.foreach { case (id, _, nm) =>
      val arr = docs(id)
      val brute = arr.indices.dropRight(2).count(i =>
        arr(i) == phrase(0) && arr(i + 1) == phrase(1) && arr(i + 2) == phrase(2))
      assert(brute.toLong == nm, s"doc $id")
      assert(nm > 0)
    }
  }

  test("cusumStream equals the batch chart across a mid-warmup batch split") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val daily = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().sortBy(t => (t._2, t._1))
    // split INSIDE the warmup window of every series (day 10 of ~2400)
    val cutDay = daily.map(_._2).distinct.sorted.apply(10)
    val in = MemoryStream[(String, String, Long)]
    val q = graft.streaming.RainStorm.cusumStream(spark, in.toDF()
        .toDF("priority", "day", "n"))
      .writeStream.format("memory").queryName("cusum_stream").outputMode("update").start()
    try {
      in.addData(daily.filter(_._2 < cutDay).toIndexedSeq)
      q.processAllAvailable()
      in.addData(daily.filter(_._2 >= cutDay).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("cusum_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = graft.queries.Patterns.cusumChangepoint.run(spark, sf).collect()
        .map(r => (r.getAs[String]("priority"), r.getAs[java.sql.Date]("day").toString,
          r.getAs[Long]("n"), r.getAs[Long]("cusum_milli"), r.getAs[Long]("alarm"))).toSet
      assert(got == batch)
      assert(got.size > 100)
    } finally q.stop()
  }

  test("cusumStream idleTtl expires a never-completing warmup buffer (state store stays bounded)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, String, Long)]
    // warmup 2, TTL 1s of processing time, real trigger (an armed
    // ProcessingTimeTimeout needs periodic batches to fire; see docstring).
    val q = graft.streaming.RainStorm.cusumStream(spark, in.toDF()
        .toDF("priority", "day", "n"), warmup = 2, idleTtl = Some("1 second"))
      .writeStream.format("memory").queryName("cusum_ttl")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(("A", "d1", 10L)) // half-filled warmup buffer, then silence
      Thread.sleep(4000)           // > TTL: the idle key's state must expire
      in.addData(("A", "d2", 20L), ("A", "d3", 30L))
      val deadline = System.currentTimeMillis() + 30000
      def rows() = spark.table("cusum_ttl").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      while (rows().size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      // Expired: d1 is gone, warmup refills from {d2,d3} alone -> mu=25000,
      // exactly two emitted rows. Un-expired state would emit THREE rows
      // (d1+d2 fill warmup at mu=15000, then d3).
      val got = rows()
      assert(got.size == 2, s"expected d1's buffer expired, got $got")
      assert(got.map(_._1) == Set("d2", "d3") && !got.exists(_._1 == "d1"))
      val mu = 25000L
      val s2 = math.max(0L, 0L + (1000 * 20 - mu - mu / 20))
      val s3 = math.max(0L, (if (s2 > mu) 0L else s2) + (1000 * 30 - mu - mu / 20))
      assert(got == Set(("d2", 20L, s2), ("d3", 30L, s3)), s"recurrence mismatch: $got")
    } finally q.stop()
  }

  test("personalized pagerank matches a driver-side integer fold of the same graph") {
    import graft.queries.Extensions
    val got = Extensions.pprQ.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("rank_scaled"))).toMap

    val edges = Tables.events(spark, sf)
      .select((col("user_id") % 211).as("src"), (col("event_id") % 211).as("dst"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).distinct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg   = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.size.toLong }
    val seeds = nodes.filter(_ % 13 == 0)
    val scale = 1000000000000L
    var r = nodes.map(n => n -> (if (n % 13 == 0) scale / seeds.size else 0L)).toMap
    for (_ <- 1 to 5) {
      val contribs = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s0, _) => r(s0) / deg(s0) }.sum
      }
      r = nodes.map { n =>
        val base = if (n % 13 == 0) (15L * scale) / (100L * seeds.size) else 0L
        n -> (base + (85L * contribs.getOrElse(n, 0L)) / 100L)
      }.toMap
    }
    assert(got == r)
    assert(got.values.exists(_ > 0) && seeds.nonEmpty)
    // mass concentrates at/near seeds: the top-ranked node is a seed
    assert(got.maxBy(_._2)._1 % 13 == 0)
  }

  test("abtest z statistic matches driver-side two-proportion math") {
    import graft.queries.Governance
    val r = Governance.abtestSignificance.run(spark, sf).collect().head
    val (na, ca) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"))
    val (nb, cb) = (r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    assert(na > 0 && nb > 0)
    assert(ca < na || cb < nb, "conversion must not be degenerate")
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val z =
      if (pp == 0.0 || pp == 1.0) 0.0
      else (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Long]("z_milli") == math.floor(z * 1000 + 0.5).toLong)
    assert(r.getAs[Long]("significant") == (if (math.abs(z) > 1.96) 1L else 0L))
  }

  test("error_burst: maximal runs only, boundaries at user change and stream end") {
    import spark.implicits._
    import graft.queries.Patterns
    val dir = "/tmp/graft_burst_fixture"
    // u1: E E E E E (one burst of 5, trailing at user boundary)
    // u2: E E view E E E (first run too short; second qualifies, ends stream)
    // u3: E E (never qualifies)
    val rows = Seq(
      (1L, ts(0), 1L, "error", 0.0, ""), (2L, ts(1), 1L, "error", 0.0, ""),
      (3L, ts(2), 1L, "error", 0.0, ""), (4L, ts(3), 1L, "error", 0.0, ""),
      (5L, ts(4), 1L, "error", 0.0, ""),
      (10L, ts(0), 2L, "error", 0.0, ""), (11L, ts(1), 2L, "error", 0.0, ""),
      (12L, ts(2), 2L, "view", 0.0, ""),
      (13L, ts(3), 2L, "error", 0.0, ""), (14L, ts(4), 2L, "error", 0.0, ""),
      (15L, ts(5), 2L, "error", 0.0, ""),
      (20L, ts(0), 3L, "error", 0.0, ""), (21L, ts(1), 3L, "error", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Patterns.errorBurst.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_errors"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSet
    def us(min: Int) = ts(min).getTime * 1000L
    assert(out == Set(
      (1L, 5L, us(0), us(4)),
      (2L, 3L, us(3), us(5))))
  }

  test("simjoin_incremental equals the delta-involving slice of exact all-pairs") {
    import graft.queries.Patterns
    val got = Patterns.simjoinIncremental.run(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.DedupOps.shingles(col("text"), 4).as("t"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](1).toSet))
    val expect = (for {
      (a, ta) <- sh; (b, tb) <- sh if a < b
      if a % 10 == 0 || b % 10 == 0 // at least one delta doc
      inter = (ta & tb).size.toDouble
      if inter / (ta.size + tb.size - inter) >= 0.8
    } yield (a, b)).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "the delta slice should contain planted near-dups")
  }

  test("cusum recurrence matches a driver-side fold, alarms reset the statistic") {
    val rows = Patterns.cusumChangepoint.run(spark, sf).collect()
    assert(rows.length > 20)
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, rs0) =>
      val rs = rs0.sortBy(_.getAs[java.sql.Date]("day").toString)
      val warm = rs.take(28).map(_.getAs[Long]("n") * 1000L)
      val mu = warm.sum / warm.length
      val k = mu / 20
      var carry = 0L
      rs.foreach { r =>
        val sPre = math.max(0L, carry + (1000 * r.getAs[Long]("n") - mu - k))
        assert(r.getAs[Long]("cusum_milli") == sPre)
        val alarm = if (sPre > mu) 1L else 0L
        assert(r.getAs[Long]("alarm") == alarm)
        carry = if (alarm == 1L) 0L else sPre
      }
    }
  }
}
