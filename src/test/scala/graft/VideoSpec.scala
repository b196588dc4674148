package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.multimodal.{Video, VideoCodec}

/** The video decode path: VideoCodec must implement the ISO-BMFF box format
  * (asserted against independent in-test big-endian byte reads, NOT against
  * the codec itself), tolerate unknown boxes anywhere in the tree, reject
  * malformed/torn containers, slice frames through the stco/stsc/stsz chunk
  * map exactly, and the pipeline stages (keyframe digest, scene cuts,
  * temporal fingerprint) must match hand-computed values.
  */
class VideoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def tag(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "US-ASCII")

  private val frames = Array(
    Array.tabulate(6)(i => (10 * i).toByte),       // 2x3 frame 0
    Array.tabulate(6)(i => (10 * i + 1).toByte),
    Array.tabulate(6)(i => (200 + i).toByte),
    Array.tabulate(6)(i => (200 + i + 1).toByte))
  private val clip = VideoCodec.encodeMp4(2, 3, 1000, 40, frames, Array(0, 2))

  test("MP4 encode writes spec-literal box structure, independent BE reads") {
    // ftyp first: size 16, brand isom
    assert(be32(clip, 0) == 16 && tag(clip, 4) == "ftyp" && tag(clip, 8) == "isom")
    // mdat second: 8 + 4 frames x 6 bytes
    assert(be32(clip, 16) == 8 + 24 && tag(clip, 20) == "mdat")
    // frame payload verbatim at mdat payload offset 24
    assert(clip(24) == 0 && (clip(24 + 6) & 0xff) == 1 && (clip(24 + 12) & 0xff) == 200)
    // moov third, spanning to EOF; canonical size 445 + 4n + 4*nsync
    val moovOff = 16 + 8 + 24
    assert(tag(clip, moovOff + 4) == "moov")
    assert(be32(clip, moovOff) == 445 + 4 * 4 + 4 * 2)
    assert(moovOff + be32(clip, moovOff) == clip.length)
    // total matches the closed form the oracle predicts
    assert(clip.length == 469 + 4 * 6 + 4 * 4 + 4 * 2)
  }

  test("decode round-trips dims, duration, keyframes, and frame bytes exactly") {
    val v = VideoCodec.decode(clip)
    assert(v.brand == "isom" && v.codec == "gry8")
    assert(v.width == 2 && v.height == 3)
    assert(v.timescale == 1000 && v.duration == 160 && v.durationMs == 160)
    assert(v.syncSamples.toSeq == Seq(1, 3)) // 1-based
    assert(v.nFrames == 4)
    (0 until 4).foreach(f => assert(v.frames(f).toSeq == frames(f).toSeq, s"frame $f"))
  }

  test("box walk tolerates unknown boxes; a box shifted under stco is rejected") {
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 9, 9, 9, 9)
    // unknown box between mdat and moov: skipped, frame map unaffected
    val ftypMdat = clip.take(16 + 8 + 24)
    val moov     = clip.drop(16 + 8 + 24)
    val v = VideoCodec.decode(ftypMdat ++ free ++ moov)
    assert(v.width == 2 && v.nFrames == 4 && v.frames(2).toSeq == frames(2).toSeq)
    // unknown box BEFORE mdat shifts the payload away from the absolute
    // stco offset — the chunk-map bounds check must refuse, not misread
    val shifted = clip.take(16) ++ free ++ clip.drop(16)
    assert(VideoCodec.tryDecode(shifted).isEmpty)
  }

  test("malformed containers are rejected, not misparsed") {
    assert(VideoCodec.tryDecode(Array[Byte](1, 2, 3)).isEmpty, "truncated")
    val notFtyp = clip.clone(); notFtyp(4) = 'x'
    assert(VideoCodec.tryDecode(notFtyp).isEmpty, "first box not ftyp")
    val torn = clip.dropRight(5) // moov declares more than remains
    assert(VideoCodec.tryDecode(torn).isEmpty, "box overruns buffer")
    // stsz count inconsistent with stts total: flip stts sample_count
    val bad = clip.clone()
    val i = bad.indexOfSlice("stts".getBytes("US-ASCII"))
    // layout after the 4cc: ver/flags 4, entry_count 4, then entry[0].count
    bad(i + 15) = 9
    assert(VideoCodec.tryDecode(bad).isEmpty, "stts/stsz mismatch")
  }

  test("synthetic clip geometry and pixels follow the documented formulas") {
    val text  = "hello spark video"
    val len   = text.getBytes("UTF-8").length // 17
    val v     = VideoCodec.decode(Video.syntheticMp4(text))
    assert(v.width == len % 16 + 4 && v.height == len % 12 + 4)
    assert(v.nFrames == len % 10 + 4)
    assert(v.syncSamples.toSeq == (0 until v.nFrames by 4).map(_ + 1))
    val b = text.getBytes("UTF-8")
    // spot-check frame 5 (scene 1, phase 40*1 + 1), pixel 7
    val expected = ((b(7 % len) & 0xff) + 41 + 21) % 256
    assert((v.frames(5)(7) & 0xff) == expected)
  }

  test("pipeline stages match hand-computed values on a tiny frame") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text") // len 2: w=6, h=6, n=6
    val pay  = Video.withVideoPayload(spark, docs)
    val meta = Video.decodeMeta(spark, pay).collect().head
    assert(meta.width == 6 && meta.height == 6 && meta.n_frames == 6)
    assert(meta.n_keyframes == 2 && meta.duration_ms == 240)
    assert(meta.n_bytes == 469 + 6 * 36 + 4 * 6 + 4 * 2)

    // frame luma sums from the formula: p(f,i) = (b(i%2) + phase(f) + 3i) % 256
    val b      = "ab".getBytes("UTF-8")
    def p(f: Int, i: Int): Int = ((b(i % 2) & 0xff) + 40 * (f / 4) + f % 4 + 3 * i) % 256
    def fsum(f: Int): Long = (0 until 36).map(p(f, _)).sum.toLong

    val kd = Video.sampleKeyframes(spark, pay).collect().head
    assert(kd.n_sampled == 2)
    assert(kd.luma_total == fsum(0) + fsum(4))
    assert(kd.luma_checksum == fsum(0) * 1 + fsum(4) * 5)

    val sc = Video.detectSceneCuts(spark, pay).collect().head
    def sad(f: Int): Long = (0 until 36).map(i => math.abs(p(f, i) - p(f - 1, i))).sum.toLong
    val sads = (1 until 6).map(sad)
    assert(sc.total_motion == sads.sum && sc.max_sad == sads.max)
    assert(sc.n_cuts == sads.count(_ > 16L * 36))
    assert(sc.first_cut == 4, "the scene boundary at the second GOP")

    val fp = Video.fingerprint(spark, pay).collect().head
    val sums = (0 until 6).map(fsum)
    val expFp = (1 until 6).filter(f => sums(f) >= sums(f - 1)).map(f => 1L << (f - 1)).sum
    assert(fp.fp == expFp)
  }

  test("registry queries run and return one row per document") {
    val n = Tables.documents(spark, TestSpark.sf0001).count()
    MediaVideoRegistryProbe.names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, TestSpark.sf0001)
      assert(df.count() == n, s"$q row count")
    }
  }

  test("curation pipeline gates discriminate and survivors are fp-group minima") {
    val out = SparkEntry.queries("x_curation_video")(spark, TestSpark.sf0001).collect()
    val n   = Tables.documents(spark, TestSpark.sf0001).count()
    assert(out.nonEmpty && out.length < n, "gates must drop some documents")
    // every survivor carries >= 1 cut by the gate's own columns
    assert(out.forall(_.getLong(out.head.fieldIndex("n_cuts")) >= 1))
  }

  test("curateStream: micro-batch slicing equals the batch face; corpus + cross-batch fps drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
    val corpusFps = Video
      .fingerprint(spark, Video.withVideoPayload(spark, docs.filter(col("doc_id") % 2 === 0)))
      .collect().map(_.fp).toSet
    val batchClips = Video
      .withVideoPayload(spark, docs.filter(col("doc_id") % 2 === 1))
      .collect().sortBy(_._1)

    // Batch face = the same operator on a batch Dataset (empty state).
    val want = Video
      .curateStream(spark, batchClips.toSeq.toDS(), corpusFps)
      .collect().map(c => (c.doc_id, c.fp)).sorted.toSeq
    assert(want.nonEmpty, "sanity: some arriving clips must survive")
    assert(want.forall { case (_, fp) => !corpusFps.contains(fp) },
      "no survivor may carry a persisted corpus fingerprint")

    // Streamed in three id-ordered micro-batches: state must carry the
    // first-wins set across batches, reproducing the batch face exactly.
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Video.curateStream(spark, in.toDS(), corpusFps)
      .writeStream.format("memory").queryName("video_curate_stream")
      .outputMode("append").start()
    try {
      Seq(batchClips.take(40), batchClips.slice(40, 170), batchClips.drop(170)).foreach { b =>
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("video_curate_stream")
      .select("doc_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === want)

    // Cross-batch dedup is live: a batch-2 clip with a batch-1 survivor's
    // fp exists in this corpus (fp space is 2^12, 250 odd docs), and the
    // smaller id won.
    val byFp = Video
      .scoreClips(spark, batchClips.toSeq.toDS()).collect()
      .filter(c => c.n_cuts >= 1 && c.total_motion >= 6L * c.px * (c.n_frames - 1))
      .groupBy(_.fp)
    val dupGroups = byFp.filter { case (fp, cs) => cs.length > 1 && !corpusFps.contains(fp) }
    assert(dupGroups.nonEmpty, "sanity: some fp group must have >1 gated arrival")
    dupGroups.foreach { case (fp, cs) =>
      assert(got.contains((cs.map(_.doc_id).min, fp)), s"group $fp keeps its min id")
      assert(cs.map(_.doc_id).sorted.tail.forall(id => !got.contains((id, fp))),
        s"group $fp drops later arrivals")
    }
  }
}

private object MediaVideoRegistryProbe {
  val names = Seq("x_video_meta", "x_video_frame_sample", "x_video_scene_cuts", "x_video_fingerprint")
}
