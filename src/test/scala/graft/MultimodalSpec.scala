package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.StubCodec

/** The multimodal decode path: the mapPartitions plumbing must reproduce the
  * (stub) codec exactly, and the registered query must stay scalar-only (the
  * driver's compare harness cannot sort array columns — round-1 regression).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeFrames matches the plain codec applied to the raw payload bytes") {
    val withPayload = Multimodal.withPayload(Tables.documents(spark, TestSpark.sf0001)).limit(25)
    val decoded = Multimodal.decodeFrames(spark, withPayload)
      .collect().map(m => m.doc_id -> m).toMap
    val raw = withPayload.select(col("doc_id").cast("long"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    assert(raw.nonEmpty)
    raw.foreach { case (id, bytes) =>
      val m = decoded(id)
      assert(m.n_bytes == bytes.length.toLong)
      assert(m.fake_width == StubCodec.width(bytes))
      assert(m.fake_height == StubCodec.height(bytes))
      assert(m.frame_hashes == StubCodec.frames(bytes), s"frame hashes differ for doc $id")
      assert(m.frame_hashes.length == math.min(math.ceil(bytes.length / 256.0).toInt, 8))
    }
  }

  test("x_multimodal_frames output is scalar-only (driver compare cannot sort arrays)") {
    val df = graft.queries.Extensions.multimodalFrames.run(spark, TestSpark.sf0001)
    val arrayCols = df.schema.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    assert(arrayCols.isEmpty, s"array-typed output columns would crash the harness: $arrayCols")
  }
}
