package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing (schema, partition-preserving batch transform,
  * deterministic output shape) is real; the actual media decode is STUBBED —
  * the image/audio codec libraries are not in this container. The stub is a
  * deterministic fake keyed on the payload bytes, clearly marked below; a real
  * deployment swaps `StubCodec` for an actual decoder without touching the
  * pipeline shape.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      fake_width: Int,
      fake_height: Int,
      frame_hashes: Seq[Long]
  )

  /** ======== STUB ========
    * Deterministic fake codec standing in for image/audio decode. Field
    * values are pure functions of the payload so tests are reproducible.
    */
  object StubCodec {
    def width(bytes: Array[Byte]): Int  = (bytes.length % 640) + 1
    def height(bytes: Array[Byte]): Int = (bytes.length % 480) + 1
    /** "Frame sample": rolling hash of each 256-byte chunk, max 8 frames. */
    def frames(bytes: Array[Byte]): Seq[Long] =
      bytes.grouped(256).take(8).map { chunk =>
        chunk.foldLeft(0L)((h, b) => h * 1000003L + (b & 0xff))
      }.toSeq
  }

  /** Attach a binary payload column (here: the utf-8 text bytes stand in for
    * media bytes — the schema/partitioning is what's under test).
    */
  def withPayload(docs: DataFrame, payloadFrom: String = "text"): DataFrame =
    docs.withColumn("payload", col(payloadFrom).cast("binary"))

  /** Column-only metadata extraction (no decode needed): byte length, fake
    * dimensions, md5 checksum. Fully codegen'd; this is the path that must
    * stay cheap at 100 TB because it touches every payload.
    */
  def extractMeta(withPayload: DataFrame): DataFrame =
    withPayload
      .withColumn("n_bytes", length(col("payload")).cast("bigint"))
      .withColumn("fake_width", (col("n_bytes") % 640 + 1).cast("int"))
      .withColumn("checksum", md5(col("payload")))

  /** Batch decode via typed `mapPartitions` — the Scala analog of a
    * `mapInPandas` batch UDF: one codec instance per partition, rows streamed
    * through it, output schema declared by the `MediaMeta` encoder.
    */
  def decodeFrames(spark: SparkSession, withPayload: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Per-partition codec init happens once here; payloads then flow
        // through in batches (the `mapInPandas` batch shape) — a real decoder
        // would amortize GPU/codec dispatch across each chunk.
        rows.grouped(batchSize).flatMap { chunk =>
          chunk.map { case (id, bytes) =>
            MediaMeta(id, bytes.length.toLong, StubCodec.width(bytes), StubCodec.height(bytes), StubCodec.frames(bytes))
          }
        }
      }
  }
}
