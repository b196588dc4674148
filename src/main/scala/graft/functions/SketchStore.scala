package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Storage

/** Persisted per-segment KMV (bottom-k) distinct-count sketch store — the
  * third persisted serving family beside the text index ([[TextIndex]]) and
  * the IVF-PQ index ([[AnnIndex]]), for the warehouse question those don't
  * answer: "how many distinct keys in THIS slice of the data?" without
  * touching the data. One build pass sketches every segment; after that any
  * segment RANGE is answered from sketch rows alone (≤ k per segment), and
  * new segments append without re-reading old ones — KMV sketches merge by
  * re-taking the bottom-k of a union (Bar-Yossef et al., RANDOM 2002), which
  * is what makes per-segment persistence sound.
  *
  * Artifact layout (all parquet, [[Storage]] facade):
  *   `segments` — (seg BIGINT, hv BIGINT): the ≤ k smallest distinct
  *                [[KmvSketch]] hash values per segment. Plain rows, not an
  *                opaque blob, so probes AND the DuckDB oracle replay the
  *                merge in SQL.
  *   `meta`     — one row (k).
  *   `manifest` — commit marker, written LAST / dropped FIRST: probes and
  *                appends refuse a torn store (the [[TextIndex]]/[[AnnIndex]]
  *                transaction discipline).
  *
  * Scale: the store is (segments × k) rows — model-sized against the data
  * (256 longs stand for a segment of any row count). A probe reads only the
  * pruned seg range; the estimate itself is the x_distinct_kmv integer/double
  * formula, bit-reproducible across engines.
  */
object SketchStore {

  val M: Long = KmvSketch.M // 2^61 - 1, the hash universe

  private def manifest(path: String) = s"$path/manifest"

  /** Bottom-k distinct hashes per segment. Salted two-phase rank (the
    * x_inverted_index window-skew doctrine): a seg-only window would cap
    * parallelism at the segment count, which at 100 TB is far below the
    * cluster's — pre-rank within (seg, hv mod 32), re-rank the ≤ 32k
    * survivors.
    *
    * distinct-first, NOT the single-exchange dense_rank variant: the
    * dense_rank form (rank distinct values in place, collapse duplicates at
    * the end — one data-sized exchange instead of three) was implemented
    * and A/B'd in r18 and measured consistently SLOWER at sf0.1 (probe
    * 2.27 → 2.77 s, append 3.29 → 3.67 s, min-of-6 at steal < 500): the
    * upfront distinct's map-side partial aggregation collapses co-located
    * duplicates (same partkey within a segment arrives clustered from the
    * scan) before any shuffle, so both window sorts run over ~2/3 the rows,
    * which beats saving one exchange of the full stream. Guide §1.1's
    * "fresh ideal plan is usually slower — switch back to the empirical
    * loop". On a corpus whose duplicates are NOT scan-clustered the
    * dense_rank form would shuffle less; revisit with that measurement.
    */
  private def segmentSketches(rows: DataFrame, k: Int): DataFrame =
    rows.select(col("seg"), col("hv")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg"), pmod(col("hv"), lit(32))).orderBy(col("hv"))))
      .filter(col("rn") <= k)
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("hv"))))
      .filter(col("rn2") <= k)
      .select(col("seg"), col("hv"))

  /** Build the store from (seg, hv) rows — hv must be [[graft.functions
    * .NativeFns.hash61]] output (the registry's fixed Carter–Wegman hash).
    * Replaces any prior store; manifest written last.
    */
  def build(rows: DataFrame, k: Int, path: String): Unit = {
    val spark = rows.sparkSession
    Storage.drop(manifest(path))
    Storage.replace(segmentSketches(rows, k), s"$path/segments")
    spark.range(1).select(lit(k.toLong).as("k"))
      .write.mode("overwrite").parquet(s"$path/meta")
    spark.range(1).select(lit("committed").as("state"))
      .write.mode("overwrite").parquet(manifest(path))
  }

  /** Append NEW segments' sketches — O(delta) work, the old segments are
    * never re-read. Segments are append-once: re-sketching a present
    * segment is refused (its rows are already final under the build's
    * bottom-k; a changed segment means a rebuild, the [[TextIndex]]
    * re-add-refusal discipline). Manifest dropped first, rewritten last.
    */
  def appendSegments(rows: DataFrame, path: String): Unit = {
    val spark = rows.sparkSession
    require(Storage.exists(manifest(path)),
      "torn or absent sketch store: refusing to append")
    val k = spark.read.parquet(s"$path/meta").head().getAs[Long]("k").toInt
    // Two delta passes, kept deliberately (r18 A/B): the dup check's
    // distinct-seg scan short-circuits through CollectLimit and shuffles
    // only ~|segments| rows, and both single-pass replacements measured
    // SLOWER at sf0.1 quiet (parquet staging + adopt: 3.29 → 3.67 s;
    // pin-the-sketch-frame + write-from-blocks: 3.29 → 4.0 s — the pin
    // double-materializes the sketch rows, which costs more than the cheap
    // check pass saves). On a cluster where the delta scan dominates, the
    // staging variant is the right trade; see OPTIMIZATION_r18.md.
    val existing = spark.read.parquet(s"$path/segments").select(col("seg")).distinct()
    val dup = rows.select(col("seg")).distinct()
      .join(existing, Seq("seg"), "left_semi").limit(1).count()
    require(dup == 0L,
      "segment already present: segments are append-once (rebuild to refresh)")
    Storage.drop(manifest(path))
    Storage.append(segmentSketches(rows, k), s"$path/segments")
    spark.range(1).select(lit("committed").as("state"))
      .write.mode("overwrite").parquet(manifest(path))
  }

  /** Distinct-count estimate over the segment range [lo, hi], from sketch
    * rows alone: union the range's per-segment bottom-k sets, re-take the
    * global bottom-k (TakeOrdered over ≤ k·|range| rows — sketch-sized,
    * never data-sized), estimate (k−1)·M/kth. filled < k means the merged
    * sketch IS the exact distinct hash set — the estimate is exact.
    * Returns one row (seg_lo, seg_hi, k, filled, kth_min, kmv_estimate).
    */
  def probeRange(spark: SparkSession, path: String, lo: Long, hi: Long): DataFrame = {
    require(Storage.exists(manifest(path)),
      "torn or absent sketch store: refusing to probe")
    val k = spark.read.parquet(s"$path/meta").head().getAs[Long]("k")
    val merged = spark.read.parquet(s"$path/segments")
      .filter(col("seg").between(lo, hi))
      .select(col("hv")).distinct()
      .orderBy(col("hv")).limit(k.toInt)
    merged.agg(max(col("hv")).as("kth_min"), count(lit(1)).as("filled"))
      .select(
        lit(lo).as("seg_lo"), lit(hi).as("seg_hi"), lit(k).as("k"),
        col("filled"), coalesce(col("kth_min"), lit(0L)).as("kth_min"),
        when(col("filled") < k, col("filled"))
          .otherwise(floor(lit((k - 1).toDouble) *
            (lit(M.toDouble) / col("kth_min").cast("double"))).cast("long"))
          .as("kmv_estimate"))
  }
}
