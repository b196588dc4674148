package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) sort keys for write-time
  * clustering. Sorting a table by one column gives parquet min/max pruning on
  * that column only; sorting by the interleaved bits of several columns'
  * equi-depth bucket ranks clusters ALL of them at once, so range predicates
  * on any participating column skip most files — the standard lakehouse
  * layout move (Delta/Iceberg `OPTIMIZE ZORDER BY`), re-expressed as plain
  * integer column arithmetic.
  *
  * Everything is exact and engine-portable: bucket ranks come from the same
  * histogram/cumulative-count shape as
  * [[Curation.selectTopFraction]] (value-cardinality frames, integer
  * division — no sampling, no RNG), and the bit interleave is shift/mask
  * arithmetic that whole-stage codegen compiles to a handful of ALU ops.
  * The histogram shape means the value→bucket maps stay broadcast-sized
  * whenever the columns' CARDINALITY is corpus-small (true for quantized
  * scores, sizes, categorical keys — quantize first for raw doubles, the
  * same contract as selectTopFraction).
  */
object Layout {

  /** Even-bit spread of a 16-bit value (Morton building block): bit i of the
    * input lands at bit 2i. Pure shift/mask column arithmetic — codegen'd,
    * and byte-for-byte replayable in any SQL engine with `<<`/`&`/`|`.
    */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton code of two ≤16-bit bucket ranks. */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Every-third-bit spread of a 10-bit value: bit i lands at bit 3i (the
    * 3-D Morton building block; magic masks from the standard 32-bit
    * dilation sequence).
    */
  def spread10(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x3FFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x030000FFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x0300F00FL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x030C30C3L))
    d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x09249249L))
  }

  /** 3-D Morton code of three ≤10-bit bucket ranks. */
  def morton3(x: Column, y: Column, z: Column): Column =
    spread10(x)
      .bitwiseOR(shiftleft(spread10(y), 1))
      .bitwiseOR(shiftleft(spread10(z), 2))

  /** Exact equi-depth bucket map `(value → bucket ∈ [0, buckets))`: bucket =
    * ⌊rank_before · buckets / n⌋ with rank from the value HISTOGRAM — one
    * hash aggregation plus a cumulative window over the value-cardinality
    * frame, never a corpus total order (same shape and same integral-value
    * contract as [[Curation.selectTopFraction]]). Heavily-repeated values
    * keep one bucket (equi-depth up to value granularity). Returns
    * (`__v` value, `__b` bucket).
    */
  def quantileBucketMap(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets in (0, 65536], got $buckets")
    val hist = df.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__c"))
    val w = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("__cb", coalesce(sum(col("__c")).over(w), lit(0L)))
      .join(broadcast(hist.agg(sum(col("__c")).as("__n"))))
      .select(col("__v"), expr(s"(__cb * $buckets) div __n").as("__b"))
  }

  /** Attach a 2-D Z-order key: `df` plus a `zvalue` column interleaving the
    * equi-depth bucket ranks of `colX` and `colY`. The two value→bucket maps
    * broadcast onto the corpus (map-side joins — the corpus itself never
    * shuffles here); write-time clustering is then
    * `repartitionByRange(col("zvalue")).sortWithinPartitions("zvalue")`.
    */
  def zorder2(df: DataFrame, colX: String, colY: String, buckets: Int = 256): DataFrame = {
    val bx = quantileBucketMap(df, colX, buckets)
      .select(col("__v").as("__vx"), col("__b").as("__bx"))
    val by = quantileBucketMap(df, colY, buckets)
      .select(col("__v").as("__vy"), col("__b").as("__by"))
    df.join(broadcast(bx), col(colX) === col("__vx"))
      .join(broadcast(by), col(colY) === col("__vy"))
      .withColumn("zvalue", morton2(col("__bx"), col("__by")))
      .drop("__vx", "__bx", "__vy", "__by")
  }

  /** [[zorder2]] for three columns (≤1024 equi-depth buckets each — 10 bits
    * per dimension of the 30-bit key).
    */
  def zorder3(df: DataFrame, colX: String, colY: String, colZ: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= 1024, s"3-D buckets in (0, 1024], got $buckets")
    val bx = quantileBucketMap(df, colX, buckets)
      .select(col("__v").as("__vx"), col("__b").as("__bx"))
    val by = quantileBucketMap(df, colY, buckets)
      .select(col("__v").as("__vy"), col("__b").as("__by"))
    val bz = quantileBucketMap(df, colZ, buckets)
      .select(col("__v").as("__vz"), col("__b").as("__bz"))
    df.join(broadcast(bx), col(colX) === col("__vx"))
      .join(broadcast(by), col(colY) === col("__vy"))
      .join(broadcast(bz), col(colZ) === col("__vz"))
      .withColumn("zvalue", morton3(col("__bx"), col("__by"), col("__bz")))
      .drop("__vx", "__bx", "__vy", "__by", "__vz", "__bz")
  }
}
