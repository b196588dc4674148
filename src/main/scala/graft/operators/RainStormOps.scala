package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The RainStorm operator algebra, re-expressed as composable DataFrame
  * transforms.
  *
  * The reference engine (`core_process_stream_DS.go:23-215` in the StreamDS
  * snapshot) wires a fixed 3-stage pipeline `source → op1 → op2` where each op
  * is a swappable executable implementing one of three shapes defined by the
  * MP4 spec: Transform, FilteredTransform, AggregateByKey. Here each shape is
  * a `DataFrame => DataFrame` builder; pipelines compose with `pipeline(...)`
  * and Catalyst collapses the whole chain into one optimized plan (filters
  * pushed to the scan, projections pruned, partial aggregation map-side) —
  * none of the reference's hand-built routing (`MapHashableToNodeAndTask`,
  * `core_process_utils.go:2398-2414`) needs to exist.
  */
object RainStormOps {

  /** One pipeline stage: the Spark analog of a RainStorm operator exe. */
  type Op = DataFrame => DataFrame

  /** Transform (projection / per-record rewrite): `operators/app1_2.go:13-43`. */
  def transform(cols: Column*): Op = df => df.select(cols: _*)

  /** FilteredTransform (predicate + projection): `operators/app1_1.go:14-60`,
    * `misc/rate_filter_operator.go:11-49` and friends. Chaining two of these
    * gives the reference's op1∘op2 conjunctions (`misc/rate_filter_op_1.go` +
    * `rate_filter_op_2.go`).
    */
  def filteredTransform(pred: Column)(cols: Column*): Op =
    df => df.filter(pred).select(cols: _*)

  /** Generator / flatMap (1→N): `misc/split_operator.go:11-35` splits a line
    * into words. Empty tokens are dropped, matching the reference's behavior
    * of never emitting empty words.
    */
  def splitWords(input: Column, outName: String = "word", sep: String = " "): Op =
    df =>
      df.select(explode(split(input, sep)).as(outName))
        .filter(col(outName) =!= "")

  /** AggregateByKey (stateful running aggregate): `operators/count_operator.go:
    * 16-112`. In batch this is a plain hash aggregate (Spark adds map-side
    * partial aggregation the reference lacks — SURVEY §4); the streaming
    * running-emission variant lives in [[graft.streaming.RainStorm]].
    */
  def aggregateByKey(keys: Seq[Column], aggs: Seq[Column]): Op =
    df => df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Count-by-key, the reference's only stateful aggregate. */
  def countByKey(key: Column, outName: String = "cnt"): Op =
    df => df.groupBy(key).agg(count(lit(1)).as(outName))

  /** Two-phase salted count-by-key for skewed keys: phase 1 aggregates on
    * (key, salt) so a hot key's rows spread over `saltBuckets` reducers;
    * phase 2 sums the partials per key. Same result as [[countByKey]] —
    * this is the aggregation-side analog of AQE's skew-join splitting, for
    * when one key would otherwise own an entire reducer at 100 TB.
    */
  def saltedCountByKey(key: Column, outName: String = "cnt", saltBuckets: Int = 16): Op =
    df =>
      df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
        .groupBy(key, col("__salt"))
        .agg(count(lit(1)).as("__partial"))
        .groupBy(key)
        .agg(sum(col("__partial")).as(outName))

  /** Stateless stage-2 "collect" sink semantics: outputs land in a map keyed
    * by value, i.e. duplicates collapse (`core_process_stream_DS.go:1186-1206`,
    * SURVEY §2.2 note). A set, not a bag.
    */
  def distinctCollect(cols: Column*): Op = df => df.select(cols: _*).distinct()

  /** Hash re-key: stage-1 re-keys each output tuple so the key doubles as the
    * shuffle key (`GetStage1Key`, `core_process_utils.go:542-555`). In Spark
    * the shuffle itself is implicit in any keyed op; this surfaces the
    * deterministic bucket key for inspection/tests.
    */
  def rekey(key: Column, outName: String = "bucket_key"): Op =
    df => df.withColumn(outName, md5(key.cast("string").cast("binary")))

  /** Compose source → op1 → … → opN into one lazy plan. */
  def pipeline(source: DataFrame, ops: Op*): DataFrame =
    ops.foldLeft(source)((d, op) => op(d))

  /** Parameterized operator registry mirroring the reference's swappable
    * operator-exe model (`RunOperatorlocal`, `core_process_utils.go:1347-1400`
    * execs a named binary with a string parameter). Here an operator name +
    * string parameter resolves to a native, Catalyst-optimizable Op — the
    * subprocess protocol is deliberately gone (SURVEY §2.6).
    */
  val registry: Map[String, String => Op] = Map(
    // U1: split line into words
    "split" -> (param => splitWords(col(if (param.isEmpty) "value" else param))),
    // U2: stateful count by key
    "count" -> (param => countByKey(col(if (param.isEmpty) "word" else param))),
    // U3: filter value-contains(param), keep all columns
    "filter_contains" -> (param => df => df.filter(col("value").contains(param))),
    // U5-style equality filter: param = "colName=value"
    "filter_eq" -> { param =>
      val Array(c, v) = param.split("=", 2)
      df => df.filter(col(c) === lit(v))
    },
    // U6-style numeric θ-filter: param = "colName<=0.5"
    "filter_le" -> { param =>
      val Array(c, v) = param.split("<=", 2)
      df => df.filter(col(c) <= lit(v.toDouble))
    }
  )
}
