package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
  *
  * Scale shape, per column: the value→bucket map is value-CARDINALITY-sized.
  * Bounded-cardinality columns (quantized scores, sizes, categorical keys)
  * take the exact path — histogram + distributed prefix sum + broadcast
  * map-side join. Near-unique columns (timestamps, ids) would make that map
  * corpus-sized, so [[zorder2]]/[[zorder3]] probe cardinality first (one
  * aggregate job) and route wide columns through [[rangeBinnedBucketMap]]:
  * a min/max linear pre-bin (pure arithmetic, no join key explosion) whose
  * BIN histogram is bounded, trading exact equi-depth for bin-granularity
  * equi-depth — the right trade for a layout key, where bucket balance only
  * has to hold approximately for file skipping to work.
  */
object Layout {

  /** Config key: when `true`, every [[LineageOps.truncateLineage]] site uses
    * reliable `checkpoint()` (fault-tolerant store, requires
    * `sparkContext.setCheckpointDir`) instead of `localCheckpoint()`.
    */
  val ReliableCheckpointKey = "spark.graft.reliableCheckpoint"

  /** THE lineage-truncation point for iterative / multiply-scanned frames —
    * the only place in graft allowed to call `localCheckpoint` (enforced by
    * `tools/checkpoint_lint.py`).
    *
    * Default is `localCheckpoint`: blocks live on executor-local storage —
    * the fastest truncation, but on a real cluster those blocks are NOT
    * recoverable; losing an executor that holds them fails the job instead
    * of recomputing from lineage. That trade is safe exactly when the frame
    * is provably small (model / manifest / value-cardinality-sized), so a
    * retried job recomputes it cheaply — every graft call site is audited
    * against that bound in SCALE.md §"lineage-truncation audit". For
    * cluster runs that prefer fault-tolerance over truncation speed, set
    * `spark.graft.reliableCheckpoint=true` (plus a checkpoint dir) and ALL
    * sites switch to reliable `checkpoint()` — no code change.
    */
  implicit class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def truncateLineage(eager: Boolean = true): Dataset[T] =
      if (ds.sparkSession.conf.get(ReliableCheckpointKey, "false").toBoolean)
        ds.checkpoint(eager)
      else
        ds.localCheckpoint(eager)
  }

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

  /** Deterministic slice id in [0, `parts`) for the two-phase rank/prefix
    * primitives: DRIVER-COLLECTED approx-quantile boundaries of a numeric
    * `surrogate` (monotone non-decreasing in the caller's total order) baked
    * into the plan as LITERALS, with the slice a monotone CASE over them.
    *
    * Why literals and not `repartitionByRange` + `spark_partition_id()`: the
    * two-phase shape reads its sliced frame from TWO plan branches (the
    * per-slice window and the per-slice-count offsets aggregate). A range
    * exchange samples its boundaries PER MATERIALIZATION — when the two
    * branches do not land on one reused exchange (observed under AQE at
    * gen100, r14: the x_rfm_segmentation replay failed with rank bands
    * deflated by one slice's worth around each ntile boundary), each branch
    * can slice DIFFERENTLY and the offsets join silently corrupts every
    * downstream rank. A literal-boundary slice is a pure function of the
    * row, so every branch agrees by construction — no exchange-identity,
    * caching, or recomputation-determinism assumption at any scale.
    *
    * Exactness does not depend on boundary quality (ties and approximation
    * only affect BALANCE): rows equal on the surrogate share a slice, so
    * slices stay contiguous under any order the surrogate is monotone in.
    * The skew bound is max(n/parts) + (largest surrogate tie class); callers
    * ranking a heavy-tie metric should pass a tie-spreading surrogate (see
    * [[twoPhaseRankBy]]).
    */
  private def withLiteralSlices(
      df: DataFrame, surrogate: Column, parts: Int, nullsFirst: Boolean): DataFrame = {
    val bounds = sliceBoundaries(df, Seq(surrogate), parts).head
    withLiteralSlices(df, surrogate, parts, nullsFirst, bounds)
  }

  /** One driver-side approx-quantile job returning the literal slice
    * boundaries for SEVERAL surrogates at once (Spark's multi-column
    * `approxQuantile` — one pass over `df` instead of one per surrogate).
    * Callers ranking k metrics over the same frame (RFM's three quintiles,
    * vocab-coverage's rank + prefix-sum) collect all boundary sets in ONE
    * job and feed them to the `bounds`-taking two-phase variants, cutting
    * the fixed per-rank sketch tax from k corpus-frame jobs to one
    * (r14 verdict #2).
    *
    * Fails fast unless every surrogate resolves to a NUMERIC type: the
    * two-phase slicer compares the surrogate as a double, and a silent
    * `cast('double')` on a date or string would either NULL every row (one
    * slice = the single-reducer funnel this machinery exists to kill) or,
    * for numeric-looking strings, order '10' before '9' — non-contiguous
    * slices and silently wrong ranks. Dates/timestamps are welcome through
    * [[defaultSurrogate]], which maps them to their epoch numbers first
    * (r14 ADVICE).
    */
  def sliceBoundaries(df: DataFrame, surrogates: Seq[Column], parts: Int): Seq[Array[Double]] = {
    val named = surrogates.zipWithIndex.map { case (s, i) => s.as(s"__s$i") }
    val probe = df.select(named: _*)
    probe.schema.fields.foreach { f =>
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"two-phase slice surrogate must resolve to a numeric type, got ${f.dataType}; " +
          "map dates/timestamps to their epoch numbers (see Layout.defaultSurrogate) or " +
          "pass a numeric tie-spreading surrogate (twoPhaseRankBy)")
    }
    // Multi-column approxQuantile ignores null/NaN per column independently.
    probe.stat.approxQuantile(
      surrogates.indices.map(i => s"__s$i").toArray,
      (1 until parts).map(_.toDouble / parts).toArray, 0.25 / parts).toSeq
  }

  /** [[withLiteralSlices]] with the boundary set precomputed by
    * [[sliceBoundaries]] — pure plan construction, no job.
    */
  private def withLiteralSlices(df: DataFrame, surrogate: Column, parts: Int,
      nullsFirst: Boolean, bounds: Array[Double]): DataFrame = {
    val pre = df.withColumn("__s", surrogate.cast("double"))
    val sliceOf = bounds.distinct.sorted.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__s") > lit(b), 1).otherwise(0)
    }
    pre
      .withColumn("__p",
        when(col("__s").isNull, lit(if (nullsFirst) 0 else parts - 1)).otherwise(sliceOf))
      .drop("__s")
  }

  /** Numeric surrogate + null placement implied by the FIRST sort column:
    * the column as a double, negated for DESC (monotone in the order);
    * nulls keep Spark's default placement (ASC → NULLS FIRST, DESC → NULLS
    * LAST) unless the caller's SortOrder says otherwise. Date/timestamp
    * sort columns map to their epoch numbers (monotone in the column
    * order) BEFORE the double cast — a direct `cast('double')` on a date
    * is NULL, which would silently collapse every row into one slice
    * (r14 ADVICE); any other non-numeric type fails fast in
    * [[sliceBoundaries]].
    */
  /** First 8 bytes of `b`, zero-padded, as a big-endian unsigned number in
    * a double: MONOTONE NON-DECREASING in binary order (Spark compares
    * strings and binary byte-wise unsigned), so it is a valid slice
    * surrogate for string/binary sort keys — rows tied on the first 8
    * bytes share a slice, which only affects balance, never exactness.
    * (The rounding from 64-bit integer to double is itself monotone.)
    */
  private def prefix8(b: Column): Column =
    when(b.isNull, lit(null).cast("double")).otherwise(coalesce(
      conv(hex(substring(concat(b, lit(Array.fill[Byte](8)(0))), 1, 8)), 16, 10)
        .cast("double"),
      lit(0.0)))

  /** `c` as a slice-able double, monotone in `c`'s own order: numeric casts
    * through; date/timestamp map to their epoch numbers; string/binary map
    * to their first-8-bytes prefix number ([[prefix8]] — a direct
    * `cast('double')` would NULL non-numeric strings into one silent slice
    * and order numeric-looking strings '10' < '9' wrongly, r14 ADVICE);
    * anything else fails fast.
    */
  private def numericize(df: DataFrame, c: Column): Column = {
    import org.apache.spark.sql.types._
    df.select(c).schema.head.dataType match {
      case _: NumericType   => c.cast("double")
      case DateType         => unix_date(c).cast("double")
      case TimestampType    => unix_micros(c).cast("double")
      case TimestampNTZType => unix_micros(c.cast("timestamp")).cast("double")
      case StringType       => prefix8(c.cast("binary"))
      case BinaryType       => prefix8(c)
      case other => throw new IllegalArgumentException(
        s"two-phase sort column must be numeric, date/timestamp, or string/binary; got $other — " +
          "pass a numeric tie-spreading surrogate via twoPhaseRankBy/twoPhasePrefixSumBeforeBy")
    }
  }

  private def defaultSurrogate(df: DataFrame, order: Column): (Column, Boolean) = {
    val (c, asc, nullsFirst) = org.apache.spark.sql.graftbridge.ColumnBridge.unwrapSort(order)
    val n = numericize(df, c)
    (if (asc) n else -n, nullsFirst)
  }

  /** Exact global cumulative count STRICTLY BEFORE each value, computed as a
    * distributed two-level prefix sum instead of one unpartitioned window:
    * slice the histogram by literal value boundaries ([[withLiteralSlices]]),
    * prefix-sum WITHIN each slice (a partitioned window — every task sees
    * only its slice), then add per-slice offsets (a partition-count-sized
    * frame, bounded by `spark.sql.shuffle.partitions` — model state, not
    * data state). The output is identical to `sum(c) OVER (ORDER BY v ROWS
    * UNBOUNDED PRECEDING TO 1 PRECEDING)` for ANY cardinality, but no task
    * ever holds more than its slice — an arbitrarily wide histogram
    * (near-unique column) cannot funnel through one task.
    *
    * Input: (`__v` value, `__c` count; `__v` numeric, one row per value).
    * Output: adds `__cb` (rank before). NULL `__v` sorts first (its own
    * histogram row → slice 0), matching the unpartitioned window's order.
    */
  private def distributedPrefix(hist: DataFrame): DataFrame = {
    val parts  = hist.sparkSession.sessionState.conf.numShufflePartitions
    val sliced = withLiteralSlices(hist, numericize(hist, col("__v")), parts, nullsFirst = true)
    val inner = Window.partitionBy(col("__p")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Per-slice totals: ≤`parts` rows, so this global window's frame is
    // bounded by config (spark.sql.shuffle.partitions), never by data —
    // the one shape where a single-partition window is correct at any
    // corpus size. (A constant partitionBy would not even silence the
    // WindowExec warning: the optimizer folds foldable partition keys away.)
    val offW = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("__p")).agg(sum(col("__c")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__p"), col("__off"))
    sliced
      .withColumn("__ci", coalesce(sum(col("__c")).over(inner), lit(0L)))
      .join(broadcast(offsets), "__p")
      .withColumn("__cb", col("__ci") + col("__off"))
      .drop("__p", "__ci", "__off")
  }

  /** Exact global `row_number() OVER (ORDER BY order…)` as a distributed
    * two-phase rank instead of one unpartitioned window: slice by literal
    * boundaries of the first sort column ([[withLiteralSlices]] — a pure
    * row function, deterministic across plan branches), `row_number` WITHIN
    * each slice (a partitioned window), then add broadcast per-slice
    * row-count offsets. The offset frame is ≤ `spark.sql.shuffle.partitions`
    * rows — config-sized model state — so no task ever sorts more than its
    * slice. Output is identical to the unpartitioned `row_number` for any
    * total order (surrogate ties land in one slice, and callers should pass
    * a tie-broken order anyway, as every registry user does).
    *
    * This is the general-purpose cure for the corpus-sized-window
    * anti-pattern (r13 verdict: `x_rfm_segmentation`'s ntile funnel); the
    * histogram-shaped sibling is [[distributedPrefix]]. The first sort
    * column must be numeric; heavy-tie metrics can pass a tie-spreading
    * surrogate through [[twoPhaseRankBy]].
    */
  def twoPhaseRank(df: DataFrame, out: String, order: Column*): DataFrame = {
    val (s, nf) = defaultSurrogate(df, order.head)
    twoPhaseRankBy(df, out, s, nf, order: _*)
  }

  /** k global row_numbers over the SAME frame with ONE boundary-sketch job:
    * each `(out, order…)` spec gets its own two-phase rank, but all k
    * boundary sets come from a single multi-column `approxQuantile` pass
    * over `df` instead of one sketch job per rank (r14 verdict #2 — RFM's
    * three quintiles paid three corpus-frame sketch jobs plus three offset
    * jobs; this keeps the offsets — they depend on each spec's own slicing
    * — but collapses the sketches). Callers should (local)checkpoint `df`
    * when its lineage is expensive, exactly as with the single-rank
    * variants.
    */
  def twoPhaseRankAll(df: DataFrame, specs: (String, Seq[Column])*): DataFrame = {
    val sn = specs.map { case (_, order) => defaultSurrogate(df, order.head) }
    twoPhaseRankAllBy(df, specs.zip(sn).map {
      case ((out, order), (s, nf)) => (out, s, nf, order)
    }: _*)
  }

  /** [[twoPhaseRankAll]] with an explicit slicing surrogate per spec (same
    * contract as [[twoPhaseRankBy]]: numeric, monotone non-decreasing in
    * that spec's order; exactness never depends on it — only slice balance
    * does). Use when a spec's first sort column is heavily tied — e.g.
    * Spearman's order-count rank passes `count + key·2⁻⁴⁰` so the modal tie
    * class spreads across slices instead of funnelling one task.
    */
  def twoPhaseRankAllBy(
      df: DataFrame, specs: (String, Column, Boolean, Seq[Column])*): DataFrame = {
    val parts  = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = sliceBoundaries(df, specs.map(_._2), parts)
    specs.zipWithIndex.foldLeft(df) { case (acc, ((out, surrogate, nf, order), i)) =>
      // offsetsFrom = the ORIGINAL frame, not the rank-accumulating chain:
      // the literal-bounds slice is a pure row function, so per-slice
      // counts are identical on either — but aggregating over `acc` would
      // re-evaluate every earlier rank's window+join once per offsets
      // broadcast (rank k paying k−1 stale window passes).
      rankWithBounds(acc, out, surrogate, nf, bounds(i), order, parts, offsetsFrom = df)
    }
  }

  /** [[twoPhaseRank]] with an explicit slicing surrogate: any NUMERIC column
    * expression monotone non-decreasing in `order…` (exactness never depends
    * on it — only slice balance does). Use it when the first sort column is
    * heavily tied (e.g. vocabulary counts: pass `-count + tokPrefixFrac` to
    * spread a giant tie class across slices).
    */
  def twoPhaseRankBy(
      df: DataFrame, out: String, surrogate: Column, nullsFirst: Boolean,
      order: Column*): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    rankWithBounds(df, out, surrogate, nullsFirst,
      sliceBoundaries(df, Seq(surrogate), parts).head, order, parts)
  }

  private def rankWithBounds(
      df: DataFrame, out: String, surrogate: Column, nullsFirst: Boolean,
      bounds: Array[Double], order: Seq[Column], parts: Int,
      offsetsFrom: DataFrame = null): DataFrame = {
    val sliced = withLiteralSlices(df, surrogate, parts, nullsFirst, bounds)
    // The per-slice counts may come from a cheaper frame with the same rows
    // (see twoPhaseRankAll) — the literal-bounds slice assigns identically.
    val slicedForOffsets =
      if (offsetsFrom eq null) sliced
      else withLiteralSlices(offsetsFrom, surrogate, parts, nullsFirst, bounds)
    val inner = Window.partitionBy(col("__p")).orderBy(order: _*)
    val offW = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slicedForOffsets.groupBy(col("__p")).agg(count(lit(1)).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .select(col("__p"), col("__off"))
    sliced
      .withColumn("__rn", row_number().over(inner).cast("long"))
      .join(broadcast(offsets), "__p")
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__p", "__rn", "__off")
  }

  /** Fused [[twoPhaseRankBy]] + [[twoPhasePrefixSumBeforeBy]] over ONE
    * slicing: the rank and the strictly-before running sum of `value` share
    * the boundary sketch, the sliced frame, the per-slice sort, and a
    * single offsets aggregate (per-slice count AND total in one shuffle,
    * one broadcast). The vocab-coverage shape — rank for the cutoff filter,
    * prefix sum for the coverage mass over the same order — pays one sketch
    * job and one offsets job instead of two of each (r14 verdict #2).
    */
  def twoPhaseRankAndPrefixSumBy(
      df: DataFrame, rankOut: String, sumOut: String, value: Column,
      surrogate: Column, nullsFirst: Boolean, order: Column*): DataFrame = {
    val parts  = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = sliceBoundaries(df, Seq(surrogate), parts).head
    val sliced = withLiteralSlices(df, surrogate, parts, nullsFirst, bounds)
    val innerRank = Window.partitionBy(col("__p")).orderBy(order: _*)
    val innerSum  = innerRank.rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("__p"))
      .agg(count(lit(1)).as("__pc"), sum(value).as("__pt"))
      .withColumn("__offc", coalesce(sum(col("__pc")).over(offW), lit(0L)))
      .withColumn("__offs", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__p"), col("__offc"), col("__offs"))
    sliced
      .withColumn("__rn", row_number().over(innerRank).cast("long"))
      .withColumn("__ci", coalesce(sum(value).over(innerSum), lit(0L)))
      .join(broadcast(offsets), "__p")
      .withColumn(rankOut, col("__rn") + col("__offc"))
      .withColumn(sumOut, col("__ci") + col("__offs"))
      .drop("__p", "__rn", "__ci", "__offc", "__offs")
  }

  /** Exact global running sum of `value` STRICTLY BEFORE each row under
    * `order…` (= `sum(value) OVER (ORDER BY order… ROWS UNBOUNDED PRECEDING
    * TO 1 PRECEDING)`, null-coalesced to 0) as the same two-phase shape as
    * [[twoPhaseRank]]: per-slice running sums plus broadcast per-slice
    * total offsets. Rows, unlike [[distributedPrefix]]'s histogram entries,
    * need not be distinct — callers pass a tie-broken order.
    */
  def twoPhasePrefixSumBefore(
      df: DataFrame, out: String, value: Column, order: Column*): DataFrame = {
    val (s, nf) = defaultSurrogate(df, order.head)
    twoPhasePrefixSumBeforeBy(df, out, value, s, nf, order: _*)
  }

  /** [[twoPhasePrefixSumBefore]] with an explicit slicing surrogate (same
    * contract as [[twoPhaseRankBy]]: numeric, monotone in `order…`; balance
    * only).
    */
  def twoPhasePrefixSumBeforeBy(
      df: DataFrame, out: String, value: Column, surrogate: Column,
      nullsFirst: Boolean, order: Column*): DataFrame = {
    val parts   = df.sparkSession.sessionState.conf.numShufflePartitions
    val sliced  = withLiteralSlices(df, surrogate, parts, nullsFirst)
    val inner = Window.partitionBy(col("__p")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offW = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(col("__p")).agg(sum(value).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__p"), col("__off"))
    sliced
      .withColumn("__ci", coalesce(sum(value).over(inner), lit(0L)))
      .join(broadcast(offsets), "__p")
      .withColumn(out, col("__ci") + col("__off"))
      .drop("__p", "__ci", "__off")
  }

  /** Exact `ntile(buckets)` score from a 1-based global rank column and a
    * frame-size column (by NAME, so the arithmetic uses SQL `div` — the
    * repo's integer-exact convention): standard SQL ntile puts `q+1 = n div buckets
    * + 1` rows in the first `r = n mod buckets` buckets and `q` in the
    * rest. Pure integer arithmetic — combined with [[twoPhaseRank]] this
    * reproduces `ntile(k) OVER (ORDER BY …)` bit-exactly WITHOUT the
    * unpartitioned window. (`greatest(q,1)` only guards the statically
    * unreachable `q=0` branch — when `n < buckets` every rank falls in the
    * first-`r` arm — so ANSI division never sees a zero.)
    */
  def ntileFromRank(rankCol: String, nCol: String, buckets: Int): Column = {
    val q = s"($nCol div $buckets)"
    val r = s"($nCol % $buckets)"
    val cut = s"($r * ($q + 1))"
    expr(
      s"""CASE WHEN $rankCol <= $cut
         |  THEN ($rankCol - 1) div ($q + 1) + 1
         |  ELSE $r + ($rankCol - 1 - $cut) div greatest($q, 1) + 1
         |END""".stripMargin).cast("long")
  }

  /** Exact equi-depth bucket map `(value → bucket ∈ [0, buckets))`: bucket =
    * ⌊rank_before · buckets / n⌋ with rank from the value HISTOGRAM — one
    * hash aggregation plus a [[distributedPrefix]] over the value-cardinality
    * frame, never a corpus total order (same integral-value contract as
    * [[Curation.selectTopFraction]]). Heavily-repeated values keep one
    * bucket (equi-depth up to value granularity). NULL is its own histogram
    * row and sorts first, so it deterministically maps to bucket 0. Returns
    * (`__v` value, `__b` bucket).
    *
    * The MAP itself is value-cardinality-sized; callers that broadcast it
    * ([[zorder2]]/[[zorder3]]) must bound that cardinality — they probe it
    * and fall back to [[rangeBinnedBucketMap]] past `maxExactMapCard`.
    */
  def quantileBucketMap(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= 65536, s"buckets in (0, 65536], got $buckets")
    // localCheckpoint: the histogram is value-cardinality-sized while its
    // lineage is a corpus groupBy, and it is read from FOUR jobs (the
    // distributedPrefix boundary sketch, its window and offsets branches,
    // and the __n total below) — without the checkpoint every bucket map
    // re-scans the corpus per job, ×2 in zorder2 and ×3 in zorder3 (r14
    // ADVICE; same rationale as the RFM/vocab/compaction call sites).
    val hist = df.groupBy(col(valueCol).as("__v")).agg(count(lit(1)).as("__c"))
      .truncateLineage()
    distributedPrefix(hist)
      .join(broadcast(hist.agg(sum(col("__c")).as("__n"))))
      .select(col("__v"), expr(s"(__cb * $buckets) div __n").as("__b"))
  }

  /** Equi-depth-over-BINS bucket map for near-unique numeric columns, where
    * the per-value map of [[quantileBucketMap]] would be corpus-sized and
    * unbroadcastable. Values are linearly pre-binned by (min, max) into
    * ≤`bins` ranges — pure map-side arithmetic, monotone, no per-value join
    * key — and the equi-depth histogram runs over the BIN frame (bounded by
    * `bins`, so its map broadcasts at any corpus size). Equi-depth holds at
    * bin granularity: with 2^16 bins over 2^8 buckets, a bucket's mass is
    * off only by what a single bin holds — immaterial for file skipping.
    *
    * Returns (binExpr to apply to the raw column, (`__v` bin, `__b` bucket)
    * map). NULL bins to NULL and joins null-safely to bucket 0's slot like
    * the exact path. `minV`/`maxV` come from the caller's stats probe (one
    * tiny row — model state).
    */
  def rangeBinnedBucketMap(
      df: DataFrame,
      valueCol: String,
      buckets: Int,
      minV: BigDecimal,
      maxV: BigDecimal,
      bins: Int = 1 << 16
  ): (Column, DataFrame) = {
    require(buckets > 0 && buckets <= bins, s"buckets in (0, $bins], got $buckets")
    // step ≥ smallest value that keeps (max-min)/step < bins; exact decimal
    // arithmetic so the bin id is engine-replayable.
    val span = (maxV - minV).max(BigDecimal(0))
    val step = (span / (bins - 1)).max(BigDecimal(1) / BigDecimal(1000000))
    val binExpr = floor((col(valueCol).cast("decimal(38,6)") - lit(minV.toString).cast("decimal(38,6)"))
      / lit(step.toString).cast("decimal(38,6)")).cast("long")
    val binned = df.select(binExpr.as(valueCol))
    (binExpr, quantileBucketMap(binned, valueCol, buckets))
  }

  /** Per-column bucket attach plan: the join key to compute on the raw
    * column and the broadcastable (key → bucket) map.
    */
  private def bucketPlan(
      df: DataFrame,
      c: String,
      buckets: Int,
      card: Option[Long],
      minV: Option[BigDecimal],
      maxV: Option[BigDecimal],
      maxExactMapCard: Long
  ): (Column, DataFrame) =
    if (card.forall(_ <= maxExactMapCard) || minV.isEmpty || maxV.isEmpty)
      (col(c), quantileBucketMap(df, c, buckets))
    else
      rangeBinnedBucketMap(df, c, buckets, minV.get, maxV.get)

  /** One aggregate job probing every layout column's approximate distinct
    * count and min/max (a single small row — model state). Skipped entirely
    * when `maxExactMapCard` is `Long.MaxValue` (caller vouches for bounded
    * cardinality and keeps the exact path unconditionally).
    */
  private def probeStats(df: DataFrame, cols: Seq[String], maxExactMapCard: Long)
      : Map[String, (Option[Long], Option[BigDecimal], Option[BigDecimal])] =
    if (maxExactMapCard == Long.MaxValue)
      cols.map(c => c -> ((None: Option[Long], None: Option[BigDecimal], None: Option[BigDecimal]))).toMap
    else {
      val aggs = cols.flatMap { c =>
        Seq(approx_count_distinct(col(c)).as(s"__cd_$c"),
          min(col(c)).cast("decimal(38,6)").as(s"__mn_$c"),
          max(col(c)).cast("decimal(38,6)").as(s"__mx_$c"))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      def dec(i: Int): Option[BigDecimal] =
        if (r.isNullAt(i)) None else Some(BigDecimal(r.getDecimal(i)))
      cols.zipWithIndex.map { case (c, i) =>
        c -> ((Some(r.getLong(3 * i)), dec(3 * i + 1), dec(3 * i + 2)))
      }.toMap
    }

  /** Attach a 2-D Z-order key: `df` plus a `zvalue` column interleaving the
    * equi-depth bucket ranks of `colX` and `colY`. The two value→bucket maps
    * broadcast onto the corpus (null-safe map-side joins — the corpus itself
    * never shuffles here, and NULL layout values keep their rows, landing in
    * bucket 0 like Delta/Iceberg ZORDER); write-time clustering is then
    * `repartitionByRange(col("zvalue")).sortWithinPartitions("zvalue")`.
    *
    * Columns whose probed distinct count exceeds `maxExactMapCard` take the
    * range-pre-binned path (see [[rangeBinnedBucketMap]]) so the broadcast
    * stays bounded on near-unique columns; pass `Long.MaxValue` to skip the
    * probe job when cardinality is known-bounded.
    */
  def zorder2(df: DataFrame, colX: String, colY: String, buckets: Int = 256,
      maxExactMapCard: Long = 1L << 20): DataFrame = {
    val st = probeStats(df, Seq(colX, colY), maxExactMapCard)
    val (kx, bx0) = bucketPlan(df, colX, buckets, st(colX)._1, st(colX)._2, st(colX)._3, maxExactMapCard)
    val (ky, by0) = bucketPlan(df, colY, buckets, st(colY)._1, st(colY)._2, st(colY)._3, maxExactMapCard)
    val bx = bx0.select(col("__v").as("__vx"), col("__b").as("__bx"))
    val by = by0.select(col("__v").as("__vy"), col("__b").as("__by"))
    df.join(broadcast(bx), kx <=> col("__vx"))
      .join(broadcast(by), ky <=> col("__vy"))
      .withColumn("zvalue", morton2(col("__bx"), col("__by")))
      .drop("__vx", "__bx", "__vy", "__by")
  }

  /** [[zorder2]] for three columns (≤1024 equi-depth buckets each — 10 bits
    * per dimension of the 30-bit key).
    */
  def zorder3(df: DataFrame, colX: String, colY: String, colZ: String,
      buckets: Int = 1024, maxExactMapCard: Long = 1L << 20): DataFrame = {
    require(buckets > 0 && buckets <= 1024, s"3-D buckets in (0, 1024], got $buckets")
    val st = probeStats(df, Seq(colX, colY, colZ), maxExactMapCard)
    def plan(c: String) = bucketPlan(df, c, buckets, st(c)._1, st(c)._2, st(c)._3, maxExactMapCard)
    val (kx, bx0) = plan(colX)
    val (ky, by0) = plan(colY)
    val (kz, bz0) = plan(colZ)
    val bx = bx0.select(col("__v").as("__vx"), col("__b").as("__bx"))
    val by = by0.select(col("__v").as("__vy"), col("__b").as("__by"))
    val bz = bz0.select(col("__v").as("__vz"), col("__b").as("__bz"))
    df.join(broadcast(bx), kx <=> col("__vx"))
      .join(broadcast(by), ky <=> col("__vy"))
      .join(broadcast(bz), kz <=> col("__vz"))
      .withColumn("zvalue", morton3(col("__bx"), col("__by"), col("__bz")))
      .drop("__vx", "__bx", "__vy", "__by", "__vz", "__bz")
  }
}
