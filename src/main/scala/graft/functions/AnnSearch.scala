package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Layout.LineageOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set,
  *    score every corpus vector, per-query top-k via window rank. Linear in
  *    corpus size with zero shuffle of the corpus (queries are broadcast and
  *    the rank partitions by query id — the only shuffle is |corpus|×|queries|
  *    score rows, keep k per query).
  *  - [[lshTopK]]: scale path — sign-random-projection buckets on both sides;
  *    only same-bucket candidates are scored. Hyperplanes are generated from a
  *    fixed seed so results are deterministic.
  */
object AnnSearch {

  /** Deterministic random hyperplanes: `nPlanes` × `dim`, seed-fixed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }


  /** Exact top-k neighbors for each query vector (cosine, descending; ties by
    * neighbor id). Self-matches excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), NativeFns.cosine_sim(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining — the contrastive-training data-preparation step
    * (DPR / SimCSE recipe: for each anchor, the strongest-scoring corpus
    * items of a DIFFERENT class are the informative negatives). Exact by
    * construction: per anchor, top-k by cosine over every corpus vector
    * whose `labelCol` differs from the anchor's (self and same-class rows —
    * the would-be positives — are excluded before scoring, not after, so
    * the returned k are all usable negatives).
    *
    * Same scale shape as [[bruteForceTopK]]: the anchor set broadcasts
    * (mining runs over a training slice, not the whole corpus), scoring is
    * map-side over the corpus via the codegen'd `cosine_sim` kernel, and
    * `row_number ≤ k` rewrites to WindowGroupLimit so each map task
    * forwards at most k candidates per anchor before the rank exchange.
    * For corpus-scale anchor sets, swap the broadcast for the LSH/IVF
    * bucket path ([[lshTopK]]) — the ranking contract is unchanged.
    */
  def hardNegatives(
      corpus: DataFrame, anchors: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int
  ): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neg_id"), col(vecCol).as("c_vec"),
      col(labelCol).as("c_label"))
    val scored = c
      .join(broadcast(q), col("q_label") =!= col("c_label"))
      .select(col("query_id"), col("neg_id"),
        NativeFns.cosine_sim(col("q_vec"), col("c_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neg_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Symmetric per-vector int8 quantization — the standard 4× index
    * compression an embedding store applies before ANN at corpus scale
    * (100 TB of float32 embeddings is 25 TB at int8 with ~1e-2 cosine
    * error):
    *
    *   scale = max_i |x_i| / 127,   q_i = round_half_up(x_i / scale)
    *
    * so q ∈ [-127, 127] by construction (the max-|x| element maps to ±127
    * exactly; no clamp needed) and an all-zero vector quantizes to zeros.
    * All arithmetic is float→double exact casts plus one division — both
    * engines make bit-identical decisions. Output is EXPLODED to
    * (id, pos, q, scale_q6) rows: scalar columns hash engine-portably,
    * where a float-array column's textual form would not.
    *
    * Shape at scale: pure map-side projection — the per-row `array_max ∘
    * transform` scale pass is an interpreted HOF but runs once per VECTOR
    * (not inside any join loop — the r6 interpreted-HOF trap was HOFs on
    * the hot side of a pair expansion); posexplode and the quantize
    * arithmetic stay in whole-stage codegen. No shuffle anywhere.
    */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double")))) / lit(127.0)
    embs
      .select(col(idCol), scale.as("__scale"), posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .select(col(idCol),
        col("pos").cast("long").as("pos"),
        when(col("__scale") === 0.0, lit(0L))
          .otherwise(floor(col("__x").cast("double") / col("__scale") + 0.5).cast("long"))
          .as("q"),
        floor(col("__scale") * 1e6 + 0.5).cast("long").as("scale_q6"))
  }

  /** [[quantizeInt8]]'s vector-form sibling: the same symmetric per-vector
    * int8 quantization, kept as (id, qvec array<bigint>, scale double) rows —
    * the layout a quantized ANN index actually serves from. Same arithmetic
    * (exact float→double casts, one division, round-half-up), so the
    * exploded form of this output is bit-identical to [[quantizeInt8]].
    * Pure map-side projection; the per-vector HOF runs once per vector.
    */
  def quantizeInt8Vec(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double")))) / lit(127.0)
    embs.select(
      col(idCol),
      scale.as("__s"),
      col(vecCol).as("__v"))
      .select(
        col(idCol),
        when(col("__s") === 0.0, transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"), x => floor(x.cast("double") / col("__s") + 0.5).cast("long")))
          .as("qvec"),
        col("__s").as("scale"))
  }

  /** Exact top-k over the int8-QUANTIZED index — the serving path that makes
    * [[quantizeInt8]] a functional component rather than a storage trick.
    * Score(q, c) = scale_q · scale_c · Σᵢ qᵢcᵢ: the dot product is EXACT
    * integer arithmetic in the codegen'd [[NativeFns.int8_dot]] kernel (an
    * interpreted `zip_with`+`aggregate` here would pay per-element lambda
    * dispatch inside the |queries|×|corpus| score loop — the r6 trap), and
    * the two scale factors are reapplied outside it. Same plan shape as
    * [[bruteForceTopK]]: broadcast queries, score map-side, per-query
    * row_number (WindowGroupLimit caps it map-side) — corpus is never
    * shuffled. Against 100 TB of float32 embeddings this serves from 25 TB,
    * at ~1e-2 cosine error (bounded in the spec).
    *
    * Ranking compares `score` doubles: both factors and the product are
    * single IEEE operations on exactly-derived values, so the order is
    * engine-portable (no transcendentals, no float summation order).
    */
  def int8TopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int
  ): DataFrame = {
    val c = quantizeInt8Vec(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("c_q"), col("scale").as("c_s"))
    val q = quantizeInt8Vec(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("q_q"), col("scale").as("q_s"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("q_s") * col("c_s") * NativeFns.int8_dot(col("q_q"), col("c_q")).cast("double")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Train IVF coarse centroids with Spark ML KMeans (cosine distance,
    * seed-fixed). At 100 TB you train on a sample (`trainFraction`) — k-means
    * cost is per-row×k×iters, and a 1% sample pins the same cell structure —
    * then assign the full corpus with the cheap [[NativeFns.ivf_probes]]
    * kernel. Returns the k×dim centroid matrix (small model state, like a
    * broadcast dim table).
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  def trainCentroids(
      corpus: DataFrame, vecCol: String, k: Int,
      trainFraction: Double = 1.0, seed: Long = 42L,
      cacheKey: Option[String] = None
  ): Array[Array[Double]] = {
    def compute(): Array[Array[Double]] = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val sample = if (trainFraction < 1.0) corpus.sample(withReplacement = false, trainFraction, seed) else corpus
      val feat   = sample.select(array_to_vector(col(vecCol)).as("features"))
      val model = new KMeans()
        .setK(k).setSeed(seed).setMaxIter(10)
        .setDistanceMeasure("cosine")
        .setFeaturesCol("features")
        .fit(feat)
      model.clusterCenters.map(_.toArray)
    }
    // An IVF index is trained once and queried many times; cacheKey (e.g.
    // the corpus path) makes repeat queries against the same corpus reuse
    // the centroids instead of re-running the k-means jobs per query.
    cacheKey match {
      case Some(key) => centroidCache.computeIfAbsent(s"$key|$vecCol|$k|$trainFraction|$seed", _ => compute())
      case None      => compute()
    }
  }

  /** IVF top-k — the second scale path next to [[lshTopK]]: corpus vectors
    * are assigned to their nearest coarse centroid (one cell each); each
    * query probes its `nProbe` nearest cells and scores only those cells'
    * vectors. One broadcast join on cell id; scanned fraction ≈ nProbe/nCells
    * of the corpus. Misses happen when a true neighbor lives in an unprobed
    * cell — recall is gated against the brute-force baseline in AccuracySpec.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      trainFraction: Double = 1.0, seed: Long = 42L,
      cacheKey: Option[String] = None
  ): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, nCells, trainFraction, seed, cacheKey)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      element_at(NativeFns.ivf_probes(col(vecCol), centroids, 1), 1).as("cell"))
    val q = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).as("q_vec"),
      explode(NativeFns.ivf_probes(col(vecCol), centroids, nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), NativeFns.cosine_sim(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed top-k: candidates restricted to same SRP bucket in any of
    * `tables` independent hash tables. Misses are possible (that's the A in
    * ANN); recall grows with table count AND with `probes` — multi-probe
    * flips the lowest-margin hyperplane bits on the QUERY side only, so the
    * corpus index stays one entry per table while each query checks the
    * `probes` most likely buckets per table (recall of ~2× the tables at the
    * candidate cost of probing, without reindexing).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 12, tables: Int = 4, dim: Int = 64, probes: Int = 1
  ): DataFrame = {
    val allPlanes: Array[Array[Array[Double]]] =
      (0 until tables).map(t => hyperplanes(nPlanes, dim, seed = 42L + t).map(_.toArray).toArray).toArray
    def withBuckets(df: DataFrame, id: String, vec: String, nProbes: Int): DataFrame =
      df.select(
        col(idCol).as(id),
        col(vecCol).as(vec),
        posexplode(NativeFns.srp_buckets(col(vecCol), allPlanes, nProbes)).as(Seq("pos", "bucket"))
      ).withColumn("table", (col("pos") / nProbes).cast("int")).drop("pos")
    val q = withBuckets(queries, "query_id", "q_vec", probes)
    val c = withBuckets(corpus, "neighbor_id", "c_vec", 1)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), NativeFns.cosine_sim(col("q_vec"), col("c_vec")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private val intModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Long])]]()

  /** IVF top-k over the INTEGER-EXACT coarse quantizer
    * ([[ClusterOps.kMeansModel]]: micro-quantized vectors, exact-integer
    * argmin-L2² assignment, floor-division centroid updates) instead of the
    * float ML k-means of [[ivfTopK]] — same cell/probe plan shape, but every
    * routing decision (training iterations, corpus cell assignment, query
    * probe ranking) is BIGINT arithmetic with a deterministic (dist², cid)
    * tie-break, so the ENTIRE pipeline — train → assign → probe → exact
    * within-cell cosine → rank — replays row-level in ANSI SQL the way
    * `x_ann_int8` replays quantize → score → rank. Cell routing from integer
    * L2² on micro-quantized vectors picks the same cells as float L2 except
    * within quantization slack — immaterial for a coarse quantizer whose own
    * approximation (unprobed cells) dominates; recall is additionally gated
    * against brute force in AccuracySpec.
    *
    * Scale shape is unchanged from [[ivfTopK]]: the model is k·dim driver
    * state (trained once per `cacheKey`), corpus assignment is one map-side
    * kernel projection, queries broadcast with their probe fan-out, and the
    * per-query top-k is a WindowGroupLimit — the corpus never shuffles.
    */
  def ivfIntTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
      cacheKey: Option[String] = None
  ): DataFrame = {
    def train() = ClusterOps.kMeansModel(corpus, idCol, vecCol, nCells, iters)
    val model = cacheKey match {
      case Some(key) =>
        intModelCache.computeIfAbsent(s"$key|$vecCol|$nCells|$iters", _ => train())
      case None => train()
    }
    val cids = model.map(_._1)
    val cvs  = model.map(_._2)
    val qexp = (v: Column) => transform(v, x => floor(x.cast("double") * lit(1e6)))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      NativeFns.nearest_centroid_l2(qexp(col(vecCol)), cids, cvs)
        .getField("cluster").as("cell"))
    // Query probes: the query set is broadcast-small, so the top-nProbe cells
    // come from a plain cross join against the model frame (k rows) — the
    // integer dist² here is the same arithmetic the corpus-side kernel runs.
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = model.toSeq.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cell", "cv")
    val pw = Window.partitionBy(col("query_id")).orderBy(col("__d2"), col("cell"))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), qexp(col(vecCol)).as("__qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("__d2", aggregate(
        zip_with(col("__qv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("cell"))
    val rw = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        NativeFns.cosine_sim(col("q_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the FAISS-style compressed
    * index, integer-exact end to end: the vector splits into `m` subvectors,
    * each trained with the [[ClusterOps.kMeansModel]] integer k-means on its
    * slice (quantization commutes with slicing, so sub-codebooks see exactly
    * the sliced micro-quantized data); a corpus vector's code is its m
    * nearest sub-centroid labels — ONE map-side projection of m kernel
    * calls, no shuffle, compressing dim floats to m codes. Serving
    * reconstructs the coded vector from the broadcast codebooks (a literal
    * map lookup per sub) and scores squared-L2 against the query in the
    * codegen'd `l2_dist2` kernel — asymmetric distance computation with the
    * reconstruction materialized once per corpus row rather than a per-query
    * distance table, which keeps every step deterministic integer math. The
    * FULL train→encode→reconstruct→score→rank pipeline therefore replays in
    * SQL (the third exactly-oracled ANN variant after brute force and int8).
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, iters: Int, k: Int
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m must divide dim, got dim=$dim m=$m")
    val dsub = dim / m
    val models = (0 until m).map { s =>
      ClusterOps.kMeansModel(
        corpus.select(col(idCol), slice(col(vecCol), s * dsub + 1, dsub).as(vecCol)),
        idCol, vecCol, ksub, iters)
    }
    def qv(c: Column) = transform(c, x => floor(x.cast("double") * lit(1e6)))
    val codeCols = models.zipWithIndex.map { case (mod, s) =>
      NativeFns.nearest_centroid_l2(
        slice(col("__qv"), s * dsub + 1, dsub), mod.map(_._1), mod.map(_._2))
        .getField("cluster").as(s"__c$s")
    }
    val coded = corpus
      .select(col(idCol).cast("long").as("neighbor_id"), qv(col(vecCol)).as("__qv"))
      .select(col("neighbor_id") +: codeCols: _*)
    val recon = concat(models.zipWithIndex.map { case (mod, s) =>
      element_at(
        typedlit(mod.map { case (cid, cv) => cid -> cv.toSeq }.toMap),
        col(s"__c$s"))
    }: _*)
    val q = queries.select(col(idCol).cast("long").as("query_id"), qv(col(vecCol)).as("__qqv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist2"), col("neighbor_id"))
    coded
      .select(col("neighbor_id"), recon.as("__rv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        NativeFns.l2_dist2(col("__rv"), col("__qqv")).as("adc_dist2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ — the full FAISS `IndexIVFPQ` composition (Jégou et al. TPAMI
    * 2011 §V), integer-exact: a coarse integer k-means partitions the
    * corpus into cells; each vector's RESIDUAL from its cell centroid is
    * product-quantized with per-subvector codebooks (residuals are long
    * subtractions, so the whole model stays in the same exact arithmetic);
    * serving ranks a query's nearest `nProbe` cells and scores ONLY their
    * members, each reconstructed as cell centroid + sub-codebook entries
    * and scored by the `l2_dist2` kernel. The inverted-list pruning is what
    * survives at corpus sizes where even PQ codes are too many to scan —
    * work per query is the probed fraction, and every step (train, assign,
    * residual, encode, probe, score, rank) replays in SQL, making this the
    * fourth exactly-oracled ANN variant. The one interpreted HOF
    * (`zip_with` for residual/reconstruction arithmetic) runs once per
    * corpus row at index-build time, not in the |queries|×|candidates|
    * loop — the quantizeInt8 precedent.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCells: Int, m: Int, ksub: Int, iters: Int, nProbe: Int, k: Int
  ): DataFrame = {
    require(m > 0 && dim % m == 0, s"m must divide dim, got dim=$dim m=$m")
    val dsub = dim / m
    def qv(c: Column) = transform(c, x => floor(x.cast("double") * lit(1e6)))

    val coarse    = ClusterOps.kMeansModel(corpus, idCol, vecCol, nCells, iters)
    val coarseMap = typedlit(coarse.map { case (cid, cv) => cid -> cv.toSeq }.toMap)
    val cellCol = NativeFns.nearest_centroid_l2(
      col("__qv"), coarse.map(_._1), coarse.map(_._2)).getField("cluster")

    // localCheckpoint: this frame embeds the nCells-way coarse assignment
    // plus the residual zip_with over every corpus row, and is then scanned
    // by each of the m sub-model trainings (iters+1 actions apiece) AND the
    // index build — without truncation that whole coarse pass would re-run
    // O(m·iters) times (the lineage discipline GraphOps applies per round).
    val withRes = corpus
      .select(col(idCol).cast("long").as("neighbor_id"), qv(col(vecCol)).as("__qv"))
      .withColumn("cell", cellCol)
      .withColumn("__rv", zip_with(col("__qv"), element_at(coarseMap, col("cell")),
        (a, b) => a - b))
      .truncateLineage()

    val subModels = (0 until m).map { s =>
      ClusterOps.kMeansModelQuantized(
        withRes.select(col("neighbor_id").as("__id"),
          slice(col("__rv"), s * dsub + 1, dsub).as("__qv")),
        ksub, iters)
    }
    val codeCols = subModels.zipWithIndex.map { case (mod, s) =>
      NativeFns.nearest_centroid_l2(
        slice(col("__rv"), s * dsub + 1, dsub), mod.map(_._1), mod.map(_._2))
        .getField("cluster").as(s"__c$s")
    }
    val reconRes = concat(subModels.zipWithIndex.map { case (mod, s) =>
      element_at(
        typedlit(mod.map { case (cid, cv) => cid -> cv.toSeq }.toMap),
        col(s"__c$s"))
    }: _*)
    val index = withRes
      .select(col("neighbor_id") +: col("cell") +: codeCols: _*)
      .select(col("neighbor_id"), col("cell"),
        zip_with(element_at(coarseMap, col("cell")), reconRes, (a, b) => a + b).as("__recon"))

    // Query-side probing: rank the coarse cells per query, keep nProbe.
    val q = queries.select(col(idCol).cast("long").as("query_id"), qv(col(vecCol)).as("__qqv"))
    val cellsDf = corpus.sparkSession
      .createDataFrame(coarse.toSeq.map { case (cid, cv) => (cid, cv.toSeq) })
      .toDF("cell", "__cv")
    val pw = Window.partitionBy(col("query_id")).orderBy(col("__cd"), col("cell"))
    val probes = q.crossJoin(broadcast(cellsDf))
      .select(col("query_id"), col("__qqv"), col("cell"),
        NativeFns.l2_dist2(col("__qqv"), col("__cv")).as("__cd"))
      .withColumn("__pr", row_number().over(pw))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qqv"), col("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist2"), col("neighbor_id"))
    index
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        NativeFns.l2_dist2(col("__recon"), col("__qqv")).as("adc_dist2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
