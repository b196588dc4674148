package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale design: every path is shuffle-bounded by the LSH band trick
  * (shingle → minhash → band-bucket → within-bucket pairs) so candidate
  * generation never goes quadratic in the corpus; only verified candidates pay
  * the exact-Jaccard cost. Signatures are computed by the native codegen'd
  * kernels in [[NativeExprs]] (`minhash_sig`/`simhash64`/`cosine_sim`) — no
  * UDFs and no interpreted lambda pipelines in the hot path.
  */
object DedupOps {

  /** Word n-gram shingles of a text column. Texts shorter than n words get a
    * single whole-text shingle so they still participate.
    */
  def shingles(text: Column, n: Int = 3): Column =
    NativeFns.word_shingles(text, n)

  /** MinHash signature of length k over the shingle set: element i is
    * min over shingles of xxhash64(shingle, i). Deterministic, seed-indexed.
    */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    NativeFns.minhash_sig(shingleCol, k)

  /** Exact Jaccard similarity between two array columns (double; both arrays
    * assumed distinct). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    when(union === 0, 1.0).otherwise(inter / union.cast("double"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k), hash
    * each band, bucket-join, emit within-bucket pairs (id_a < id_b). One
    * shuffle on (band, bucket); bucket lists stay small because a band match
    * at r rows already implies high similarity.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      bands: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = 200
  ): DataFrame = {
    val banded = df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))
        )
      ).as(Seq("band", "bucket"))
    )
    banded
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      // Oversized buckets are degenerate for dedup (a bucket of B ids emits
      // B²/2 pairs); cap them. At high-threshold banding (r=8) real buckets
      // are tiny — the cap only trims pathological collisions.
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      // within-bucket pair expansion (i<j) via nested higher-order transforms
      .select(
        explode(
          flatten(
            transform(
              sequence(lit(1), size(col("ids")) - 1),
              i =>
                transform(
                  slice(col("ids"), i + 1, size(col("ids"))),
                  j => struct(element_at(col("ids"), i).as("id_a"), j.as("id_b"))
                )
            )
          )
        ).as("pair")
      )
      .select(col("pair.id_a"), col("pair.id_b"))
      .distinct()
  }

  /** End-to-end MinHash near-dup detection: shingle → minhash → LSH candidates
    * → exact-Jaccard verification at `threshold`. Returns (id_a, id_b,
    * jaccard) for verified pairs.
    */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 8,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = k / bands
    val withSh  = docs.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    val withSig = withSh.withColumn("sig", minhashSignature(col("sh"), k))
    val cands   = lshCandidatePairs(withSig.select(col(idCol), col("sig")), idCol, "sig", bands, rowsPerBand)
    val a = withSh.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    cands
      .join(a, "id_a")
      .join(b, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup candidates: fingerprint + 4-way band partition of the 64
    * bits; equal band ⇒ candidate; verified by Hamming distance ≤ maxHamming.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val withSim = docs.select(col(idCol), TextAnalysis.simHash64(col(textCol)).as("simhash"))
    val banded = withSim.select(
      col(idCol),
      col("simhash"),
      posexplode(
        transform(sequence(lit(0), lit(3)), b =>
          call_function("shiftrightunsigned", col("simhash"), (b * 16).cast("int")).bitwiseAND(0xffffL))
      ).as(Seq("band", "bucket"))
    )
    val pairs = banded.as("x")
      .join(banded.as("y"), Seq("band", "bucket"))
      .filter(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("id_a"),
        col(s"y.$idCol").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming")
      )
      .distinct()
    pairs.filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs above `threshold`: block-nested-loop over
    * a broadcast primitive-float matrix (the build side is collected once and
    * broadcast, like a broadcast hash join's build side — NOT a per-pair
    * Catalyst evaluation, which pays array-decode per comparison). Each
    * partition streams its vectors against the in-memory matrix at memory
    * bandwidth. For corpora whose build side exceeds broadcast size, prefilter
    * with [[AnnSearch.lshTopK]] buckets and run this within buckets.
    */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val typed = embs.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
    val build = typed.collect().sortBy(_._1)
    val bc    = spark.sparkContext.broadcast(build.map { case (id, v) =>
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      (id, v, math.sqrt(n))
    })
    typed
      .mapPartitions { iter =>
        val right = bc.value
        iter.flatMap { case (idA, va) =>
          var na = 0.0
          var i  = 0
          while (i < va.length) { na += va(i).toDouble * va(i).toDouble; i += 1 }
          val normA = math.sqrt(na)
          right.iterator
            .filter(_._1 > idA)
            .flatMap { case (idB, vb, normB) =>
              var dot = 0.0
              var j   = 0
              val n   = math.min(va.length, vb.length)
              while (j < n) { dot += va(j).toDouble * vb(j).toDouble; j += 1 }
              val den = normA * normB
              val cos = if (den == 0.0) 0.0 else dot / den
              if (cos >= threshold) Some((idA, idB, cos)) else None
            }
        }
      }
      .toDF("id_a", "id_b", "cos")
  }
}
