package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-bench for optimization-round attribution: times the
  * individual steps of the serving-index lifecycles (build / append /
  * delete / compact / probe) so a regression can be pinned to a step
  * instead of argued from whole-query numbers under host noise.
  * Not part of the driver contract.
  */
object BenchSteps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{TextIndex, AnnIndex}

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      Console.err.println(f"[step] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)

    // inlined replica of TextIndex.build with per-table timers
    def buildSteps(indexPath: String): Unit = {
      import graft.functions.TextAnalysis
      import graft.sources.Storage
      import spark.implicits._
      Storage.drop(s"$indexPath/manifest")
      Storage.drop(s"$indexPath/tombstones")
      Storage.drop(s"$indexPath/live_corpus")
      val tok = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val postings = tok.groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      // bucket layout derived from the real build's constant so this replica
      // cannot silently drift from TextIndex.build (r17 advice)
      val nb = TextIndex.PostingBuckets
      t("  b.postings")(
        postings.withColumn("bucket", pmod(xxhash64(col("tok")), lit(nb.toLong)))
          .repartition(nb, col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/postings"))
      val post = spark.read.parquet(s"$indexPath/postings")
      t("  b.docs")(post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
        .write.mode("overwrite").parquet(s"$indexPath/docs"))
      t("  b.stats")(post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$indexPath/stats"))
      t("  b.corpus")(spark.read.parquet(s"$indexPath/docs")
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .select(col("n_docs"), col("total_dl"),
          (col("total_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
        .write.mode("overwrite").parquet(s"$indexPath/corpus"))
      val nDocs = t("  b.manifest.read")(
        spark.read.parquet(s"$indexPath/corpus").head().getAs[Long]("n_docs"))
      t("  b.manifest.write")(
        Storage.replace(Seq(nDocs).toDF("n_docs"), s"$indexPath/manifest"))
    }
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    (1 to reps).foreach { i =>
      Console.err.println(s"--- rep $i ---")
      t("text.build")(TextIndex.build(docs, "doc_id", "text", "/tmp/graft_index/steps_text"))
      t("text.buildSteps")(buildSteps("/tmp/graft_index/steps_text3"))
      t("text.probe")(TextIndex.probeBm25(spark, "/tmp/graft_index/steps_text",
        Seq("hash", "join", "stream"), topK = 20)
        .write.format("noop").mode("overwrite").save())
      t("text.build_half")(TextIndex.build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "/tmp/graft_index/steps_text2"))
      t("text.append")(TextIndex.append(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "/tmp/graft_index/steps_text2"))
      t("text.delete")(TextIndex.deleteDocs(spark, "/tmp/graft_index/steps_text",
        docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"))))
      t("text.probeLive")(TextIndex.probeBm25Live(spark, "/tmp/graft_index/steps_text",
        Seq("hash", "join", "stream"), topK = 20)
        .write.format("noop").mode("overwrite").save())
      t("text.compact")(TextIndex.compact(spark, "/tmp/graft_index/steps_text"))
      t("ann.build")(AnnIndex.buildIvfPq(embs, "vec_id", "embedding",
        dim = 64, nCells = 8, m = 4, ksub = 8, iters = 2,
        indexPath = "/tmp/graft_index/steps_ann"))
      t("ann.probe")(AnnIndex.probeIvfPq(spark, "/tmp/graft_index/steps_ann",
        embs.filter(col("vec_id") < 10), "vec_id", "embedding", nProbe = 2, k = 5)
        .write.format("noop").mode("overwrite").save())
      t("ann.delete")(AnnIndex.deleteVecs(spark, "/tmp/graft_index/steps_ann",
        embs.filter(col("vec_id") % 7 === 0).select(col("vec_id"))))
      t("ann.compact")(AnnIndex.compactIvfPq(spark, "/tmp/graft_index/steps_ann"))
    }
    spark.stop()
  }
}
