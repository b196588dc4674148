package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Thin storage facade keeping the HyDFS client-verb surface (SURVEY §2.4) so
  * tests and pipelines can speak the reference's language against any
  * Spark-supported filesystem. Replication, repair, and ring placement
  * (`core_process_routines.go`, `core_process_hydfs.go`) are storage-layer
  * concerns Spark delegates to the FS — none of that is rebuilt.
  */
object Storage {

  /** `create localf hydfsf` — create-once, duplicate rejected
    * (`createFile`, `core_process_utils.go:1809-1869`).
    */
  def create(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").parquet(path)

  /** `append localf hydfsf` — client-ordered append chunks
    * (`appendFile`, `core_process_utils.go:2191-2223`); parquet part files
    * play the role of `append_{node}_{file}_{lamport}` chunks, commit order
    * supplied by the FS.
    */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** `get hydfsf localf` — snapshot read with read-your-writes from the FS
    * (`getFile`, `core_process_utils.go:1962-2037`).
    */
  def get(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `merge hydfsf` — compact append chunks into few files
    * (`mergeFile`, `core_process_utils.go:2040-2146`). Atomic swap via temp
    * dir + move; `numFiles` bounds output parallelism like the coordinator's
    * single merged base file.
    */
  def merge(spark: SparkSession, path: String, numFiles: Int = 1): Unit = {
    val tmp = path.stripSuffix("/") + ".__merge_tmp"
    spark.read.parquet(path).coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    val target = Paths.get(path)
    deleteRecursively(target)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** `ls` / `store` — file→storage listing (`core_process_hydfs.go:613-630`). */
  def ls(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
  }

  /** `quantify` — unique-record count of a dest file
    * (`core_process_stream_DS.go:1779-1815`).
    */
  def quantify(spark: SparkSession, path: String): Long =
    spark.read.parquet(path).distinct().count()

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
