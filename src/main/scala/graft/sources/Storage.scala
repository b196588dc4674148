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

  /** Overwrite-create — the build-artifact face of [[create]]: an index
    * rebuild REPLACES the prior artifact (single-writer, e.g. the IVF-PQ
    * build job), where `create`'s create-once contract would reject it.
    */
  def replace(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** `get hydfsf localf` — snapshot read with read-your-writes from the FS
    * (`getFile`, `core_process_utils.go:1962-2037`).
    */
  def get(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  /** Remove an artifact table (recursive). Build-transaction use: a
    * multi-table index build DROPS its commit manifest before touching any
    * table and re-writes it LAST ([[graft.functions.AnnIndex.buildIvfPq]],
    * [[graft.functions.TextIndex.build]]) — so a probe that requires the
    * manifest refuses a torn index (crash between table writes) instead of
    * serving mixed state.
    */
  def drop(path: String): Unit = deleteRecursively(Paths.get(path))

  /** `merge hydfsf` — compact append chunks into few files
    * (`mergeFile`, `core_process_utils.go:2040-2146`). Crash-safe swap: the
    * old data is renamed aside (never deleted first), the merged dir moved
    * in, then the sidecar dropped — a crash at any step leaves a complete
    * copy of the data in either the target or the `.__merge_old` sidecar.
    * The target path is absent only between the two renames (no
    * delete-before-replace window). `numFiles` bounds output parallelism
    * like the coordinator's single merged base file.
    */
  def merge(spark: SparkSession, path: String, numFiles: Int = 1): Unit = {
    val tmp = path.stripSuffix("/") + ".__merge_tmp"
    spark.read.parquet(path).coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    val target = Paths.get(path)
    val old    = Paths.get(path.stripSuffix("/") + ".__merge_old")
    deleteRecursively(old)
    Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** [[merge]]'s crash-safe swap for a TRANSFORMED table: write `df` (which
    * may read from `path` itself — the write lands in a sidecar, so the read
    * is never clobbered mid-scan) to `path.__merge_tmp`, then swap it in via
    * the same rename-aside discipline. The compaction primitive of the
    * index-serving layer: tombstone-filtered rewrites of postings/codes.
    */
  def rewrite(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val tmp = path.stripSuffix("/") + ".__merge_tmp"
    deleteRecursively(Paths.get(tmp))
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(tmp)
    val target = Paths.get(path)
    val old    = Paths.get(path.stripSuffix("/") + ".__merge_old")
    deleteRecursively(old)
    Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Snapshot retention + crash-debris sweep — the VACUUM of the
    * versioned-snapshot layout (`path/snap=N/` parquet dirs, `path/manifest`
    * holding the live N, manifest written LAST by publishers): physically
    * removes snapshots older than the `keepLast`-sized window ending at the
    * live snapshot, plus rename-aside / staged-append debris
    * (`.__merge_tmp` / `.__merge_old` / `.__append_*`) left by crashed
    * writers — but only entries OLDER than `debrisGraceMs` (default 10 min):
    * a younger staging dir may belong to a concurrent in-flight
    * rewrite/append whose atomic swap hasn't landed yet, and vacuum must
    * never race a live writer. Safety contract: REFUSES a torn store
    * (snapshots present but
    * no manifest — a reader can't tell which is live, so neither can the
    * vacuum); never touches the live snapshot; never touches snapshots
    * NEWER than live (an in-flight publish owns them — its manifest flip
    * hasn't happened yet). At 100 TB this is metadata-only work: one
    * directory listing + one manifest row, deletes proportional to expired
    * snapshots, zero data reads.
    * Returns (liveSnap, removedSnaps, removedStray).
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int,
      debrisGraceMs: Long = 600000L): (Long, Long, Long) = {
    require(keepLast >= 1, "vacuum must retain at least the live snapshot")
    val base = path.stripSuffix("/")
    val entries = ls(path)
    val snaps = entries.filter(_.startsWith("snap=")).map(_.stripPrefix("snap=").toLong)
    val manifested = exists(s"$base/manifest")
    require(snaps.isEmpty || manifested,
      "torn store: snapshots present but no manifest names the live one — refusing to vacuum")
    // Debris sweep is AGE-GATED: a `.__merge_tmp`/`.__append_*` entry younger
    // than the grace period may be a CONCURRENT writer's in-flight staging
    // dir, not crash debris — deleting it would break that writer's atomic
    // swap mid-write. Only entries whose mtime predates the grace window are
    // provably abandoned (a live stager renames within seconds).
    val now = System.currentTimeMillis()
    val stray = entries.filter(n =>
        n.contains(".__merge_tmp") || n.contains(".__merge_old") || n.contains(".__append_"))
      .filter(n => now - Files.getLastModifiedTime(Paths.get(s"$base/$n")).toMillis
        >= debrisGraceMs)
    stray.foreach(n => drop(s"$base/$n"))
    if (!manifested) return (-1L, 0L, stray.size.toLong) // empty store: debris-only no-op
    val live = spark.read.parquet(s"$base/manifest").head().getAs[Long]("live")
    val expired = snaps.filter(v => v < live - keepLast + 1) // never live, never in-flight (> live)
    expired.foreach(v => drop(s"$base/snap=$v"))
    (live, expired.size.toLong, stray.size.toLong)
  }

  /** Backdate an entry's mtime (crash-debris simulation in tests/queries:
    * vacuum only sweeps debris OLDER than its grace window).
    */
  def setMtime(path: String, mtimeMs: Long): Unit =
    Files.setLastModifiedTime(Paths.get(path), java.nio.file.attribute.FileTime.fromMillis(mtimeMs))

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

  /** `multiappend file vm1,vm2,… localf1,localf2,…` — N writers append to the
    * same dataset concurrently (`core_process_hydfs.go:656-701` launches the
    * appends in parallel goroutines). Each writer commits its own uniquely
    * named part files, so concurrent appends compose without coordination;
    * client order within a writer is preserved, cross-writer order is
    * whatever the FS commit order yields — exactly the reference's semantics.
    */
  def multiAppend(dfs: Seq[DataFrame], path: String): Unit = {
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = dfs.map { df =>
      val t = new Thread(() =>
        try stagedAppend(df, path)
        catch { case e: Throwable => failures.add(e) })
      t.start(); t
    }
    threads.foreach(_.join())
    if (!failures.isEmpty) throw new RuntimeException("multiappend writer failed", failures.peek())
  }

  /** Append safe under CONCURRENT writers: plain `mode("append")` jobs share
    * the destination's `_temporary/0` staging dir (FileOutputCommitter), so
    * two simultaneous appends corrupt each other's commit. Instead each
    * writer commits to a private staging dir and then moves its uniquely
    * named part files (parquet part names embed a job UUID — the analog of
    * the reference's `append_{node}_{file}_{lamport}` chunk names) into the
    * dataset. This is also the multi-writer pattern at 100 TB: unique-name
    * chunk commit, never a shared staging root.
    */
  def stagedAppend(df: DataFrame, path: String): Unit = {
    val stage = path.stripSuffix("/") + ".__append_" + java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("overwrite").parquet(stage)
    val target = Paths.get(path)
    Files.createDirectories(target)
    Files.list(Paths.get(stage)).iterator().asScala
      .filter { f =>
        val n = f.getFileName.toString
        Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach(f => Files.move(f, target.resolve(f.getFileName), StandardCopyOption.ATOMIC_MOVE))
    deleteRecursively(Paths.get(stage))
  }

  /** `getfromreplica vm hydfsf` — read one replica's copy directly
    * (`core_process_hydfs.go:631-645`). The FS-analog of a replica is a
    * single committed part file; reading exactly one shows what that "node"
    * stores, bypassing the merged view.
    */
  def getFromReplica(spark: SparkSession, path: String, partFile: String): DataFrame =
    spark.read.parquet(path.stripSuffix("/") + "/" + partFile)

  /** `listmemids` / `store` — the membership/placement diagnostic
    * (`core_process_hydfs.go:613-655`): which storage units hold the dataset
    * and how much each holds. FS-analog: the committed data files with their
    * sizes, sorted by name (the "ring" order is the FS listing order).
    */
  def listMembers(path: String): Seq[(String, Long)] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else
      Files.list(p).iterator().asScala
        .filter { f =>
          val n = f.getFileName.toString
          Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(f => (f.getFileName.toString, Files.size(f)))
        .toSeq.sortBy(_._1)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
