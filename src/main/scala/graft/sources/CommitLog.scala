package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Offset-replay commit-log source: a DataSourceV2 micro-batch stream over a
  * single append-only line file, with RECORD offsets (line numbers) as the
  * streaming offset — the Kafka shape, minus the broker. This is the
  * offset-based exactly-once story the file source cannot give (it tracks
  * whole files, so an appended-to file is either re-read entirely or missed):
  *
  *  - `latestOffset` only advances over COMPLETE (newline-terminated) lines,
  *    so a torn append is never half-consumed;
  *  - Spark's offset WAL records each planned `[start, end)` range before
  *    execution; after a mid-batch crash the SAME range replays
  *    deterministically, which with an idempotent sink
  *    ([[graft.streaming.RainStorm.idempotentParquetSink]]) is end-to-end
  *    exactly-once (RainStormStreamingSpec kills mid-offset and resumes);
  *  - appends to the SAME file after a restart are picked up from the last
  *    committed offset — seekable replay, not file-level dedup.
  *
  * Admission control: `maxLinesPerTrigger` bounds each micro-batch like
  * Kafka's `maxOffsetsPerTrigger`; Trigger.AvailableNow is supported by
  * pinning the end offset at query start. Ranges split into up to
  * `splits` input partitions so a fat batch fans out across executors
  * (reference analog: the per-partition reads of
  * `core_process_stream_DS.go:443-721`'s TCP tuple stream, re-expressed as a
  * planned, replayable scan).
  *
  * Partition opens are O(gap-from-nearest-index-point): the producer writes
  * a `(lineCount, byteOffset)` entry to a `<path>.idx` sidecar per append
  * batch, and readers (and `latestOffset` polling) seek to the floor entry
  * before skipping lines. The sidecar is derived state that can only lag —
  * missing, stale, or torn entries degrade to a longer skip, never a wrong
  * position — so the replay contract is index-independent.
  */
class CommitLog extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CommitLog.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("commit-log source needs a path: .load(path)"))
    new CommitLogTable(path)
  }
}

object CommitLog {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Producer helper: append records as newline-terminated UTF-8 lines,
    * forced to disk before returning — a reader never sees a torn record
    * (values must not contain newlines; offsets are line numbers).
    *
    * Each append also records a `(lineCount, byteOffset)` entry in a
    * `<path>.idx` sidecar AFTER the data is durable, so readers seek to the
    * nearest indexed byte instead of skipping from the file head (the
    * production byte-index the class scaladoc used to defer). The sidecar is
    * strictly DERIVED state with a one-sided failure mode: it can only LAG
    * the log (crash between data force and index write, out-of-band
    * appends, a torn last line — all leave valid-but-stale entries), and
    * every consumer treats a missing/stale index as "seek less, skip more",
    * falling back to the head when absent. Correctness never depends on it.
    *
    * SINGLE-PRODUCER contract (the Kafka-partition rule: one leader writes a
    * partition's log): the `(lineCount, byteOffset)` entry is derived from a
    * pre-write size snapshot, so two producers appending to the SAME path
    * concurrently could record an entry whose line count maps to a byte
    * offset preceding interleaved foreign bytes. Multiple producers must
    * write DIFFERENT partition files (see [[CommitLogTopic]]); the one-sided
    * "index can only lag" failure mode holds per single-writer file.
    */
  def append(path: String, values: Seq[String]): Unit = {
    require(values.forall(!_.contains("\n")), "commit-log records are single lines")
    if (values.isEmpty) return
    val p       = Paths.get(path)
    val preSize = if (Files.exists(p)) Files.size(p) else 0L
    val bytes = values.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8)
    val ch = java.nio.channels.FileChannel.open(
      p, StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      while (buf.hasRemaining) ch.write(buf) // FileChannel.write may be short
      ch.force(true)
    } finally ch.close()
    // Index update: pre-append lines = nearest index point + bounded scan.
    val preLines = linesUpTo(path, preSize)
    Files.writeString(Paths.get(path + ".idx"),
      s"${preLines + values.size} ${preSize + bytes.length}\n",
      StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
  }

  /** Append one protocol line durably: FileChannel write loop + force(true),
    * so the marker is on disk BEFORE the caller proceeds. `Files.writeString`
    * gives no such ordering — after an OS/power crash the later data append
    * could survive while the marker is lost, inverting the WAL contract.
    */
  private def appendForced(p: java.nio.file.Path, line: String): Unit = {
    val ch = java.nio.channels.FileChannel.open(
      p, StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      val buf = java.nio.ByteBuffer.wrap(line.getBytes(StandardCharsets.UTF_8))
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true)
    } finally ch.close()
  }

  /** `(completeLines, byteEnd)` of `path`'s newline-terminated prefix: the
    * complete-line count AND the byte offset just past the last `\n`, so a
    * replayer can TRUNCATE a torn tail instead of concatenating onto it.
    * Same index-floor + bounded tail scan discipline as [[linesUpTo]]
    * (index entries are complete-line boundaries by the producer protocol,
    * so the floor is a safe scan start).
    */
  private[sources] def completePrefix(path: String): (Long, Long) = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return (0L, 0L)
    val size     = Files.size(p)
    val (l0, b0) = indexFloor(path, size)
    val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.READ)
    try {
      ch.position(b0)
      var n         = l0
      var lastEnd   = b0
      var pos       = b0
      var remaining = size - b0
      val buf = java.nio.ByteBuffer.allocate(64 * 1024)
      while (remaining > 0) {
        buf.clear()
        if (remaining < buf.capacity()) buf.limit(remaining.toInt)
        val read = ch.read(buf)
        if (read <= 0) remaining = 0
        else {
          var i = 0
          while (i < read) {
            if (buf.get(i) == '\n') { n += 1; lastEnd = pos + i + 1 }
            i += 1
          }
          pos += read
          remaining -= read
        }
      }
      (n, lastEnd)
    } finally ch.close()
  }

  /** Largest `(lines, bytes)` index entry with `bytes <= maxBytes` (and, when
    * `maxLines` is given, `lines <= maxLines`); (0, 0) when no usable entry.
    * Tolerates a missing sidecar, torn last lines, and entries beyond the
    * current file (an index ahead of a truncated log is simply unusable —
    * the bytes bound rejects it).
    */
  private[sources] def indexFloor(
      path: String, maxBytes: Long, maxLines: Long = Long.MaxValue): (Long, Long) = {
    val ip = Paths.get(path + ".idx")
    if (!Files.exists(ip)) (0L, 0L)
    else {
      var best = (0L, 0L)
      Files.readAllLines(ip, StandardCharsets.UTF_8).asScala.foreach { l =>
        l.trim.split(" ") match {
          case Array(ls, bs) if ls.forall(_.isDigit) && bs.forall(_.isDigit) =>
            val (lines, bytes) = (ls.toLong, bs.toLong)
            if (bytes <= maxBytes && lines <= maxLines && lines > best._1)
              best = (lines, bytes)
          case _ => () // torn or foreign line — ignore
        }
      }
      best
    }
  }

  /** Complete lines in `path`'s first `uptoBytes` bytes — index floor plus a
    * bounded tail scan (newlines only; a final partial line contributes 0).
    */
  private def linesUpTo(path: String, uptoBytes: Long): Long = {
    val (l0, b0) = indexFloor(path, uptoBytes)
    val p = Paths.get(path)
    if (!Files.exists(p) || uptoBytes <= b0) l0
    else {
      val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.READ)
      try {
        ch.position(b0)
        var n = l0
        var remaining = uptoBytes - b0
        val buf = java.nio.ByteBuffer.allocate(64 * 1024)
        while (remaining > 0) {
          buf.clear()
          if (remaining < buf.capacity()) buf.limit(remaining.toInt)
          val read = ch.read(buf)
          if (read <= 0) remaining = 0
          else {
            var i = 0
            while (i < read) { if (buf.get(i) == '\n') n += 1; i += 1 }
            remaining -= read
          }
        }
        n
      } finally ch.close()
    }
  }

  /** Reader entry point: `(offset long, value string)` micro-batch stream. */
  def readStream(spark: SparkSession, path: String, maxLinesPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format(classOf[CommitLog].getName)
    maxLinesPerTrigger.foreach(n => r.option("maxLinesPerTrigger", n.toString))
    r.load(path)
  }

  /** Number of COMPLETE (newline-terminated) records in the log — index
    * floor + bounded tail scan, so polling `latestOffset` stays cheap as the
    * log grows.
    */
  private[sources] def completeLines(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L else linesUpTo(path, Files.size(p))
  }

  /** Sink entry point: exactly-once streaming write of a `value` string
    * column into the commit-log format (see [[CommitLogStreamingWrite]]).
    */
  def writeStream(
      df: DataFrame, path: String, checkpointDir: String
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format(classOf[CommitLog].getName)
      .option("path", path)
      .option("checkpointLocation", checkpointDir)

  /** Driver-side epoch commit with CRASH-RESUMABLE exactly-once semantics.
    *
    * The protocol (an intent log, the classic write-ahead trick):
    *  1. `done <epoch>` already in `<path>.epochs` → the epoch fully
    *     committed earlier; discard staging and return (Spark replays
    *     epochs after restarts — this is the idempotence path).
    *  2. Otherwise ensure an `intent <epoch> <startLine> <total>` entry
    *     (writing it durably BEFORE any data), then append the staged lines
    *     the previous attempt did NOT finish: the log's current complete
    *     line count minus startLine lines are already down, and staged
    *     content is deterministic and ordered (partition id, then file
    *     order), so the resumed append writes byte-identical content into
    *     the gap — a crash at ANY point replays to exactly-one copy of
    *     every record, which plain append-after-check cannot give (a crash
    *     between data and marker would double-append).
    *  3. Record `done <epoch>`, then clear staging.
    *
    * Single committer per path (Spark runs one driver commit at a time; the
    * single-producer contract of [[append]] covers the rest). Staged lines
    * pass through driver memory one micro-batch at a time — bounded by the
    * source's admission control; a broker-scale deployment would stream
    * file-to-file instead.
    */
  private[graft] def commitEpoch(
      path: String, epochId: Long, staged: Seq[StagedEpochFile]): Unit = {
    val epochsPath = Paths.get(path + ".epochs")
    val entries: Seq[String] =
      if (Files.exists(epochsPath))
        Files.readAllLines(epochsPath, StandardCharsets.UTF_8).asScala.toSeq
      else Seq.empty
    def cleanup(): Unit =
      staged.foreach(m => Files.deleteIfExists(Paths.get(m.file)))

    if (entries.contains(s"done $epochId")) { cleanup(); return }

    val sorted = staged.sortBy(_.partitionId)
    val total  = sorted.map(_.rows).sum
    val startLine = entries.reverseIterator
      .map(_.trim.split(" "))
      .collectFirst { case Array("intent", e, s, n) if e == epochId.toString =>
        require(n.toLong == total,
          s"epoch $epochId replayed with different content: staged $total rows, intent $n")
        s.toLong
      }
      .getOrElse {
        val s = completeLines(path)
        // Forced BEFORE any data append — the WAL ordering the protocol
        // depends on (a surviving data append with a lost intent would
        // recompute startLine from the extended log and double-append).
        appendForced(epochsPath, s"intent $epochId $s $total\n")
        s
      }

    val already = completeLines(path) - startLine
    require(already >= 0 && already <= total,
      s"foreign append interleaved with epoch $epochId replay " +
        s"(log at ${already + startLine} lines, intent start $startLine, total $total)")
    if (already < total) {
      val lines = sorted.iterator.flatMap { m =>
        val p = Paths.get(m.file)
        if (Files.exists(p)) Files.readAllLines(p, StandardCharsets.UTF_8).asScala
        else Seq.empty
      }.toSeq
      require(lines.size == total,
        s"staging lost for epoch $epochId: ${lines.size} of $total staged rows present")
      // Torn-tail repair: a crash mid-append can leave a partial last line
      // that completeLines excludes; appending the gap onto those bytes
      // would merge the torn fragment and the replayed record into one
      // corrupted line. Truncate to the last complete-line boundary first.
      val (_, completeBytes) = completePrefix(path)
      val p = Paths.get(path)
      if (Files.exists(p) && Files.size(p) > completeBytes) {
        val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.WRITE)
        try { ch.truncate(completeBytes); ch.force(true) } finally ch.close()
      }
      append(path, lines.drop(already.toInt))
    }
    // Forced before staging cleanup, so a committed epoch can never lose its
    // `done` marker to a crash and re-append from already-deleted staging.
    appendForced(epochsPath, s"done $epochId\n")
    cleanup()
  }
}

private[graft] case class StagedEpochFile(file: String, partitionId: Int, rows: Long)
  extends WriterCommitMessage

/** Exactly-once DSv2 streaming SINK for the commit-log format — the write
  * half of the Kafka-shaped story ([[CommitLog]] is the read half): tasks
  * stage their rows to per-(epoch, partition) files, and the driver commit
  * appends them through the intent-log protocol of [[CommitLog.commitEpoch]],
  * so an epoch replayed after ANY crash point lands exactly once. Expects a
  * `value` string column (the Kafka sink convention).
  */
private[sources] class CommitLogStreamingWrite(path: String, valueIdx: Int)
  extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new CommitLogWriterFactory(path, valueIdx)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CommitLog.commitEpoch(path, epochId,
      messages.toSeq.collect { case m: StagedEpochFile => m })

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: StagedEpochFile => Files.deleteIfExists(Paths.get(m.file))
      case _                  => ()
    }
}

private[sources] class CommitLogWriterFactory(path: String, valueIdx: Int)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new CommitLogDataWriter(path, valueIdx, partitionId, epochId)
}

/** Task-side staging writer: rows append to a per-(epoch, partition) file
  * (TRUNCATE on open, so a retried task simply rewrites its attempt — the
  * last successful attempt's content is what the commit message references).
  */
private[sources] class CommitLogDataWriter(
    path: String, valueIdx: Int, partitionId: Int, epochId: Long)
  extends DataWriter[InternalRow] {

  private val stagingDir = Paths.get(path + ".staging")
  Files.createDirectories(stagingDir)
  private val file = stagingDir.resolve(s"epoch-$epochId-part-$partitionId")
  private val ch = java.nio.channels.FileChannel.open(
    file, StandardOpenOption.CREATE, StandardOpenOption.WRITE,
    StandardOpenOption.TRUNCATE_EXISTING)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val v = record.getUTF8String(valueIdx).toString
    require(!v.contains("\n"), "commit-log records are single lines")
    val buf = java.nio.ByteBuffer.wrap((v + "\n").getBytes(StandardCharsets.UTF_8))
    while (buf.hasRemaining) ch.write(buf)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    ch.force(true); ch.close()
    StagedEpochFile(file.toString, partitionId, rows)
  }

  override def abort(): Unit = { ch.close(); Files.deleteIfExists(file) }

  override def close(): Unit = if (ch.isOpen) ch.close()
}

private[sources] class CommitLogTable(path: String) extends Table with SupportsRead with SupportsWrite {

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = info.schema()
    require(schema.fieldNames.contains("value") &&
        schema(schema.fieldIndex("value")).dataType == StringType,
      s"commit-log sink expects a `value` string column, got ${schema.simpleString}")
    val vIdx = schema.fieldIndex("value")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new CommitLogStreamingWrite(path, vIdx)
      }
    }
  }
  override def name(): String = s"commitlog(`$path`)"
  override def schema(): StructType = CommitLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxLinesPerTrigger")).map(_.toLong)
    () => new Scan {
      override def readSchema(): StructType = CommitLog.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CommitLogMicroBatchStream(path, maxPerTrigger)
    }
  }
}

private[sources] case class CommitLogOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

private[sources] class CommitLogMicroBatchStream(path: String, maxPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // Set once at query start under Trigger.AvailableNow: the stream drains to
  // exactly this point and stops, however many appends race in afterwards.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(CommitLog.completeLines(path))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CommitLogOffset].line
    val avail = availableNowCap.getOrElse(CommitLog.completeLines(path))
    val end = limit match {
      case mr: ReadMaxRows => math.min(avail, s + mr.maxRows())
      case _               => avail
    }
    CommitLogOffset(math.max(s, end))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled source: latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = CommitLogOffset(CommitLog.completeLines(path))

  override def initialOffset(): Offset = CommitLogOffset(0L)

  override def deserializeOffset(json: String): Offset = CommitLogOffset(json.trim.toLong)

  // The log is the durable store; nothing to release on commit.
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CommitLogOffset].line
    val e = end.asInstanceOf[CommitLogOffset].line
    if (e <= s) Array.empty
    else {
      // Contiguous splits so one fat batch fans out; never below 256
      // lines/split so trivial batches stay single-task.
      val splits = math.max(1L, math.min(4L, (e - s) / 256L)).toInt
      val step = (e - s + splits - 1) / splits
      (0 until splits).iterator
        .map(i => CommitLogInputPartition(path, s + i * step, math.min(e, s + (i + 1) * step)))
        .filter(p => p.end > p.start)
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = CommitLogReaderFactory
}

private[sources] case class CommitLogInputPartition(path: String, start: Long, end: Long)
  extends InputPartition

/** Shared seek-and-scan over one file's planned `[start, end)` line range —
  * the reading half of both the single-log and topic partition readers.
  *
  * Seeks to the nearest index point at-or-below the start offset, then skips
  * only the gap — O(gap) per partition open instead of O(offset). A
  * missing/stale sidecar degrades to the head (floor (0,0)), never to a
  * wrong position: index entries only ever lag the log. The byte bound is
  * the CURRENT file size (0 if the log vanished), so an index entry
  * surviving a truncated/replaced log can't position past EOF and silently
  * read zero rows — truncation below a planned offset surfaces as the
  * explicit corruption error in [[next]] instead.
  */
private[sources] final class LineRangeReader(path: String, start: Long, end: Long) {
  private val (idxLines, idxBytes) = CommitLog.indexFloor(
    path,
    maxBytes = if (Files.exists(Paths.get(path))) Files.size(Paths.get(path)) else 0L,
    maxLines = start)
  private val channel = java.nio.channels.FileChannel.open(
    Paths.get(path), StandardOpenOption.READ)
  private val reader = {
    channel.position(idxBytes)
    new java.io.BufferedReader(
      java.nio.channels.Channels.newReader(channel, StandardCharsets.UTF_8))
  }
  private var line: Long = idxLines
  private var current: String = _
  while (line < start && reader.readLine() != null) line += 1

  def next(): Boolean =
    if (line >= end) false
    else {
      current = reader.readLine()
      // The planned range only covers lines complete at planning time, so
      // a null here means the file shrank — corruption, not laziness.
      if (current == null)
        throw new IllegalStateException(
          s"commit log $path truncated below planned offset $end (at $line)")
      line += 1
      true
    }

  def offset: Long = line - 1
  def value: String = current
  def close(): Unit = reader.close()
}

private[sources] object CommitLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CommitLogInputPartition]
    new PartitionReader[InternalRow] {
      private val r = new LineRangeReader(p.path, p.start, p.end)
      override def next(): Boolean = r.next()
      override def get(): InternalRow = InternalRow(r.offset, UTF8String.fromString(r.value))
      override def close(): Unit = r.close()
    }
  }
}

/** Multi-partition commit-log TOPIC: N single-writer partition files under
  * one directory, consumed as ONE stream with a composite per-file offset —
  * the full Kafka topic shape (a topic is nothing but a set of append-only
  * partition logs whose record offsets commit together), built on the same
  * replay guarantees as [[CommitLog]]:
  *
  *  - the streaming offset is a `{partitionFile: lineCount}` map, serialized
  *    with sorted keys so offset equality is textual equality in the WAL;
  *  - each partition file keeps its own record offsets and byte-index
  *    sidecar; a planned composite range replays deterministically per file
  *    after a crash (the single-log argument, applied per partition);
  *  - admission control splits `maxLinesPerTrigger` across partitions
  *    PROPORTIONALLY to their lag (floor division, remainder granted in
  *    sorted-name order) — deterministic, and a hot partition cannot starve
  *    the others;
  *  - partition files appearing after the stream starts are picked up at
  *    offset 0 (the add-partitions case); files named `*.log` in the topic
  *    directory are the partition set.
  */
class CommitLogTopic extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CommitLogTopic.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("commit-log topic source needs a directory: .load(dir)"))
    new CommitLogTopicTable(dir)
  }
}

object CommitLogTopic {
  val schema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** The topic's partition files: `*.log` directly under `dir`, sorted by
    * name (the sort makes every budget split and offset serialization
    * deterministic).
    */
  private[sources] def partitionFiles(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".log"))
        .toSeq.sorted
      finally s.close()
    }
  }

  private[sources] def offsetsToJson(m: Map[String, Long]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private[sources] def offsetsFromJson(s: String): Map[String, Long] =
    "\"([^\"]+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap

  /** Reader entry point: `(partition string, offset long, value string)`. */
  def readStream(spark: SparkSession, dir: String, maxLinesPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format(classOf[CommitLogTopic].getName)
    maxLinesPerTrigger.foreach(n => r.option("maxLinesPerTrigger", n.toString))
    r.load(dir)
  }
}

private[sources] class CommitLogTopicTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"commitlogtopic(`$dir`)"
  override def schema(): StructType = CommitLogTopic.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxPerTrigger = Option(options.get("maxLinesPerTrigger")).map(_.toLong)
    () => new Scan {
      override def readSchema(): StructType = CommitLogTopic.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new CommitLogTopicMicroBatchStream(dir, maxPerTrigger)
    }
  }
}

private[sources] case class CommitLogTopicOffset(lines: Map[String, Long]) extends Offset {
  override def json(): String = CommitLogTopic.offsetsToJson(lines)
}

private[sources] class CommitLogTopicMicroBatchStream(dir: String, maxPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var availableNowCap: Option[Map[String, Long]] = None

  private def available(): Map[String, Long] =
    CommitLogTopic.partitionFiles(dir)
      .map(f => f -> CommitLog.completeLines(s"$dir/$f")).toMap

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(available())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s     = start.asInstanceOf[CommitLogTopicOffset].lines
    val avail = availableNowCap.getOrElse(available())
    val lags = avail.toSeq.sortBy(_._1).map { case (f, av) =>
      (f, s.getOrElse(f, 0L), math.max(0L, av - s.getOrElse(f, 0L)))
    }
    val total = lags.map(_._3).sum
    val end = limit match {
      case mr: ReadMaxRows if total > mr.maxRows() =>
        // Proportional-to-lag split, deterministic: floor share first, then
        // the remainder one line at a time in sorted-name order.
        val budget = mr.maxRows()
        val floors = lags.map { case (f, st, lag) => (f, st, lag, budget * lag / total) }
        var left   = budget - floors.map(_._4).sum
        floors.map { case (f, st, lag, share) =>
          val extra = if (left > 0 && share < lag) { left -= 1; 1L } else 0L
          f -> (st + math.min(lag, share + extra))
        }.toMap
      case _ => lags.map { case (f, st, lag) => f -> (st + lag) }.toMap
    }
    // Keys only ever accumulate: a partition file deleted out-of-band keeps
    // its committed count, so restarts can't re-plan vanished ranges from 0.
    CommitLogTopicOffset(s ++ end)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled source: latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = CommitLogTopicOffset(available())

  override def initialOffset(): Offset = CommitLogTopicOffset(Map.empty)

  override def deserializeOffset(json: String): Offset =
    CommitLogTopicOffset(CommitLogTopic.offsetsFromJson(json))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CommitLogTopicOffset].lines
    val e = end.asInstanceOf[CommitLogTopicOffset].lines
    e.toSeq.sortBy(_._1).flatMap { case (f, endLine) =>
      val startLine = s.getOrElse(f, 0L)
      if (endLine <= startLine) Seq.empty
      else {
        // Same contiguous-split fan-out as the single log, per partition.
        val n    = endLine - startLine
        val splits = math.max(1L, math.min(4L, n / 256L)).toInt
        val step   = (n + splits - 1) / splits
        (0 until splits).iterator
          .map(i => CommitLogTopicInputPartition(
            s"$dir/$f", f, startLine + i * step, math.min(endLine, startLine + (i + 1) * step)))
          .filter(p => p.end > p.start)
          .toSeq
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = CommitLogTopicReaderFactory
}

private[sources] case class CommitLogTopicInputPartition(
    path: String, part: String, start: Long, end: Long) extends InputPartition

private[sources] object CommitLogTopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CommitLogTopicInputPartition]
    new PartitionReader[InternalRow] {
      private val r       = new LineRangeReader(p.path, p.start, p.end)
      private val partUtf = UTF8String.fromString(p.part)
      override def next(): Boolean = r.next()
      override def get(): InternalRow = InternalRow(partUtf, r.offset, UTF8String.fromString(r.value))
      override def close(): Unit = r.close()
    }
  }
}
