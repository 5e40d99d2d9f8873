package graft.streaming

import java.util
import java.util.Collections

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DataSourceV2 STREAMING source — the extension point the
  * Kafka connector uses, proven offline: an append-only line log on
  * disk stands in for the broker's topic, and the connector
  * implements the same public interfaces a production ingress does
  * (`TableProvider` → `Table` → `Scan.toMicroBatchStream`, with
  * `SupportsAdmissionControl` for per-trigger rate limiting — the
  * `maxOffsetsPerTrigger` analog).
  *
  * Semantics (Kafka-shaped):
  *  - the offset space is the line index of the log: monotone,
  *    replayable, serialized into the checkpoint as plain JSON;
  *  - `latestOffset(start, limit)` ADMITS at most `maxRowsPerTrigger`
  *    records per micro-batch — backpressure lives at the source, so
  *    a restart after backlog cannot produce one giant batch;
  *  - `planInputPartitions(start, end)` splits the admitted range
  *    into `numPartitions` contiguous slices read in parallel;
  *  - `commit(end)` is the source-side retention hook (a log can
  *    truncate below it); replay below the committed offset after a
  *    restart is prevented by the checkpointed offset, exactly like
  *    a Kafka group's committed position.
  *
  * Records: line i → (offset=i, ts = epoch base + i seconds,
  * doc_id=i, text=line) — the document-stream shape ingestPipeline
  * consumes (add `content_hash` with one select). Reading by line
  * slice is O(file) per partition here for simplicity; a production
  * log source seeks by byte offset — the connector surfaces are
  * identical.
  *
  * Use: `spark.readStream.format("graft.streaming.DocLog")
  * .option("path", ...).option("maxRowsPerTrigger", "2").load()`.
  */
class DocLog extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null, "doclog source requires a 'path' option")
    new DocLogTable(path, opts.getInt("maxRowsPerTrigger", 100),
      opts.getInt("numPartitions", 2))
  }
}

object DocLog {
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** 2026-01-01T00:00:00Z in microseconds — the deterministic event-time
    * base (record i is stamped base + i seconds). */
  val BaseMicros: Long = java.time.Instant.parse("2026-01-01T00:00:00Z")
    .getEpochSecond * 1000000L

  private[streaming] def logLength(path: String): Long = {
    val f = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(f)) {
      val s = java.nio.file.Files.lines(f)
      try s.count() finally s.close()
    } else 0L
  }
}

private[streaming] class DocLogTable(path: String, maxRows: Int, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"doclog($path)"
  override def schema(): StructType = DocLog.schema
  override def capabilities(): util.Set[TableCapability] =
    Collections.singleton(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = DocLog.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new DocLogStream(path, maxRows, parts)
      }
    }
}

private[streaming] case class DocOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[streaming] class DocLogStream(path: String, maxRows: Int, parts: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  @volatile private[streaming] var committed: Long = -1L

  override def initialOffset(): Offset = DocOffset(0L)
  override def deserializeOffset(json: String): Offset = DocOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRows)

  /** Admission control: never admit more than the limit past `start`,
    * whatever backlog the log has accumulated. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DocOffset].n
    val len = DocLog.logLength(path)
    val cap = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        s + r.maxRows()
      case _ => len
    }
    DocOffset(math.min(len, cap))
  }
  override def reportLatestOffset(): Offset = DocOffset(DocLog.logLength(path))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocOffset].n
    val e = end.asInstanceOf[DocOffset].n
    val n = math.max(1, math.min(parts.toLong, e - s)).toInt
    (0 until n).map { i =>
      val lo = s + (e - s) * i / n
      val hi = s + (e - s) * (i + 1) / n
      DocLogPartition(path, lo, hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = DocLogReaderFactory

  override def commit(end: Offset): Unit = {
    committed = end.asInstanceOf[DocOffset].n
  }
  override def stop(): Unit = ()
}

private[streaming] case class DocLogPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[streaming] object DocLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocLogPartition]
    new PartitionReader[InternalRow] {
      private val stream = java.nio.file.Files.lines(java.nio.file.Paths.get(p.path))
      private val it = stream.skip(p.start).limit(p.end - p.start).iterator()
      private var off = p.start - 1
      private var line: String = _
      override def next(): Boolean =
        if (it.hasNext) { line = it.next(); off += 1; true } else false
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        off, DocLog.BaseMicros + off * 1000000L, off, UTF8String.fromString(line)))
      override def close(): Unit = stream.close()
    }
  }
}
