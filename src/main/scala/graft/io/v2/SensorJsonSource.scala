package graft.io.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A REAL DataSourceV2 connector for the engine's JSON-lines sensor
  * topic directory — the A1 Kafka-scan seam (io.Sources) promoted to a
  * first-class Spark source: `spark.read.format(
  * "graft.io.v2.SensorJsonSource").load(dir)`.
  *
  * Spark-native capabilities implemented (not simulated):
  *  - one InputPartition per topic file → parallel scan, task locality
  *    by file (at scale, one task per log segment);
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the reader
  *    materializes only requested fields — a `select(machine_id)`
  *    never builds value/timestamp strings;
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): `machine_id =` and
  *    `sensor_type =` equality predicates evaluate inside the reader
  *    against the raw parsed token, before row materialization; Spark
  *    drops its post-scan Filter for accepted predicates (the plan
  *    proves it — V2SourceSpec), everything else is returned unhandled;
  *  - malformed-JSON drop (reference semantics D1,
  *    sensor_aggregation.py:31-32): a line that fails to parse or
  *    lacks the envelope fields is skipped, not fatal.
  *
  * The reference's real topic is Kafka (flink-jobs/sensor_aggregation
  * .py:26-29); this connector serves the same envelope from the
  * file-backed topic the zero-egress environment uses, through the
  * exact API a Kafka DSv2 connector would implement.
  */
class SensorJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SensorJsonSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SensorJsonTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object SensorJsonSource {
  /** The reference's message envelope (ingest_data.py:63-70). */
  val Schema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("machine_id", StringType),
    StructField("sensor_type", StringType),
    StructField("value", DoubleType)))
}

class SensorJsonTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"sensor_json($path)"
  override def schema(): StructType = SensorJsonSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SensorJsonScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SensorJsonWriteBuilder(path, info.schema())
}

/** Write side — the B1 producer sink as a REAL V2 writer with the
  * two-phase commit protocol: each task streams its rows into a file
  * under a hidden staging dir and reports it in its commit message;
  * the DRIVER commit renames all staged files into the topic in one
  * pass, abort deletes the staging dir — a failed/speculated task can
  * never leave a partial segment visible (the at-least-once JSON-dir
  * seam couldn't make that guarantee). */
class SensorJsonWriteBuilder(path: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SensorJsonBatchWrite(path, schema)
  }
}

class SensorJsonBatchWrite(path: String, schema: StructType) extends BatchWrite {
  private val stagingDir = s"$path/.staging-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SensorJsonWriterFactory(stagingDir, schema.fieldNames)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
    messages.collect { case StagedFile(f) =>
      val src = new Path(f)
      fs.rename(src, new Path(root, src.getName))
    }
    fs.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(new Path(stagingDir), true)
  }
}

case class StagedFile(file: String) extends WriterCommitMessage

class SensorJsonWriterFactory(stagingDir: String, fields: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SensorJsonWriter(stagingDir, fields, partitionId, taskId)
}

class SensorJsonWriter(
    stagingDir: String, fields: Array[String], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  // taskId separates speculative attempts WITHIN a write; the random
  // fragment separates APPENDS ACROSS application runs — taskId
  // counters reset per session, so "part-00000-200" from yesterday's
  // append and today's would otherwise collide at commit-rename time
  // and silently overwrite a committed segment.
  private val file = new Path(
    stagingDir,
    f"part-$partitionId%05d-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.jsonl")
  private val fs = file.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = fs.create(file, true)
  private val mapper = new ObjectMapper()

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f)
      else f match {
        case "value" => node.put(f, row.getDouble(i))
        case _ => node.put(f, row.getUTF8String(i).toString)
      }
    }
    out.write((mapper.writeValueAsString(node) + "\n").getBytes("UTF-8"))
  }

  override def commit(): WriterCommitMessage = { out.close(); StagedFile(file.toString) }
  override def abort(): Unit = { out.close(); fs.delete(file, false); () }
  override def close(): Unit = ()
}

class SensorJsonScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SensorJsonSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => a == "machine_id" || a == "sensor_type"
      case _ => false
    }
    pushed = accepted
    rejected // unhandled — Spark keeps its own Filter for these
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SensorJsonScan(path, required, pushed)
}

class SensorJsonScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    SensorJsonScan.listFiles(path)
      .map(f => SensorFilePartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorJsonReaderFactory(required.fieldNames,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })

  /** Streaming side: the topic as a MicroBatchStream with
    * FILE-GRANULAR REPLAYABLE OFFSETS — the Kafka offset model mapped
    * onto the segment files: an offset is "first N files in
    * lexicographic order" (producers append monotonically-named
    * segments, the same contract Kafka log segments follow). A batch
    * [start, end) plans one partition per new file; recovery replans
    * the identical batch from the checkpointed offsets — exactly-once
    * into idempotent sinks. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SensorJsonMicroBatch(path, required.fieldNames,
      pushed.collect { case EqualTo(a, v: String) => (a, v) })
}

object SensorJsonScan {
  /** Lexicographically-sorted data files (stable offset base). */
  def listFiles(path: String): Array[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
      .sorted
  }
}

/** Offset = count of committed files (lexicographic prefix). */
case class FileCountOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

class SensorJsonMicroBatch(
    path: String, fields: Array[String], equalTo: Array[(String, String)])
    extends MicroBatchStream {
  override def initialOffset(): Offset = FileCountOffset(0)

  override def latestOffset(): Offset =
    FileCountOffset(SensorJsonScan.listFiles(path).length)

  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileCountOffset].n
    val e = end.asInstanceOf[FileCountOffset].n
    SensorJsonScan.listFiles(path).slice(s, e)
      .map(f => SensorFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorJsonReaderFactory(fields, equalTo)

  override def commit(end: Offset): Unit = () // files are immutable segments
  override def stop(): Unit = ()
}

case class SensorFilePartition(file: String) extends InputPartition

class SensorJsonReaderFactory(
    fields: Array[String], equalTo: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SensorJsonReader(
      partition.asInstanceOf[SensorFilePartition].file, fields, equalTo)
}

class SensorJsonReader(
    file: String, fields: Array[String], equalTo: Array[(String, String)])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fs = new Path(file).getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val lines = scala.io.Source.fromInputStream(fs.open(new Path(file)), "UTF-8")
  private val it = lines.getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      parse(it.next()) match {
        case Some(row) => current = row; return true
        case None => () // malformed or filtered out — skip (D1 semantics)
      }
    }
    false
  }

  private def parse(line: String): Option[InternalRow] =
    try {
      val node = mapper.readTree(line)
      if (node == null || !node.isObject) return None
      def str(f: String): String =
        if (node.hasNonNull(f)) node.get(f).asText() else null
      // pushed equality filters evaluate BEFORE materialization
      if (equalTo.exists { case (f, v) => str(f) != v }) return None
      val values: Array[Any] = fields.map {
        case "value" => if (node.hasNonNull("value")) node.get("value").asDouble() else null
        case f => Option(str(f)).map(UTF8String.fromString).orNull
      }
      Some(InternalRow.fromSeq(values.toIndexedSeq))
    } catch { case _: Exception => None }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
