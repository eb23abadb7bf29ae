package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-offset batch source (DataSourceV2) — the engine-side half of
  * the reference's offset-windowed Kafka batch read
  * (`kafka_to_gcs_by_spark_batch.py:81-87`: `format("kafka")` with
  * `startingOffsets`/`endingOffsets` JSON built by an
  * offsets-for-times lookup). The kafka connector jar is unavailable
  * offline (SURVEY.md §7), so the wire is a local directory standing
  * in for a topic — `p<N>.jsonl`, one file per partition, one record
  * per line, the line number being the record's offset — while the
  * OPTION CONTRACT is the connector's, verbatim:
  *
  *  - `path`: topic directory
  *  - `topic`: topic name (must match the key in the offsets JSON)
  *  - `startingOffsets`: `"earliest"` or `{"topic":{"0":off,…}}`
  *    (inclusive; -2 ⇒ earliest)
  *  - `endingOffsets`: `"latest"` or the same JSON shape (exclusive;
  *    -1 ⇒ latest)
  *
  * which is exactly what [[graft.ingest.OffsetLookup.window]] emits —
  * so the Airflow-shaped `offsets_for_times → bounded read` pipeline
  * runs end-to-end through a real `spark.read.format(...)` plan
  * (`OffsetSourceSpec`). Output schema mirrors the kafka source's
  * (key/value binary, topic, partition, offset).
  *
  * Scale shape: one InputPartition per topic partition — the same
  * parallelism contract as the kafka source (executor-side range
  * reads, no driver materialization; the driver holds only the
  * per-partition offset bounds).
  */
class OffsetFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffsetFileSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OffsetFileTable(new CaseInsensitiveStringMap(properties))
}

object OffsetFileSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType)))

  val Earliest = -2L
  val Latest = -1L

  private val PartFile = """p(\d+)\.jsonl""".r
  private val OffsetEntry = """"(\d+)"\s*:\s*(-?\d+)""".r

  /** Topic partitions present under `path` (from `p<N>.jsonl` names). */
  def listPartitions(path: String): Seq[Int] = {
    val fs = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    fs.toSeq.flatMap(f => f.getName match {
      case PartFile(p) => Some(p.toInt)
      case _ => None
    }).sorted
  }

  /** Parse `"earliest"`/`"latest"`/`{"topic":{"p":off,…}}` into
    * per-partition offsets; `sentinel` fills the sentinel forms and
    * absent partitions (kafka: an unlisted partition defaults like the
    * sentinel of its side).
    */
  def parseOffsets(spec: String, topic: String, partitions: Seq[Int],
                   sentinel: Long): Map[Int, Long] = spec.trim match {
    case "earliest" => partitions.map(_ -> Earliest).toMap
    case "latest" => partitions.map(_ -> Latest).toMap
    case json =>
      val given = parseOffsetsJson(json, topic)
      partitions.map(p => p -> given.getOrElse(p, sentinel)).toMap
  }

  /** Parse ONLY the partitions an offsets JSON names — no directory
    * listing involved. Used for checkpoint restore, where the JSON is
    * authoritative (kafka semantics): a checkpointed partition whose
    * file is momentarily absent must keep its offset, not be rebuilt
    * from disk state.
    *
    * Extraction is scoped to the NAMED topic's nested object: a
    * multi-topic offsets JSON (`{"a":{"0":5},"b":{"0":9}}`, legal per
    * the kafka option contract) must not merge foreign-topic
    * partitions into this topic's map. Partition objects hold only
    * numeric values, so the non-nested `[^}]*` body match is exact.
    */
  def parseOffsetsJson(json: String, topic: String): Map[Int, Long] = {
    require(json.contains("\"" + topic + "\""),
      s"offsets JSON $json does not mention topic '$topic'")
    val topicObj =
      ("\"" + java.util.regex.Pattern.quote(topic) + "\"\\s*:\\s*\\{([^}]*)\\}").r
    val scoped = topicObj.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    OffsetEntry.findAllMatchIn(scoped)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
  }
}

private[sources] class OffsetFileTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"offset-file-${options.get("path")}"
  override def schema(): StructType = OffsetFileSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new OffsetFileScan(options)
}

private[sources] class OffsetFileScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = OffsetFileSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    import OffsetFileSource._
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    val topic = Option(options.get("topic")).getOrElse(
      throw new IllegalArgumentException("option 'topic' is required"))
    val parts = listPartitions(path)
    val starts = parseOffsets(
      Option(options.get("startingOffsets")).getOrElse("earliest"),
      topic, parts, Earliest)
    val ends = parseOffsets(
      Option(options.get("endingOffsets")).getOrElse("latest"),
      topic, parts, Latest)
    parts.map { p =>
      val s = starts(p)
      val e = ends(p)
      // numeric validation — the reference compared offsets as strings
      // (save_raw_data_from_kafka_to_gcs.py:79-81); sentinels skip it
      if (s >= 0 && e >= 0) graft.ingest.OffsetLookup.validateRange(s, e)
      OffsetFilePartition(s"$path/p$p.jsonl", topic, p, s, e): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OffsetFileReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OffsetFileMicroBatchStream(options)
}

/** Streaming (micro-batch) read over the same topic directory — the
  * `readStream.format(...)` half of the seam
  * (`kafka_to_gcs_by_spark_streaming.py:13-17`: subscribe + load, no
  * end bound). Offsets are per-partition LINE COUNTS, serialized in
  * the kafka connector's own JSON shape (`{"topic":{"0":n,…}}`) so
  * checkpoint offset files are contract-identical; lines appended to
  * `p<N>.jsonl` between triggers become the next micro-batch, and
  * partitions appearing later are picked up from offset 0 (kafka's
  * new-partition rule). `startingOffsets` honors the connector's
  * streaming semantics: earliest (default), latest (= counts at first
  * trigger), or explicit JSON; `endingOffsets` is a batch-only option
  * and is ignored, as in the connector.
  *
  * Scale shape: the driver tracks one long per partition (the same
  * state the kafka source keeps); each micro-batch plans one
  * InputPartition per topic partition reading only `[start, end)`.
  * Line-count discovery re-reads files because jsonl has no footer —
  * the stand-in's cost, not the contract's.
  */
private[sources] class OffsetFileMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {
  import OffsetFileSource._

  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("option 'path' is required"))
  private val topic = Option(options.get("topic")).getOrElse(
    throw new IllegalArgumentException("option 'topic' is required"))

  private def counts(): Map[Int, Long] =
    listPartitions(path).map { p =>
      val f = new java.io.File(path, s"p$p.jsonl")
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try p -> src.getLines().size.toLong finally src.close()
    }.toMap

  override def initialOffset(): Offset = {
    val now = counts()
    val spec = Option(options.get("startingOffsets")).getOrElse("earliest")
    val parsed = parseOffsets(spec, topic, now.keys.toSeq.sorted, Earliest)
    OffsetFileStreamOffset(topic, parsed.map { case (p, o) =>
      p -> (if (o == Earliest) 0L else if (o == Latest) now(p) else o)
    })
  }

  override def latestOffset(): Offset = OffsetFileStreamOffset(topic, counts())

  // Checkpoint JSON is authoritative (kafka semantics): restore exactly
  // the partitions it names. Rebuilding from the CURRENT directory
  // listing would drop the offset of a checkpointed partition whose
  // p<N>.jsonl is absent at restart, and planInputPartitions' 0-default
  // would then re-emit already-processed records once the file
  // reappears. Disk-only NEW partitions still default to 0 at plan
  // time (the connector's new-partition rule) — they need no entry here.
  override def deserializeOffset(json: String): Offset =
    OffsetFileStreamOffset(topic,
      parseOffsetsJson(json, topic)
        .map { case (p, o) => p -> (if (o < 0) 0L else o) })

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OffsetFileStreamOffset].offsets
    val e = end.asInstanceOf[OffsetFileStreamOffset].offsets
    e.toSeq.sortBy(_._1).map { case (p, endOff) =>
      OffsetFilePartition(s"$path/p$p.jsonl", topic, p,
        s.getOrElse(p, 0L), endOff): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OffsetFileReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Kafka-JSON-shaped stream offset: `{"topic":{"0":n,…}}`. */
private[sources] case class OffsetFileStreamOffset(topic: String,
                                                   offsets: Map[Int, Long])
    extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")
}

private[sources] case class OffsetFilePartition(file: String, topic: String,
                                                partition: Int, start: Long,
                                                end: Long) extends InputPartition

private[sources] class OffsetFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OffsetFilePartition]
    new PartitionReader[InternalRow] {
      import OffsetFileSource.{Earliest, Latest}
      private val lines: Seq[String] = {
        val f = new java.io.File(p.file)
        if (!f.isFile) Seq.empty
        else {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.getLines().toVector finally src.close()
        }
      }
      private val from: Long = if (p.start == Earliest) 0L
        else if (p.start == Latest) lines.length.toLong
        else p.start
      private val until: Long = if (p.end == Latest) lines.length.toLong
        else if (p.end == Earliest) 0L
        else math.min(p.end, lines.length.toLong)
      private var off: Long = from - 1

      override def next(): Boolean = { off += 1; off < until }
      override def get(): InternalRow =
        InternalRow(null,
          lines(off.toInt).getBytes("UTF-8"),
          UTF8String.fromString(p.topic),
          p.partition,
          off)
      override def close(): Unit = ()
    }
  }
}
