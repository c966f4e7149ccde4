package graft.sources.avro

import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.UUID
import scala.jdk.CollectionConverters._

/** `graft-avro`: an Avro container-file batch source/sink as a native
  * Spark DataSource V2 (SURVEY §2.7 avro row — previously declared
  * env-blocked because only the spark-avro DATASOURCE jar is absent;
  * avro-core 1.12 is on the classpath, so the connector is built
  * directly on it).
  *
  * Reference surface: `flink-formats/flink-avro/.../AvroInputFormat
  * .java:40` (file read path), `AvroOutputFormat.java:70` (file write
  * path), row mapping per `AvroRowDe/SerializationSchema` — see
  * [[AvroConversions]].
  *
  * Scale shape: one input partition per container file (the write path
  * emits one file per task, so a round trip preserves parallelism; a
  * 100 TB directory fans out across every executor). Column pruning is
  * pushed into the decoder — unneeded fields are never converted
  * (Avro's decoder still materializes the record; real IO-level skip
  * would need per-block indexes the format doesn't have). Writes are
  * two-phase: tasks write to a hidden temp dir, the driver commit
  * renames files into place — a failed task/job leaves no partial
  * output visible, the reference's StreamingFileSink/OutputFormat
  * commit discipline. All file IO goes through the Hadoop FileSystem
  * API, so the same code targets HDFS/S3A unchanged.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = AvroDataSource.pathOf(options.asCaseSensitiveMap().asScala.toMap)
    val conf = new Configuration()
    val fs = FileSystem.get(new Path(dir).toUri, conf)
    val files = AvroDataSource.listAvro(fs, new Path(dir))
    require(files.nonEmpty, s"graft-avro: no .avro files under $dir to infer a schema from")
    def schemaOf(p: Path): StructType = {
      val in = fs.open(p)
      try {
        val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
        try AvroConversions.toSparkSchema(stream.getSchema)
        finally stream.close()
      } finally if (in != null) in.close()
    }
    // Mixed-generation directories (schema evolution): merge the
    // NEWEST file's schema (lexicographically last — the epoch-named
    // write contract makes that the latest generation) with columns
    // present only in the OLDEST, appended nullable (the decoder
    // reads them as null from newer files). Bounded at two header
    // reads, so inference stays O(1) in file count; generations
    // BETWEEN first and last are covered because evolution is
    // append-only here — a column alive mid-history exists in first
    // or last. Explicit .schema(...) remains the precise control.
    val newest = schemaOf(files.last)
    if (files.size == 1) newest
    else {
      val oldest = schemaOf(files.head)
      // any column absent from the OTHER generation must read
      // nullable — files lacking it decode it as null
      val widened = newest.fields.map(f =>
        if (oldest.fieldNames.contains(f.name)) f else f.copy(nullable = true))
      val extra = oldest.fields
        .filterNot(f => newest.fieldNames.contains(f.name))
        .map(_.copy(nullable = true))
      StructType(widened ++ extra)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroTable(AvroDataSource.pathOf(properties.asScala.toMap), schema)
}

object AvroDataSource {
  private[avro] def pathOf(props: Map[String, String]): String =
    props.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException(
        "graft-avro: a path is required — .load(dir) / .save(dir) or .option(\"path\", dir)"))

  private[avro] def listAvro(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro") &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getPath).sortBy(_.getName)
}

class AvroTable(dir: String, schema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(dir, schema,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(dir, info.schema())
}

// ---- read path ----

class AvroScanBuilder(dir: String, full: StructType, maxFilesPerTrigger: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(dir, required, maxFilesPerTrigger)
}

class AvroScan(dir: String, required: StructType,
    maxFilesPerTrigger: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(dir, required, maxFilesPerTrigger)
  override def description(): String =
    s"graft-avro $dir ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = FileSystem.get(new Path(dir).toUri, new Configuration())
    AvroDataSource.listAvro(fs, new Path(dir))
      .map(p => AvroInputPartition(p.toString): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

case class AvroInputPartition(file: String) extends InputPartition

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroInputPartition].file
    new PartitionReader[InternalRow] {
      private val in = {
        val p = new Path(file)
        FileSystem.get(p.toUri, new Configuration()).open(p)
      }
      private val stream =
        new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      private val decode = AvroConversions.recordDecoder(stream.getSchema, required)
      private var reuse: GenericRecord = _
      private var current: InternalRow = _

      override def next(): Boolean =
        if (stream.hasNext) { reuse = stream.next(reuse); current = decode(reuse); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = { stream.close(); in.close() }
    }
  }
}

// ---- write path ----

class AvroWriteBuilder(dir: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroBatchWrite(dir, schema, doTruncate)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new AvroStreamingWrite(dir, schema)
  }
}

class AvroBatchWrite(dir: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  private val tmp = s"$dir/.graft-avro-tmp-${UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(tmp, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(dir)
    val fs = FileSystem.get(target.toUri, new Configuration())
    if (truncate) AvroDataSource.listAvro(fs, target).foreach(fs.delete(_, false))
    messages.foreach { case AvroCommit(file) =>
      val src = new Path(file)
      if (!fs.rename(src, new Path(target, src.getName)))
        throw new java.io.IOException(s"graft-avro: commit rename failed for $file")
    }
    fs.delete(new Path(tmp), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(dir).toUri, new Configuration())
    fs.delete(new Path(tmp), true)
  }
}

case class AvroCommit(file: String) extends WriterCommitMessage

class AvroWriterFactory(tmp: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val avroSchema = AvroConversions.toAvroSchema(schema, "GraftRow")
      private val encode = AvroConversions.rowEncoder(schema, avroSchema)
      private val file = new Path(s"$tmp/part-$partitionId-$taskId.avro")
      private val fs = FileSystem.get(file.toUri, new Configuration())
      private val out = fs.create(file, true)
      private val writer = {
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
        w.setCodec(CodecFactory.snappyCodec())
        w.create(avroSchema, out)
      }
      override def write(record: InternalRow): Unit = writer.append(encode(record))
      override def commit(): WriterCommitMessage = { writer.close(); AvroCommit(file.toString) }
      override def abort(): Unit = { writer.close(); fs.delete(file, false) }
      override def close(): Unit = ()
    }
}
