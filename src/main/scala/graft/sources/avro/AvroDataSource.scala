package graft.sources.avro

import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileStream, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
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
  * Scale shape: SPLIT-capable reads — files larger than the split
  * size (option `splitSize`, default 128 MiB, the
  * `maxPartitionBytes` convention) fan out into byte-range
  * partitions aligned on Avro's 16-byte block sync markers
  * (`DataFileReader.sync(start)` seeks to the first block after the
  * range start; reading stops at `pastSync(end)` — the reference's
  * `AvroInputFormat` is split-aware through exactly this
  * FileInputFormat contract), so ONE 10 GB container file occupies
  * many tasks, not one. Small files stay one partition each (the
  * write path emits one file per task, so round trips preserve
  * parallelism). Column pruning is
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
    // present only in older generations, appended nullable (the
    // decoder reads them as null from files that lack them). The type
    // check folds over EVERY file's header — endpoint-only comparison
    // would let a middle generation whose type differs from both ends
    // receive the newest type's decoder and fail mid-scan with a raw
    // ClassCastException. One header read per file (a few KB each,
    // inference-time only — the same O(files) discipline Spark's own
    // format inference pays); explicit .schema(...) skips it entirely.
    if (files.size == 1) schemaOf(files.head)
    else {
      val schemas = files.map(p => p -> schemaOf(p))
      val newest = schemas.last._2
      // first appearance wins the type contract: every later
      // generation must agree on each column's type, fail at inference
      // with the column and BOTH files named otherwise
      val firstSeen = scala.collection.mutable.LinkedHashMap
        .empty[String, (Path, StructField)]
      schemas.foreach { case (p, st) =>
        st.fields.foreach { f =>
          firstSeen.get(f.name) match {
            case Some((p0, f0)) if f0.dataType != f.dataType =>
              throw new IllegalArgumentException(
                s"graft-avro: column '${f.name}' changed type across " +
                  s"generations (${f0.dataType.simpleString} in " +
                  s"${p0.getName} vs ${f.dataType.simpleString} in " +
                  s"${p.getName}); pass an explicit .schema(...) " +
                  "to read evolved-type directories")
            case Some(_) => ()
            case None    => firstSeen(f.name) = (p, f)
          }
        }
      }
      // any column absent from ANY generation must read nullable —
      // files lacking it decode it as null
      val inAll = schemas.map(_._2.fieldNames.toSet).reduce(_ intersect _)
      val widened = newest.fields.map(f =>
        if (inAll(f.name)) f else f.copy(nullable = true))
      val extra = firstSeen.keysIterator
        .filterNot(newest.fieldNames.contains)
        .map(n => firstSeen(n)._2.copy(nullable = true)).toSeq
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
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      Option(options.get("splitSize")).map(_.toLong)
        .getOrElse(AvroScan.DefaultSplitSize))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(dir, info.schema())
}

// ---- read path ----

class AvroScanBuilder(dir: String, full: StructType,
    maxFilesPerTrigger: Option[Int],
    splitSize: Long = AvroScan.DefaultSplitSize)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(dir, required, maxFilesPerTrigger, splitSize)
}

object AvroScan {
  /** Default byte-range split size — Spark's maxPartitionBytes convention. */
  val DefaultSplitSize: Long = 128L * 1024 * 1024
}

class AvroScan(dir: String, required: StructType,
    maxFilesPerTrigger: Option[Int] = None,
    splitSize: Long = AvroScan.DefaultSplitSize) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(dir, required, maxFilesPerTrigger)
  override def description(): String =
    s"graft-avro $dir ReadSchema: ${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = FileSystem.get(new Path(dir).toUri, new Configuration())
    require(splitSize > 0, s"graft-avro: splitSize must be positive, got $splitSize")
    AvroDataSource.listAvro(fs, new Path(dir)).flatMap { p =>
      val len = fs.getFileStatus(p).getLen
      // sync-aligned byte ranges: a range owns the blocks whose sync
      // marker falls inside it — ranges never split a block
      if (len <= splitSize) Seq(AvroInputPartition(p.toString, 0L, len))
      else (0L until len by splitSize).map(off =>
        AvroInputPartition(p.toString, off, math.min(splitSize, len - off)))
    }.map(identity[InputPartition]).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)
}

/** A sync-aligned byte range of one container file; `length` of
  * Long.MaxValue means to-EOF (the streaming read path). */
case class AvroInputPartition(file: String, start: Long = 0L,
                              length: Long = Long.MaxValue) extends InputPartition

/** [[SeekableInput]] over the Hadoop FileSystem API — what
  * [[DataFileReader]] needs to seek between block sync markers. */
private[avro] class HadoopSeekableInput(fs: FileSystem, path: Path)
    extends SeekableInput {
  private val len = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  override def length(): Long = len
  override def seek(p: Long): Unit = in.seek(p)
  override def tell(): Long = in.getPos
  override def read(b: Array[Byte], off: Int, n: Int): Int = in.read(b, off, n)
  override def close(): Unit = in.close()
}

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[AvroInputPartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(part.file)
      private val fs = FileSystem.get(path.toUri, new Configuration())
      private val seekable = new HadoopSeekableInput(fs, path)
      private val reader = DataFileReader.openReader(
        seekable, new GenericDatumReader[GenericRecord]())
        .asInstanceOf[DataFileReader[GenericRecord]]
      // the split-read contract (AvroInputFormat.open / Hadoop
      // AvroRecordReader): position at the first sync AFTER start,
      // stop once the reader passes the range end — each block is
      // read by exactly one range. `end` is CAPPED at the file length:
      // pastSync computes position + SYNC_SIZE, which overflows for a
      // Long.MaxValue to-EOF sentinel and would read zero rows.
      private val end = math.min(
        if (part.length > Long.MaxValue - part.start) Long.MaxValue
        else part.start + part.length,
        seekable.length())
      reader.sync(part.start)
      private val decode = AvroConversions.recordDecoder(reader.getSchema, required)
      private var reuse: GenericRecord = _
      private var current: InternalRow = _

      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(end)) {
          reuse = reader.next(reuse); current = decode(reuse); true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
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
