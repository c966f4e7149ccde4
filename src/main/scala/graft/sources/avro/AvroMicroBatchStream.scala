package graft.sources.avro

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

/** Micro-batch stream read over a directory of Avro container files
  * (the streaming leg of the graft-avro connector — the reference runs
  * `AvroInputFormat` inside streaming jobs the same way,
  * `flink-formats/flink-avro/.../AvroInputFormat.java:40`).
  *
  * Offset model: the count of files consumed in lexicographic name
  * order. The contract is append-only arrival with lexicographically
  * increasing names — what the connector's own writer and the replay
  * harness produce (`chunk_00.avro`, `chunk_01.avro`, …). A file
  * sorting before the consumed prefix would be silently skipped, so
  * `planInputPartitions` re-checks the prefix it planned and throws if
  * the listing mutated under it. `maxFilesPerTrigger` is honored via
  * admission control; Trigger.AvailableNow snapshots the target count
  * up front.
  */
class AvroMicroBatchStream(dir: String, required: StructType,
    maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def listing(): Seq[String] = {
    val fs = FileSystem.get(new Path(dir).toUri, new Configuration())
    AvroDataSource.listAvro(fs, new Path(dir)).map(_.toString)
  }

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listing().size.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = AvroOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowTarget.getOrElse(listing().size.toLong)
    val from = start.asInstanceOf[AvroOffset].n
    val to = limit match {
      case m: ReadMaxFiles => math.min(avail, from + m.maxFiles())
      case _               => avail
    }
    AvroOffset(math.max(from, to))
  }

  override def reportLatestOffset(): Offset = AvroOffset(listing().size.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (from, to) = (start.asInstanceOf[AvroOffset].n, end.asInstanceOf[AvroOffset].n)
    val files = listing()
    require(files.size >= to,
      s"graft-avro stream: listing shrank below planned offset $to (${files.size} files) " +
        s"— files must be append-only with increasing names")
    files.slice(from.toInt, to.toInt)
      .map(f => AvroInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required)

  override def deserializeOffset(json: String): Offset = AvroOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class AvroOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}
