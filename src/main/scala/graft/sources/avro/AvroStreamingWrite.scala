package graft.sources.avro

import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Streaming (micro-batch) avro sink — the reference's
  * StreamingFileSink with an Avro bulk writer
  * (`flink-formats/flink-avro/.../AvroWriters.java`, used via
  * `StreamingFileSink.forBulkFormat`).
  *
  * Exactly-once discipline: tasks write each epoch's rows to hidden
  * temp files; the driver-side `commit(epochId, …)` renames them to
  * DETERMINISTIC final names `part-e<epoch>-p<partition>.avro`
  * (zero-padded epoch, so the streaming-read name contract holds).
  * A replayed epoch after a failure or restart re-commits the SAME
  * final names — the rename deletes-then-moves, so re-commits are
  * idempotent and a partially-written epoch is never visible
  * (Flink's in-progress → pending → committed file lifecycle). */
class AvroStreamingWrite(dir: String, schema: StructType) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new AvroStreamingWriterFactory(dir, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val target = new Path(dir)
    val fs = FileSystem.get(target.toUri, new Configuration())
    // A replayed epoch can run with FEWER partitions than a prior
    // partially-committed attempt — overwriting only per-message
    // destinations would leave the attempt's higher-numbered parts
    // visible as duplicate rows. Clear EVERY existing file of the
    // epoch(s) being committed first, then rename the new set in.
    val epochs = (epochId +: messages.collect {
      case AvroEpochCommit(_, e, _) => e }.toSeq).distinct
    epochs.foreach { e =>
      val stale = fs.globStatus(new Path(target, f"part-e$e%05d-p*.avro"))
      if (stale != null) stale.foreach(st => fs.delete(st.getPath, false))
    }
    messages.foreach { case AvroEpochCommit(file, epoch, partition) =>
      val src = new Path(file)
      val dst = new Path(target, f"part-e$epoch%05d-p$partition%05d.avro")
      if (fs.exists(src) && !fs.rename(src, dst))
        throw new java.io.IOException(s"graft-avro: epoch commit rename failed for $file")
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(dir).toUri, new Configuration())
    messages.foreach {
      case AvroEpochCommit(file, _, _) =>
        val p = new Path(file)
        if (fs.exists(p)) fs.delete(p, false)
      case _ => ()
    }
  }
}

case class AvroEpochCommit(file: String, epoch: Long, partition: Int)
  extends WriterCommitMessage

class AvroStreamingWriterFactory(dir: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val avroSchema = AvroConversions.toAvroSchema(schema, "GraftRow")
      private val encode = AvroConversions.rowEncoder(schema, avroSchema)
      private val file =
        new Path(f"$dir/.tmp-e$epochId%05d-p$partitionId%05d-t$taskId.avro")
      private val fs = FileSystem.get(file.toUri, new Configuration())
      private val out = fs.create(file, true)
      private val writer = {
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.setCodec(CodecFactory.snappyCodec())
        w.create(avroSchema, out)
      }
      override def write(record: InternalRow): Unit = writer.append(encode(record))
      override def commit(): WriterCommitMessage = {
        writer.close()
        AvroEpochCommit(file.toString, epochId, partitionId)
      }
      override def abort(): Unit = { writer.close(); fs.delete(file, false) }
      override def close(): Unit = ()
    }
}
