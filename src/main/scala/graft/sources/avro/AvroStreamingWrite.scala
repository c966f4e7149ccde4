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
    // visible as duplicate rows. But delete-all-then-rename has no
    // atomicity either: a crash between the glob delete and the
    // renames would leave a previously COMMITTED epoch's files gone
    // while the replacements still sit in temp. Three-step commit
    // instead:
    //   1. STAGE — rename every new part to a dot-prefixed staged
    //      name in the target dir (readers skip dot-files), so the
    //      full replacement set is durably in place first;
    //   2. SWAP — per destination file, delete-then-rename (the only
    //      non-visible window is one file wide, and the staged copy
    //      survives any crash inside it);
    //   3. SWEEP — delete stale visible parts of the epoch(s) whose
    //      part numbers are NOT in the new set (the fewer-partitions
    //      replay case), after the new set is fully visible.
    // Leftover .staged files from a crashed attempt are invisible to
    // readers and get overwritten when the epoch replays.
    val commits = messages.collect { case c: AvroEpochCommit => c }
    val staged = commits.map { case AvroEpochCommit(file, epoch, partition) =>
      val src = new Path(file)
      val stg = new Path(target, f".staged-e$epoch%05d-p$partition%05d.avro")
      if (fs.exists(stg)) fs.delete(stg, false)
      if (fs.exists(src) && !fs.rename(src, stg))
        throw new java.io.IOException(s"graft-avro: epoch stage rename failed for $file")
      (stg, epoch, partition)
    }
    staged.foreach { case (stg, epoch, partition) =>
      val dst = new Path(target, f"part-e$epoch%05d-p$partition%05d.avro")
      if (fs.exists(dst)) fs.delete(dst, false)
      if (fs.exists(stg) && !fs.rename(stg, dst))
        throw new java.io.IOException(s"graft-avro: epoch commit rename failed for $stg")
    }
    val epochs = (epochId +: commits.map(_.epoch)).distinct
    val fresh = staged.map { case (_, e, p) => (e, p) }.toSet
    val PartRe = """part-e(\d+)-p(\d+)\.avro""".r
    epochs.foreach { e =>
      val stale = fs.globStatus(new Path(target, f"part-e$e%05d-p*.avro"))
      if (stale != null) stale
        .filterNot { st =>
          st.getPath.getName match {
            case PartRe(ep, pp) => fresh.contains((ep.toLong, pp.toInt))
            case _              => false
          }
        }
        .foreach(st => fs.delete(st.getPath, false))
      // also sweep staged leftovers of this epoch that no message in
      // THIS commit claimed — a prior crashed attempt with MORE
      // partitions would otherwise leave invisible .staged garbage
      // accumulating forever
      val orphans = fs.globStatus(new Path(target, f".staged-e$e%05d-p*.avro"))
      if (orphans != null) orphans.foreach(st => fs.delete(st.getPath, false))
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
