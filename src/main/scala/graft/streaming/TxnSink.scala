package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once transactional JDBC sink — the Spark form of the
  * reference's `TwoPhaseCommitSinkFunction`
  * (`flink-streaming-java/.../functions/sink/
  * TwoPhaseCommitSinkFunction.java:77`): Flink opens a transaction
  * per checkpoint epoch, pre-commits on snapshot, and commits on
  * checkpoint-complete; recovery re-commits or aborts dangling
  * transactions so a replayed epoch never lands twice.
  *
  * The Spark mapping: micro-batch = checkpoint epoch. foreachBatch is
  * at-least-once, so exactly-once is achieved by making each
  * (batch, partition) write a SINGLE transaction that atomically
  * inserts the rows AND a commit marker keyed (batch_id,
  * partition_id). A replay (task retry or post-crash batch re-run)
  * finds the marker inside the same transactional view and skips —
  * the marker check plays recoverAndCommit/recoverAndAbort. Unlike a
  * driver-global transaction, per-partition transactions scale: N
  * executors commit independently, exactly as Flink's per-subtask
  * transactions do, and a half-failed batch re-runs only its
  * uncommitted partitions.
  *
  * Scale notes: one short transaction per partition per batch (tune
  * partitions so each holds a sane row count); the commits table
  * stays tiny (2 bigints per partition-epoch) and is PK-guarded, so
  * even a marker race (two concurrent replays) resolves to one
  * winner — the loser's INSERT violates the PK and rolls its whole
  * transaction back, rows included.
  */
object TxnSink {

  /** Create the destination + commit-marker tables (idempotent). */
  def init(url: String, table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      def tryDdl(sql: String): Unit =
        try { st.executeUpdate(sql); () }
        catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      tryDdl(s"CREATE TABLE $table (ID BIGINT, V BIGINT)")
      tryDdl(s"CREATE TABLE ${table}_COMMITS (" +
        "BATCH_ID BIGINT NOT NULL, PART_ID INT NOT NULL, " +
        s"PRIMARY KEY (BATCH_ID, PART_ID))")
      st.close()
    } finally conn.close()
  }

  /** Write one micro-batch exactly-once: call from foreachBatch with
    * the engine's batchId. Expects columns (id: bigint, v: bigint).
    * Idempotent under replay at BOTH granularities — whole-batch
    * re-run and single-partition task retry.
    *
    * The marker key is (batchId, partitionId), which is only sound if
    * a REPLAYED batch routes every row to the same partition id it got
    * the first time — a changed spark.sql.shuffle.partitions or a
    * nondeterministic upstream shuffle would silently drop rows that
    * land in an already-marked partition. So the write FIRST
    * repartitions on hash(id) with a FIXED partition count baked into
    * the sink (not inherited from the session): the row→partition map
    * is then a pure function of the data, stable across replays and
    * config changes. */
  def writeBatch(batch: DataFrame, batchId: Long, url: String,
                 table: String, numParts: Int = 8): Unit = {
    val stable = batch.repartition(numParts,
      org.apache.spark.sql.functions.col(batch.columns.head))
    stable.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val partId = org.apache.spark.TaskContext.getPartitionId()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        // READ COMMITTED is enough: the check-then-insert race between
        // concurrent replays is resolved by the marker PK, not by
        // isolation — the losing transaction's marker INSERT violates
        // the PK and rolls back its rows too. (Serializable would add
        // previous-key range locks on the commits btree and deadlock
        // under concurrent adjacent-key inserts.)
        conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_READ_COMMITTED)
        val check = conn.prepareStatement(
          s"SELECT 1 FROM ${table}_COMMITS WHERE BATCH_ID = ? AND PART_ID = ?")
        check.setLong(1, batchId); check.setInt(2, partId)
        val seen = { val rs = check.executeQuery(); val b = rs.next(); rs.close(); b }
        check.close()
        if (!seen) {
          val ins = conn.prepareStatement(s"INSERT INTO $table (ID, V) VALUES (?, ?)")
          // flush every 10k rows so a large partition never buffers the
          // whole JDBC batch in executor memory; atomicity is the
          // surrounding transaction's, not the batch's
          var pending = 0
          rows.foreach { r =>
            ins.setLong(1, r.getLong(0)); ins.setLong(2, r.getLong(1))
            ins.addBatch(); pending += 1
            if (pending >= 10000) { ins.executeBatch(); pending = 0 }
          }
          if (pending > 0) ins.executeBatch()
          ins.close()
          val mark = conn.prepareStatement(
            s"INSERT INTO ${table}_COMMITS (BATCH_ID, PART_ID) VALUES (?, ?)")
          mark.setLong(1, batchId); mark.setInt(2, partId)
          mark.executeUpdate(); mark.close()
          conn.commit() // rows + marker become visible atomically
        } else {
          conn.rollback() // replayed partition: already committed, skip
        }
      } catch {
        case e: Throwable =>
          // a rollback failure (dead connection) must not mask the
          // original cause — swallow it and rethrow the real error
          try conn.rollback()
          catch { case _: Throwable => () }
          throw e
      } finally conn.close()
    }
  }
}
