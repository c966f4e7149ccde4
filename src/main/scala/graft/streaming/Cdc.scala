package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC changelog-format ingestion: a Debezium-style JSON envelope
  * (`op` c/u/d + `before`/`after` images + source position) parsed into
  * typed changelog rows and materialized into current table state —
  * the reference's changelog-source story (its JSON debezium/canal
  * format decoders feeding retract streams; see
  * flink-formats/flink-json for the format family and the Retract
  * pipeline here for the downstream semantics).
  *
  * Spark-first shape: the wire is a STRING column; `from_json` with an
  * explicit envelope schema does the decode (codegen'd, no UDF);
  * materialization is last-writer-wins per key ordered by (source ts,
  * source position) with delete tombstones dropping the key — a window
  * rank in batch, a per-micro-batch MERGE upsert in streaming (the
  * foreachBatch pattern of Retract.upsertUserCounts). At 100 TB the
  * changelog shuffles once on the primary key; state per key is one
  * row.
  */
object Cdc {

  /** Envelope payload schema: op, exact source timestamp (µs — keeps
    * ordering exact where debezium's ts_ms would tie), a monotone
    * source position for same-timestamp ties, and row images. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_us", LongType),
    StructField("pos", LongType),
    StructField("before", StructType(Seq(
      StructField("user_id", LongType)))),
    StructField("after", StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("k", LongType))))))

  /** Encode the events table as a CDC wire stream: signup → insert,
    * click/view/purchase → update, error → delete (tombstone with only
    * the before-image key, the debezium delete shape). Keeps `ts` next
    * to the JSON so replay harnesses can chunk on event time. */
  def envelope(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val after = when(op =!= "d", struct(
      col("user_id"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("k")))
    val before = when(op === "d", struct(col("user_id")))
    // event_id rides NEXT TO the json (never inside the decode path):
    // replay harnesses chunk on it when they want deliberately
    // NON-time-ordered micro-batches (q320's out-of-order repair row)
    events.select(col("ts"), col("event_id"),
      to_json(struct(
        op.as("op"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("pos"),
        before.as("before"),
        after.as("after"))).as("json"))
  }

  /** Decode the wire: one from_json + key coalesced across images
    * (deletes carry it in `before`). Pure projection — streaming-legal
    * and scan-speed. */
  def parse(wire: DataFrame, jsonCol: Column): DataFrame =
    wire.select(from_json(jsonCol, envelopeSchema).as("e"))
      .select(col("e.op").as("op"), col("e.ts_us").as("ts_us"),
        col("e.pos").as("pos"),
        coalesce(col("e.after.user_id"), col("e.before.user_id"))
          .as("user_id"),
        col("e.after.value").as("value"), col("e.after.k").as("k"))

  /** Generation-2 envelope schema: the source ALTERed a column onto
    * the table mid-stream (Debezium emits the widened `after` image
    * from then on). One permissive schema decodes BOTH generations —
    * from_json leaves the absent field null on v1 rows, the same
    * all-generations read discipline the Avro connector applies
    * (AvroDataSource's widened-schema read, q248). */
  val envelopeSchemaV2: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_us", LongType),
    StructField("pos", LongType),
    StructField("before", StructType(Seq(
      StructField("user_id", LongType)))),
    StructField("after", StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType),
      StructField("k", LongType),
      StructField("seg", StringType))))))

  /** Encode post-evolution events as v2 envelopes: the after-image
    * carries the new `seg` column. */
  def envelopeV2(events: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val after = when(op =!= "d", struct(
      col("user_id"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      upper(col("event_type")).as("seg")))
    val before = when(op === "d", struct(col("user_id")))
    events.select(col("ts"), col("event_id"),
      to_json(struct(
        op.as("op"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("pos"),
        before.as("before"),
        after.as("after"))).as("json"))
  }

  /** Decode a MIXED-generation wire under the v2 schema: v1 rows get
    * seg = null, v2 rows their encoded value. */
  def parseV2(wire: DataFrame, jsonCol: Column): DataFrame =
    wire.select(from_json(jsonCol, envelopeSchemaV2).as("e"))
      .select(col("e.op").as("op"), col("e.ts_us").as("ts_us"),
        col("e.pos").as("pos"),
        coalesce(col("e.after.user_id"), col("e.before.user_id"))
          .as("user_id"),
        col("e.after.value").as("value"), col("e.after.k").as("k"),
        col("e.after.seg").as("seg"))

  /** Batch materialization: last op per key by (ts_us, pos), delete
    * tombstones drop the key. One shuffle on the key. */
  def materialize(changelog: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("pos").desc)
    changelog.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") =!= "d")
      .drop("__rn")
  }

  /** Keyed current-state table for the streaming MERGE path
    * (idempotent create). Deletes are RETAINED as tombstone rows
    * (DELETED = 1, null images): physically removing the row would
    * erase the key's version watermark, and a late-arriving older
    * update could then resurrect a deleted key — the classic CDC
    * anti-pattern. Production compacts tombstones after a retention
    * window; readers filter DELETED = 0. */
  def initStateTable(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        "CREATE TABLE CDC_STATE (USER_ID BIGINT PRIMARY KEY, " +
          "VAL DOUBLE, K BIGINT, TS_US BIGINT, POS BIGINT, " +
          "DELETED SMALLINT NOT NULL)")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      st.close()
    } finally conn.close()
  }

  /** SCD2 history table for the streaming maintenance path (q317):
    * one row per key VERSION, half-open validity intervals; the open
    * version has VALID_TO_US NULL. Tombstones are versions like any
    * other (they close the prior interval and stay open until
    * superseded) — exactly the batch SCD2 (q311) shape. */
  def initScd2Table(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        "CREATE TABLE SCD2_HIST (USER_ID BIGINT, VALID_FROM_US BIGINT, " +
          "POS BIGINT, OP CHAR(1), VAL DOUBLE, K BIGINT, " +
          "VALID_TO_US BIGINT, " +
          "PRIMARY KEY (USER_ID, VALID_FROM_US, POS))")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      st.close()
    } finally conn.close()
  }

  /** One SCD2 version as the JDBC writer sees it. */
  private case class Ver(ts: Long, pos: Long, op: String,
                         value: Option[Double], k: Option[Long])

  /** Per-micro-batch SCD2 maintenance (foreachBatch): every incoming
    * version closes the key's open interval and becomes the new open
    * version. The batch is repartitioned by key and sorted by
    * (key, ts_us, pos), so each partition applies its keys' versions
    * in ORDER with no cross-writer races, and each key's in-batch run
    * is buffered (bounded per-key work) so intermediate versions get
    * their VALID_TO_US at INSERT time from the run lookahead.
    *
    * Order safety (r11, the reference's
    * TemporalRowTimeJoinOperator.java:71 buffered-late-row case):
    *  - the per-key guard is the NEWEST stored version — open or
    *    closed — not just the open row, so a crash-replay that landed
    *    mid-key (chunk committed after the lookahead pre-stamped the
    *    newest row's VALID_TO_US) resumes exactly: replayed rows
    *    at-or-before the guard are skipped, the first genuinely newer
    *    row needs no close (its predecessor was pre-stamped with this
    *    row's own ts), and the stream never dies on a duplicate key —
    *    the r10 ADVICE hole;
    *  - a stale row that is NOT already stored (a genuinely
    *    out-of-order version, e.g. shuffled CDC source partitions) is
    *    a REPAIR: the key's full history is read back, the late
    *    versions spliced in, every interval bound recomputed, and the
    *    key's rows rewritten in one transaction — bounded per-key
    *    work, exercised by q320's deliberately non-time-ordered
    *    replay.
    * Fast-path writes are addBatch/executeBatch with chunked commits
    * (the q303 batching discipline); rebuilds commit per key. */
  def scd2Batch(batch: DataFrame, url: String): Unit = {
    batch.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("pos"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val selNewest = conn.prepareStatement(
            "SELECT VALID_FROM_US, POS, VALID_TO_US FROM SCD2_HIST " +
              "WHERE USER_ID = ? ORDER BY VALID_FROM_US DESC, POS DESC " +
              "FETCH FIRST 1 ROWS ONLY")
          val selPk = conn.prepareStatement(
            "SELECT 1 FROM SCD2_HIST WHERE USER_ID = ? " +
              "AND VALID_FROM_US = ? AND POS = ?")
          val selAll = conn.prepareStatement(
            "SELECT VALID_FROM_US, POS, OP, VAL, K FROM SCD2_HIST " +
              "WHERE USER_ID = ? ORDER BY VALID_FROM_US, POS")
          val delKey = conn.prepareStatement(
            "DELETE FROM SCD2_HIST WHERE USER_ID = ?")
          val close = conn.prepareStatement(
            "UPDATE SCD2_HIST SET VALID_TO_US = ? WHERE USER_ID = ? " +
              "AND VALID_FROM_US = ? AND POS = ? AND VALID_TO_US IS NULL")
          val ins = conn.prepareStatement(
            "INSERT INTO SCD2_HIST (USER_ID, VALID_FROM_US, POS, OP, " +
              "VAL, K, VALID_TO_US) VALUES (?, ?, ?, ?, ?, ?, ?)")
          var pending = 0

          def addInsert(key: Long, v: Ver, validTo: Option[Long]): Unit = {
            ins.setLong(1, key); ins.setLong(2, v.ts); ins.setLong(3, v.pos)
            ins.setString(4, v.op)
            v.value match {
              case Some(d) => ins.setDouble(5, d)
              case None => ins.setNull(5, java.sql.Types.DOUBLE)
            }
            v.k match {
              case Some(l) => ins.setLong(6, l)
              case None => ins.setNull(6, java.sql.Types.BIGINT)
            }
            validTo match {
              case Some(t) => ins.setLong(7, t)
              case None => ins.setNull(7, java.sql.Types.BIGINT)
            }
            ins.addBatch()
          }

          /** Insert `fresh` (all strictly newer than the stored
            * newest) with run-lookahead bounds; close the stored open
            * row if there is one. A stored newest that is CLOSED
            * needs no close — its bound was pre-stamped by the
            * lookahead before the crash that replayed us here. */
          def fastPath(key: Long, fresh: Seq[Ver],
                       newest: Option[(Long, Long, Boolean)]): Unit = {
            if (fresh.isEmpty) return
            newest.foreach { case (nf, np, isOpen) =>
              if (isOpen) {
                close.setLong(1, fresh.head.ts); close.setLong(2, key)
                close.setLong(3, nf); close.setLong(4, np)
                close.addBatch()
              }
            }
            fresh.zipWithIndex.foreach { case (v, i) =>
              val validTo =
                if (i + 1 < fresh.size) Some(fresh(i + 1).ts) else None
              addInsert(key, v, validTo)
              pending += 1
            }
            if (pending >= 1024) {
              close.executeBatch(); ins.executeBatch(); conn.commit()
              pending = 0
            }
          }

          /** Out-of-order repair: splice the run into the key's full
            * stored history, recompute every interval bound, rewrite
            * the key in one transaction. */
          def rebuild(key: Long, run: Seq[Ver]): Unit = {
            // flush fast-path work first so the rebuild transaction
            // is self-contained
            close.executeBatch(); ins.executeBatch()
            pending = 0
            selAll.setLong(1, key)
            val rs = selAll.executeQuery()
            val stored = scala.collection.mutable.ArrayBuffer.empty[Ver]
            while (rs.next()) {
              val vf = rs.getLong(1); val p = rs.getLong(2)
              val op = rs.getString(3)
              val d = rs.getDouble(4)
              val value = if (rs.wasNull()) None else Some(d)
              val kk = rs.getLong(5)
              val k = if (rs.wasNull()) None else Some(kk)
              stored += Ver(vf, p, op, value, k)
            }
            rs.close()
            val merged = (stored ++ run)
              .groupBy(v => (v.ts, v.pos)).map(_._2.head).toSeq
              .sortBy(v => (v.ts, v.pos))
            delKey.setLong(1, key); delKey.executeUpdate()
            merged.zipWithIndex.foreach { case (v, i) =>
              addInsert(key, v,
                if (i + 1 < merged.size) Some(merged(i + 1).ts) else None)
            }
            ins.executeBatch()
            conn.commit()
          }

          // iterate the partition as bounded per-key runs
          val it = rows.buffered
          while (it.hasNext) {
            val key = it.head.getAs[Number]("user_id").longValue()
            val run = scala.collection.mutable.ArrayBuffer.empty[Ver]
            while (it.hasNext &&
                   it.head.getAs[Number]("user_id").longValue() == key) {
              val r = it.next()
              val value =
                if (r.isNullAt(r.fieldIndex("value"))) None
                else Some(r.getAs[Number]("value").doubleValue())
              val k =
                if (r.isNullAt(r.fieldIndex("k"))) None
                else Some(r.getAs[Number]("k").longValue())
              run += Ver(r.getAs[Number]("ts_us").longValue(),
                r.getAs[Number]("pos").longValue(),
                r.getAs[String]("op"), value, k)
            }
            selNewest.setLong(1, key)
            val nrs = selNewest.executeQuery()
            val newest =
              if (nrs.next()) {
                val vf = nrs.getLong(1); val p = nrs.getLong(2)
                nrs.getLong(3)
                Some((vf, p, nrs.wasNull())) // wasNull ⇒ still open
              } else None
            nrs.close()
            newest match {
              case None => fastPath(key, run.toSeq, None)
              case Some((nf, np, _)) =>
                val (fresh, stale) = run.toSeq.partition(v =>
                  v.ts > nf || (v.ts == nf && v.pos > np))
                if (stale.isEmpty) fastPath(key, fresh, newest)
                else {
                  // replayed duplicates are already stored (PK hit);
                  // anything else is genuine out-of-order data
                  val late = stale.filterNot { v =>
                    selPk.setLong(1, key); selPk.setLong(2, v.ts)
                    selPk.setLong(3, v.pos)
                    val prs = selPk.executeQuery()
                    val hit = prs.next(); prs.close(); hit
                  }
                  if (late.isEmpty) fastPath(key, fresh, newest)
                  else rebuild(key, run.toSeq)
                }
            }
          }
          if (pending > 0) {
            close.executeBatch(); ins.executeBatch()
          }
          // ALWAYS commit: under autoCommit=false even the pure-read
          // guard lookups of a fully-replayed (no-op) partition open a
          // transaction, and Derby refuses to close mid-transaction
          conn.commit()
          Seq(selNewest, selPk, selAll, delKey, close, ins).foreach(_.close())
        } finally conn.close()
      }
    }
  }

  /** Tombstone compaction — the production retention step the
    * DELETED-marker design defers to (see [[initStateTable]]):
    * physically drop tombstones whose version is older than the
    * WATERMARK, i.e. older than anything the source can still
    * deliver. Safe by the version algebra: dropping a tombstone only
    * matters if an op for that key arrives later — an op NEWER than
    * the tombstone re-inserts correctly (a genuine resurrection), and
    * an op OLDER than it can no longer arrive once the replay horizon
    * has passed the watermark. Run per micro-batch with
    * watermark = the batch's minimum event time (an event-time-ordered
    * source can never later deliver anything older); q326 binds the
    * full loop. Returns the number of tombstones dropped. */
  def compactTombstones(url: String, watermarkUs: Long): Int = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        "DELETE FROM CDC_STATE WHERE DELETED = 1 AND TS_US < ?")
      try {
        st.setLong(1, watermarkUs)
        val n = st.executeUpdate()
        if (!conn.getAutoCommit) conn.commit()
        n
      } finally st.close()
    } finally conn.close()
  }

  /** Per-micro-batch CDC MERGE (runs inside foreachBatch): apply an op
    * only if its (ts_us, pos) is newer than the stored version — c/u
    * upsert the after-image, tombstones upsert a DELETED marker. The
    * version guard makes the merge idempotent under micro-batch
    * replay (at-least-once → effectively-once state) AND order-safe
    * for late data (an op older than the stored version — deleted or
    * not — is refused).
    *
    * BATCHED JDBC (not row-at-a-time): the caller reduces the
    * micro-batch to last-op-per-key first (the q302 window), which
    * also hash-partitions it by user_id — each partition owns its
    * keys exclusively, so partitions write disjoint key sets in
    * parallel. Per 1024-key chunk, UPDATE-FIRST merge semantics:
    *  1. one `executeBatch` of version-guarded UPDATEs (the
    *     (ts_us, pos) predicate rides the WHERE clause — the
    *     MERGE-with-version-predicate shape, so a replayed task
    *     attempt can never regress a newer stored version);
    *  2. rows whose update count is 0 are either absent or
    *     stored-newer: a primary-key POINT lookup per miss
    *     distinguishes them (index lookups only — a set-oriented
    *     IN-list probe here plans as a table scan whose read locks
    *     drag across other writers' uncommitted rows and deadlocks
    *     the embedded store; measured, not theory);
    *  3. one `executeBatch` of INSERTs for the absent keys.
    * In steady state almost every row is an update → ~2 batch calls
    * per 1024 rows; the first batch is inserts → point lookups once.
    * Commit per chunk (short transactions, bounded lock footprint,
    * log-fsync amortized 1024×); chunks sort ascending by key so
    * concurrent writers acquire page locks monotonically. Deadlock
    * victims roll back and replay the chunk — safe, every write is
    * version-guarded. */
  def mergeBatch(batch: DataFrame, url: String): Unit = {
    val chunk = 1024
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(
            "INSERT INTO CDC_STATE (USER_ID, VAL, K, TS_US, POS, DELETED) " +
              "VALUES (?, ?, ?, ?, ?, ?)")
          val upd = conn.prepareStatement(
            "UPDATE CDC_STATE SET VAL = ?, K = ?, TS_US = ?, POS = ?, " +
              "DELETED = ? WHERE USER_ID = ? " +
              "AND (TS_US < ? OR (TS_US = ? AND POS < ?))")
          val sel = conn.prepareStatement(
            "SELECT 1 FROM CDC_STATE WHERE USER_ID = ?")
          def imageParams(st: java.sql.PreparedStatement, i: Int,
                          r: org.apache.spark.sql.Row, dead: Boolean,
                          ts: Long, pos: Long): Unit = {
            if (dead) {
              st.setNull(i + 1, java.sql.Types.DOUBLE)
              st.setNull(i + 2, java.sql.Types.BIGINT)
            } else {
              st.setDouble(i + 1, r.getAs[Number]("value").doubleValue())
              st.setLong(i + 2, r.getAs[Number]("k").longValue())
            }
            st.setLong(i + 3, ts); st.setLong(i + 4, pos)
            st.setShort(i + 5, if (dead) 1 else 0)
          }
          rows.grouped(chunk).foreach { grpUnsorted =>
            val grp = grpUnsorted
              .sortBy(_.getAs[Number]("user_id").longValue())
            var attempt = 0
            var done = false
            while (!done) {
              try {
                // phase 1: guarded UPDATE for every row
                // (params: val, k, ts, pos, deleted, key, ts, ts, pos)
                grp.foreach { r =>
                  val key = r.getAs[Number]("user_id").longValue()
                  val ts = r.getAs[Number]("ts_us").longValue()
                  val pos = r.getAs[Number]("pos").longValue()
                  imageParams(upd, 0, r, r.getAs[String]("op") == "d", ts, pos)
                  upd.setLong(6, key)
                  upd.setLong(7, ts); upd.setLong(8, ts); upd.setLong(9, pos)
                  upd.addBatch()
                }
                val counts = upd.executeBatch()
                // phases 2+3: distinguish each miss (absent vs
                // stored-newer) by PK point lookup; INSERT the absent
                var nIns = 0
                grp.zip(counts.toIndexedSeq).foreach { case (r, c) =>
                  if (c == 0) {
                    val key = r.getAs[Number]("user_id").longValue()
                    sel.setLong(1, key)
                    val rs = sel.executeQuery()
                    val exists = rs.next(); rs.close()
                    if (!exists) {
                      val ts = r.getAs[Number]("ts_us").longValue()
                      val pos = r.getAs[Number]("pos").longValue()
                      ins.setLong(1, key)
                      imageParams(ins, 1, r, r.getAs[String]("op") == "d", ts, pos)
                      ins.addBatch()
                      nIns += 1
                    }
                  }
                }
                if (nIns > 0) ins.executeBatch()
                conn.commit()
                done = true
              } catch {
                // deadlock victim: roll back, clear the half-built
                // batches, replay the chunk (version guards make the
                // replay a no-op where it already applied)
                case _: java.sql.SQLTransactionRollbackException
                    if attempt < 6 =>
                  conn.rollback()
                  upd.clearBatch(); ins.clearBatch()
                  attempt += 1
                  Thread.sleep(25L << attempt)
              }
            }
          }
          sel.close(); ins.close(); upd.close()
        } finally conn.close()
      }
    }
  }
}
