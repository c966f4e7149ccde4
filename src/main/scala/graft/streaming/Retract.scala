package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retract/changelog composition — the agg-on-agg recipe (SURVEY §7.4
  * risk 1).
  *
  * The problem: Flink threads a changelog through every operator
  * (`BaseRow.java:29` header byte ACCUMULATE/RETRACT;
  * `StreamExecRetractionRules.scala` decides which operators must emit
  * UPDATE_BEFORE). A two-level streaming aggregate like
  *
  *   SELECT cnt, count(*) FROM
  *     (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
  *   GROUP BY cnt
  *
  * is only correct when the inner agg RETRACTS a user's old count as it
  * moves buckets (`GroupAggFunction.java:44` emits the before/after
  * pair). Structured Streaming has no row-level retraction — update
  * mode refreshes a key's row at the sink, but a downstream aggregate
  * never sees "user left bucket 1".
  *
  * The same applies one operator later: a JOIN downstream of an
  * aggregate must consume retractions too (the reference's
  * RetractableTopNFunction / StreamExecJoin in AccRetract mode), or a
  * user moving buckets is double-counted after enrichment. See
  * [[changelogThroughJoin]] — the delta rows survive a stream-static
  * join unchanged (the join only adds columns), so the downstream
  * aggregate stays exact.
  *
  * Two equivalent re-modelings, both implemented here:
  *
  * 1. EXPLICIT CHANGELOG (stateful recomposition): the inner aggregate
  *    is a flatMapGroupsWithState that emits its own before/after pair
  *    as (bucket, ±1) delta rows — an append-mode stream that IS the
  *    changelog. Any downstream consumer sums deltas per bucket
  *    (`applyChangelog`, itself a running stateful sum) and holds the
  *    correct outer aggregate at every batch. This is exactly the
  *    reference's AccRetract mode with the header byte turned into a
  *    column.
  *
  * 2. FOREACHBATCH + MERGE (materialize-then-reaggregate): the inner
  *    update-mode aggregate is upserted into an external keyed table
  *    per micro-batch (JDBC upsert here — the MERGE pattern; Delta/
  *    Iceberg MERGE INTO on a lake); the outer aggregate is an
  *    ordinary batch query over that table, correct because the table
  *    always holds exactly one current row per user.
  *
  * Scale notes: (1) keeps all state in the state store partitioned by
  * key — no external system, one extra shuffle for the delta
  * aggregation; (2) bounds streaming state to the inner agg and pays
  * one upsert round-trip per batch — right when the outer query is ad
  * hoc or served elsewhere. Both avoid the wrong-by-construction
  * naive chaining.
  */
object Retract {

  /** A changelog row: delta = +1 accumulate / -1 retract (the BaseRow
    * header as data). */
  case class Change(bucket: Long, delta: Long)

  /** A keyed changelog row — the join-ready form: the key travels with
    * the delta so downstream operators (joins, re-keyed aggregates)
    * can route it. */
  case class KeyedChange(user_id: Long, bucket: Long, delta: Long)

  /** Inner aggregate re-expressed as a changelog emitter: running
    * count of events per user; each arrival moves the user from bucket
    * `old` to bucket `new`, emitting Change(old, -1), Change(new, +1).
    * Append-mode output — downstream stateful operators may consume
    * it. */
  def countPerUserChangelog(events: Dataset[Event]): Dataset[Change] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          val old = state.getOption.getOrElse(0L)
          val now = old + rows.size
          state.update(now)
          ((if (old > 0) List(Change(old, -1L)) else Nil)
            :+ Change(now, 1L)).iterator
      }
  }

  /** Outer aggregate over a changelog: running per-bucket sum of
    * deltas = number of users currently in each bucket. Emits the
    * refreshed (bucket, n_users) row whenever it changes — itself an
    * append-mode changelog of the outer result (Spark only chains
    * multiple flatMapGroupsWithState operators when every one of them,
    * and the query, is in append mode; the newest row per bucket is
    * the current value). */
  def applyChangelog(changes: Dataset[Change]): Dataset[(Long, Long)] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state: GroupState[Long]) =>
          val now = state.getOption.getOrElse(0L) + rows.map(_.delta).sum
          state.update(now)
          Iterator((bucket, now))
      }
  }

  // ---- changelog THROUGH A JOIN (the RetractableTopNFunction /
  // join-consumes-retractions case, reference
  // `RetractableTopNFunction.java`: operators downstream of an
  // aggregate must process UPDATE_BEFORE/UPDATE_AFTER pairs) ---------

  /** Keyed form of the inner aggregate's changelog: running count of
    * events per user, emitted as (user_id, old_bucket, -1) /
    * (user_id, new_bucket, +1) pairs. Because the KEY rides along,
    * this append-mode stream can flow through joins. */
  def countPerUserKeyedChangelog(events: Dataset[Event]): Dataset[KeyedChange] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, KeyedChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[Long]) =>
          val old = state.getOption.getOrElse(0L)
          val now = old + rows.size
          state.update(now)
          ((if (old > 0) List(KeyedChange(user, old, -1L)) else Nil)
            :+ KeyedChange(user, now, 1L)).iterator
      }
  }

  /** Changelog through a join into a downstream aggregate: the inner
    * per-user aggregate feeds an enrichment join (user → dimension
    * attribute) whose output feeds an outer per-(dim, bucket) count.
    *
    * The key insight: a JOIN APPLIED TO DELTA ROWS IS ITSELF A
    * CHANGELOG — joining (user, bucket, ±1) to a dimension yields
    * (dim_value, bucket, ±1) rows whose signs still cancel correctly,
    * because the join only ADDS columns (each retraction joins to the
    * same dim row as its accumulate). The outer aggregate then sums
    * deltas per (dim_value, bucket) exactly like [[applyChangelog]].
    * This is the reference's retraction flow through
    * StreamExecJoin → StreamExecGroupAggregate re-expressed with the
    * changelog as data.
    *
    * `dim` must be a static (batch) DataFrame with columns
    * (user_id, dim_value) — stream-static joins are stateless, so
    * deltas pass through unmodified. For a CHANGING dimension — both
    * inputs changelogs — use [[deltaJoin]], the bilateral-state form
    * (Flink's StreamExecJoin in AccRetract mode), or the
    * foreachBatch+MERGE pattern below (materialize the inner result,
    * re-join per batch).
    *
    * Emits (dim_value, bucket, n_users) refreshes; the newest row per
    * (dim_value, bucket) is the current outer aggregate. */
  def changelogThroughJoin(events: Dataset[Event],
                           dim: DataFrame): Dataset[(String, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val deltas = countPerUserKeyedChangelog(events)
    val joined = deltas.join(
        org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "inner")
      .select(org.apache.spark.sql.functions.col("dim_value").cast("string"),
        org.apache.spark.sql.functions.col("bucket"),
        org.apache.spark.sql.functions.col("delta"))
      .as[(String, Long, Long)]
    joined
      .groupByKey { case (dv, bucket, _) => (dv, bucket) }
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((dv, bucket), rows, state: GroupState[Long]) =>
          val now = state.getOption.getOrElse(0L) + rows.map(_._3).sum
          state.update(now)
          Iterator((dv, bucket, now))
      }
  }

  // ---- delta × delta changelog JOIN (bilateral state) ---------------

  /** One side's changelog row for [[deltaJoin]]: `leftSide` tags the
    * input, `delta` = ±n asserts/retracts n copies of `value` under
    * `key`. */
  case class SideDelta(key: Long, leftSide: Boolean, value: Long, delta: Long)

  /** A join-result changelog row: the (left, right) pairing under
    * `key` changed multiplicity by `delta`. */
  case class JoinDelta(key: Long, left: Long, right: Long, delta: Long)

  /** BILATERAL delta×delta equi-join — both inputs are changelogs and
    * the output is the changelog of the join result (the case
    * [[changelogThroughJoin]]'s stream-static form cannot cover; the
    * reference's StreamExecJoin in AccRetract mode keeps exactly this
    * state: per key, each side's live rows, `StreamingJoinOperator`
    * matching ± records against the opposite side's state).
    *
    * Both tagged inputs union into ONE keyed stateful op; state per
    * key is the pair of value→count multisets. Batch deltas are
    * NETTED per (side, value) first, so application is
    * order-independent within a batch (the same contract
    * [[retractableTopN]] keeps); the emitted join deltas are computed
    * set-theoretically —
    *   Δjoin(l,r) = newL(l)·newR(r) − oldL(l)·oldR(r)
    * over the touched pairs — which equals dL×oldR + oldL×dR + dL×dR
    * and never enumerates unchanged pairs. A retraction overtaking
    * its accumulate across batches nets a NEGATIVE count in state and
    * self-corrects when the accumulate lands (the reference tolerates
    * the same transient via its record counters).
    *
    * Scale: state is bounded by live rows per join key (identical to
    * any stream-stream join); emission is O(changed × opposite-side
    * live), the join's true output delta. */
  def deltaJoin(changes: Dataset[SideDelta]): Dataset[JoinDelta] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Map[Long, Long], Map[Long, Long]), JoinDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Map[Long, Long], Map[Long, Long])]) =>
          val (oldL, oldR) = state.getOption
            .getOrElse((Map.empty[Long, Long], Map.empty[Long, Long]))
          val rs = rows.toSeq
          def netOf(side: Boolean) = rs.filter(_.leftSide == side)
            .groupBy(_.value).view.mapValues(_.map(_.delta).sum)
            .filter(_._2 != 0L).toMap
          val dL = netOf(true); val dR = netOf(false)
          def applied(m: Map[Long, Long], d: Map[Long, Long]) =
            d.foldLeft(m) { case (acc, (v, c)) =>
              val n = acc.getOrElse(v, 0L) + c
              if (n == 0L) acc - v else acc.updated(v, n)
            }
          val newL = applied(oldL, dL); val newR = applied(oldR, dR)
          val touched: Set[(Long, Long)] =
            (for { l <- dL.keySet; r <- oldR.keySet ++ newR.keySet }
              yield (l, r)) ++
            (for { l <- oldL.keySet ++ newL.keySet; r <- dR.keySet }
              yield (l, r))
          val out = touched.iterator.map { case (l, r) =>
            JoinDelta(key, l, r,
              newL.getOrElse(l, 0L) * newR.getOrElse(r, 0L) -
                oldL.getOrElse(l, 0L) * oldR.getOrElse(r, 0L))
          }.filter(_.delta != 0L).toList
          state.update((newL, newR))
          out.iterator
      }
  }

  // ---- changelog INTO A TOP-N (RetractableTopNFunction itself) ------

  /** One refreshed rank row: the current occupant of `rank` within
    * `pkey`'s top-N (newest emission per (pkey, rank) is current).
    * `id == TombstoneId` means the rank is now VACANT — the changelog
    * delete record for a row leaving the top-N without a successor
    * (the reference RetractableTopNFunction emits explicit
    * DELETE/retract rows in this case). */
  case class RankedRow(pkey: String, rank: Int, id: Long, value: Long)

  /** Sentinel occupant for a vacated rank (real ids are nonnegative
    * throughout the catalog). */
  val TombstoneId: Long = -1L

  /** Retractable Top-N (reference `RetractableTopNFunction.java`: a
    * rank operator downstream of an aggregate must CONSUME
    * retractions — on UPDATE_BEFORE it removes the old row, possibly
    * promoting a previously-overtaken row back into the top-N; naive
    * insert-only ranking can never demote).
    *
    * Input: changelog rows (pkey, id, value, delta) — delta +1 asserts
    * "id currently holds value", -1 retracts a previously asserted
    * (id, value). State per pkey: the full id → value map (the
    * reference's data-state SortedMap, same unbounded-below caveat —
    * every live id must be retained because ANY of them can re-enter
    * the top-N after a retraction).
    *
    * Delta application is ORDER-INDEPENDENT within a batch: deltas are
    * netted per (id, value) first, net-negative entries remove the
    * id's current value if it matches, net-positive entries set it.
    * A shuffled (old,-1)/(new,+1) pair therefore lands identically
    * regardless of arrival order — the changelog contract survives the
    * exchange between operators, which is what lets this chain behind
    * [[countPerUserKeyedChangelog]] without ordering assumptions.
    *
    * Emits the refreshed top-N of every touched pkey each batch,
    * ranked by value desc (ties → smaller id, deterministic). When a
    * batch's net retractions SHRINK the top-N (a deletion with no
    * replacing assert), the vacated ranks are emitted as
    * [[TombstoneId]] rows — without them the "newest emission per
    * (pkey, rank) is current" contract would leave a stale occupant
    * (the reference emits explicit retract records for rows leaving
    * the top-N). State carries the previously emitted rank count so
    * only genuinely vacated ranks get tombstones. */
  def retractableTopN(changes: Dataset[(String, Long, Long, Long)],
                      n: Int): Dataset[RankedRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Map[Long, Long], Int), RankedRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (pkey, rows, state: GroupState[(Map[Long, Long], Int)]) =>
          var (cur, lastEmitted) =
            state.getOption.getOrElse((Map.empty[Long, Long], 0))
          rows.toSeq.groupBy(_._2).foreach { case (id, rs) =>
            val net = rs.groupBy(_._3).view
              .mapValues(_.map(_._4).sum).toMap
            net.foreach { case (value, d) =>
              if (d < 0 && cur.get(id).contains(value)) cur -= id
            }
            net.foreach { case (value, d) => if (d > 0) cur += id -> value }
          }
          val top = cur.toSeq.sortBy { case (id, v) => (-v, id) }.take(n)
          state.update((cur, top.size))
          val ranked = top.zipWithIndex.map { case ((id, v), i) =>
            RankedRow(pkey, i + 1, id, v)
          }
          val tombstones = (top.size + 1 to lastEmitted)
            .map(r => RankedRow(pkey, r, TombstoneId, 0L))
          (ranked ++ tombstones).iterator
      }
  }

  /** The full reference flow StreamExecGroupAggregate →
    * StreamExecRank in AccRetract mode: per-user event counts as a
    * keyed changelog feeding the retractable Top-N ("most active
    * users"). A user overtaking another DEMOTES them — visible only
    * because the rank operator consumed the retraction. */
  def topUsersByCount(events: Dataset[Event], n: Int): Dataset[RankedRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    retractableTopN(
      countPerUserKeyedChangelog(events)
        .map(c => ("all", c.user_id, c.bucket, c.delta)), n)
  }

  // ---- pattern 2: foreachBatch + MERGE ------------------------------

  /** Create the keyed inner-result table (idempotent). */
  def initUserCountTable(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        "CREATE TABLE USER_COUNTS (USER_ID BIGINT PRIMARY KEY, CNT BIGINT)")
      catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }
      st.close()
    } finally conn.close()
  }

  /** Per-batch upsert of the refreshed inner-agg rows (the MERGE
    * pattern: UPDATE the user's current row, INSERT if absent — one
    * current row per key afterwards). Runs inside foreachBatch. */
  def upsertUserCounts(batch: DataFrame, url: String): Unit = {
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val up = conn.prepareStatement(
          "UPDATE USER_COUNTS SET CNT = ? WHERE USER_ID = ?")
        val ins = conn.prepareStatement(
          "INSERT INTO USER_COUNTS (USER_ID, CNT) VALUES (?, ?)")
        rows.foreach { r =>
          val user = r.getAs[Number]("user_id").longValue()
          val cnt = r.getAs[Number]("cnt").longValue()
          up.setLong(1, cnt); up.setLong(2, user)
          if (up.executeUpdate() == 0) {
            ins.setLong(1, user); ins.setLong(2, cnt); ins.executeUpdate()
          }
        }
        conn.commit(); up.close(); ins.close()
      } finally conn.close()
    }
  }

  /** The outer aggregate as a plain batch query over the materialized
    * inner result: users per count-bucket. Run after any batch —
    * always consistent because USER_COUNTS has one row per user. */
  def bucketCountsFromTable(spark: org.apache.spark.sql.SparkSession,
                            url: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "USER_COUNTS").load()
      .groupBy(col("CNT").as("bucket"))
      .agg(count(lit(1)).as("n_users"))
  }
}
