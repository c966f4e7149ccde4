package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration showcase (custom-operator
  * ladder path (c), SURVEY §7.2): the temporal as-of join as a custom
  * LogicalPlan node, planned by an injected SparkStrategy into a
  * dedicated physical operator — registered through
  * SparkSessionExtensions (GraftExtensions, wired in GraftSession).
  *
  * Reference semantics: `StreamExecTemporalJoin.scala` /
  * `TemporalRowTimeJoinOperator.java:71` — each left (probe) row joins
  * the latest right (versioned) row with the same key and
  * rightTs ≤ leftTs; unmatched lefts keep null right columns.
  *
  * The physical operator is a CO-PARTITIONED MERGE: EnsureRequirements
  * hash-partitions both children on the key and sorts them by
  * (key, ts) — the operator then streams both sorted iterators once
  * per partition, carrying only the latest right row (O(1) state). At
  * 100 TB this is one shuffle per side and a linear merge, the same
  * shape as a sort-merge join, with none of the union+window form's
  * full-row window materialization.
  *
  * Restrictions (showcase scope): integral join key, timestamp-typed
  * time columns (both evaluate to Long internally).
  */
object AsOfJoin {

  /** left.asOfJoin(right): each left row gets the latest right row of
    * the same key at-or-before its timestamp. `rightTie` makes the
    * choice among equal-timestamp right rows total (highest tiebreak
    * wins — the reference keeps the last version at a timestamp). */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: Column, rightKey: Column,
            leftTs: Column, rightTs: Column,
            rightTie: Option[Column] = None): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(
        GraftSqlBridge.logicalPlan(left), GraftSqlBridge.logicalPlan(right),
        GraftSqlBridge.expression(leftKey), GraftSqlBridge.expression(rightKey),
        GraftSqlBridge.expression(leftTs), GraftSqlBridge.expression(rightTs),
        rightTie.map(GraftSqlBridge.expression)))
}

/** Logical node: carries resolved child attributes; analysis treats it
  * like any binary operator (output = left ++ nullable right). */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        rightTie: Option[Expression] = None)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected via SparkSessionExtensions): maps the
  * logical node to the physical merge operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. EnsureRequirements supplies hash
  * co-partitioning on the keys and a per-partition (key, ts) sort;
  * doExecute is a single forward merge per partition. */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        rightTie: Option[Expression],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      // among equal-ts rights the merge keeps the LAST row, so an
      // ascending tiebreak makes "highest tiebreak wins" total
      rightTie.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output // right attrs nullable: the projection must null-check
    left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
      val rIt = rIt0.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var curKey = 0L
      var curRight: InternalRow = null // latest right row for curKey
      def keyOf(e: Expression, row: InternalRow): Long =
        e.eval(row).asInstanceOf[Number].longValue()
      def tsOf(e: Expression, row: InternalRow): Long =
        e.eval(row).asInstanceOf[Number].longValue()
      lIt.map { l =>
        val k = keyOf(lk, l)
        val t = tsOf(lt, l)
        // advance the right side through every row at-or-before (k, t)
        while (rIt.hasNext && {
          val hk = keyOf(rk, rIt.head)
          hk < k || (hk == k && tsOf(rt, rIt.head) <= t)
        }) {
          val r = rIt.next()
          curKey = keyOf(rk, r)
          curRight = r.copy() // iterator rows are reused buffers
        }
        val matched = curRight != null && curKey == k
        proj(joined(l, if (matched) curRight else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Session-extensions entry point: register with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectQueryStagePrepRule(_ => BroadcastShuffleElision)
  }
}
