package graft.plans

import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Physical-plan rule: elide a round-robin shuffle feeding a
  * broadcast.
  *
  * `Tables.load` round-robin-repartitions work-heavy single-file
  * tables so per-row work parallelizes past the one-task scan (a
  * local-testdata artifact; multi-file tables self-disable it). When
  * that table ends up on the BUILD side of a broadcast join — by
  * explicit hint or by size estimation — the repartition is pure
  * waste: the rows are about to be collected to the driver and
  * broadcast anyway, so the plan carries an Exchange directly under a
  * BroadcastExchange, a full local shuffle bought for nothing (the
  * round-4 review's q107 finding).
  *
  * The load site cannot know its consumer and the logical optimizer
  * cannot see size-estimated broadcast decisions, so the elision runs
  * as a query-stage preparation rule on the PHYSICAL plan, where
  * every broadcast — hinted or estimated — is a BroadcastExchangeExec.
  *
  * It ONLY splices a round-robin shuffle off the DIRECT spine between
  * the broadcast and the scan — Project/Filter links whose per-row
  * work is on the order of the shuffle's own serialization cost.
  * A round-robin below an aggregate/join inside the broadcast subtree
  * is load-bearing (it parallelizes heavy per-row work feeding that
  * aggregate past the one-task single-file scan) and must stay: the
  * first cut of this rule stripped those too and benched q76/q108 at
  * 2-2.5× slower — the aggregate's shingling work collapsed onto one
  * task. Round-robin only moves rows and broadcast imposes no
  * distribution requirement, so a spine splice never changes results.
  *
  * Registered in [[GraftExtensions]] via injectQueryStagePrepRule.
  */
object BroadcastShuffleElision extends Rule[SparkPlan] {

  /** Splice round-robin shuffles out of a Project/Filter spine;
    * anything else ends the spine untouched. */
  private def spliceSpine(p: SparkPlan): SparkPlan = p match {
    case s: ShuffleExchangeExec
        if s.outputPartitioning.isInstanceOf[RoundRobinPartitioning] =>
      spliceSpine(s.child)
    case pr: ProjectExec =>
      val c = spliceSpine(pr.child)
      if (c eq pr.child) pr else pr.copy(child = c)
    case f: FilterExec =>
      val c = spliceSpine(f.child)
      if (c eq f.child) f else f.copy(child = c)
    case other => other
  }

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case b: BroadcastExchangeExec =>
      val stripped = spliceSpine(b.child)
      if (stripped eq b.child) b else b.copy(child = stripped)
  }
}
