package graft.plans

import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.BaseJoinExec

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
  * every broadcast — hinted or estimated — is a BroadcastExchangeExec:
  * inside its subtree, any round-robin ShuffleExchange whose input is
  * a pure scan pipeline (no other exchange, join, or aggregate below
  * — i.e., exactly the Tables.load shape) is replaced by its child.
  * Round-robin only moves rows and broadcast imposes no distribution
  * requirement on its child, so the rewrite never changes results;
  * repartitions above real computation are left alone, since their
  * parallelism may be load-bearing for that computation.
  *
  * Registered in [[GraftExtensions]] via injectQueryStagePrepRule.
  */
object BroadcastShuffleElision extends Rule[SparkPlan] {

  private def pureScanPipeline(p: SparkPlan): Boolean =
    p.collectFirst {
      case e: ShuffleExchangeLike => e
      case j: BaseJoinExec        => j
      case a: BaseAggregateExec   => a
    }.isEmpty

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case b: BroadcastExchangeExec =>
      val stripped = b.child.transformUp {
        case s: ShuffleExchangeExec
            if s.outputPartitioning.isInstanceOf[RoundRobinPartitioning] &&
              pureScanPipeline(s.child) =>
          s.child
      }
      if (stripped eq b.child) b else b.copy(child = stripped)
  }
}
