package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic vertex-centric iteration — the user surface of the
  * reference's Pregel/Spargel stack (`flink-gelly/.../pregel/
  * VertexCentricIteration.java`, ComputeFunction.compute(vertex,
  * messages) + scatter/gather `spargel/ScatterGatherIteration.java`),
  * previously covered only by the ten finished library algorithms: a
  * NEW graph algorithm meant hand-writing the superstep joins. Now it
  * is three Column expressions on top of [[Iterate.delta]].
  *
  * The program contract per superstep (the reference's semantics):
  *  - only ACTIVE vertices (last superstep's changed set = the delta
  *    workset) SCATTER: each out-edge of an active vertex evaluates
  *    `sendMsg` over the edge row joined with the source's value
  *    (visible as column `src_<valueCol>`); null = no message.
  *  - messages GATHER per destination with `mergeMsg` (an aggregate
  *    over the `msg` column — the reference's MessageCombiner).
  *  - each vertex WITH an inbox runs `vprog(currentValue, mergedMsg)`;
  *    a vertex whose value is unchanged halts (leaves the workset),
  *    exactly the vote-to-halt model. No inbox → not recomputed.
  *  - termination: empty workset or `maxIter` supersteps.
  *
  * Everything is Catalyst Column expressions, never lambdas: each
  * superstep is one join + one aggregate + one join, fully codegen'd
  * and AQE-planned, with [[Iterate.delta]] supplying the lineage-cut
  * loop and workset-sized supersteps. At 100 TB the per-superstep
  * shuffle is O(frontier), not O(graph) — the delta-iteration shape
  * the reference runs these programs on.
  *
  * Directed: messages flow src→dst along `edges` rows as given; pass
  * a pre-unioned bidirectional edge frame for undirected programs
  * (what the library algorithms do). Multi-valued vertices: pack the
  * state into one struct column.
  */
object Pregel {

  /** Run a vertex program to convergence (empty workset) or `maxIter`.
    *
    * @param vertices      (id, `valueCol`, …) — the initial solution set
    * @param edges         (src, dst, …edge attrs) — sendMsg sees these
    * @param valueCol      the vertex state column
    * @param maxIter       superstep cap
    * @param initialActive which vertices scatter in superstep 0
    * @param sendMsg       expr over edge attrs + `src_<valueCol>`; null = no message
    * @param mergeMsg      aggregate expr over the gathered `msg` column
    * @param vprog         (currentValue, mergedMsg) → new value
    */
  def delta(vertices: DataFrame, edges: DataFrame, valueCol: String,
            maxIter: Int, initialActive: Column = lit(true))(
           sendMsg: Column,
           mergeMsg: Column => Column,
           vprog: (Column, Column) => Column): DataFrame = {
    require(vertices.columns.toSeq.sorted == Seq("id", valueCol).sorted,
      s"vertices must be exactly (id, $valueCol) — pack richer state into a struct")
    val ws0 = vertices.filter(initialActive)
    Iterate.delta(vertices, ws0, Seq("id"), maxIter) { (solution, workset) =>
      val scattered = edges
        .join(workset.select(col("id").as("src"),
          col(valueCol).as(s"src_$valueCol")), "src")
        .select(col("dst").as("id"), sendMsg.as("msg"))
        .filter(col("msg").isNotNull)
      val inbox = scattered.groupBy(col("id"))
        .agg(mergeMsg(col("msg")).as("__merged"))
      val delta = inbox.join(solution, "id")
        .select(col("id"), col(valueCol).as("__old"),
          vprog(col(valueCol), col("__merged")).as(valueCol))
        .filter(!(col(valueCol) <=> col("__old")))
        .select(col("id"), col(valueCol))
      (delta, delta)
    }
  }
}

/** The reference's SECOND iteration surface — scatter-gather
  * (`flink-gelly/.../spargel/ScatterGatherIteration.java:76`:
  * `ScatterFunction.sendMessages` over a vertex's out-edges +
  * `GatherFunction.updateVertex(vertex, MessageIterator)`). Spargel's
  * dataflow is the same push model [[Pregel.delta]] runs — messages
  * only along edges, activity = vertices updated last superstep — so
  * this surface maps the two-UDF API onto it: `scatter` is the
  * per-edge message expression, `combine` the MessageIterator
  * reduction, `gather` the vertex update. */
object ScatterGather {
  def run(vertices: DataFrame, edges: DataFrame, valueCol: String,
          maxIter: Int, initialActive: Column = lit(true))(
         scatter: Column,
         combine: Column => Column,
         gather: (Column, Column) => Column): DataFrame =
    Pregel.delta(vertices, edges, valueCol, maxIter, initialActive)(
      scatter, combine, gather)
}

/** The reference's THIRD iteration surface — Gather-Sum-Apply
  * (`flink-gelly/.../gsa/GatherSumApplyIteration.java:59`:
  * `GatherFunction(Neighbor) → M`, `SumFunction.sum`,
  * `ApplyFunction.apply`). PULL-based and BULK: every superstep every
  * vertex re-gathers over its full in-neighborhood — `gather` runs
  * per edge with the source neighbor's value visible as
  * `nbr_<valueCol>`, `sum` reduces the partials per destination,
  * `apply(old, summed)` rewrites the vertex. Convergence = no vertex
  * value changed (the reference's internal updated-count aggregator),
  * checked with one null-safe anti-filter per superstep. Each
  * superstep is one join + one aggregate + one left join — all
  * Catalyst expressions, shuffles O(edges), the plan you want when
  * most of the graph is still changing (the regime GSA targets;
  * switch to [[Pregel.delta]] when frontiers are sparse). */
object Gsa {
  def run(vertices: DataFrame, edges: DataFrame, valueCol: String,
          maxIter: Int)(
         gather: Column,
         sum: Column => Column,
         apply: (Column, Column) => Column): DataFrame = {
    require(vertices.columns.toSeq.sorted == Seq("id", valueCol).sorted,
      s"vertices must be exactly (id, $valueCol) — pack richer state into a struct")
    Iterate.bulk(vertices, maxIter) { (sol, _) =>
      val partials = edges
        .join(sol.select(col("id").as("src"),
          col(valueCol).as(s"nbr_$valueCol")), "src")
        .select(col("dst").as("id"), gather.as("m"))
        .filter(col("m").isNotNull)
      val sums = partials.groupBy(col("id")).agg(sum(col("m")).as("__sum"))
      sol.join(sums, Seq("id"), "left")
        .select(col("id"),
          when(col("__sum").isNull, col(valueCol))
            .otherwise(apply(col(valueCol), col("__sum"))).as(valueCol))
    } { (prev, next) =>
      next.alias("n").join(prev.alias("p"), col("n.id") === col("p.id"))
        .filter(!(col(s"n.$valueCol") <=> col(s"p.$valueCol"))).isEmpty
    }
  }
}
