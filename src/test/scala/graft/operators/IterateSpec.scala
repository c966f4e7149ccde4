package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bulk and delta iteration semantics (reference
  * IterativeDataSet.java / DeltaIteration.java): superstep counts,
  * convergence criteria, empty-workset termination, and solution-set
  * replace-by-key. */
class IterateSpec extends SparkSpec {

  test("bulk runs exactly maxIter supersteps without a criterion") {
    val spark2 = spark; import spark2.implicits._
    val out = Iterate.bulk(Seq(0L).toDF("v"), 5) { (df, _) =>
      df.select((col("v") + 1).as("v"))
    }()
    assert(out.head().getLong(0) == 5L)
  }

  test("bulk stops early when the convergence criterion fires") {
    val spark2 = spark; import spark2.implicits._
    // cap at 3: step is idempotent past v=3, criterion = no change
    val out = Iterate.bulk(Seq(0L).toDF("v"), 100) { (df, _) =>
      df.select(least(col("v") + 1, lit(3L)).as("v"))
    } { (prev, next) =>
      prev.withColumnRenamed("v", "p")
        .crossJoin(next).filter(col("v") =!= col("p")).isEmpty
    }
    assert(out.head().getLong(0) == 3L)
  }

  test("bulk passes the 0-based superstep index to the step") {
    val spark2 = spark; import spark2.implicits._
    var seen = List.empty[Int]
    Iterate.bulk(Seq(1L).toDF("v"), 3) { (df, i) => seen :+= i; df }()
    assert(seen == List(0, 1, 2))
  }

  test("delta terminates on an empty workset and replaces by key") {
    val spark2 = spark; import spark2.implicits._
    // propagate the max value one hop per superstep along a chain
    // 1 -> 2 -> 3; solution (id, v) starts (i, i); workset = changed
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val init = Seq((1L, 10L), (2L, 0L), (3L, 0L)).toDF("id", "v")
    var steps = 0
    val out = Iterate.delta(init, init, Seq("id"), 100) { (sol, ws) =>
      steps += 1
      val cand = edges.join(ws.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(max(col("v")).as("cand"))
      val delta = cand.join(sol, "id").filter(col("cand") > col("v"))
        .select(col("id"), col("cand").as("v"))
      (delta, delta)
    }
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 10L, 2L -> 10L, 3L -> 10L), s"solution: $m")
    // 2 propagation supersteps + 1 that finds an empty delta
    assert(steps == 3, s"supersteps: $steps")
  }

  test("delta leaves untouched solution rows in place") {
    val spark2 = spark; import spark2.implicits._
    val init = Seq((1L, 1L), (2L, 2L)).toDF("id", "v")
    val ws = Seq((1L, 1L)).toDF("id", "v")
    val out = Iterate.delta(init, ws, Seq("id"), 10) { (_, w) =>
      // single superstep: rewrite key 1 only, then stop
      val delta = w.filter(col("v") < 100).select(col("id"), lit(100L).as("v"))
      (delta, delta.limit(0))
    }
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 100L, 2L -> 2L), s"solution: $m")
  }

  test("connected components via delta matches the brute-force closure") {
    val spark2 = spark; import spark2.implicits._
    // two components: {1,2,3,4} (chain) and {10,11}
    val vs = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val m = GraphOps.connectedComponents(vs, es).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L), s"components: $m")
  }

  test("sssp via delta relaxes only improved frontiers to the right answer") {
    val spark2 = spark; import spark2.implicits._
    val vs = Seq(1L, 2L, 3L, 4L).toDF("id")
    // 1->2 (1.0), 2->3 (1.0), 1->3 (5.0) — the long way loses; 4 unreachable
    val es = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0))
      .toDF("src", "dst", "weight")
    val m = GraphOps.shortestPaths(vs, es, source = 1L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0), s"dists: $m")
  }
}
