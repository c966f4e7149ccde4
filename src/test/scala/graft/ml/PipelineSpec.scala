package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pipeline API semantics vs the reference contract
  * (flink-ml-api Pipeline.java): estimator replacement on fit,
  * transform-before-fit refusal, input threading, JSON round-trip. */
class PipelineSpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    (0L until 120L).map { i =>
      val e = Array.tabulate(8) { d =>
        val h = (i * 31 + d * 17 + 7) % 101
        (h / 101.0f) - 0.5f
      }
      // two planted anomalies
      val e2 = if (i >= 118) Array.fill(8)(4.0f) else e
      (i, (i % 3).toInt, e2)
    }.toDF("vec_id", "label", "embedding")
  }

  test("fit replaces estimators with models; transform threads stages") {
    val p = new Pipeline()
      .appendStage(new GaussianOutlierEstimator())
      .appendStage(new OutlierFilter())
    assert(p.needFit)
    val fitted = p.fit(emb)
    assert(!fitted.needFit)
    assert(fitted.getStages.head.isInstanceOf[GaussianOutlierModel])
    val out = fitted.transform(emb)
    val ids = out.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // the planted anomalies are gated out; schema back to the input's
    assert(!ids.contains(118L) && !ids.contains(119L))
    assert(out.columns.toSeq == Seq("vec_id", "label", "embedding"))
  }

  test("transform before fit refuses (reference Pipeline.java:202)") {
    val p = new Pipeline().appendStage(new GaussianOutlierEstimator())
    val err = intercept[IllegalStateException](p.transform(emb))
    assert(err.getMessage.contains("need to fit first"))
  }

  test("a transformer-only pipeline needs no fit and adds no shuffle") {
    val p = new Pipeline().appendStage(new Int8Quantizer("embedding"))
    assert(!p.needFit)
    val out = p.transform(emb)
    assert(out.columns.contains("qv") && out.columns.contains("nrm"))
    assert(out.count() == 120)
    // codes agree with the engine's quantI8 projection
    val viaHelper = graft.operators.VectorQueries.quantI8(emb, "vec_id")
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    out.select(col("vec_id"), col("qv"), col("nrm")).collect().foreach { r =>
      val (qv, nrm) = viaHelper(r.getLong(0))
      assert(r.getSeq[Long](1) == qv && r.getLong(2) == nrm)
    }
    // pure projection: no Exchange in the stage's plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("JSON round-trip restores a fitted pipeline exactly") {
    val fitted = new Pipeline()
      .appendStage(new GaussianOutlierEstimator())
      .fit(emb)
    val json = fitted.toJson
    val restored = new Pipeline(json)
    assert(!restored.needFit)
    def scores(p: Pipeline) = p.transform(emb)
      .select(col("vec_id"), col("score"), col("outlier"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(scores(restored) == scores(fitted))
    // and the json itself is stable across a second trip
    assert(new Pipeline(json).toJson == json)
  }

  test("loadJson fails loudly on malformed stage entries") {
    // garbage with a class marker: declared > parsed → loud failure
    intercept[IllegalArgumentException] {
      new Pipeline("""[{"class":"graft.ml.OutlierFilter","params":{bad}]""")
    }
    // a params value containing '}' breaks the stage regex — must
    // throw, never silently restore a shorter pipeline
    val json = new Pipeline()
      .appendStage(new Int8Quantizer("emb}col")).toJson
    intercept[IllegalArgumentException](new Pipeline(json))
  }

  test("malformed JSON with an unterminated value errors fast (no ReDoS)") {
    // merely-greedy runs inside (x+|y)* backtrack exponentially on an
    // unterminated quoted value; the possessive regexes must fail this
    // in milliseconds, loudly
    val bad = """[{"class":"graft.ml.Int8Quantizer","params":{"embCol":"""" +
      ("x" * 2000) // no closing quote, no closing braces
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException](new Pipeline(bad))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "parse did not fail fast")
  }

  test("loadJson restores only whitelisted stage classes (no reflection)") {
    // a class name smuggled into the JSON must never reach the
    // classloader — not a PipelineStage at all:
    val e = intercept[IllegalArgumentException] {
      new Pipeline("""[{"class":"java.util.ArrayList","params":{}}]""")
    }
    assert(e.getMessage.contains("not a registered PipelineStage"))
    // ...and crucially, a PERFECTLY VALID PipelineStage subclass that
    // merely isn't in the shipped registry is refused too — the
    // isAssignableFrom form this replaced would have admitted it (and
    // Class.forName would have run its static initializer even with
    // deferred init once instantiation followed)
    val e2 = intercept[IllegalArgumentException] {
      new Pipeline(s"""[{"class":"${classOf[RogueStage].getName}","params":{}}]""")
    }
    assert(e2.getMessage.contains("not a registered PipelineStage"))
    assert(!RogueStage.constructed, "rogue stage constructor ran")
  }

  test("IvfClusterEstimator round-trips and matches the engine's assign") {
    val fitted = new Pipeline()
      .appendStage(new IvfClusterEstimator("embedding", 4, 2))
      .fit(emb)
    val restored = new Pipeline(fitted.toJson)
    def clusters(p: Pipeline) = p.transform(emb)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1).toSeq
    val viaPipeline = clusters(fitted)
    assert(clusters(restored) == viaPipeline)
    val m = graft.operators.IvfAnn.fit(emb, "embedding", 4, 2)
    val direct = graft.operators.IvfAnn.assign(emb, "embedding", m)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1).toSeq
    assert(viaPipeline == direct)
    assert(viaPipeline.map(_._2).distinct.size > 1)
  }

  test("a fitted pipeline composes into one lazy plan (no mid-stage sink)") {
    val fitted = new Pipeline()
      .appendStage(new GaussianOutlierEstimator())
      .appendStage(new OutlierFilter())
      .fit(emb)
    val plan = fitted.transform(emb).queryExecution.optimizedPlan.toString
    // the filter fused into the same plan tree as the scoring projection
    assert(!plan.contains("LogicalRDD") || plan.split("LogicalRDD").length <= 2)
  }
}

/** A legitimate PipelineStage subclass that is deliberately NOT in the
  * shipped registry — restore-by-name must refuse it without ever
  * running this constructor. */
final class RogueStage extends graft.ml.Pipeline.Transformer {
  RogueStage.constructed = true
  def transform(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = df
  def params: Map[String, String] = Map.empty
  def withParams(p: Map[String, String]): graft.ml.Pipeline.PipelineStage = this
}

object RogueStage { @volatile var constructed = false }
