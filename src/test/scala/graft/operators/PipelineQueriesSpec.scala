package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic invariants of the corpus-curation operators (exact result
  * parity is gated by Verify + the DuckDB oracle at sf0.01). */
class PipelineQueriesSpec extends SparkSpec {

  private def run(name: String) =
    PipelineQueries.queries(name)(spark, sf)

  test("q74: clusters are consistent labelings") {
    val cc = run("q74_dedup_cluster").cache()
    // cluster id is the min member (canonical exists in every cluster)
    val bad = cc.groupBy("cluster_id")
      .agg(min("doc_id").as("mn"), count(lit(1)).as("sz"))
      .filter(col("mn") =!= col("cluster_id"))
    assert(bad.count() == 0)
    // cluster_size is the actual member count
    val szBad = cc.groupBy("cluster_id", "cluster_size")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") =!= col("cluster_size"))
    assert(szBad.count() == 0)
    // exactly one canonical per cluster
    val canon = cc.filter(col("is_canonical"))
      .groupBy("cluster_id").count().filter(col("count") =!= 1)
    assert(canon.count() == 0)
    // every doc labeled exactly once
    val docs = graft.Tables.documents(spark, sf).count()
    assert(cc.count() == docs)
    cc.unpersist()
  }

  test("q74: near-dup edge endpoints land in the same cluster") {
    val docs = graft.Tables.documents(spark, sf)
    val sig = TextQueries.minhashSigs(docs).localCheckpoint()
    val edges = TextQueries.minhashAgreePairs(sig)
      .filter(col("n_agree") >= 4)
    val cc = run("q74_dedup_cluster")
      .select(col("doc_id"), col("cluster_id"))
    val split = edges
      .join(cc.withColumnRenamed("doc_id", "id_a")
              .withColumnRenamed("cluster_id", "ca"), "id_a")
      .join(cc.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("cluster_id", "cb"), "id_b")
      .filter(col("ca") =!= col("cb"))
    assert(split.count() == 0)
  }

  test("q75: quota picks exactly min(quota, stratum size) per language") {
    val s = run("q75_sample_stratified").cache()
    val perLang = s.groupBy("lang").agg(
      sum(when(col("pick_quota"), 1).otherwise(0)).as("picked"),
      count(lit(1)).as("n"))
    val bad = perLang.filter(col("picked") =!= least(col("n"), lit(20)))
    assert(bad.count() == 0)
    // deterministic: rerun yields identical pick sets
    val again = run("q75_sample_stratified")
    assert(s.select("doc_id", "pick_bernoulli", "lang_rank")
      .except(again.select("doc_id", "pick_bernoulli", "lang_rank"))
      .count() == 0)
    s.unpersist()
  }

  test("q76: repetition ratios are bounded and exact on a known doc") {
    val r = run("q76_repetition")
    assert(r.filter(col("top_word_ppm") > 1000000 ||
                    col("distinct_ppm") > 1000000).count() == 0)
    // "a b a b" → 4 words, 2 distinct, top word 2×; 3 bigrams, top 2×
    import spark.implicits._
    val one = Seq((1L, "a b a b")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    one.createOrReplaceTempView("pq_known")
    val wc = one.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").count()
    assert(wc.count() == 2)
  }

  test("q77: one keeper per normalized key; keepers cover all copies") {
    val d = run("q77_norm_dedup").cache()
    assert(d.filter(col("is_keeper")).select("keep_id").distinct().count() ==
           d.select("keep_id").distinct().count())
    assert(d.filter(col("doc_id") === col("keep_id"))
            .filter(!col("is_keeper")).count() == 0)
    d.unpersist()
  }

  test("q78: respects filter band and per-language quota") {
    val c = run("q78_curate").cache()
    assert(c.filter(col("n_tokens") < 30 || col("n_tokens") > 500).count() == 0)
    val over = c.groupBy("lang").count().filter(col("count") > 25)
    assert(over.count() == 0)
    assert(c.filter(col("lang_rank") > 25).count() == 0)
    c.unpersist()
  }
}
