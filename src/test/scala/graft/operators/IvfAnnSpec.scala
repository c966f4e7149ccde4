package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfAnnSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)

  test("fit produces k finite centroids of the right dimension") {
    val m = IvfAnn.fit(emb, "embedding", k = 8, lloydIters = 2)
    assert(m.centroids.length == 8)
    assert(m.centroids.forall(c => c.length == 64 && c.forall(v => !v.isNaN)))
    // deterministic
    val m2 = IvfAnn.fit(emb, "embedding", k = 8, lloydIters = 2)
    assert(m.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("assign puts every vector in [0, k)") {
    val m = IvfAnn.fit(emb, "embedding", k = 8)
    val clusters = IvfAnn.assign(emb, "embedding", m)
      .select(col("cluster")).distinct().collect().map(_.getInt(0)).toSet
    assert(clusters.forall(c => c >= 0 && c < 8) && clusters.size > 1)
  }

  test("assignViaJoin (large-K path) agrees with the literal argmax") {
    val m = IvfAnn.fit(emb, "embedding", k = 8)
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(toMap(IvfAnn.assignViaJoin(emb, "embedding", m)) ==
           toMap(IvfAnn.assign(emb, "embedding", m)))
  }

  test("search returns candidates only from probed lists, ranked by cosine") {
    val m = IvfAnn.fit(emb, "embedding", k = 8)
    val probes = emb.filter(col("vec_id") <= 5)
    val res = IvfAnn.search(emb, probes, "embedding", m, k = 3, nprobe = 2)
      .collect()
    assert(res.nonEmpty)
    // rank is 1..3 per probe and sims are non-increasing within a probe
    val byProbe = res.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length).toSeq)
      val sims = sorted.map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
    }
    // every hit is genuinely in one of the probe's nprobe clusters
    val assigned = IvfAnn.assign(emb, "embedding", m)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probeLists = IvfAnn.search(emb, probes, "embedding", m, k = 1000, nprobe = 2)
      .select(col("pid"), col("cid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    probeLists.foreach { case (pid, cids) =>
      val lists = cids.map(assigned)
      assert(lists.size <= 2, s"probe $pid drew candidates from ${lists.size} lists")
    }
  }

  test("oversized K fails loudly instead of blowing codegen / driver memory") {
    val e = intercept[IllegalArgumentException] {
      IvfAnn.fit(emb, "embedding", k = 1000000)
    }
    assert(e.getMessage.contains("assignViaJoin"))
    val e2 = intercept[IllegalArgumentException] {
      IvfAnn.assign(emb, "embedding",
        IvfAnn.Model(Array.fill(257)(Array(0.0))))
    }
    assert(e2.getMessage.contains("cap"))
  }

  test("approximate setting (nprobe 2 of 8) keeps recall@5 above the floor") {
    // the q240 audit covers the LSH path with an exact oracle; the
    // IVF path's k-means model is not SQL-expressible, so its recall
    // is pinned HERE: mean recall@5 at nprobe=2/8 must hold a floor —
    // a broken assignment or probe routing craters it to ~nprobe/k
    val m = IvfAnn.fit(emb, "embedding", k = 8, lloydIters = 2)
    val probes = emb.filter(col("vec_id") <= 20)
    val approx = IvfAnn.search(emb, probes, "embedding", m, k = 5, nprobe = 2)
      .select(col("pid"), col("cid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = IvfAnn.search(emb, probes, "embedding", m, k = 5, nprobe = 8)
      .select(col("pid"), col("cid")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (pid, truth) =>
      approx.getOrElse(pid, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"mean recall@5 $mean%.2f below floor")
  }
}
