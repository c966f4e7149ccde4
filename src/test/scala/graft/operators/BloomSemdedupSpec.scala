package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Bloom two-phase decontamination (q210) + SemDeDup (q209) fast
  * invariants — the value-exact binds live in the oracle rows; these
  * pin the properties the oracle can't see. */
class BloomSemdedupSpec extends SparkSpec {

  test("bloom prefilter admits every true member (no false negatives)") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("source") === "src1")
      .select(explode(TextQueries.shingles4(col("text"))).as("sh")).distinct()
    val sketch = bench
      .agg(GraftFunctions.bloom_filter_agg(xxhash64(col("sh")), 200000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    assert(sketch != null)
    // every benchmark shingle itself must pass the probe — a hashing
    // mismatch between build and probe would show up right here
    assert(bench.filter(!GraftFunctions.bloom_might_contain(sketch, xxhash64(col("sh")))).isEmpty)
  }

  test("bloom prefilter is selective on non-member shingles") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("source") === "src1")
      .select(explode(TextQueries.shingles4(col("text"))).as("sh")).distinct()
    val sketch = bench
      .agg(GraftFunctions.bloom_filter_agg(xxhash64(col("sh")), 200000L).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val corpus = docs.filter(col("source") =!= "src1")
      .select(explode(TextQueries.shingles4(col("text"))).as("sh")).distinct()
    val nonMembers = corpus.join(bench, Seq("sh"), "left_anti")
    val total = nonMembers.count()
    val falsePos = nonMembers
      .filter(GraftFunctions.bloom_might_contain(sketch, xxhash64(col("sh"))))
      .count()
    // 200k-capacity sketch over a few thousand members: fp ≈ 0
    assert(falsePos <= math.max(1L, total / 100),
      s"bloom passed $falsePos of $total non-members")
  }

  test("semdedup partitions the corpus and only drops provable dups") {
    val out = VectorQueries.queries("q209_semdedup")(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() == n) // every vector classified exactly once
    assert(out.select(col("vec_id")).distinct().count() == n)
    assert(out.select(col("cluster")).distinct().count() <= 32)
    // kept is 0/1 and at least the 32 seeds (each first in its own
    // cluster ordering... not guaranteed per-cluster; assert weaker:
    // some rows kept, and every cluster keeps its earliest member
    val firsts = out.groupBy(col("cluster")).agg(min(col("vec_id")).as("vec_id"))
    assert(out.join(firsts, Seq("cluster", "vec_id")).filter(col("kept") === 0).isEmpty,
      "a cluster's earliest member can never have an earlier dup")
    out.unpersist()
  }
}
