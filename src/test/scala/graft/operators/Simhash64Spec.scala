package graft.operators

import graft.SparkSpec

/** The production-width (64-bit) SimHash signature: the Spark
  * expression tree must equal an independent brute-force JVM
  * implementation (java.security MD5, per-bit tf-weighted majority)
  * on the real documents table. The DuckDB oracle checks the same
  * thing at sf0.01 through q67/q79; this spec pins the semantics
  * (hex-slice token hashing, strict majority, OR-combined bits)
  * against a third implementation. */
class Simhash64Spec extends SparkSpec {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Brute-force 64-bit simhash: token hash = md5 hex chars 1-8 (bits
    * 0-31) and 9-16 (bits 32-63); bit set iff a strict majority of
    * token hashes have it set. */
  private def bruteSimhash(text: String): Long = {
    val toks = text.split(" ", -1)
    val hashes = toks.map { t =>
      val h = md5hex(t)
      (java.lang.Long.parseLong(h.substring(0, 8), 16),
        java.lang.Long.parseLong(h.substring(8, 16), 16))
    }
    val n = hashes.length
    (0 until 64).foldLeft(0L) { (acc, b) =>
      val cnt = hashes.count { case (lo, hi) =>
        val (h, off) = if (b < 32) (lo, b) else (hi, b - 32)
        ((h >> off) & 1L) == 1L
      }
      if (2 * cnt > n) acc | (1L << b) else acc
    }
  }

  test("q67 simhash64 equals the brute-force JVM implementation") {
    val got = TextQueries.queries("q67_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      assert(got(id) == bruteSimhash(text), s"doc $id signature mismatch")
    }
    // the width is real: some signature must use the top 16 bits
    assert(got.values.exists(v => (v >>> 48) != 0L))
  }

  test("q79 near-dup pairs: banding finds every hamming<=3 pair (pigeonhole)") {
    val sigs = TextQueries.queries("q67_simhash")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (ida, idb, h.toLong)).toSet
    val got = TextQueries.queries("q79_simhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the testdata contains exact duplicates
  }
}
