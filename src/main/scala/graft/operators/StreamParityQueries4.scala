package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.{QuotaSampler, Replay}
import StreamParityQueries.runAppend

/** Round-7 parity pack: streaming corpus-curation additions. */
object StreamParityQueries4 {

  val queries: Map[String, Q] = Map(

    // STREAMING per-language admission quota: replay the documents
    // table as three doc_id-ordered micro-batches through the keyed
    // counter state op — the first `quota` docs of each language are
    // admitted, everything later is dropped. Deterministic because
    // epochs replay in id order and batches sort on doc_id; oracle is
    // the batch rank over the same order. Wrong iff the counter
    // resets between batches, over-admits inside a batch, or the
    // key partitioning leaks rows across languages.
    "q207_stream_quota" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-quota")
      val docs = Tables.documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (c1, c2) = (maxId / 3, 2 * maxId / 3)
      val keyed = docs.select(col("doc_id"), col("lang").as("k"))
      val (inDir, schema) = Replay.fileEpochs(keyed,
        Seq(col("doc_id") < c1,
          col("doc_id") >= c1 && col("doc_id") < c2,
          col("doc_id") >= c2),
        base.toString)
      val admitted = QuotaSampler.admitFirstN(
        Replay.streamDf(s, inDir, schema).as[QuotaSampler.DocKey], 40)
      runAppend(admitted.toDF(), base.toString, s)
        .select(col("doc_id"), col("k").as("lang"))
        .orderBy(col("doc_id"))
    }),

    // STREAMING SemDeDup — q209's semantic near-dup flagging against
    // a STATIC embedded corpus (the nightly-snapshot + intra-day-
    // stream shape of q154/q155, but in vector space): the lower-id
    // half is the corpus, quantized int8 with q209's seed clusters;
    // the upper half streams in three micro-batches; each batch is a
    // PURE PROJECTION (quantize + literal-argmax cluster — no
    // aggregate, so no watermark needed) into a stream-static join
    // confined to the row's cluster, flagging at code-cosine >= 0.4;
    // streaming dropDuplicates emits each flagged vector exactly
    // once across batches. At 100 TB the corpus side is partitioned
    // by cluster id so a micro-batch touches only its clusters'
    // members — never the whole corpus.
    "q213_semdedup_stream" -> ((s, d) => {
      import graft.streaming.Replay
      val base = java.nio.file.Files.createTempDirectory("graft-semdedupstream")
      val e = Tables.embeddings(s, d)
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val half = maxId / 2
      val (c1, c2) = (half + (maxId - half) / 3, half + 2 * ((maxId - half) / 3))
      val corpusQ = VectorQueries.quantI8(e.filter(col("vec_id") < half), "vec_id")
      val seeds = corpusQ.orderBy(col("vec_id")).limit(32).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      val corpus = corpusQ.withColumn("cluster",
          VectorQueries.clusterOfI8(col("qv"), col("nrm"), seeds))
        .select(col("vec_id").as("cid"), col("qv").as("cqv"),
          col("nrm").as("cnrm"), col("cluster"))
      val chunks = Seq(
        col("vec_id") >= half && col("vec_id") < c1,
        col("vec_id") >= c1 && col("vec_id") < c2,
        col("vec_id") >= c2)
      val (inDir, schema) =
        Replay.fileEpochs(e.filter(col("vec_id") >= half), chunks, base.toString)
      val sq = VectorQueries.quantI8(Replay.streamDf(s, inDir, schema), "vec_id")
        .withColumn("cluster",
          VectorQueries.clusterOfI8(col("qv"), col("nrm"), seeds))
      val dotI = aggregate(zip_with(col("qv"), col("cqv"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      val cos = dotI.cast("double") /
        greatest(sqrt((col("nrm") * col("cnrm")).cast("double")), lit(1e-30))
      val flagged = sq.join(corpus, Seq("cluster"))
        .filter(cos >= 0.4)
        .select(col("vec_id"))
        .dropDuplicates("vec_id")
      runAppend(flagged, base.toString, s).orderBy(col("vec_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q207_stream_quota" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 40
        |ORDER BY doc_id""".stripMargin,

    // q209's quantize+assign CTEs with corpus-half seeds; a stream
    // (upper-half) vector is flagged when any corpus (lower-half)
    // member of its cluster sits at code-cosine >= 0.4. The epoch
    // split is invisible to the result — flagging is against the
    // static corpus only, so the oracle is one-shot.
    "q213_semdedup_stream" ->
      s"""WITH hf AS (SELECT max(vec_id) // 2 AS half FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127 /
         |      greatest(list_max(list_transform(embedding,
         |        y -> abs(CAST(y AS DOUBLE)))), 1e-30)) AS BIGINT)) AS qv
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, qv,
         |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nrm
         |  FROM q),
         |seeds AS (
         |  SELECT vec_id AS sid, qv AS sqv, nrm AS snrm
         |  FROM n, hf WHERE vec_id < hf.half ORDER BY vec_id LIMIT 32),
         |asg AS (
         |  SELECT n.vec_id, seeds.sid,
         |    CAST(list_dot_product(n.qv, seeds.sqv) AS DOUBLE) /
         |      greatest(sqrt(CAST(n.nrm * seeds.snrm AS DOUBLE)), 1e-30) AS sc
         |  FROM n, seeds),
         |cl AS (
         |  SELECT vec_id, sid AS cluster FROM (
         |    SELECT vec_id, sid,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY sc DESC, sid) AS rn
         |    FROM asg) WHERE rn = 1),
         |m AS (
         |  SELECT cl.vec_id, cl.cluster, n.qv, n.nrm
         |  FROM cl JOIN n USING (vec_id))
         |SELECT DISTINCT s.vec_id
         |FROM m s, m c, hf
         |WHERE s.vec_id >= hf.half AND c.vec_id < hf.half
         |  AND s.cluster = c.cluster
         |  AND CAST(list_dot_product(s.qv, c.qv) AS DOUBLE) /
         |      greatest(sqrt(CAST(s.nrm * c.nrm AS DOUBLE)), 1e-30) >= 0.4
         |ORDER BY s.vec_id""".stripMargin
  )
}
