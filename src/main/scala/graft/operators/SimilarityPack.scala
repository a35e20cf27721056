package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Similarity-search queries over the embeddings table (64-dim float
  * vectors): near-dup pairs, brute-force ANN baseline, IVF-bucketed ANN. */
object SimilarityPack extends QueryPack {

  val NearDupThreshold = 0.35
  val NumCentroids = 8

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def centroids(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Embedding-cosine near-duplicate pairs.
    "q34_embedding_neardup" -> ((s, dir) => {
      Similarity.cosineNearDup(corpus(s, dir), NearDupThreshold)
        .orderBy("id_a", "id_b")
    }),

    // Brute-force exact top-5 ANN baseline.
    "q35_ann_bruteforce" -> ((s, dir) => {
      Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), k = 5)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF-bucketed ANN (the scale path; recall vs q35 tested in ScalaTest).
    "q36_ann_ivf" -> ((s, dir) => {
      Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir), centroids(s, dir), k = 3)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // spark.ml random-hyperplane LSH ANN (seeded; not SQL-expressible →
    // rows-only check; recall asserted in SimilaritySpec).
    "q38_ann_lsh" -> ((s, dir) => {
      Similarity.lshTopK(corpus(s, dir), queriesDf(s, dir), k = 3)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
        .orderBy("qid", "rank")
    })
  )

  // ---- DuckDB twins --------------------------------------------------------

  /** Rounded cosine between two embedding list columns (FLOAT[] → DOUBLE);
    * zero-norm vectors yield NULL like the engine's pairSim guard. */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    val denom = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"ROUND(CASE WHEN $denom = 0.0 THEN NULL ELSE ${dot(a, b)} / $denom END, 4)"
  }

  def oracles: Map[String, String] = Map(
    "q34_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       ${cosSql("a.embedding", "b.embedding")} AS cos_sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= $NearDupThreshold
         |ORDER BY id_a, id_b""".stripMargin,

    "q35_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, e.vec_id AS neighbor_id,
         |                  ${cosSql("e.embedding", "q.qvec")} AS sim
         |           FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |ranked AS (SELECT qid, neighbor_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neighbor_id, sim FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q36_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, cid FROM buckets WHERE vec_id % 50 = 0),
         |cand AS (SELECT q.qid, b.vec_id AS neighbor_id
         |         FROM q JOIN buckets b ON b.cid = q.cid AND b.vec_id <> q.qid),
         |scored AS (SELECT cand.qid, cand.neighbor_id,
         |                  ${cosSql("eq.embedding", "en.embedding")} AS sim
         |           FROM cand JOIN e eq ON eq.vec_id = cand.qid
         |                     JOIN e en ON en.vec_id = cand.neighbor_id),
         |ranked AS (SELECT qid, neighbor_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neighbor_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  )
}
