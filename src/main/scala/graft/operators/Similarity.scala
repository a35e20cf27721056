package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two strategies:
  *  - [[bruteForceTopK]]: exact top-k by cosine — the correctness baseline.
  *    Query side broadcast; corpus side never shuffles until the final
  *    per-query rank (rows = |corpus| × |queries|, partitioned by query).
  *  - [[ivfTopK]]: IVF-style bucketing — corpus and queries are assigned to
  *    their nearest centroid, and search only touches the query's bucket.
  *    At 100 TB this turns full scans into bucket-pruned scans; with the
  *    corpus written partitioned-by-centroid the pruning happens at the
  *    file-scan level.
  *
  * Ranking ties are broken on (rounded sim DESC, id ASC) so results are
  * deterministic and stable across engines (1-ulp float differences can't
  * reorder ranks).
  *
  * Input contracts: corpus(id LONG, vec ARRAY<FLOAT|DOUBLE>),
  * queries(qid LONG, qvec), centroids(cid LONG, cvec).
  */
object Similarity {

  private def sim(a: String, b: String) =
    round(cosine(toDoubleArray(col(a)), toDoubleArray(col(b))), 4)

  /** Exact top-k neighbors per query by cosine similarity. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), sim("vec", "qvec").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Assign each row to its highest-cosine centroid: (id, cid). */
  def assign(data: DataFrame, centroids: DataFrame,
             idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(sim(vecCol, "cvec").desc, col("cid"))
    data.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cid"))
  }

  /** IVF top-k: search only the query's centroid bucket. Trades recall for
    * a |corpus|/|buckets| reduction in scored pairs. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int): DataFrame = {
    val corpusB = assign(corpus, centroids, "id", "vec")
    val queriesB = assign(queries, centroids, "qid", "qvec")
    val scored = queriesB.join(corpusB, "cid")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), sim("vec", "qvec").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup. */
  def cosineNearDup(corpus: DataFrame, threshold: Double): DataFrame = {
    val l = corpus.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val r = corpus.select(col("id").as("id_b"), col("vec").as("vec_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), sim("vec_a", "vec_b").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
