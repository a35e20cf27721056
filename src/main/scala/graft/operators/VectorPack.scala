package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Multi-vector retrieval and embedding post-processing: ColBERT-style
  * late-interaction (MaxSim) scoring, and the pool → L2-normalize →
  * matryoshka-truncate pipeline that turns per-token vectors into a
  * storable document embedding.
  */
object VectorPack extends QueryPack {

  val Dim = 64
  /** MaxSim corpus split: vec_id < QueryVecs are query token vectors
    * (QueryCount queries round-robin), the rest are document token
    * vectors (DocCount docs round-robin). */
  val QueryVecs = 8
  val QueryCount = 2
  val DocCount = 25
  val TopK = 5

  /** Pooling group fan-in (vec_id mod PoolGroups → one pooled vector). */
  val PoolGroups = 50
  /** Matryoshka prefix length. */
  val TruncDim = 16
  /** Fixed-point scale for pooling sums: per-element values are snapped
    * to 1e-7 integers BEFORE aggregation, so the grouped sum is integer
    * addition — associative, hence identical across engines and shuffle
    * partitionings (same trick as [[Graph.pageRank]]'s rank units). */
  val PoolScale = 1e7

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), VectorFunctions.toDoubleArray(col("embedding")).as("v"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ColBERT-style late interaction: score(q, d) = Σ_{qv ∈ q} max_{dv ∈ d}
    // cos(qv, dv); top-5 docs per query. The query side is a handful of
    // vectors — broadcast against the document-token corpus (at 100 TB the
    // document side would first be cut by an ANN candidate stage, e.g.
    // Similarity.ivfTopK over pooled vectors; the MaxSim rerank here is the
    // exact final stage of that cascade). Per-token maxes are snapped to
    // 6 decimals before the Σ so the small sum is over exact multiples of
    // 1e-6 — cross-engine deterministic.
    "q105_maxsim" -> ((s, dir) => {
      val qv = emb(s, dir).filter(col("vec_id") < QueryVecs)
        .select((col("vec_id") % QueryCount).as("query_id"),
          col("vec_id").as("qv_id"), col("v").as("qe"))
      val dv = emb(s, dir).filter(col("vec_id") >= QueryVecs)
        .select((col("vec_id") % DocCount).as("doc_id"), col("v").as("de"))
      // zero-norm guard: x/0 is NaN in Spark (and NaN sorts ABOVE every
      // real under max), while the SQL twin yields NULL — emit NULL here
      // too so both engines skip degenerate vectors identically
      val den = VectorFunctions.l2Norm(col("qe")) * VectorFunctions.l2Norm(col("de"))
      val sims = dv.crossJoin(broadcast(qv))
        .select(col("query_id"), col("qv_id"), col("doc_id"),
          when(den === 0.0, lit(null))
            .otherwise(VectorFunctions.dot(col("qe"), col("de")) / den).as("sim"))
      val best = sims.groupBy("query_id", "qv_id", "doc_id")
        .agg(round(max(col("sim")), 6).as("m"))
      val scores = best.groupBy("query_id", "doc_id")
        .agg(round(sum(col("m")), 6).as("maxsim"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("maxsim").desc, col("doc_id"))
      scores.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .orderBy("query_id", "rank")
    }),

    // Pool per-token vectors to one embedding per group: element-wise mean
    // (fixed-point integer sums — see PoolScale), L2-normalize, truncate
    // to the 16-dim matryoshka prefix, re-normalize. Output: group, fan-in,
    // full-vector norm, first 4 components of the final truncated unit
    // vector. The explode shuffles (group, dim) pairs, never raw text or
    // full vectors twice; one aggregation + one per-group reassembly.
    "q109_vec_pool" -> ((s, dir) => {
      val x = emb(s, dir)
        .select((col("vec_id") % PoolGroups).as("g"),
          posexplode(col("v")).as(Seq("i0", "xv")))
        .select(col("g"), (col("i0") + 1).as("i"),
          round(col("xv") * lit(PoolScale), 0).cast("long").as("sv"))
      val m = x.groupBy("g", "i")
        .agg(sum(col("sv")).as("ssum"), count(lit(1)).as("n"))
        .withColumn("mv",
          col("ssum").cast("double") / (col("n").cast("double") * lit(PoolScale)))
      val arr = m.groupBy("g")
        .agg(max(col("n")).as("n_vecs"),
          array_sort(collect_list(struct(col("i"), col("mv")))).as("pairs"))
        .withColumn("mvec", transform(col("pairs"), p => p.getField("mv")))
      val t = slice(col("mvec"), 1, TruncDim)
      val tnorm = sqrt(aggregate(t, lit(0.0), (a, e) => a + e * e))
      arr.select(col("g"), col("n_vecs"),
          round(sqrt(aggregate(col("mvec"), lit(0.0), (a, e) => a + e * e)), 6)
            .as("full_norm"),
          round(element_at(t, 1) / tnorm, 6).as("c1"),
          round(element_at(t, 2) / tnorm, 6).as("c2"),
          round(element_at(t, 3) / tnorm, 6).as("c3"),
          round(element_at(t, 4) / tnorm, 6).as("c4"))
        .orderBy("g")
    })
  )

  // ---- DuckDB twins --------------------------------------------------------

  /** Unrounded cosine over FLOAT[] columns cast to DOUBLE, zero-norm → NULL
    * (same guard as the engine's cosine; list order is preserved by
    * list_transform + list_sum, matching Spark's sequential array fold). */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, $Dim), i -> $x[i] * $y[i]))"
    val denom = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"CASE WHEN $denom = 0.0 THEN NULL ELSE ${dot(a, b)} / $denom END"
  }

  def oracles: Map[String, String] = Map(

    "q105_maxsim" ->
      s"""WITH q AS (
         |  SELECT vec_id % $QueryCount AS query_id, vec_id AS qv_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
         |  FROM embeddings WHERE vec_id < $QueryVecs),
         |d AS (
         |  SELECT vec_id % $DocCount AS doc_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS de
         |  FROM embeddings WHERE vec_id >= $QueryVecs),
         |pm AS (
         |  SELECT query_id, qv_id, doc_id,
         |         round(max(${cosSql("qe", "de")}), 6) AS m
         |  FROM q CROSS JOIN d GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT query_id, doc_id, round(sum(m), 6) AS maxsim
         |  FROM pm GROUP BY 1, 2),
         |r AS (
         |  SELECT query_id, doc_id, maxsim,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY maxsim DESC, doc_id) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, maxsim, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "q109_vec_pool" ->
      s"""WITH x AS (
         |  SELECT vec_id % $PoolGroups AS g,
         |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * $PoolScale)
         |              AS BIGINT) AS sv,
         |         generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |m AS (
         |  SELECT g, i,
         |         CAST(sum(sv) AS DOUBLE) / (count(*) * $PoolScale) AS mv,
         |         count(*) AS n
         |  FROM x GROUP BY 1, 2),
         |a AS (
         |  SELECT g, max(n) AS n_vecs,
         |         sum(mv * mv) AS sq_full,
         |         sum(CASE WHEN i <= $TruncDim THEN mv * mv END) AS sq_t,
         |         max(CASE WHEN i = 1 THEN mv END) AS m1,
         |         max(CASE WHEN i = 2 THEN mv END) AS m2,
         |         max(CASE WHEN i = 3 THEN mv END) AS m3,
         |         max(CASE WHEN i = 4 THEN mv END) AS m4
         |  FROM m GROUP BY 1)
         |SELECT g, CAST(n_vecs AS BIGINT) AS n_vecs,
         |       round(sqrt(sq_full), 6) AS full_norm,
         |       round(m1 / sqrt(sq_t), 6) AS c1,
         |       round(m2 / sqrt(sq_t), 6) AS c2,
         |       round(m3 / sqrt(sq_t), 6) AS c3,
         |       round(m4 / sqrt(sq_t), 6) AS c4
         |FROM a ORDER BY g""".stripMargin
  )
}
