package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Search surface: BM25 lexical top-k and reciprocal-rank-fusion hybrid
  * retrieval (sparse BM25 + dense cosine), the two-tower shape of a
  * retrieval-augmented data pipeline.
  */
object SearchPack extends QueryPack {

  /** The fixed search query (terms exist in the synthetic corpus with
    * varied document frequencies). */
  val Terms = Seq("hash", "join", "vector")
  val TopK = 10
  /** Candidate-list depth fused by RRF: ranks are computed over the TOP-C
    * of each ranker, never the full corpus, so the rank windows run on a
    * bounded, already-limited set (TakeOrdered + 100-row window), not a
    * single-partition global sort. */
  val TopC = 100
  val RrfK = 60

  /** Global top-N size for the rank-equalization fusion audit (q137). */
  val FuseN = 100

  /** The exact phrase for positional search (q142) — adjacent tokens. */
  val Phrase = Seq("hash", "join")

  /** q237 planted-relevance retrieval benchmark: chunk geometry (the q53
    * window/stride), which chunks become queries (chunk 1 of every 25th
    * doc), the query span carved from each (tokens 9..16 — the chunk
    * must be long enough to hold it), and the rank cut. */
  val RagWindow = 32
  val RagStride = 24
  val RagQMod = 25
  val RagSpanStart = 9
  val RagSpanLen = 8
  val RagTopK = 10

  private def rankTop(df: DataFrame, scoreCol: String, n: Int,
                      rankName: String): DataFrame = {
    val top = df.orderBy(col(scoreCol).desc, col("id")).limit(n)
    val w = Window.orderBy(col(scoreCol).desc, col("id"))
    top.withColumn(rankName, row_number().over(w))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BM25 top-10: postings restricted to the query terms in the scan
    // stage, O(|query|) broadcast sides, top-k via TakeOrdered — the
    // ranking window only ever sees the 10 survivors.
    "q113_bm25" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select("doc_id", "text")
      rankTop(Search.bm25(docs, "doc_id", "text", Terms), "score", TopK, "rank")
        .select(col("rank"), col("id").as("doc_id"), col("score"))
        .orderBy("rank")
    }),

    // Hybrid retrieval: BM25 candidates ∪ dense-cosine candidates, fused
    // by reciprocal rank (1/(60+r), the parameter-free fusion that wins
    // most TREC hybrid tracks). The fusion sum is TWO terms written in
    // fixed order — no aggregation, so no float-order hazard. A doc
    // missing from one list contributes 0 from that side.
    "q114_hybrid_rrf" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select("doc_id", "text")
      val lex = rankTop(Search.bm25(docs, "doc_id", "text", Terms),
        "score", TopC, "lex_rank").select(col("id"), col("lex_rank"))
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      val qv = broadcast(emb.filter(col("id") === 0).select(col("v").as("qv")))
      val sims = emb.crossJoin(qv)
        .select(col("id"), graft.functions.Portable.snap6(
          VectorFunctions.cosineOrNull(col("v"), col("qv"))).as("sim"))
      val dense = rankTop(sims, "sim", TopC, "dense_rank")
        .select(col("id"), col("dense_rank"))
      val fused = lex.join(dense, Seq("id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("dense_rank")), lit(0.0)), 6))
      val top = fused.orderBy(col("rrf").desc, col("id")).limit(TopK)
      val w = Window.orderBy(col("rrf").desc, col("id"))
      // nullable ranks ride as DOUBLE: a nullable INT column round-trips
      // through pandas as Int32 on one reader and float64 on the other —
      // DOUBLE + NaN is the one representation both agree on
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("id").as("doc_id"),
          col("lex_rank").cast("double").as("lex_rank"),
          col("dense_rank").cast("double").as("dense_rank"), col("rrf"))
        .orderBy("rank")
    }),

    // Planted-relevance retrieval benchmark — the end-to-end eval a RAG
    // ingestion pipeline runs on itself: the corpus is chunked (q53
    // geometry), a query is carved out of known chunks (an 8-token span
    // — its source chunk IS the relevant answer, no human labels
    // needed), and per-query BM25 over the chunk index is scored with
    // MRR@10 / hit@{1,5}. This is the lexical complement of q225's ANN
    // eval: q225 measures the index against exact search, this measures
    // the whole chunk→index→rank loop against planted ground truth.
    // Scale: postings are cut to query terms by a broadcast semi-join in
    // the scan stage; df/stat sides are O(|query terms|); the one big
    // shuffle is (qid, cid) partial-summed map-side. Per-term weights
    // micro-round before summation (the q113 discipline) so scores are
    // partition-order-free; metrics ride integer reciprocal ranks.
    "q237_retrieval_eval" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select("doc_id", "text")
      // chunks ride as TOKEN ARRAYS: the chunk string itself is never an
      // output here, and both consumers (query spans, postings) re-split
      // it — chunkTokenArrays skips the array_join + two split() passes
      // over the chunk corpus (exactly-equal tokens, see its doc).
      val chunks = CorpusOps.chunkTokenArrays(docs, "doc_id", "text",
          RagWindow, RagStride)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("cid"),
          col("doc_id"), col("chunk_idx"),
          col("n_toks").cast("long").as("dl"), col("chunk_toks"))
        .localCheckpoint() // feeds queries, postings, dl and stats — EAGER:
        // the stats broadcast + postings job race a lazy checkpoint
      val queries = chunks
        .filter(col("doc_id") % RagQMod === 0 && col("chunk_idx") === 1 &&
          col("dl") >= RagSpanStart + RagSpanLen - 1)
        .select(col("cid").as("qid"),
          array_distinct(slice(col("chunk_toks"),
            RagSpanStart, RagSpanLen)).as("qterms"))
        .localCheckpoint()
      val qterms = queries.select(col("qid"), explode(col("qterms")).as("term"))
      val allTerms = broadcast(qterms.select("term").distinct())
      val postings = chunks
        .select(col("cid"), explode(col("chunk_toks")).as("term"))
        .join(allTerms, Seq("term"), "left_semi")
        .groupBy("cid", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint() // feeds df and the scoring join (df is a
        // broadcast side — eager, same race as above)
      val dfT = broadcast(postings.groupBy("term").agg(count(lit(1)).as("df")))
      val stats = broadcast(chunks.agg(count(lit(1)).as("n_chunks"),
        sum("dl").as("sum_dl")))
      val wts = postings.join(dfT, "term")
        .join(chunks.select("cid", "dl"), "cid").crossJoin(stats)
        .withColumn("wt",
          log(lit(1.0) + (col("n_chunks").cast("double") - col("df") + 0.5)
            / (col("df") + 0.5))
            * (col("tf") * (lit(Search.K1) + 1.0))
            / (col("tf") + lit(Search.K1) * (lit(1.0) - lit(Search.B)
              + lit(Search.B) * col("dl")
                / (col("sum_dl").cast("double") / col("n_chunks")))))
      val scored = qterms.join(wts, "term")
        .groupBy("qid", "cid")
        .agg(sum(round(col("wt") * 1e6, 0).cast("long")).as("s_e6"))
      val wRank = Window.partitionBy("qid").orderBy(col("s_e6").desc, col("cid"))
      val ranked = scored.withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= RagTopK)
      val per = queries.select(col("qid"))
        .join(ranked.filter(col("cid") === col("qid"))
          .select(col("qid"), col("rank")), Seq("qid"), "left_outer")
        .select(coalesce(col("rank"), lit(0)).cast("long").as("rk"))
      val P = graft.functions.Portable
      per.agg(count(lit(1)).as("n_queries"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_hit1"),
          sum(when(col("rk").between(1, 5), 1L).otherwise(0L)).as("n_hit5"),
          sum(when(col("rk") >= 1, expr("1000000 DIV rk")).otherwise(0L))
            .as("rr_e6"))
        .select(col("n_queries"),
          P.snap6(col("n_hit1").cast("double") / col("n_queries")).as("hit1"),
          P.snap6(col("n_hit5").cast("double") / col("n_queries")).as("hit5"),
          P.snap6(col("rr_e6").cast("double") / 1e6 / col("n_queries"))
            .as("mrr"))
    }),

    // Cross-source score equalization: a raw global quality top-100 is
    // dominated by whichever source's score distribution sits highest;
    // rank-normalizing within source (percent_rank = histogram
    // equalization) makes scores comparable across sources — the
    // pre-fusion step for mixing ranked lists of different calibration.
    // Output contrasts per-source membership of both top-100s; all
    // counts, no float outputs (ranks are exact small rationals used
    // only for ordering).
    "q137_rank_fuse" -> ((s, dir) => {
      // scored table feeds BOTH top-100s — pin it (the repo's
      // multi-consumer convention) or the corpus tokenizes twice
      val t = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions
            .qualityScore(col("text"), TextPack.stopwords).as("q"))
        .localCheckpoint()
      val rawTop = t.orderBy(desc("q"), col("doc_id")).limit(FuseN)
      val weq = Window.partitionBy("source").orderBy(col("q"), col("doc_id"))
      val eqTop = t.withColumn("eq", percent_rank().over(weq))
        .orderBy(desc("eq"), col("doc_id")).limit(FuseN)
      rawTop.groupBy("source").agg(count(lit(1)).as("n_raw"))
        .join(eqTop.groupBy("source").agg(count(lit(1)).as("n_eq")),
          Seq("source"), "full_outer")
        .select(col("source"),
          coalesce(col("n_raw"), lit(0L)).as("n_raw"),
          coalesce(col("n_eq"), lit(0L)).as("n_eq"))
        .orderBy("source")
    }),

    // Exact phrase search over a POSITIONAL postings index: one posting
    // (doc, term, pos) per occurrence, the phrase resolved by an
    // adjacency equi-join (pos_2 = pos_1 + 1) — the scale path that
    // never rescans full text (term filters push into the scan; the
    // join runs on the two term posting lists only). The oracle is the
    // naive full-text scan, so the postings semantics are pinned against
    // "what the text actually contains".
    "q142_phrase_search" -> ((s, dir) => {
      // the postings table feeds both term filters — pin it so the
      // corpus posexplodes once (in a real index it IS materialized)
      val p = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .localCheckpoint()
      val t1 = p.filter(col("tok") === Phrase(0))
        .select(col("doc_id"), col("pos"))
      val t2 = p.filter(col("tok") === Phrase(1))
        .select(col("doc_id").as("doc_id2"), col("pos").as("pos2"))
      val hits = t1.join(t2, col("doc_id") === col("doc_id2") &&
        col("pos2") === col("pos") + 1)
      hits.agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    })
  )

  // ---- DuckDB twins --------------------------------------------------------

  /** Shared BM25 CTE chain ending in `sc(id, score)`. The arithmetic is
    * written with the same association as [[Search.bm25]]'s Column tree. */
  private def bm25Ctes: String = {
    val termList = Terms.map(t => s"'$t'").mkString(", ")
    s"""t AS (SELECT doc_id AS id, ${TextPack.toksSql("text")} AS toks FROM documents),
       |dl AS (SELECT id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |tf AS (
       |  SELECT id, tok AS term, count(*) AS tf
       |  FROM (SELECT id, unnest(toks) AS tok FROM t)
       |  WHERE tok IN ($termList) GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |wt AS (
       |  SELECT tf.id,
       |         ln(1.0 + (CAST(st.n_docs AS DOUBLE) - dft.df + 0.5) / (dft.df + 0.5))
       |           * (tf.tf * (${Search.K1} + 1.0))
       |           / (tf.tf + ${Search.K1} * (1.0 - ${Search.B} + ${Search.B} * dl.dl
       |                / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS w
       |  FROM tf JOIN dl USING (id) CROSS JOIN st JOIN dft USING (term)),
       |sc AS (SELECT id,
       |         CAST(sum(CAST(round(w * 1000000.0) AS BIGINT)) AS DOUBLE)
       |           / 1000000.0 AS score
       |       FROM wt GROUP BY 1)""".stripMargin
  }

  def oracles: Map[String, String] = Map(

    "q237_retrieval_eval" -> {
      val P = graft.functions.Portable
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |st0 AS (SELECT doc_id, toks,
         |               unnest(generate_series(0, greatest(len(toks) - 1, 0),
         |                 $RagStride)) AS start
         |        FROM d),
         |ch AS (SELECT doc_id * 1000 + (start // $RagStride) AS cid,
         |              doc_id, (start // $RagStride) AS chunk_idx,
         |              CAST(least($RagWindow, len(toks) - start) AS BIGINT)
         |                AS dl,
         |              list_slice(toks, start + 1, start + $RagWindow)
         |                AS ctoks
         |       FROM st0),
         |q AS (SELECT cid AS qid,
         |             list_distinct(list_slice(ctoks, $RagSpanStart,
         |               ${RagSpanStart + RagSpanLen - 1})) AS qterms
         |      FROM ch WHERE doc_id % $RagQMod = 0 AND chunk_idx = 1
         |        AND dl >= ${RagSpanStart + RagSpanLen - 1}),
         |qt AS (SELECT qid, unnest(qterms) AS term FROM q),
         |at AS (SELECT DISTINCT term FROM qt),
         |p AS (SELECT cid, term, count(*) AS tf
         |      FROM (SELECT cid, unnest(ctoks) AS term FROM ch)
         |      WHERE term IN (SELECT term FROM at) GROUP BY 1, 2),
         |dft AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
         |st AS (SELECT count(*) AS n_chunks, CAST(sum(dl) AS BIGINT)
         |              AS sum_dl FROM ch),
         |w AS (SELECT p.cid, p.term,
         |             ln(1.0 + (CAST(st.n_chunks AS DOUBLE) - dft.df + 0.5)
         |                  / (dft.df + 0.5))
         |               * (p.tf * (${Search.K1} + 1.0))
         |               / (p.tf + ${Search.K1} * (1.0 - ${Search.B}
         |                    + ${Search.B} * ch.dl
         |                      / (CAST(st.sum_dl AS DOUBLE) / st.n_chunks)))
         |               AS wt
         |      FROM p JOIN ch ON ch.cid = p.cid CROSS JOIN st
         |             JOIN dft ON dft.term = p.term),
         |sc AS (SELECT qt.qid, w.cid,
         |              sum(CAST(round(wt * 1000000.0) AS BIGINT)) AS s_e6
         |       FROM qt JOIN w ON w.term = qt.term GROUP BY 1, 2),
         |r AS (SELECT qid, cid,
         |             row_number() OVER (PARTITION BY qid
         |               ORDER BY s_e6 DESC, cid) AS rank
         |      FROM sc),
         |per AS (SELECT q.qid, CAST(coalesce(r.rank, 0) AS BIGINT) AS rk
         |        FROM q LEFT JOIN r ON r.qid = q.qid AND r.cid = q.qid
         |                          AND r.rank <= $RagTopK),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |               sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_hit1,
         |               sum(CASE WHEN rk BETWEEN 1 AND 5 THEN 1 ELSE 0 END)
         |                 AS n_hit5,
         |               sum(CASE WHEN rk >= 1 THEN 1000000 // rk ELSE 0 END)
         |                 AS rr_e6
         |        FROM per)
         |SELECT n_queries,
         |       ${P.snap6Sql("CAST(n_hit1 AS DOUBLE) / n_queries")} AS hit1,
         |       ${P.snap6Sql("CAST(n_hit5 AS DOUBLE) / n_queries")} AS hit5,
         |       ${P.snap6Sql("CAST(rr_e6 AS DOUBLE) / 1e6 / n_queries")} AS mrr
         |FROM agg""".stripMargin
    },

    "q113_bm25" ->
      s"""WITH $bm25Ctes,
         |r AS (
         |  SELECT id, score,
         |         row_number() OVER (ORDER BY score DESC, id) AS rank
         |  FROM sc)
         |SELECT CAST(rank AS INT) AS rank, id AS doc_id, score
         |FROM r WHERE rank <= $TopK ORDER BY rank""".stripMargin,

    "q114_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |lex AS (
         |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS INT)
         |           AS lex_rank
         |  FROM sc ORDER BY score DESC, id LIMIT $TopC),
         |qv AS (
         |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
         |  FROM embeddings WHERE vec_id = 0),
         |ev AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |ds AS (
         |  SELECT id,
         |         ${graft.functions.Portable.snap6Sql(
                     graft.functions.VectorFunctions.cosineOrNullSql("e", "q", 64))} AS sim
         |  FROM ev CROSS JOIN qv),
         |den AS (
         |  SELECT id, CAST(row_number() OVER (ORDER BY sim DESC, id) AS INT)
         |           AS dense_rank
         |  FROM ds ORDER BY sim DESC, id LIMIT $TopC),
         |f AS (
         |  SELECT coalesce(lex.id, den.id) AS id, lex.lex_rank, den.dense_rank,
         |         round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0.0)
         |             + coalesce(1.0 / ($RrfK + den.dense_rank), 0.0), 6) AS rrf
         |  FROM lex FULL OUTER JOIN den ON lex.id = den.id),
         |r AS (
         |  SELECT id, lex_rank, dense_rank, rrf,
         |         row_number() OVER (ORDER BY rrf DESC, id) AS rank
         |  FROM f)
         |SELECT CAST(rank AS INT) AS rank, id AS doc_id,
         |       CAST(lex_rank AS DOUBLE) AS lex_rank,
         |       CAST(dense_rank AS DOUBLE) AS dense_rank, rrf
         |FROM r WHERE rank <= $TopK ORDER BY rank""".stripMargin,

    "q137_rank_fuse" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |            ${TextPack.toksSql("text")} AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |        ${graft.functions.TextFunctions
                     .qualityScoreSql(TextPack.stopwords)} AS q FROM t),
         |raw AS (SELECT doc_id, source FROM s
         |        ORDER BY q DESC, doc_id LIMIT $FuseN),
         |eq AS (SELECT doc_id, source,
         |         percent_rank() OVER (PARTITION BY source
         |           ORDER BY q, doc_id) AS eq
         |       FROM s),
         |eqt AS (SELECT doc_id, source FROM eq
         |        ORDER BY eq DESC, doc_id LIMIT $FuseN),
         |a AS (SELECT source, count(*) AS n_raw FROM raw GROUP BY 1),
         |b AS (SELECT source, count(*) AS n_eq FROM eqt GROUP BY 1)
         |SELECT coalesce(a.source, b.source) AS source,
         |       CAST(coalesce(n_raw, 0) AS BIGINT) AS n_raw,
         |       CAST(coalesce(n_eq, 0) AS BIGINT) AS n_eq
         |FROM a FULL JOIN b ON a.source = b.source
         |ORDER BY source""".stripMargin,

    "q142_phrase_search" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents),
         |h AS (SELECT doc_id,
         |        len(list_filter(generate_series(1, len(toks) - 1),
         |          i -> toks[i] = '${Phrase(0)}'
         |           AND toks[i + 1] = '${Phrase(1)}')) AS occ
         |      FROM t)
         |SELECT CAST(sum(occ) AS BIGINT) AS n_occurrences,
         |       CAST(count(*) FILTER (WHERE occ > 0) AS BIGINT) AS n_docs,
         |       min(doc_id) FILTER (WHERE occ > 0) AS min_doc,
         |       max(doc_id) FILTER (WHERE occ > 0) AS max_doc
         |FROM h""".stripMargin
  )
}
