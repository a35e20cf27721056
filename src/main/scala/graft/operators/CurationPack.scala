package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.{Portable, TextFunctions => T}
import graft.sources.Tables

/** The end-to-end corpus-curation pipeline — the composition a training-data
  * run executes, as ONE dataflow: language filter → quality floor → exact
  * dedup → MinHash-LSH near-dup removal → per-source corpus stats.
  *
  * Input is the documents table plus injected *mutated* re-crawls (text with
  * a suffix token, ids offset by [[MutOffset]]): exact dedup must NOT catch
  * them (they differ) and the near-dup stage MUST (shingle Jaccard ≈ 0.9),
  * so both dedup stages are load-bearing in the oracle comparison.
  *
  * Scale shape: filters are scan-stage expressions; exact dedup is one
  * shuffle on the content hash; near-dup is the LSH pipeline (bounded by
  * bucket collisions, not n²); the keep-list anti-join broadcasts the small
  * removal set. No stage is quadratic in the corpus.
  */
object CurationPack extends QueryPack {

  val MutOffset = 200000L
  val QualityFloor = 0.5
  val JaccardThreshold = 0.5

  /** documents ∪ mutated copy of every 4th doc (near- but not exact dups). */
  def withMutatedCopies(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    d.unionAll(d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + MutOffset).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"), col("source")))
  }

  def withMutatedCopiesSql: String =
    s"""SELECT doc_id, text, source FROM documents
       |UNION ALL
       |SELECT doc_id + $MutOffset AS doc_id, text || ' zzz' AS text, source
       |FROM documents WHERE doc_id % 4 = 0""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The contract query is a thin wrapper over the LAZY pipeline face
    // (Curation.pipeline) — no persist, nothing to clean up after the
    // driver's action; library callers that iterate use
    // Curation.curateWith, which persists for the callback scope and
    // always unpersists (asserted in CurationSpec).
    "q40_curation" -> ((s, dir) => {
      Curation.sourceStats(
        Curation.pipeline(withMutatedCopies(s, dir), TextPack.stopwords,
          QualityFloor, shingleN = 3, numHashes = 16, bands = 4,
          jaccardThreshold = JaccardThreshold))
    })
  )

  def oracles: Map[String, String] = {
    val toks = TextPack.toksSql("text")
    Map("q40_curation" ->
      s"""WITH docs AS ($withMutatedCopiesSql),
         |scored AS (
         |  SELECT doc_id, text, source,
         |         ${graft.functions.TextFunctions.qualityScoreSql(TextPack.stopwords)} AS q
         |  FROM (SELECT doc_id, text, source, $toks AS toks FROM docs)),
         |en AS (SELECT * FROM scored WHERE source IS NOT NULL AND q >= $QualityFloor),
         |exact_keep AS (
         |  SELECT doc_id, text, source, q FROM (
         |    SELECT *, MIN(doc_id) OVER (PARTITION BY ${DedupPack.contentHashSql("text")}) AS keeper
         |    FROM en) t
         |  WHERE doc_id = keeper),
         |sh AS (${DedupPack.shinglesSql("exact_keep")}),
         |${DedupPack.minhashCandCtes()},
         |${DedupPack.neardupRemovalCtes(JaccardThreshold)},
         |curated AS (SELECT * FROM exact_keep WHERE doc_id NOT IN (SELECT doc_b FROM neardup))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(len($toks)) AS BIGINT) AS total_tokens,
         |       ${Portable.snap6Sql("AVG(q)")} AS avg_quality
         |FROM curated GROUP BY source ORDER BY source""".stripMargin)
  }
}
