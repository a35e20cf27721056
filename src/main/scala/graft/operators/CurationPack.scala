package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.{TextFunctions => T}
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
    "q40_curation" -> ((s, dir) => {
      val docs = withMutatedCopies(s, dir)
      // stage 1+2: language + quality floor (scan-stage predicates; the
      // score is the SAME TextFunctions.qualityScore q21 reports — and it
      // guards zero-token docs, which a curation pipeline must filter,
      // not crash on)
      val en = docs.filter(col("source").isNotNull)
        .withColumn("q", T.qualityScore(col("text"), TextPack.stopwords))
        .filter(col("q") >= QualityFloor)
      // stage 3: exact dedup — keep the min doc_id per normalized content
      // persisted: the LSH pipeline + anti-join + stats all re-read this
      // stage; in production this is the materialization point between
      // curation passes. The cache outlives the returned DataFrame (the
      // driver contract gives no post-action hook) — it is a few MB of
      // curated text and Spark evicts LRU under pressure
      val exactKeep = en
        .withColumn("h", Dedup.contentHash(col("text")))
        .withColumn("keeper", min(col("doc_id"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
        .filter(col("doc_id") === col("keeper"))
        .drop("h", "keeper")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // stage 4: near-dup removal — drop the higher id of each verified pair
      val pairs = Dedup.minhashLsh(exactKeep, shingleN = 3, numHashes = 16,
        bands = 4, threshold = JaccardThreshold)
      val dropIds = pairs.select(col("doc_b").as("doc_id")).distinct()
      val curated = exactKeep.join(broadcast(dropIds), Seq("doc_id"), "left_anti")
      // stage 5: per-source stats of the surviving corpus
      curated
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(T.tokens(col("text")))).cast("long").as("total_tokens"),
          round(avg(col("q")), 6).as("avg_quality"))
        .orderBy("source")
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
         |       ROUND(AVG(q), 6) AS avg_quality
         |FROM curated GROUP BY source ORDER BY source""".stripMargin)
  }
}
