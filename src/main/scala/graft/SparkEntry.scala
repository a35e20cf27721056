package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 appears as a named entry in
  * [[queries]] (assembled from the per-family [[QueryPack]]s), with a DuckDB
  * equivalent in [[oracleSql]] where the semantics are ANSI-SQL-expressible.
  * Column names and value rounding are aligned pairwise so the driver's
  * sorted-hash compare is stable.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    AlsPack, ModelCodec, SvmPack, ServePack, GeneratorPack, TrainPack,
    AnalyticsPack, TextPack, DedupPack, SimilarityPack, MultimodalPack,
    CurationPack, PipelinePack, SelectionPack,
    AuditPack, GraphPack, VectorPack, LifecyclePack, SearchPack, TemporalPack,
    FuzzyPack, AugmentPack, MiningPack, RerankPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end capability in one plan: rating fact ⋈
    * broadcast factor models → dot-product predictions → MSE. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_mse")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each entry
    * ensures the engine's native SQL functions (graft_dot, …) are
    * registered on the session before the query plan is built. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap.map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        GraftExtensions.prepareSession(s)
        fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
