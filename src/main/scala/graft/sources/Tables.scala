package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source surface of the engine (SURVEY.md §2.1).
  *
  * Parquet loaders for the driver test tables, plus the reference's file
  * formats re-expressed as declarative Spark reads:
  *  - S1/S2 typed CSV ratings scan with delimiter + optional header
  *    (reference: flink-als/ALSImpl.scala:22-32, als-ms/MSE.java:40-44)
  *  - S3 libsvm scan (flink-svm/SVMImpl.scala:21)
  *  - S4/S5/S6 text scan, recursive enumeration, streaming directory poll
  *    (flink-als/ALSMeanVector.scala:25, als-ms/SGD.java:44-60)
  *  - S7 collection/range source (model-generator/ALSModelGenerator.scala:46-53)
  *
  * All reads declare an explicit schema — never inference — matching the
  * reference's fixed positional schemas.
  */
object Tables {

  /** Names of the driver-provided test tables. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one driver test table from an sf directory.
    *
    * Memoized per (session, path): a fresh `spark.read.parquet` re-lists
    * the directory and re-reads footers for schema on EVERY call, and a
    * multi-query session (the bench runs every contract query) pays that
    * per query. Reusing the analyzed relation reuses its FileIndex and
    * schema. The cache holds logical plans only — no data is pinned.
    * Weak keying cannot work here (a Dataset strongly references its
    * SparkSession, so WeakHashMap entries would never be collectible);
    * instead entries for stopped sessions are evicted on access.
    *
    * ASSUMES the sf directories are immutable for the session's lifetime
    * (true for the driver's pre-generated testdata). A rewritten path
    * would serve a stale FileIndex — call [[invalidate]] after rewriting
    * a directory this loader has already read. */
  private val relationCache = scala.collection.concurrent.TrieMap
    .empty[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]

  /** Drop cached relations under `dir` (all sessions) and refresh Spark's
    * own per-path caches, so the next `table()` call re-lists the files.
    * Needed only when a previously-read sf directory is rewritten.
    * Matches on path SEGMENTS (`dir/…`), so "/data/sf1" cannot evict
    * "/data/sf10". Spark's file-status cache is per-session, so callers
    * must pass every live session that read the directory. */
  def invalidate(spark: SparkSession, dir: String): Unit = {
    val prefix = dir.stripSuffix("/") + "/"
    relationCache.values.foreach(_.filterInPlace((p, _) => !p.startsWith(prefix)))
    spark.catalog.refreshByPath(dir)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    relationCache.filterInPlace((s, _) => !s.sparkContext.isStopped)
    val perSession = relationCache
      .getOrElseUpdate(spark, scala.collection.concurrent.TrieMap.empty)
    perSession.getOrElseUpdate(s"$dir/$name.parquet",
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Schema of the reference's rating fact: userId, itemId, rating. */
  val ratingSchema: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("item_id", IntegerType, nullable = false),
    StructField("rating", DoubleType, nullable = false)))

  /** The events table with `ts` normalized to a session-timezone
    * TimestampType (sessions here run UTC, per the driver contract), so
    * every downstream date/window function sees one type regardless of
    * how the generator wrote the column. Handles the schemas the driver
    * has shipped across rounds:
    *   - TIMESTAMP(NANOS) read as BIGINT under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (integer `div` keeps
    *     full precision — ns values exceed double's 2^53);
    *   - plain timestamp[us] (isAdjustedToUTC=false → TIMESTAMP_NTZ),
    *     cast to TimestampType: under a UTC session the wall-clock is
    *     unchanged, matching DuckDB's naive read of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Corrupt-tolerant typed CSV scan: rows that fail the schema land
    * whole in a `_bad` column instead of killing the job (PERMISSIVE
    * mode) — the posture a crawl-scale ingest needs, where a malformed
    * line per million is certain and a fail-fast scan is a denial of
    * service against the pipeline. Callers split on `_bad IS NULL` and
    * route the quarantine rows to a dead-letter sink. NOTE Spark refuses
    * a raw-scan query whose referenced columns reduce to ONLY the
    * corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    * COLUMN — column pruning would re-parse with a partial schema and
    * change which rows count as corrupt): materialize the parse once
    * (cache, or write the parsed batch) before splitting good/bad, which
    * an ingest pipeline does anyway. */
  def robustCsv(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType,
                delimiter: String = ","): org.apache.spark.sql.DataFrame =
    spark.read
      .schema(schema.add("_bad", "string"))
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(path)

  /** S1/S2: typed CSV scan; delimiter comma or tab, optional header skip. */
  def ratingsCsv(spark: SparkSession, path: String,
                 delimiter: String = ",", header: Boolean = false): DataFrame =
    spark.read.schema(ratingSchema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .csv(path)

  /** S3: libsvm scan -> (label DOUBLE, features VECTOR). */
  def libsvm(spark: SparkSession, path: String): DataFrame =
    spark.read.format("libsvm").load(path)

  /** S4/S5: text lines, optionally recursive directory enumeration. */
  def textLines(spark: SparkSession, path: String,
                recursive: Boolean = false): DataFrame =
    spark.read.option("recursiveFileLookup", recursive.toString).text(path)

  /** S6: continuously-polled directory as a stream (micro-batch). */
  def textStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(dir)

  /** S7: collection source, `env.fromCollection(1 to n)` analog. */
  def idRange(spark: SparkSession, n: Long, parallelism: Int = 0): DataFrame = {
    val base = spark.range(1, n + 1)
    (if (parallelism > 0) base.repartition(parallelism) else base).toDF("id")
  }

  /** JSON-lines scan with an EXPLICIT schema — never schema inference,
    * which runs a full extra pass over the data during planning (the
    * q45-count() mistake at the source layer). Malformed lines land in
    * the `_bad` quarantine column instead of killing the scan, matching
    * [[robustCsv]]'s PERMISSIVE contract. */
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_bad", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(path)

  /** ORC scan (native reader, vectorized) — the second columnar format a
    * warehouse migration typically carries alongside parquet. Explicit
    * schema for the same no-inference-pass reason as [[jsonLines]];
    * column pruning and predicate pushdown work as with parquet. */
  def orc(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
