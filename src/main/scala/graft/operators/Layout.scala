package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — layout maintenance for long-lived tables.
  *
  * Streaming ingest and fine-grained partitioning leave thousands of tiny
  * parquet files behind; at 100 TB the file-listing and per-file open
  * costs dominate scans long before the data does. Compaction rewrites a
  * directory into `targetFiles` larger files with `coalesce` — a
  * NARROW dependency (tasks concatenate input splits; no shuffle, no
  * sort, rows move but never repartition by content). Pair with
  * [[ZOrder.layoutWrite]] when the rewrite should also re-cluster.
  */
object Layout {

  /** Rewrite `inDir` into `outDir` as `targetFiles` files. Returns
    * (files before, files after) from the two file listings — metadata
    * only, no extra scan of the data. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFiles: Int): (Int, Int) = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val in = spark.read.parquet(inDir)
    in.coalesce(targetFiles).write.mode("overwrite").parquet(outDir)
    (in.inputFiles.length, spark.read.parquet(outDir).inputFiles.length)
  }

  /** Idempotent partition backfill: overwrite ONLY the hive-style
    * partitions present in `df`, leaving every other partition of the
    * table untouched (partitionOverwriteMode=dynamic; the default STATIC
    * mode would truncate the whole table first). This is the
    * reprocess-one-day / backfill-one-source write a 100 TB pipeline
    * runs daily — rewriting the full table for a one-partition fix is a
    * 1000× write amplification. Set per-write (a writer option), not
    * session-wide, so concurrent writers keep their own semantics. */
  def overwritePartitions(df: org.apache.spark.sql.DataFrame, path: String,
                          partCol: String): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)

  /** Write `df` as a bucketed + per-bucket-sorted managed table: the
    * layout investment that makes every later equi-join or aggregation
    * on `keyCol` between co-bucketed tables run with ZERO exchange — the
    * single biggest repeated-shuffle saver for a 100 TB fact/dim pair
    * that joins daily (shuffle once at write time, never again at read).
    * Bucket counts must match across tables meant to co-join;
    * BucketedJoinSpec proves the exchange-free plan and result parity
    * with the shuffled join. */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
                    keyCol: String, buckets: Int): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }
}
