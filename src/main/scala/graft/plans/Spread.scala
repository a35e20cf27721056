package graft.plans

import org.apache.spark.sql.DataFrame

/** Small-input parallelization guard for operators whose per-row work
  * dwarfs their scan cost (brute-force vector scoring, shingling,
  * token-window chunking).
  *
  * Spark's map-side pipeline inherits the SCAN's partitioning, and
  * parquet cannot split below a row group — so a small single-row-group
  * table scans as ONE split and everything up to the first exchange
  * (the expensive part of these operators) serializes on one core. On
  * the 32-core bench session this measured as q240's two kNN passes
  * running as 1-task 1.8–2.1 s stages and q237's chunk-index build as a
  * 4.5 s 2-task stage.
  *
  * [[apply]] repartitions to the session's default parallelism ONLY
  * when the input arrives narrower than it: at 100 TB the scan has
  * thousands of splits and this is a no-op by construction — an
  * unconditional repartition there would COLLAPSE the scan and shuffle
  * the corpus, exactly the wrong direction. When it does fire, the
  * shuffle carries only the small input already flowing into the
  * operator, and downstream results are partitioning-independent (the
  * fleet-wide discipline: deterministic tie-breaks, integer-lattice
  * sums, sort_array'd collects), so values and hashes are unchanged.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    // streaming frames: the partition-count probe (.rdd) is illegal on
    // an unstarted stream, and micro-batch partitioning is the source's
    // contract — operators that need a rebalance on a stream declare it
    // explicitly (SURVEY §2.9), so the guard is batch-only by design
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
