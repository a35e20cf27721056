package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that break at 100 TB (builder-prompt
  * scale requirements; no reference analog — flink-ms never joins).
  *
  *  - [[saltedJoin]]: equi-join under heavy key skew. A hot key sends its
  *    entire fact partition to one reducer; salting splits each fact key
  *    across `salt` sub-keys and replicates the (small-side) build rows
  *    once per sub-key, so the hot key's work spreads over `salt` tasks.
  *    AQE's skew handling covers sort-merge joins automatically; explicit
  *    salting is for when the build side must also stay shuffled (too big
  *    to broadcast) or the engine's runtime re-plan is unavailable.
  *  - [[colocatedWrite]] / bucketed tables: pre-shuffle both sides of a
  *    recurring join ONCE at write time (`bucketBy` on the join key); every
  *    later join on that key is exchange-free — the 100 TB pattern for the
  *    rating-fact ⋈ factor-model join when the model outgrows broadcast.
  */
object ScaleJoins {

  /** Skew-safe inner equi-join on `key`. `fact` rows get a random-but-
    * deterministic salt in [0, salt); `dim` rows are replicated `salt`
    * times. Result equals `fact.join(dim, key)` exactly. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltCol = "__graft_salt"
    require(!fact.columns.contains(saltCol) && !dim.columns.contains(saltCol),
      s"inputs must not already have a $saltCol column")
    // deterministic salt from the row content keeps retries idempotent;
    // map columns are unhashable in Spark, so salt from the rest (the key
    // itself is always hashable and always included)
    val hashCols = fact.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val salted = fact.withColumn(saltCol,
      pmod(hash(struct(hashCols: _*)), lit(salt)))
    val replicated = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Skew-safe two-stage aggregation: SUM/COUNT on `keyCol` where one key
    * dominates (the grouped twin of [[saltedJoin]]). Stage 1 groups on
    * (key, salt-of-row) — the hot key's rows spread over `buckets`
    * reducers; stage 2 re-sums the per-bucket partials on the key alone,
    * a `keys × buckets`-row input no matter how skewed the data. Only
    * re-aggregable partials (sums, counts) are legal here, which is why
    * the API takes named sum columns instead of arbitrary expressions;
    * exactness under re-association is the caller's job (use integer
    * fixed-point for floats). Results equal the plain one-stage groupBy
    * exactly. NOTE Spark's partial aggregation already does map-side
    * combining per TASK; the salt stage matters when a single REDUCER
    * key is still too hot after it (billions of identical keys at 100 TB).
    */
  def saltedAgg(df: DataFrame, keyCol: String, sums: Map[String, Column],
                buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltCol = "__graft_agg_salt"
    require(!df.columns.contains(saltCol),
      s"input must not already have a $saltCol column")
    require(!sums.contains("n"),
      "sums key 'n' collides with the built-in count column")
    val hashCols = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    // salt = hash(row content, row position): content alone would send
    // FULLY-IDENTICAL rows of the hot key to one bucket — exactly the
    // "billions of identical keys" case this operator exists for. The
    // position component (monotonically_increasing_id) is not stable
    // across retries, which is fine here: bucket assignment only needs
    // every row counted once, and re-aggregable sums are bucket-agnostic
    // (unlike saltedJoin, where the dim replication must line up).
    val partial = df
      .withColumn(saltCol, pmod(hash(struct(hashCols: _*),
        monotonically_increasing_id()), lit(buckets)))
      .groupBy(col(keyCol), col(saltCol))
      .agg(count(lit(1)).as("__n"),
        sums.toSeq.sortBy(_._1).map { case (n, c) => sum(c).as(n) }: _*)
    partial
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"),
        sums.keys.toSeq.sorted.map(n => sum(col(n)).as(n)): _*)
  }

  /** Write `df` bucketed+sorted by `key` into the session catalog as
    * `table`, so subsequent equi-joins on `key` between co-bucketed tables
    * need no shuffle (both sides already hash-distributed identically). */
  def colocatedWrite(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Make the optimizer's runtime bloom-filter injection observable: for a
    * shuffle equi-join whose build side carries a selective filter, Spark
    * can build a bloom filter from the build-side keys at runtime and push
    * `might_contain(key)` into the probe side's SCAN — non-joining fact
    * rows die before the shuffle, the 100 TB benefit DPP gives partition
    * keys extended to arbitrary join keys. Injection is gated on size
    * estimates tuned for clusters (probe scan ≥ 10 GB by default); this
    * pins the gates so the behavior exists at any scale. Session-wide by
    * necessity: the decision happens at optimization time, long after the
    * DataFrame is built. ScaleJoinsSpec asserts both the injected
    * bloom-filter plan shape and result parity with the plain join. */
  def enableRuntimeBloomFilter(spark: org.apache.spark.sql.SparkSession,
                               probeScanThresholdBytes: Long = 0L,
                               buildThresholdBytes: Long = 100L << 20): Unit = {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      probeScanThresholdBytes.toString)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      buildThresholdBytes.toString)
  }

  /** Null-safe skew diagnosis: rows per key, top-n heaviest keys with
    * their share of the total — the decision input for salt sizing. The
    * grand total is a scalar aggregate cross-joined back in (an
    * unpartitioned window would funnel every per-key count through one
    * task — the exact pathology this profiler exists to diagnose). */
  def skewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    counts
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n"), round(col("n") / col("_total"), 6).as("share"))
      .orderBy(col("n").desc, col("key"))
  }
}
