package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Pair-scan cost discipline: the FLOAT→DOUBLE cast and the squared norm of
  * every vector are computed ONCE per row before any pair join; the
  * per-pair work is a single codegen dot product + one divide. The
  * arithmetic (dot/(sqrt(n2a)·sqrt(n2b))) is exactly the composed cosine the
  * oracles compute — only hoisted.
  *
  * Ranking ties are broken on (rounded sim DESC, id ASC) so results are
  * deterministic and stable across engines (1-ulp float differences can't
  * reorder ranks).
  *
  * Input contracts: corpus(id LONG, vec ARRAY<FLOAT|DOUBLE>),
  * queries(qid LONG, qvec), centroids(cid LONG, cvec).
  */
object Similarity {

  /** Project (id, vec, …) → (id, vec cast to ARRAY<DOUBLE>, n2 = Σv²),
    * renaming to avoid collisions after self-joins. */
  private def prepped(df: DataFrame, idCol: String, vecCol: String,
                      suffix: String): DataFrame =
    df.select(col(idCol).as(s"id$suffix"),
      toDoubleArray(col(vecCol)).as(s"vec$suffix"),
      sqNorm(toDoubleArray(col(vecCol))).as(s"n2$suffix"))

  /** Spread a narrow scan across the session's cores before a FLOP-bound
    * broadcast cross join — BroadcastNestedLoopJoin inherits the STREAM
    * side's partitioning (measured: q240's two kNN passes each ran as a
    * 1-task 1.8–2.1 s stage on a 32-core session). See
    * [[graft.plans.Spread]] for the guard's full rationale. */
  private def spread(df: DataFrame): DataFrame = graft.plans.Spread(df)

  /** Cosine from precomputed sides — one dot per pair. A zero-norm vector
    * has no defined cosine: null (ranked last, never "similar") instead of
    * an ANSI division error killing the scan. */
  private def pairSim(sa: String, sb: String) = {
    val denom = sqrt(col(s"n2$sa")) * sqrt(col(s"n2$sb"))
    round(when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dot(col(s"vec$sa"), col(s"vec$sb")) / denom), 4)
  }

  /** Exact top-k neighbors per query by cosine similarity. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = spread(prepped(corpus, "id", "vec", "_c"))
    val q = prepped(queries, "qid", "qvec", "_q")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id_c") =!= col("id_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * highest-cosine corpus vectors with a DIFFERENT label — the "closest
    * wrong answers" a retrieval/embedding model trains against (in-batch
    * random negatives are too easy; these are the pairs that move the
    * loss). Inputs carry labels: corpus (id, vec, label), queries (qid,
    * qvec, qlabel). Exact form — query side broadcast, corpus scanned
    * once, top-k per query via rank window over only the label-mismatched
    * pairs. At 100 TB the corpus side swaps to the IVF index (q36's
    * operator) exactly like the ANN queries; this exact form is also the
    * recall oracle for that swap. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id").as("id_c"),
      toDoubleArray(col("vec")).as("vec_c"),
      sqNorm(toDoubleArray(col("vec"))).as("n2_c"),
      col("label").as("lbl_c"))
    val q = queries.select(col("qid").as("id_q"),
      toDoubleArray(col("qvec")).as("vec_q"),
      sqNorm(toDoubleArray(col("qvec"))).as("n2_q"),
      col("qlabel").as("lbl_q"))
    val scored = spread(c).crossJoin(broadcast(q))
      .filter(col("id_c") =!= col("id_q") && col("lbl_c") =!= col("lbl_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Assign each row to its highest-cosine centroid: (id, vec, cid).
    *
    * Argmax as `max_by` aggregation, not a row_number window: the window
    * form shuffles ALL |rows| × |centroids| scored pairs to sort each
    * partition; `max_by` partial-aggregates map-side, so only one
    * candidate per (row, task) crosses the wire — the difference between
    * shuffling k× the corpus and shuffling the corpus once at 100 TB.
    * Ties break exactly like the previous ORDER BY (sim DESC, cid ASC):
    * the ordering struct is (sim, -cid), nulls pinned below every real
    * cosine (a zero-norm vector has sim null → assigned the last-ranked
    * centroid, never "closest"). */
  def assign(data: DataFrame, centroids: DataFrame,
             idCol: String, vecCol: String): DataFrame = {
    val d = spread(prepped(data, idCol, vecCol, "_d"))
    val c = prepped(centroids, "cid", "cvec", "_k")
    d.crossJoin(broadcast(c))
      .groupBy(col("id_d"))
      .agg(max_by(
        struct(col("vec_d"), col("n2_d"), col("id_k")),
        struct(coalesce(pairSim("_d", "_k"), lit(-2.0)).as("s"),
          (-col("id_k")).as("nid"))).as("best"))
      .select(col("id_d").as(idCol), col("best.vec_d").as(vecCol),
        col("best.n2_d").as("n2"), col("best.id_k").as("cid"))
  }

  /** Scan-stage centroid assignment for STREAMING/serve paths: centroids
    * ride the plan as a literal array (there are few — the IVF codebook),
    * and the argmax is `array_max` over per-centroid (sim, -cid, cid)
    * structs — no aggregation, no shuffle, legal in any streaming plan.
    * Tie/null semantics match [[assign]]: (rounded sim DESC, cid ASC),
    * zero-norm rows fall to the last-ranked centroid via the -2.0 floor. */
  def assignScan(data: DataFrame, centroidsLocal: Seq[(Long, Array[Double])],
                 idCol: String, vecCol: String): DataFrame = {
    require(centroidsLocal.nonEmpty, "need at least one centroid")
    val d = prepped(data, idCol, vecCol, "_d")
    val cands = centroidsLocal.map { case (cid, cvec) =>
      val cv = lit(cvec)
      val n2c = cvec.map(x => x * x).sum
      val denom = sqrt(col("n2_d")) * math.sqrt(n2c)
      val sim = round(when(denom === 0.0, lit(null).cast("double"))
        .otherwise(dot(col("vec_d"), cv) / denom), 4)
      struct(coalesce(sim, lit(-2.0)).as("s"), lit(-cid).as("nid"),
        lit(cid).as("cid"))
    }
    d.select(col("id_d").as(idCol), col("vec_d").as(vecCol), col("n2_d").as("n2"),
      array_max(array(cands: _*)).getField("cid").as("cid"))
  }

  /** IVF top-k: search only the query's centroid bucket. Trades recall for
    * a |corpus|/|buckets| reduction in scored pairs. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int): DataFrame = {
    val corpusB = assign(corpus, centroids, "id", "vec")
      .select(col("cid"), col("id").as("id_c"), col("vec").as("vec_c"),
        col("n2").as("n2_c"))
    val queriesB = assign(queries, centroids, "qid", "qvec")
      .select(col("cid"), col("qid").as("id_q"), col("qvec").as("vec_q"),
        col("n2").as("n2_q"))
    // query side is always ≪ corpus: broadcast it so the corpus never
    // shuffles on cid (post-window stats are unknown to Catalyst, which
    // would otherwise pick a sort-merge join)
    val scored = broadcast(queriesB).join(corpusB, "cid")
      .filter(col("id_c") =!= col("id_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Multi-probe IVF search — THE recall/latency knob of an IVF index:
    * each query probes its top-`nprobe` centroids instead of one, so
    * recall climbs toward exact while cost grows only with the probe
    * count (the corpus layout is untouched: every vector still lives in
    * exactly one rank-1 bucket, so probed candidate sets are disjoint
    * and need no dedup). nprobe = 1 degenerates to [[ivfTopK]] exactly;
    * tie semantics ((sim desc, cid) on probes, (sim desc, id) on
    * results) match the single-probe path. */
  def ivfTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
                        centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val scored = ivfMultiProbeScored(corpus, queries, centroids, nprobe)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.select(col("qid"), col("id"), col("sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Multi-probe IVF scoring WITHOUT the final top-k cut: every candidate
    * in the query's `nprobe` nearest buckets, scored, tagged with the
    * bucket's probe rank. Because probe sets NEST (the np nearest buckets
    * are the first np of the nprobe nearest), one corpus assignment + one
    * scoring join serve every probe level ≤ nprobe: level np's exact
    * [[ivfTopKMultiProbe]] result is `probe_rank <= np` + the same
    * (sim desc, id) rank window. q223's sweep composes all its levels
    * from one pass instead of re-assigning and re-scoring the corpus per
    * level (guide §1.2: remove duplicate passes). */
  def ivfMultiProbeScored(corpus: DataFrame, queries: DataFrame,
                          centroids: DataFrame, nprobe: Int): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val corpusB = assign(corpus, centroids, "id", "vec")
      .select(col("cid"), col("id").as("id_c"), col("vec").as("vec_c"),
        col("n2").as("n2_c"))
    val q = prepped(queries, "qid", "qvec", "_q")
    val c = prepped(centroids, "cid", "cvec", "_k")
    // the probe ranking window partitions by query id over a broadcast-
    // sized frame (queries × centroids) — request-sized, never corpus
    val wProbe = Window.partitionBy(col("id_q"))
      .orderBy(coalesce(pairSim("_q", "_k"), lit(-2.0)).desc, col("id_k"))
    val probes = q.crossJoin(broadcast(c))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("id_q"), col("vec_q"), col("n2_q"),
        col("id_k").as("cid"), col("rn").as("probe_rank"))
    broadcast(probes).join(corpusB, "cid")
      .filter(col("id_c") =!= col("id_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"), col("probe_rank"))
  }

  /** The 100 TB path for [[hardNegatives]]: search only the query's IVF
    * bucket (the q36 layout) and exclude same-label members there — the
    * label column simply travels with the index rows, so the bucket scan
    * costs the same as plain IVF search. Inputs: corpus (id, vec, label),
    * queries (qid, qvec, qlabel), centroids (cid, cvec). Labels are
    * re-joined after assignment here; a materialized index
    * ([[ivfWriteIndex]]-style) would store them alongside cid. */
  def ivfHardNegatives(corpus: DataFrame, queries: DataFrame,
                       centroids: DataFrame, k: Int): DataFrame = {
    val corpusB = assign(corpus.select(col("id"), col("vec")),
        centroids, "id", "vec")
      .select(col("cid"), col("id").as("id_c"), col("vec").as("vec_c"),
        col("n2").as("n2_c"))
      .join(corpus.select(col("id").as("id_c"), col("label").as("lbl_c")),
        "id_c")
    val queriesB = assign(queries.select(col("qid"), col("qvec")),
        centroids, "qid", "qvec")
      .select(col("cid"), col("qid").as("id_q"), col("qvec").as("vec_q"),
        col("n2").as("n2_q"))
      .join(queries.select(col("qid").as("id_q"), col("qlabel").as("lbl_q")),
        "id_q")
    val scored = broadcast(queriesB).join(corpusB, "cid")
      .filter(col("id_c") =!= col("id_q") && col("lbl_c") =!= col("lbl_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Train IVF centroids with k-means (seeded) — real centroids instead of
    * arbitrary sample vectors; returns (cid, cvec) in the [[assign]]
    * contract. At 100 TB the fit runs on a sample; assignment of the full
    * corpus stays a broadcast crossJoin + argmax. */
  def trainCentroids(corpus: DataFrame, k: Int, seed: Long = 42L,
                     maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feats = corpus.select(
      array_to_vector(toDoubleArray(col("vec"))).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray) }
      .toDF("cid", "cvec")
  }

  /** Materialize the IVF index: corpus assigned to centroids, written
    * partitioned by centroid id. At 100 TB this is the layout that turns
    * ANN search into a file-pruned scan — a query touches only its
    * bucket's files, enforced by the scan, not the executor. */
  def ivfWrite(corpus: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(corpus, centroids, "id", "vec")
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Incrementally add vectors to a materialized IVF index: assign ONLY
    * the new batch (the existing index is untouched data-wise) and append
    * its rows into their centroid partitions. At 100 TB this is the
    * difference between re-writing the whole index per ingest batch and
    * touching just the partitions the batch lands in — the appended files
    * join the per-cid directories, so [[ivfSearchIndexed]]'s partition
    * pruning keeps working unchanged. Centroids must be the ones the
    * index was built with (a drifted codebook needs a rebuild, not an
    * append — same contract as every IVF implementation). */
  def ivfAppend(newVecs: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(newVecs, centroids, "id", "vec")
      .write.mode("append").partitionBy("cid").parquet(path)

  /** Search a materialized IVF index: queries are assigned to centroids,
    * then joined against the index on the PARTITION column — dynamic
    * partition pruning limits the scan to the queried buckets. */
  def ivfSearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val corpusB = spark.read.parquet(path)
      .select(col("cid"), col("id").as("id_c"),
        toDoubleArray(col("vec")).as("vec_c"), col("n2").as("n2_c"))
    val queriesB = assign(queries, centroids, "qid", "qvec")
      .select(col("cid"), col("qid").as("id_q"),
        toDoubleArray(col("qvec")).as("vec_q"), col("n2").as("n2_q"))
    val scored = corpusB.join(broadcast(queriesB), "cid")
      .filter(col("id_c") =!= col("id_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN via spark.ml BucketedRandomProjectionLSH: hash vectors into
    * random-hyperplane buckets, join within buckets. The third strategy
    * next to brute force (exact) and IVF (centroid-pruned); seeded, so
    * deterministic, but not SQL-expressible → rows-only check + recall
    * assertion in SimilaritySpec. Euclidean-bucketed: candidates are
    * re-scored with exact cosine and re-ranked.
    *
    * The spark.ml MODEL supplies the hash tables, but the candidate join
    * is declarative rather than `approxSimilarityJoin`: that helper
    * row-deduplicates pairs WITH both vector structs in the shuffle key
    * and charges an interpreted euclidean-distance UDF this operator then
    * discards. Here each side explodes its (table, bucket) keys, the
    * equi-join collides them, the codegen cosine runs map-side, and the
    * per-(query, candidate) dedup shuffles only (qid, id, sim). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bucketLength: Double = 2.0, numTables: Int = 3,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val c = prepped(corpus, "id", "vec", "_c")
      .withColumn("features", array_to_vector(col("vec_c")))
    val q = prepped(queries, "qid", "qvec", "_q")
      .withColumn("features", array_to_vector(col("vec_q")))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(c)
    // (table index, bucket id) per row per hash table; BRP emits one hash
    // value per table as a length-1 vector
    def banded(df: DataFrame, suffix: String) =
      model.transform(df)
        .select(col(s"id$suffix"), col(s"vec$suffix"), col(s"n2$suffix"),
          posexplode(col("hashes")).as(Seq("table", "_h")))
        .withColumn("bucket", vector_to_array(col("_h")).getItem(0))
        .drop("_h")
    val pairs = banded(c, "_c").join(banded(q, "_q"), Seq("table", "bucket"))
      .filter(col("id_c") =!= col("id_q"))
      .select(col("id_q").as("qid"), col("id_c").as("id"),
        pairSim("_c", "_q").as("sim"))
      // a pair colliding in several tables appears once per table; partial
      // aggregation dedups map-side, and the exchange carries 3 scalars
      .groupBy(col("qid"), col("id")).agg(first(col("sim")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** All pairs (a < b) with cosine ≥ threshold by brute force — the O(n²)
    * exact baseline, kept ONLY as the recall reference for
    * [[cosineNearDup]] (SimilaritySpec asserts the blocked operator
    * returns identical pairs). Not wired to any driver query: a cartesian
    * product is exactly what a 100 TB dedup must never run. */
  def cosineNearDupExact(corpus: DataFrame, threshold: Double): DataFrame = {
    val l = prepped(corpus, "id", "vec", "_a")
    val r = prepped(corpus, "id", "vec", "_b")
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), pairSim("_a", "_b").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Per-row random-hyperplane band keys: `bands` keys, each packing
    * `bitsPerBand` sign bits of seeded Gaussian projections. Two vectors at
    * angle θ agree on one bit with probability 1−θ/π, so near-dup pairs
    * collide in at least one band w.h.p. — at cosine ≥ 0.98 (θ ≤ 0.2 rad,
    * 16 bands × 8 bits) the miss probability per true pair is < 1e-6, and
    * for the ~1.0-cosine pairs an embedding dedup actually targets it is
    * < 1e-20. Deterministic: hyperplanes derive from `seed` only.
    *
    * One fused native expression (see
    * [[graft.functions.expressions.SignBands]]): the previous composed form
    * built 128 separate dot-product expressions in a single Project, which
    * fell out of whole-stage codegen on size and re-read the vector once
    * per plane — it alone made q34 the slowest bench query. */
  def signBitBands(vec: Column, dim: Int, bands: Int = 16,
                   bitsPerBand: Int = 8, seed: Long = 42L): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    column(graft.functions.expressions.SignBands(
      Cast(expression(vec), ArrayType(DoubleType)), dim, bands, bitsPerBand, seed))
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup, the
    * 100 TB shape: LSH band-bucket candidate generation (an EQUI-join on
    * (band, key), never a cartesian product) + exact cosine verification
    * of candidates only. Same output as [[cosineNearDupExact]] (w.h.p. per
    * [[signBitBands]]; SimilaritySpec compares them exactly), cost bounded
    * by band-bucket collisions instead of n². At real scale the signature
    * projection would be materialized once; here the corpus re-scan is
    * three cheap columnar reads. */
  def cosineNearDup(corpus: DataFrame, threshold: Double, dim: Int,
                    bands: Int = 16, bitsPerBand: Int = 8,
                    seed: Long = 42L): DataFrame = {
    val p = spread(prepped(corpus, "id", "vec", ""))
    val bandRows = p
      .select(col("id"), posexplode(
        signBitBands(col("vec"), dim, bands, bitsPerBand, seed))
        .as(Seq("band", "bkey")))
    val l = bandRows.select(col("band"), col("bkey"), col("id").as("id_a"))
    val r = bandRows.select(col("band"), col("bkey"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val a = p.select(col("id").as("id_a"), col("vec").as("vec_a"), col("n2").as("n2_a"))
    val b = p.select(col("id").as("id_b"), col("vec").as("vec_b"), col("n2").as("n2_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"), pairSim("_a", "_b").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
