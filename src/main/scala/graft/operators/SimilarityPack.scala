package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Similarity-search queries over the embeddings table (64-dim float
  * vectors): near-dup pairs, brute-force ANN baseline, IVF-bucketed ANN. */
object SimilarityPack extends QueryPack {

  val NearDupThreshold = 0.98
  val NumCentroids = 8

  /** Probe counts for the q223 IVF tuning sweep. */
  val NprobeSweep: Seq[Int] = Seq(1, 2, 4)

  /** q225 candidate-list depth (MRR@k / hit@k cut). */
  val MrrK = 10

  /** q233 near-dup threshold sweep: the thresholds, the graded
    * perturbation magnitudes (the embeddings are unit-norm, so deltas
    * 0.1/0.25/0.45 on one component plant pairs at cosine ≈
    * 0.995/0.97/0.90±0.02 — the loosest group deliberately STRADDLES the
    * 0.90 floor so the curve has a partial level), and the widened band
    * count — at cosine 0.90 a 16-band signature misses a true pair with
    * p ≈ 4e-3 (too hot for an exact oracle); 64 bands push the per-pair
    * miss below 1e-9. The knob IS the lesson: looser dedup thresholds
    * buy recall with bands, not with pair enumeration. */
  val SweepThresholds: Seq[Double] = Seq(0.90, 0.95, 0.98)
  val SweepDeltas: Seq[Double] = Seq(0.1, 0.25, 0.45)
  val SweepBands = 64

  /** q235 farthest-point-sampling coreset size. */
  val CoresetK = 6
  val SamplePerCluster = 5
  val Dim = 64
  val PerturbOffset = 100000L
  /** PQ geometry: 8 subspaces of 8 dims, 16 codewords per subspace. */
  val PqM = 8
  val PqCodewords = 16

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Near-dup test corpus: embeddings ∪ a slightly perturbed copy of every
    * 5th vector (ids offset by [[PerturbOffset]], first component +0.1) —
    * the same planted-near-duplicate design the text-curation pipeline
    * uses. Organic random pairs sit far below cosine 0.98, the planted
    * pairs just under 1.0, so the near-dup operator has real work whose
    * output the all-pairs oracle checks exactly. Perturbation happens
    * AFTER the FLOAT→DOUBLE cast so both engines add 0.1 in doubles. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("vec"))
    base.unionAll(base.filter(col("id") % 5 === 0)
      .select((col("id") + PerturbOffset).as("id"),
        transform(col("vec"), (x, i) =>
          when(i === 0, x + 0.1).otherwise(x)).as("vec")))
  }

  /** q233 sweep corpus: every 5th vector gets a perturbed copy whose
    * first-component delta cycles through [[SweepDeltas]] by (id DIV 5)
    * mod 3 — planting near-dup pairs at three distinct cosine levels so a
    * threshold sweep has a real curve to trace. Organic pairs of this
    * positive-orthant corpus sit near cosine 0.75, far under the sweep
    * floor, so the qualifying set stays planted-only and bounded. */
  private def gradedCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("vec"))
    val delta = SweepDeltas.zipWithIndex.foldLeft(lit(SweepDeltas.last)) {
      case (acc, (d, i)) =>
        when(expr("(id DIV 5) % 3") === i, lit(d)).otherwise(acc)
    }
    // the perturbation is applied BEFORE the id is re-aliased: with both
    // in one select list, Spark's lateral-column-alias resolution binds
    // delta's `id` to the already-offset alias and silently shifts every
    // delta group by (PerturbOffset DIV 5) mod 3 (caught by the
    // Round6bOpsSpec all-pairs recount)
    base.unionAll(base.filter(col("id") % 5 === 0)
      .select(col("id"), transform(col("vec"), (x, i) =>
        when(i === 0, x + delta).otherwise(x)).as("vec"))
      .select((col("id") + PerturbOffset).as("id"), col("vec")))
  }

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def centroids(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** Labeled variants shared by the exact (q197) and IVF-bucketed (q203)
    * hard-negative miners — one definition so the two cannot drift. */
  private def labeledCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  private def labeledQueries(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Embedding-cosine near-duplicate pairs over the planted-dup corpus:
    // LSH band candidates (equi-join) + exact verify — no cartesian
    // product anywhere in the plan (plan-shape asserted in SimilaritySpec).
    "q34_embedding_neardup" -> ((s, dir) => {
      Similarity.cosineNearDup(nearDupCorpus(s, dir), NearDupThreshold, Dim)
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup-style semantic dedup, end to end: embedding near-dup pairs
    // (blocked LSH + exact verify, q34's operator) → connected components
    // under transitivity (DupGroups) → the keep/drop ledger a curation run
    // executes (keep the min id of each group, drop the rest). The min
    // label IS the keeper, so the component id doubles as keep_id.
    "q68_semantic_dedup" -> ((s, dir) => {
      val pairs = Similarity.cosineNearDup(nearDupCorpus(s, dir), NearDupThreshold, Dim)
      DupGroups.connectedComponents(pairs, "id_a", "id_b")
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("group_size"),
          (count(lit(1)) - 1).as("n_dropped"))
        .select(col("comp").as("keep_id"), col("group_size"), col("n_dropped"))
        .orderBy("keep_id")
    }),

    // Hard-negative mining: per query, the 3 nearest corpus vectors whose
    // LABEL differs — the contrastive-training pairs that actually move
    // the loss (random negatives are trivially separable). Exact top-k
    // with the query side broadcast; the 100 TB path swaps the corpus
    // scan for the IVF index exactly like q36.
    "q197_hard_negatives" -> ((s, dir) => {
      Similarity.hardNegatives(labeledCorpus(s, dir),
          labeledQueries(s, dir), k = 3)
        .select(col("qid"), col("rank"), col("id").as("neg_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // q197's 100 TB path made concrete: hard negatives mined inside the
    // query's IVF bucket only (the q36 layout with the label column
    // riding the index rows). Same bucket-scan cost as plain IVF search;
    // recall vs the exact q197 is the q174-style tradeoff.
    "q203_ivf_hard_negatives" -> ((s, dir) => {
      Similarity.ivfHardNegatives(labeledCorpus(s, dir),
          labeledQueries(s, dir), centroids(s, dir), k = 3)
        .select(col("qid"), col("rank"), col("id").as("neg_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // Brute-force exact top-5 ANN baseline.
    "q35_ann_bruteforce" -> ((s, dir) => {
      Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), k = 5)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // IVF-bucketed ANN (the scale path; recall vs q35 tested in ScalaTest).
    "q36_ann_ivf" -> ((s, dir) => {
      Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir), centroids(s, dir), k = 3)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // ANN recall audit: the IVF index (q36's operator) measured per query
    // against the exact brute-force top-k on the SAME corpus — the
    // index-quality counterpart of q116's dedup-recall audit. An index
    // you can't measure is an index you can't trust after the next
    // re-ingest; this emits the ledger (per query: exact-k size, hits the
    // bucketed search kept, recall) that decides whether the centroid
    // count / probe budget needs raising. All outputs are integer counts
    // or exact count ratios — no float-order hazard; both rankings break
    // ties on (rounded sim DESC, id), so the hit sets are engine-exact.
    // Scale shape: the brute-force side is |queries| × |corpus| with the
    // query side broadcast — at 100 TB the audit runs on a query SAMPLE
    // (queries are already the %50 stratum), never the full corpus as
    // queries; the IVF side touches one bucket per query.
    // IVF nprobe tuning sweep — the curve an index operator actually
    // reads before picking a probe count: micro-averaged recall@5 vs
    // exact for nprobe ∈ {1, 2, 4} (with 8 centroids, 4 probes searches
    // half the index). Exact ground truth is computed ONCE and pinned;
    // each probe level reuses the same bucketed layout, so the sweep
    // costs three bucket scans, not three index builds. Recall is an
    // exact integer ratio (Σhit/Σexact) — engine-identical.
    "q223_ivf_nprobe_sweep" -> ((s, dir) => {
      val k = 5
      val ex = Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), k)
        .select(col("qid"), col("id"))
        // EAGER: each probe level's hit count reaches this frame through
        // a BROADCAST exchange; lazy, the three broadcast jobs race to
        // compute the brute-force ground truth concurrently
        .localCheckpoint(true) // shared by all probe levels
      val exTot = ex.agg(count(lit(1)).as("n_exact"),
        countDistinct(col("qid")).as("n_queries"))
      // probe sets NEST, so ONE assignment + scoring pass at the deepest
      // level serves the whole sweep (guide §1.2: the old per-level
      // ivfTopKMultiProbe calls re-assigned and re-scored the corpus
      // 3×); level np = candidates from the first np buckets + the same
      // (sim desc, id) top-k window, exactly ivfTopKMultiProbe's result
      val scored = Similarity.ivfMultiProbeScored(corpus(s, dir),
          queriesDf(s, dir), centroids(s, dir), NprobeSweep.max)
        .localCheckpoint(true) // shared by all probe levels (eager: the
        // per-level broadcast jobs race a lazy pin)
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
      NprobeSweep.map { np =>
        val approx = scored.filter(col("probe_rank") <= np)
          .withColumn("rank", row_number().over(wk))
          .filter(col("rank") <= k)
          .select(col("qid"), col("id"))
        val hits = ex.join(approx, Seq("qid", "id"))
          .agg(count(lit(1)).as("n_hit"))
        exTot.crossJoin(broadcast(hits))
          .select(lit(np.toLong).as("nprobe"), col("n_queries"),
            col("n_exact"), col("n_hit"),
            graft.functions.Portable.snap6(
              col("n_hit").cast("double") / col("n_exact")).as("recall"))
      }.reduce(_ unionAll _).orderBy("nprobe")
    }),

    // Diversity coreset by farthest-point sampling (k-center greedy, the
    // 2-approximation): seed with the smallest id, then k−1 times pick
    // the vector whose similarity to its NEAREST chosen center is lowest
    // — the classic diverse-subset selector (spread probes, eval seeds,
    // annotation batches) that q90's quota sampling cannot express
    // (quotas balance cluster COUNTS; FPS maximizes separation). The
    // loop lives entirely IN the plan: each step is a corpus scan ×
    // broadcast of the ≤k chosen rows, a max-per-row, and a 1-row
    // min_by aggregate that the next step cross-joins — no driver-side
    // collect anywhere, so the same plan runs unchanged on a cluster.
    // Cost O(k·n) scans, the canonical FPS cost. Radii (1 − nearest-
    // center sim at selection time) are non-increasing by construction
    // — the spec asserts it; sims round to 4 before any comparison so
    // both engines pick identical argmins.
    "q235_fps_coreset" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
            .as("vec"))
        .withColumn("n2", graft.functions.VectorFunctions.sqNorm(col("vec")))
        // EAGER: every FPS step broadcasts the chosen set while the main
        // job scans this frame; lazy, those concurrent jobs race to load
        // the embedding corpus before any block persists
        .localCheckpoint(true) // scanned once per FPS step
      val first = e.orderBy("id").limit(1)
        .select(lit(0).as("step"), col("id").as("cid"),
          col("vec").as("cvec"), col("n2").as("cn2"),
          lit(null).cast("double").as("radius"))
      def sim(cv: org.apache.spark.sql.Column,
              c2: org.apache.spark.sql.Column) = round(
        graft.functions.VectorFunctions.dot(col("vec"), cv)
          / (sqrt(col("n2")) * sqrt(c2)), 4)
      val chosen = (1 until CoresetK).foldLeft(first) { (acc, k) =>
        // the chosen set rides as ONE broadcast row holding a struct
        // array, and the per-row nearest-center max is an array_max over
        // its ≤ k elements — identical rounded sims and the same max, but
        // no corpus-sized exchange and no array-keyed hash aggregate per
        // step (guide §2.3/§2.4: the old crossJoin×k + groupBy(id, vec,
        // n2) shuffled the whole embedding corpus once per FPS step and
        // hashed 64-double array keys in every partial aggregate)
        val centers = acc.agg(
          collect_list(struct(col("cvec"), col("cn2"))).as("cs"))
        val nearest = e.crossJoin(broadcast(centers))
          .select(col("id"), col("vec"), col("n2"),
            array_max(transform(col("cs"),
              c => sim(c.getField("cvec"), c.getField("cn2")))).as("smax"))
        // each 1-row selection is checkpointed EAGERLY: without a
        // checkpoint, step k's plan re-executes the whole prefix chain
        // (acc appears both under `nearest` and in the union); lazy, the
        // final action's per-step broadcast exchanges race to materialize
        // the same chain concurrently
        val next = nearest
          .agg(min_by(struct(col("id"), col("vec"), col("n2"), col("smax")),
            struct(col("smax"), col("id"))).as("m"))
          .select(lit(k).as("step"), col("m.id").as("cid"),
            col("m.vec").as("cvec"), col("m.n2").as("cn2"),
            (lit(1.0) - col("m.smax")).as("radius"))
          .localCheckpoint(true)
        acc.unionAll(next)
      }
      chosen.select(col("step"), col("cid").as("center_id"), col("radius"))
        .orderBy("step")
    }),

    // Near-dup threshold tuning sweep — the curve a dedup operator reads
    // before committing a cosine cut: pairs and affected docs at 0.90 /
    // 0.95 / 0.98 over a corpus with planted duplicates at three cosine
    // levels. Candidates are generated ONCE at the loosest threshold
    // (the 64-band signature keeps that exact — see SweepBands); tighter
    // levels are filters over the already-verified sims, so the sweep
    // costs one LSH pass however many thresholds it traces. No cartesian
    // anywhere (the fleet guardrail applies to this plan too).
    "q233_neardup_sweep" -> ((s, dir) => {
      val pairs = Similarity.cosineNearDup(gradedCorpus(s, dir),
          SweepThresholds.min, Dim, bands = SweepBands)
        // EAGER: each threshold level's id count reaches this frame via a
        // BROADCAST exchange; lazy, the three broadcast jobs race to run
        // the whole LSH near-dup pipeline concurrently
        .localCheckpoint(true) // shared by all threshold levels
      SweepThresholds.map { t =>
        val p = pairs.filter(col("cos_sim") >= t)
        val ids = p.select(col("id_a").as("id"))
          .unionAll(p.select(col("id_b").as("id")))
        p.agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(ids.agg(
            countDistinct(col("id")).as("n_ids"))))
          .select(lit(t).as("threshold"), col("n_pairs"), col("n_ids"))
      }.reduce(_ unionAll _).orderBy("threshold")
    }),

    // Ranked-retrieval quality of the IVF index — MRR@10 and hit@{1,3,10}
    // against the EXACT top-1 neighbor (the metric a serving team reports
    // next to q174's set-recall@k: "how high does the true best answer
    // rank?"). Ground truth is one brute-force top-1 row per query; the
    // candidate list is the production ivfTopK path at k = 10, so the
    // number measures the real index, not a replica. Reciprocal ranks
    // ride integer micro-units (1e6 DIV rank — exact in both engines),
    // so the means are partition-order-free. Scale: the truth and
    // candidate tables are |queries|-sized (queries are already a
    // sample stratum), the join is on (qid, id), and the final
    // aggregate is a single reduce — nothing here scans corpus² at any
    // scale.
    "q225_mrr_hit_rate" -> ((s, dir) => {
      val truth = Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), 1)
        .select(col("qid"), col("id"))
      val cand = Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir),
          centroids(s, dir), MrrK)
        .select(col("qid"), col("id"), col("rank"))
      val per = truth.join(cand, Seq("qid", "id"), "left_outer")
        .select(col("qid"), coalesce(col("rank"), lit(0)).cast("long").as("rk"))
      val P = graft.functions.Portable
      per.agg(count(lit(1)).as("n_queries"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_hit1"),
          sum(when(col("rk").between(1, 3), 1L).otherwise(0L)).as("n_hit3"),
          sum(when(col("rk") >= 1, 1L).otherwise(0L)).as("n_hit10"),
          sum(when(col("rk") >= 1, expr("1000000 DIV rk")).otherwise(0L))
            .as("rr_e6"))
        .select(col("n_queries"),
          P.snap6(col("n_hit1").cast("double") / col("n_queries")).as("hit1"),
          P.snap6(col("n_hit3").cast("double") / col("n_queries")).as("hit3"),
          P.snap6(col("n_hit10").cast("double") / col("n_queries")).as("hit10"),
          P.snap6(col("rr_e6").cast("double") / 1e6 / col("n_queries"))
            .as("mrr"))
    }),

    "q174_ann_recall" -> ((s, dir) => {
      val k = 5
      val exact = Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), k)
        .select(col("qid"), col("id"))
      val approx = Similarity.ivfTopK(corpus(s, dir), queriesDf(s, dir),
          centroids(s, dir), k)
        .select(col("qid"), col("id"))
      val hit = exact.join(approx, Seq("qid", "id"))
        .groupBy("qid").agg(count(lit(1)).as("n_hit"))
      exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
        .join(hit, Seq("qid"), "left_outer")
        .select(col("qid"), col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall", graft.functions.Portable.snap6(
          col("n_hit").cast("double") / col("n_exact")))
        .orderBy("qid")
    }),

    // Cluster-balanced diversity sample: assign every embedding to its
    // nearest centroid, keep a fixed per-cluster quota in deterministic
    // hash order — the selection step that keeps a corpus subset spread
    // across semantic clusters instead of letting one dense cluster
    // dominate (the balance half of SemDeDup-style curation).
    // Scale shape: assignment is the q36 broadcast max_by (one shuffle of
    // the corpus); the quota is a rank-limit window (WindowGroupLimit —
    // per-task top-m heaps before the exchange, plan-asserted for the
    // same shape in SelectionSpec).
    // PCA dimensionality reduction (64 -> 8) ahead of ANN — the standard
    // index-shrinking step. The eigensolve itself is not SQL-expressible,
    // so the query emits deterministic gates the oracle pins: every vector
    // projected (count + width), explained-variance ratios monotone
    // nonincreasing (an eigendecomposition invariant — false means the
    // solver broke), and the 8-component cumulative variance inside the
    // band measured for this corpus family (0.16-0.20 across sf; the
    // embeddings are near-isotropic, so k/d = 0.125 anchors it).
    // Component SIGNS are solver-dependent, so projections are gated, not
    // pinned. Scale: fit is one pass building a d x d Gramian (d = 64);
    // transform is a scan-stage matrix-vector product.
    "q92_pca_reduce" -> ((s, dir) => {
      import org.apache.spark.ml.feature.PCA
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val data = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), array_to_vector(
          graft.functions.VectorFunctions.toDoubleArray(col("embedding")))
          .as("features"))
      val model = new PCA().setK(8)
        .setInputCol("features").setOutputCol("proj").fit(data)
      val ev = model.explainedVariance.toArray
      val monotone = ev.sliding(2).forall(p => p(0) >= p(1) - 1e-12)
      val cum = ev.sum
      model.transform(data)
        .select(vector_to_array(col("proj")).as("p"))
        .agg(count(lit(1)).as("n_projected"),
          bool_and(size(col("p")) === 8).as("dims_ok"),
          lit(monotone).as("var_monotone"),
          lit(cum >= 0.13 && cum <= 0.30).as("cumvar_ok"))
    }),

    "q90_cluster_sample" -> ((s, dir) => {
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val asg = Similarity.assign(e, centroids(s, dir), "id", "vec")
        .select(col("id"), col("cid"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
        .orderBy(graft.functions.Portable.hash32(
          concat(lit("cs:"), col("id").cast("string"))), col("id"))
      asg.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= SamplePerCluster)
        .select(col("cid"), col("rk"), col("id"))
        .orderBy("cid", "rk")
    }),

    // spark.ml random-hyperplane LSH ANN. The LSH itself is not
    // SQL-expressible, so the query emits deterministic QUALITY GATES the
    // oracle CAN pin: every query answered with a full top-3 (structural
    // completeness of the bucketed join) and rank-1 recall vs the exact
    // brute-force baseline ≥ 0.5 (the approximation bar; seeded hashes make
    // it deterministic). A hash mismatch means the LSH degenerated —
    // empty buckets or lost recall. Detailed neighbor lists remain
    // asserted in SimilaritySpec.
    "q38_ann_lsh" -> ((s, dir) => {
      val q = queriesDf(s, dir).select(col("qid"))
      val lshSets = Similarity.lshTopK(corpus(s, dir), queriesDf(s, dir), k = 3)
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("cnt"), collect_set(col("id")).as("ids"))
      val bf1 = Similarity.bruteForceTopK(corpus(s, dir), queriesDf(s, dir), k = 1)
        .select(col("qid"), col("id").as("top1"))
      q.join(lshSets, Seq("qid"), "left").join(bf1, Seq("qid"), "left")
        .agg(count(lit(1)).as("n_queries"),
          bool_and(coalesce(col("cnt"), lit(0L)) === 3).as("full_topk"),
          (avg(when(array_contains(col("ids"), col("top1")), 1.0)
            .otherwise(0.0)) >= 0.5).as("recall_ok"))
    }),

    // Product quantization + ADC search: 16x vector compression with a
    // table-lookup distance (the memory side of billion-scale ANN; IVF
    // bucketing q36 composes with this inside each bucket). Codebooks are
    // the first PqCodewords embeddings (deterministic, like q36's
    // centroids), so the WHOLE pipeline — encode argmins, LUT, ADC sums,
    // ranking — is replicated exactly in DuckDB: no recall gate needed,
    // the oracle pins every neighbor and distance.
    "q81_pq_adc" -> ((s, dir) => {
      import graft.functions.VectorFunctions.toDoubleArray
      val all = Tables.table(s, dir, "embeddings")
      val corp = all.select(col("vec_id").as("id"),
        toDoubleArray(col("embedding")).as("vec"))
      val codebook = all.filter(col("vec_id") < PqCodewords)
        .select(col("vec_id").cast("int").as("code"),
          toDoubleArray(col("embedding")).as("cvec"))
      val qs = all.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), toDoubleArray(col("embedding")).as("qvec"))
      val enc = PQ.encode(corp, codebook, m = PqM, dim = Dim)
      PQ.adcTopK(enc, codebook, qs, m = PqM, dim = Dim, k = 3)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
          round(col("adc_dist").cast("double"), 6).as("adc_dist"))
        .orderBy("qid", "rank")
    }),

    // The full IVF-PQ index: q36's centroid bucketing stacked on q81's
    // product quantization — ADC scores ONLY same-bucket candidates, and
    // the candidate join carries the bucket id as an extra equi-key (the
    // billion-scale ANN layout: |corpus|/|buckets| candidates at 16x
    // compression). Oracle replays both halves exactly.
    "q97_ivfpq" -> ((s, dir) => {
      import graft.functions.VectorFunctions.toDoubleArray
      val all = Tables.table(s, dir, "embeddings")
      val corp = all.select(col("vec_id").as("id"),
        toDoubleArray(col("embedding")).as("vec"))
      val codebook = all.filter(col("vec_id") < PqCodewords)
        .select(col("vec_id").cast("int").as("code"),
          toDoubleArray(col("embedding")).as("cvec"))
      val qs = all.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), toDoubleArray(col("embedding")).as("qvec"))
      val cents = centroids(s, dir)
      val corpB = Similarity.assign(corp, cents, "id", "vec")
        .select(col("id"), col("cid"))
      val qB = Similarity.assign(qs, cents, "qid", "qvec")
        .select(col("qid"), col("cid"))
      val enc = PQ.encode(corp, codebook, m = PqM, dim = Dim)
      PQ.adcTopKBucketed(enc, codebook, qs, m = PqM, dim = Dim, k = 3,
          corpusBuckets = corpB, queryBuckets = qB)
        .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
          round(col("adc_dist").cast("double"), 6).as("adc_dist"))
        .orderBy("qid", "rank")
    }),

    // Symmetric int8 quantization of the embedding column — the 4x
    // compression step a 100 TB vector corpus applies before ANN.
    // floor(x + 0.5) on BOTH engines (plain round() differs in half-way
    // tie behavior across engines); clamp to [-127, 127]; report
    // reconstruction error stats per vector.
    "q44_quantize" -> ((s, dir) => {
      val v = graft.functions.VectorFunctions.toDoubleArray(col("embedding"))
      val scale = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0
      // zero guard: an all-zero embedding has scale 0 — x/scale would be
      // NaN here but NULL in DuckDB; both engines quantize it to zeros
      val q = transform(v, x => when(scale === 0.0, lit(0.0)).otherwise(
        greatest(lit(-127.0), least(lit(127.0), floor(x / scale + 0.5)))))
      val err = zip_with(v, q, (x, qi) => abs(x - qi * scale))
      Tables.table(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"),
          round(col("embedding").getItem(0).cast("double"), 6).as("v0"),
          element_at(q, 1).cast("long").as("q0"),
          round(aggregate(err, lit(0.0), (a, x) => greatest(a, x)), 6).as("max_err"),
          round(aggregate(err, lit(0.0), (a, x) => a + x) / 64.0, 6).as("mean_err"))
        .orderBy("vec_id")
    }),

    // kNN-distance outlier scoring: a point whose 5 nearest neighbors
    // are all far away sits in a sparse region — the embedding-space
    // anomaly/junk detector (mislabeled scans, encoder failures). Scored
    // exactly via the q35 brute-force baseline (broadcast query side;
    // the IVF path q36/q97 is the corpus-scale variant). The per-query
    // score is an INTEGER sum of 1e4-scaled sims — the 4-decimal sims
    // are identical doubles in both engines, and integer addition makes
    // the sum independent of summation order, so ranking by it is
    // cross-engine stable where a float sum would flake.
    "q165_knn_outlier" -> ((s, dir) => {
      val q = Tables.table(s, dir, "embeddings")
        .filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val topk = Similarity.bruteForceTopK(corpus(s, dir), q, k = 5)
      val agg = topk.groupBy("qid")
        .agg(count(lit(1)).as("n_nn"),
          sum(round(col("sim") * 10000, 0).cast("long")).as("sim_sum_e4"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("sim_sum_e4").asc, col("qid"))
      agg.withColumn("outlier_rank", row_number().over(w))
        .select(col("outlier_rank"), col("qid"), col("n_nn"), col("sim_sum_e4"),
          graft.functions.Portable.snap6(
            col("sim_sum_e4").cast("double") / (col("n_nn") * lit(10000.0)))
            .as("mean_sim"))
        .orderBy("outlier_rank")
    })
  )

  // ---- DuckDB twins --------------------------------------------------------

  private val Pb = graft.functions.Portable

  /** Rounded cosine between two embedding list columns (FLOAT[] → DOUBLE);
    * zero-norm vectors yield NULL like the engine's pairSim guard. */
  private def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    val denom = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"ROUND(CASE WHEN $denom = 0.0 THEN NULL ELSE ${dot(a, b)} / $denom END, 4)"
  }

  /** [[cosSql]] over already-DOUBLE list columns (the near-dup corpus casts
    * before perturbing). */
  private def cosDblSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> $x[i] * $y[i]))"
    val denom = s"(sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"ROUND(CASE WHEN $denom = 0.0 THEN NULL ELSE ${dot(a, b)} / $denom END, 4)"
  }

  def oracles: Map[String, String] = Map(
    "q38_ann_lsh" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       TRUE AS full_topk, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id % 50 = 0""".stripMargin,

    "q34_embedding_neardup" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |e AS (
         |  SELECT id, v FROM base
         |  UNION ALL
         |  SELECT id + $PerturbOffset AS id,
         |         list_transform(generate_series(1, $Dim),
         |                        i -> CASE WHEN i = 1 THEN v[i] + 0.1 ELSE v[i] END) AS v
         |  FROM base WHERE id % 5 = 0)
         |SELECT a.id AS id_a, b.id AS id_b,
         |       ${cosDblSql("a.v", "b.v")} AS cos_sim
         |FROM e a JOIN e b ON a.id < b.id
         |WHERE ${cosDblSql("a.v", "b.v")} >= $NearDupThreshold
         |ORDER BY id_a, id_b""".stripMargin,

    "q68_semantic_dedup" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |e AS (
         |  SELECT id, v FROM base
         |  UNION ALL
         |  SELECT id + $PerturbOffset AS id,
         |         list_transform(generate_series(1, $Dim),
         |                        i -> CASE WHEN i = 1 THEN v[i] + 0.1 ELSE v[i] END) AS v
         |  FROM base WHERE id % 5 = 0),
         |pairs AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b
         |  FROM e a JOIN e b ON a.id < b.id
         |  WHERE ${cosDblSql("a.v", "b.v")} >= $NearDupThreshold),
         |und AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |        UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM und),
         |walk(id, comp) AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT u.src AS id, w.comp FROM und u JOIN walk w ON u.dst = w.id),
         |labels AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id)
         |SELECT comp AS keep_id, CAST(count(*) AS BIGINT) AS group_size,
         |       CAST(count(*) - 1 AS BIGINT) AS n_dropped
         |FROM labels GROUP BY comp ORDER BY keep_id""".stripMargin,

    "q203_ivf_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, cid FROM buckets WHERE vec_id % 50 = 0),
         |cand AS (SELECT q.qid, b.vec_id AS neg_id
         |         FROM q JOIN buckets b ON b.cid = q.cid AND b.vec_id <> q.qid),
         |scored AS (SELECT cand.qid, cand.neg_id,
         |                  ${cosSql("eq.embedding", "en.embedding")} AS sim
         |           FROM cand JOIN e eq ON eq.vec_id = cand.qid
         |                     JOIN e en ON en.vec_id = cand.neg_id
         |           WHERE en.label <> eq.label),
         |ranked AS (SELECT qid, neg_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neg_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neg_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "q197_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
         |      FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, e.vec_id AS neg_id,
         |                  ${cosSql("e.embedding", "q.qvec")} AS sim
         |           FROM e CROSS JOIN q
         |           WHERE e.vec_id <> q.qid AND e.label <> q.qlabel),
         |ranked AS (SELECT qid, neg_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neg_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neg_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "q35_ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, e.vec_id AS neighbor_id,
         |                  ${cosSql("e.embedding", "q.qvec")} AS sim
         |           FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |ranked AS (SELECT qid, neighbor_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neighbor_id, sim FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q36_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, cid FROM buckets WHERE vec_id % 50 = 0),
         |cand AS (SELECT q.qid, b.vec_id AS neighbor_id
         |         FROM q JOIN buckets b ON b.cid = q.cid AND b.vec_id <> q.qid),
         |scored AS (SELECT cand.qid, cand.neighbor_id,
         |                  ${cosSql("eq.embedding", "en.embedding")} AS sim
         |           FROM cand JOIN e eq ON eq.vec_id = cand.qid
         |                     JOIN e en ON en.vec_id = cand.neighbor_id),
         |ranked AS (SELECT qid, neighbor_id, sim,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |                        ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
         |           FROM scored)
         |SELECT qid, rank, neighbor_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "q223_ivf_nprobe_sweep" -> {
      val perNp = NprobeSweep.map { np =>
        s"""SELECT $np AS nprobe,
           |       (SELECT count(DISTINCT qid) FROM bf) AS n_queries,
           |       (SELECT count(*) FROM bf) AS n_exact,
           |       (SELECT count(*) FROM bf
           |        JOIN ivf$np ON ivf$np.qid = bf.qid AND ivf$np.id = bf.id)
           |         AS n_hit""".stripMargin
      }.mkString("\n UNION ALL\n")
      val ivfPerNp = NprobeSweep.map { np =>
        s"""qb$np AS (SELECT vec_id AS qid, cid FROM asg
           |          WHERE vec_id % 50 = 0 AND rn <= $np),
           |cand$np AS (SELECT qb$np.qid, b.vec_id AS id
           |            FROM qb$np JOIN buckets b
           |              ON b.cid = qb$np.cid AND b.vec_id <> qb$np.qid),
           |sc$np AS (SELECT cand$np.qid, cand$np.id,
           |                 ${cosSql("eq.embedding", "en.embedding")} AS sim
           |          FROM cand$np JOIN e eq ON eq.vec_id = cand$np.qid
           |                       JOIN e en ON en.vec_id = cand$np.id),
           |ivf$np AS (SELECT qid, id FROM (
           |             SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
           |                      ORDER BY sim DESC, id) AS rank FROM sc$np)
           |           WHERE rank <= 5)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
         |      WHERE vec_id % 50 = 0),
         |bf_scored AS (SELECT q.qid, e.vec_id AS id,
         |                     ${cosSql("e.embedding", "q.qvec")} AS sim
         |              FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |bf AS (SELECT qid, id FROM (
         |         SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                  ORDER BY sim DESC, id) AS rank FROM bf_scored)
         |       WHERE rank <= 5),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |      WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid)
         |                 AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |$ivfPerNp
         |SELECT CAST(nprobe AS BIGINT) AS nprobe,
         |       CAST(n_queries AS BIGINT) AS n_queries,
         |       CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       ${graft.functions.Portable.snap6Sql(
                   "CAST(n_hit AS DOUBLE) / n_exact")} AS recall
         |FROM ($perNp) ORDER BY nprobe""".stripMargin
    },

    "q235_fps_coreset" -> {
      val steps = (1 until CoresetK).map { k =>
        val prev = if (k == 1) "c0" else s"cents${k - 1}"
        s"""s$k AS (SELECT e.id, e.v,
           |          max(${cosSql("e.v", "c.v")}) AS smax
           |        FROM e CROSS JOIN $prev c GROUP BY e.id, e.v),
           |n$k AS (SELECT id, v, smax FROM s$k ORDER BY smax, id LIMIT 1),
           |cents$k AS (SELECT id, v FROM $prev
           |            UNION ALL SELECT id, v FROM n$k)""".stripMargin
      }.mkString(",\n")
      val out = (1 until CoresetK).map(k =>
        s"SELECT $k AS step, id AS center_id, 1.0 - smax AS radius FROM n$k")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |c0 AS (SELECT id, v FROM e ORDER BY id LIMIT 1),
         |$steps
         |SELECT CAST(step AS INTEGER) AS step, center_id, radius FROM (
         |  SELECT 0 AS step, id AS center_id,
         |         CAST(NULL AS DOUBLE) AS radius FROM c0
         |  UNION ALL $out)
         |ORDER BY step""".stripMargin
    },

    "q233_neardup_sweep" -> {
      val deltaSql = "CASE (id // 5) % 3 WHEN 0 THEN " +
        s"${SweepDeltas(0)} WHEN 1 THEN ${SweepDeltas(1)} " +
        s"ELSE ${SweepDeltas(2)} END"
      val levels = SweepThresholds.map(t =>
        s"SELECT CAST($t AS DOUBLE) AS threshold").mkString(" UNION ALL ")
      s"""WITH base AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |e AS (
         |  SELECT id, v FROM base
         |  UNION ALL
         |  SELECT id + $PerturbOffset AS id,
         |         list_transform(generate_series(1, $Dim),
         |           i -> CASE WHEN i = 1 THEN v[i] + ($deltaSql)
         |                ELSE v[i] END) AS v
         |  FROM base WHERE id % 5 = 0),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |              ${cosDblSql("a.v", "b.v")} AS cos_sim
         |       FROM e a JOIN e b ON a.id < b.id),
         |lv AS ($levels),
         |hits AS (SELECT lv.threshold, pr.id_a, pr.id_b
         |         FROM lv JOIN pr ON pr.cos_sim >= lv.threshold)
         |SELECT lv.threshold,
         |       CAST(coalesce(np, 0) AS BIGINT) AS n_pairs,
         |       CAST(coalesce(ni, 0) AS BIGINT) AS n_ids
         |FROM lv LEFT JOIN (
         |  SELECT threshold, count(*) AS np FROM hits GROUP BY 1) p
         |  ON p.threshold = lv.threshold
         |LEFT JOIN (
         |  SELECT threshold, count(DISTINCT id) AS ni FROM (
         |    SELECT threshold, id_a AS id FROM hits
         |    UNION ALL SELECT threshold, id_b FROM hits) GROUP BY 1) i
         |  ON i.threshold = lv.threshold
         |ORDER BY lv.threshold""".stripMargin
    },

    "q225_mrr_hit_rate" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0),
         |bf_scored AS (SELECT q.qid, e.vec_id AS id,
         |                     ${cosSql("e.embedding", "q.qvec")} AS sim
         |              FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |truth AS (SELECT qid, id FROM (
         |            SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                     ORDER BY sim DESC, id) AS rank FROM bf_scored)
         |          WHERE rank = 1),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |qb AS (SELECT vec_id AS qid, cid FROM buckets WHERE vec_id % 50 = 0),
         |cand0 AS (SELECT qb.qid, b.vec_id AS id
         |          FROM qb JOIN buckets b ON b.cid = qb.cid AND b.vec_id <> qb.qid),
         |ivf_scored AS (SELECT cand0.qid, cand0.id,
         |                      ${cosSql("eq.embedding", "en.embedding")} AS sim
         |               FROM cand0 JOIN e eq ON eq.vec_id = cand0.qid
         |                          JOIN e en ON en.vec_id = cand0.id),
         |cand AS (SELECT qid, id, rank FROM (
         |           SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                    ORDER BY sim DESC, id) AS rank FROM ivf_scored)
         |         WHERE rank <= $MrrK),
         |per AS (SELECT truth.qid,
         |               CAST(coalesce(cand.rank, 0) AS BIGINT) AS rk
         |        FROM truth LEFT JOIN cand
         |          ON cand.qid = truth.qid AND cand.id = truth.id),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |               sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_hit1,
         |               sum(CASE WHEN rk BETWEEN 1 AND 3 THEN 1 ELSE 0 END) AS n_hit3,
         |               sum(CASE WHEN rk >= 1 THEN 1 ELSE 0 END) AS n_hit10,
         |               sum(CASE WHEN rk >= 1 THEN 1000000 // rk ELSE 0 END) AS rr_e6
         |        FROM per)
         |SELECT n_queries,
         |       ${Pb.snap6Sql("CAST(n_hit1 AS DOUBLE) / n_queries")} AS hit1,
         |       ${Pb.snap6Sql("CAST(n_hit3 AS DOUBLE) / n_queries")} AS hit3,
         |       ${Pb.snap6Sql("CAST(n_hit10 AS DOUBLE) / n_queries")} AS hit10,
         |       ${Pb.snap6Sql("CAST(rr_e6 AS DOUBLE) / 1e6 / n_queries")} AS mrr
         |FROM agg""".stripMargin,

    "q174_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0),
         |bf_scored AS (SELECT q.qid, e.vec_id AS id,
         |                     ${cosSql("e.embedding", "q.qvec")} AS sim
         |              FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |bf AS (SELECT qid, id FROM (
         |         SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                  ORDER BY sim DESC, id) AS rank FROM bf_scored)
         |       WHERE rank <= 5),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |qb AS (SELECT vec_id AS qid, cid FROM buckets WHERE vec_id % 50 = 0),
         |cand AS (SELECT qb.qid, b.vec_id AS id
         |         FROM qb JOIN buckets b ON b.cid = qb.cid AND b.vec_id <> qb.qid),
         |ivf_scored AS (SELECT cand.qid, cand.id,
         |                      ${cosSql("eq.embedding", "en.embedding")} AS sim
         |               FROM cand JOIN e eq ON eq.vec_id = cand.qid
         |                         JOIN e en ON en.vec_id = cand.id),
         |ivf AS (SELECT qid, id FROM (
         |          SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |                   ORDER BY sim DESC, id) AS rank FROM ivf_scored)
         |        WHERE rank <= 5),
         |hit AS (SELECT bf.qid, CAST(count(*) AS BIGINT) AS n_hit
         |        FROM bf JOIN ivf ON ivf.qid = bf.qid AND ivf.id = bf.id
         |        GROUP BY 1),
         |ex AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM bf GROUP BY 1)
         |SELECT ex.qid AS qid, n_exact, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |       ${graft.functions.Portable.snap6Sql(
               "CAST(coalesce(n_hit, 0) AS DOUBLE) / n_exact")} AS recall
         |FROM ex LEFT JOIN hit ON hit.qid = ex.qid ORDER BY qid""".stripMargin,

    "q92_pca_reduce" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_projected, TRUE AS dims_ok,
        |       TRUE AS var_monotone, TRUE AS cumvar_ok
        |FROM embeddings""".stripMargin,

    "q90_cluster_sample" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < $NumCentroids),
         |asg AS (SELECT vec_id, cid,
         |               ROW_NUMBER() OVER (PARTITION BY vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, cid) AS rn
         |        FROM e CROSS JOIN c),
         |buckets AS (SELECT vec_id AS id, cid FROM asg WHERE rn = 1),
         |ranked AS (SELECT cid, id,
         |                  CAST(ROW_NUMBER() OVER (PARTITION BY cid
         |                    ORDER BY ${graft.functions.Portable.hash32Sql("'cs:' || CAST(id AS VARCHAR)")}, id)
         |                    AS INTEGER) AS rk
         |           FROM buckets)
         |SELECT cid, rk, id FROM ranked WHERE rk <= $SamplePerCluster
         |ORDER BY cid, rk""".stripMargin,

    "q44_quantize" -> {
      val v = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
      s"""WITH e AS (
         |  SELECT vec_id, $v AS v,
         |         list_max(list_transform($v, x -> abs(x))) / 127.0 AS s
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |q AS (
         |  SELECT vec_id, v, s,
         |         list_transform(v, x -> CASE WHEN s = 0 THEN 0.0
         |                                ELSE greatest(-127.0, least(127.0, floor(x / s + 0.5))) END) AS qv
         |  FROM e),
         |err AS (
         |  SELECT vec_id, v, qv,
         |         list_transform(generate_series(1, 64), i -> abs(v[i] - qv[i] * s)) AS e
         |  FROM q)
         |SELECT vec_id,
         |       ROUND(v[1], 6) AS v0,
         |       CAST(qv[1] AS BIGINT) AS q0,
         |       ROUND(list_max(e), 6) AS max_err,
         |       ROUND(list_sum(e) / 64.0, 6) AS mean_err
         |FROM err ORDER BY vec_id""".stripMargin
    },

    "q97_ivfpq" -> {
      val sub = Dim / PqM
      def dist(x: String, c: String, mi: Int): String = {
        val base = mi * sub
        val diff = s"(CAST($x[$base + j] AS DOUBLE) - CAST($c[$base + j] AS DOUBLE))"
        s"list_sum(list_transform(generate_series(1, $sub), j -> $diff * $diff))"
      }
      val encBranches = (0 until PqM).map(mi =>
        s"SELECT id, code, $mi AS mi, d$mi AS d FROM cd").mkString("\nUNION ALL\n")
      val lutBranches = (0 until PqM).map(mi =>
        s"SELECT qid, code, $mi AS mi, CAST(ROUND(dq$mi, 6) AS DECIMAL(18,6)) AS d FROM lutd")
        .mkString("\nUNION ALL\n")
      s"""WITH cb AS (SELECT CAST(vec_id AS INTEGER) AS code, embedding AS cvec
         |            FROM embeddings WHERE vec_id < $PqCodewords),
         |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
         |      WHERE vec_id % 50 = 0),
         |c AS (SELECT vec_id AS cid, embedding AS centv FROM embeddings
         |      WHERE vec_id < $NumCentroids),
         |asg AS (SELECT e.vec_id, c.cid,
         |               ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                 ORDER BY ${cosSql("e.embedding", "c.centv")} DESC, c.cid) AS rn
         |        FROM embeddings e CROSS JOIN c),
         |buckets AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
         |cd AS (SELECT corpus.id, cb.code,
         |         ${(0 until PqM).map(mi => s"${dist("vec", "cvec", mi)} AS d$mi").mkString(",\n         ")}
         |       FROM corpus, cb),
         |cdm AS ($encBranches),
         |best AS (SELECT id, mi, code,
         |           ROW_NUMBER() OVER (PARTITION BY id, mi ORDER BY d, code) AS rn
         |         FROM cdm),
         |codes AS (SELECT id, mi, code FROM best WHERE rn = 1),
         |lutd AS (SELECT q.qid, cb.code,
         |           ${(0 until PqM).map(mi => s"${dist("qvec", "cvec", mi)} AS dq$mi").mkString(",\n           ")}
         |         FROM q, cb),
         |lut AS ($lutBranches),
         |adc AS (SELECT l.qid, cc.id, sum(l.d) AS adc
         |        FROM codes cc
         |        JOIN buckets bc ON bc.vec_id = cc.id
         |        JOIN lut l ON l.mi = cc.mi AND l.code = cc.code
         |        JOIN buckets bq ON bq.vec_id = l.qid AND bq.cid = bc.cid
         |        GROUP BY 1, 2),
         |r AS (SELECT qid, id, adc,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, id) AS INTEGER) AS rank
         |      FROM adc)
         |SELECT qid, rank, id AS neighbor_id, ROUND(CAST(adc AS DOUBLE), 6) AS adc_dist
         |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    },

    "q81_pq_adc" -> {
      val sub = Dim / PqM
      def dist(x: String, c: String, mi: Int): String = {
        val base = mi * sub
        val diff = s"(CAST($x[$base + j] AS DOUBLE) - CAST($c[$base + j] AS DOUBLE))"
        s"list_sum(list_transform(generate_series(1, $sub), j -> $diff * $diff))"
      }
      val encBranches = (0 until PqM).map(mi =>
        s"SELECT id, code, $mi AS mi, d$mi AS d FROM cd").mkString("\nUNION ALL\n")
      val lutBranches = (0 until PqM).map(mi =>
        s"SELECT qid, code, $mi AS mi, CAST(ROUND(dq$mi, 6) AS DECIMAL(18,6)) AS d FROM lutd")
        .mkString("\nUNION ALL\n")
      s"""WITH cb AS (SELECT CAST(vec_id AS INTEGER) AS code, embedding AS cvec
         |            FROM embeddings WHERE vec_id < $PqCodewords),
         |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
         |      WHERE vec_id % 50 = 0),
         |cd AS (SELECT corpus.id, cb.code,
         |         ${(0 until PqM).map(mi => s"${dist("vec", "cvec", mi)} AS d$mi").mkString(",\n         ")}
         |       FROM corpus, cb),
         |cdm AS ($encBranches),
         |best AS (SELECT id, mi, code,
         |           ROW_NUMBER() OVER (PARTITION BY id, mi ORDER BY d, code) AS rn
         |         FROM cdm),
         |codes AS (SELECT id, mi, code FROM best WHERE rn = 1),
         |lutd AS (SELECT q.qid, cb.code,
         |           ${(0 until PqM).map(mi => s"${dist("qvec", "cvec", mi)} AS dq$mi").mkString(",\n           ")}
         |         FROM q, cb),
         |lut AS ($lutBranches),
         |adc AS (SELECT l.qid, c.id, sum(l.d) AS adc
         |        FROM codes c JOIN lut l ON l.mi = c.mi AND l.code = c.code
         |        GROUP BY 1, 2),
         |r AS (SELECT qid, id, adc,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, id) AS INTEGER) AS rank
         |      FROM adc)
         |SELECT qid, rank, id AS neighbor_id, ROUND(CAST(adc AS DOUBLE), 6) AS adc_dist
         |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    },

    "q165_knn_outlier" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
         |      WHERE vec_id % 20 = 0),
         |scored AS (SELECT q.qid, e.vec_id AS nid,
         |                  ${cosSql("e.embedding", "q.qvec")} AS sim
         |           FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |topk AS (SELECT qid, sim FROM (
         |           SELECT qid, sim,
         |                  ROW_NUMBER() OVER (PARTITION BY qid
         |                    ORDER BY sim DESC, nid) AS rk
         |           FROM scored) WHERE rk <= 5),
         |agg AS (SELECT qid, count(*) AS n_nn,
         |               CAST(sum(CAST(round(sim * 10000) AS BIGINT))
         |                 AS BIGINT) AS sim_sum_e4
         |        FROM topk GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY sim_sum_e4, qid) AS INTEGER)
         |         AS outlier_rank,
         |       qid, n_nn, sim_sum_e4,
         |       ${graft.functions.Portable.snap6Sql(
             "CAST(sim_sum_e4 AS DOUBLE) / (n_nn * 10000.0)")} AS mean_sim
         |FROM agg ORDER BY outlier_rank""".stripMargin
  )
}
