package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack

/** ML training jobs as driver-contract queries (SURVEY.md §7.2 step 3).
  *
  * ALS/LinearSVC fits are not ANSI-SQL-expressible, but their OUTPUTS here
  * are deterministic quality gates that ARE: q24 emits per-kind factor-row
  * counts (= distinct users/items in the training sample, derivable from
  * the raw tables) plus a zero NaN count; q25 emits per-feature
  * nonzero-weight booleans (a seeded fit on informative features leaves no
  * weight at ±1e-12). The DuckDB twins compute the counts from the data and
  * pin the gates — a hash mismatch means the fit degenerated (NaNs, dropped
  * ids, collapsed weights), which is exactly what a training health check
  * should catch. Fit-quality assertions (RMSE vs baseline, separability)
  * live in TrainingSpec. Both train on a deterministic sample so the bench
  * cost stays bounded at sf0.1.
  */
object TrainPack extends QueryPack {

  /** q209 negative sampling: candidate draws per sampled user and the
    * negatives kept after the positive anti-join. */
  val NegCandidates = 8
  val NegPerUser = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Implicit-feedback negative sampling — the training-data op the
    // reference's own ALS domain needs: implicit datasets record only
    // POSITIVE interactions, so the trainer must draw per-user negatives
    // from the un-interacted catalog. Deterministic: candidate item ids
    // come from the hash family (seeded by (user, draw index)), invalid
    // draws (items the user actually touched) fall out via a left-anti
    // join on the positive pairs, and the first NegPerUser surviving
    // draws win. The catalog size rides the plan as a 1-row broadcast
    // (no driver action); the anti-join shuffles (user, item) pairs —
    // the only shuffle, keyed exactly like the ALS co-partitioning.
    // The positive-pair table is pinned EAGERLY (fleet rule:
    // multi-consumer checkpoint) — its three consumers (catalog bound,
    // sampled-user set, anti-join probe) were each re-running the
    // orders⋈lineitem join + distinct (measured r8: cold 10.2 → ~4 s
    // at sf0.1).
    "q209_negative_sampling" -> ((s, dir) => {
      val pos = Ratings.ratings(s, dir)
        .select(col("user_id"), col("item_id")).distinct()
        .localCheckpoint()
      val maxItem = pos.agg(max(col("item_id")).as("max_item"))
      val users = pos.select(col("user_id")).distinct()
        .filter(col("user_id") % 7 === 0)
      val cands = users.crossJoin(broadcast(maxItem))
        .select(col("user_id"),
          explode(sequence(lit(1), lit(NegCandidates))).as("j"),
          col("max_item"))
        .select(col("user_id"), col("j"),
          (graft.functions.Portable.hash32(concat(lit("neg:"),
            col("user_id").cast("string"), lit(":"), col("j").cast("string")))
            % col("max_item") + 1).as("item_id"))
        // two draws can collide on the same item — keep the earliest draw
        // index so the user's negatives are DISTINCT items
        .groupBy("user_id", "item_id").agg(min(col("j")).as("j"))
      val negs = cands.join(pos, Seq("user_id", "item_id"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("j")
      negs.withColumn("neg_rank", row_number().over(w))
        .filter(col("neg_rank") <= NegPerUser)
        .select(col("user_id"), col("neg_rank"), col("item_id"))
        .orderBy("user_id", "neg_rank")
    }),

    // ALSImpl parity (flink-als/ALSImpl.scala:35-63): fit, export factors in
    // the wire format, report per-kind row counts + finite-factor check.
    "q24_als_train" -> ((s, dir) => {
      val ratings = Ratings.ratings(s, dir).filter(col("user_id") % 5 === 0)
      val (uf, itf) = Training.alsTrain(ratings, rank = 4, maxIter = 5, blocks = 4)
      Training.alsExport(uf, itf)
        .select(ModelCodec.parseKind(col("record")).as("kind"),
          ModelCodec.parseFactors(col("record")).as("factors"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(when(graft.functions.VectorFunctions.anyNaN(col("factors")), 1)
            .otherwise(0)).cast("long").as("n_nan"))
        .orderBy("kind")
    }),

    // SVMImpl parity (flink-svm/SVMImpl.scala:24-48): hinge-loss linear
    // classifier over lineitem numerics; label = high-price indicator.
    // Emits the exported (feature_id, weight) rows — the model itself.
    "q25_svm_train" -> ((s, dir) => {
      val li = graft.sources.Tables.table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(
          when(col("l_extendedprice") > 30000, 1.0).otherwise(-1.0).as("label"),
          (col("l_quantity") / 50.0).as("f_qty"),
          (col("l_extendedprice") / 100000.0).as("f_price"),
          col("l_discount").as("f_disc"),
          col("l_tax").as("f_tax"))
      val w = Training.svmTrain(li, Seq("f_qty", "f_price", "f_disc", "f_tax"),
        maxIter = 10)
      // Gates must hold at EVERY scale factor, so they assert what the
      // construction guarantees, not incidental sparsity: each weight is
      // finite (the NaN/blow-up guard), and the f_price weight — the label
      // IS a threshold on price — is positive (the fit learned the planted
      // relationship). "All weights nonzero" was a latent flake: at
      // sf0.001's ~90-row sample the hinge loss legitimately zeroes f_qty.
      val learned = broadcast(w.filter(col("feature_id") === 2)
        .select((col("w") > 1e-9).as("price_detector_ok")))
      w.crossJoin(learned)
        .select(col("feature_id"),
          (!isnan(col("w")) && abs(col("w")) < 1e6).as("finite"),
          col("price_detector_ok"))
        .orderBy("feature_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "q209_negative_sampling" ->
      s"""WITH pos AS (
         |  SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |mi AS (SELECT max(item_id) AS max_item FROM pos),
         |u AS (SELECT DISTINCT user_id FROM pos WHERE user_id % 7 = 0),
         |cand0 AS (SELECT user_id, j,
         |           ${graft.functions.Portable.hash32Sql(
                       "'neg:' || CAST(user_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}
         |             % max_item + 1 AS item_id
         |         FROM u CROSS JOIN mi
         |              CROSS JOIN (SELECT unnest(generate_series(1, $NegCandidates)) AS j)),
         |cand AS (SELECT user_id, item_id, min(j) AS j
         |         FROM cand0 GROUP BY user_id, item_id),
         |neg AS (SELECT c.user_id, c.j, c.item_id FROM cand c
         |        ANTI JOIN pos p
         |          ON p.user_id = c.user_id AND p.item_id = c.item_id),
         |r AS (SELECT user_id, item_id,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY j)
         |             AS INTEGER) AS neg_rank
         |      FROM neg)
         |SELECT user_id, neg_rank, item_id FROM r
         |WHERE neg_rank <= $NegPerUser ORDER BY user_id, neg_rank""".stripMargin,

    // Factor tables cover exactly the distinct ids of the training sample;
    // a healthy fit has zero NaN factor vectors.
    "q24_als_train" ->
      """WITH r AS (
        |  SELECT o_custkey AS user_id, l_partkey AS item_id
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey % 5 = 0)
        |SELECT 'I' AS kind, CAST(count(DISTINCT item_id) AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS n_nan FROM r
        |UNION ALL
        |SELECT 'U' AS kind, CAST(count(DISTINCT user_id) AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS n_nan FROM r
        |ORDER BY kind""".stripMargin,

    // The seeded hinge fit on four informative lineitem features must leave
    // every weight materially nonzero (L2 regularization never zeroes them).
    "q25_svm_train" ->
      """SELECT CAST(feature_id AS BIGINT) AS feature_id,
        |       TRUE AS finite, TRUE AS price_detector_ok
        |FROM (VALUES (1), (2), (3), (4)) AS t(feature_id)
        |ORDER BY feature_id""".stripMargin
  )
}
