package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack

/** ML training jobs as driver-contract queries (SURVEY.md §7.2 step 3).
  *
  * ALS/LinearSVC fits are not ANSI-SQL-expressible, so these entries carry
  * no oracle (the driver records rows-only checks); the quality assertions
  * live in TrainingSpec. Both train on a deterministic sample so the bench
  * cost stays bounded at sf0.1.
  */
object TrainPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
      Training.svmTrain(li, Seq("f_qty", "f_price", "f_disc", "f_tax"),
        maxIter = 10)
        .select(col("feature_id"), (abs(col("w")) > 1e-12).as("nonzero"))
        .orderBy("feature_id")
    })
  )

  def oracles: Map[String, String] = Map.empty
}
