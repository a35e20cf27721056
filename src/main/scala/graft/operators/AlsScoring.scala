package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Prediction + evaluation as pure dataflow (SURVEY.md §3.3).
  *
  * The reference computes predictions by per-record RPC into Flink queryable
  * state (als-ms/MSE.java:122-159, flink-queryable-client/ALSPredict.java:65-83)
  * — an index-nested-loop join against a remote KV store. Re-expressed here
  * as broadcast equi-joins + a dot-product expression: one Catalyst plan, no
  * side effects, shuffle-free on the fact side when the model dims broadcast.
  */
object AlsScoring {

  /** J2/J5: score every rating with dot(userFactors, itemFactors).
    * Model tables are broadcast — at 100 TB fact scale the model stays
    * ~O(users+items) and this remains a map-side join. */
  def predictions(ratings: DataFrame, userF: DataFrame, itemF: DataFrame): DataFrame =
    ratings
      .join(broadcast(userF), "user_id")
      .join(broadcast(itemF), "item_id")
      .withColumn("prediction", dot(col("uf"), col("itf")))

  /** Left-outer variant with mean-vector fallback — the reference's
    * `orElse(MEAN)` semantics (als-ms/SGD.java:142-147,227). */
  def predictionsWithFallback(ratings: DataFrame, userF: DataFrame,
                              itemF: DataFrame, meanU: Column, meanI: Column): DataFrame =
    ratings
      .join(broadcast(userF), Seq("user_id"), "left_outer")
      .join(broadcast(itemF), Seq("item_id"), "left_outer")
      .withColumn("prediction",
        dot(coalesce(col("uf"), meanU), coalesce(col("itf"), meanI)))

  /** A4: mean squared error of (rating, prediction). MSE.java:52-69.
    * Squared via multiplication (not pow) so each row's error term is
    * bit-identical to the oracle's `(r-p)*(r-p)`. */
  def mse(preds: DataFrame): DataFrame = {
    val err = col("rating") - col("prediction")
    preds.agg(
      avg(err * err).as("mse"),
      count(lit(1)).as("n"))
  }
}
