package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._

/** Batch form of the reference's online no-intercept regression
  * (datastream_java/utils/TravelTimePredictionModel.java:33-89): a
  * `SimpleRegression(false)` through the origin reduces to the sums
  * slope = ΣXY / ΣXX (SURVEY §2.6 W5 — "plain sums encode cleaner").
  *
  * The same sum-form state (RegressionSums) drives the streaming
  * TravelTimePrediction in graft.streaming; here the sums are a plain
  * hash aggregate — partial map-side sums then one shuffle on the key,
  * which is exactly how the 100 TB version should train per-key linear
  * models. Sums are exact DECIMAL (order-independent), division happens
  * once per group in double.
  */
object Regression {

  /** Per-supplier price-vs-quantity slope through the origin. Emits -1.0
    * for untrained/degenerate groups (ΣXX = 0), mirroring the reference's
    * untrained sentinel (TravelTimePredictionModel.java:59-65).
    */
  def slopePerKey(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(18,2)"
    lineitem(spark, d)
      .select($"l_suppkey", $"l_quantity".cast(dec).as("x"), $"l_extendedprice".cast(dec).as("y"))
      .groupBy($"l_suppkey")
      .agg(sum($"x" * $"y").cast("double").as("sxy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        count(lit(1)).as("n"))
      .select($"l_suppkey",
        when($"sxx" > 0.0, $"sxy" / $"sxx").otherwise(lit(-1.0)).as("slope"),
        $"n")
  }
}
