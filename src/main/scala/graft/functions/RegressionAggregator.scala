package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's no-intercept regression
  * (utils/TravelTimePredictionModel.java:33-89, SimpleRegression(false))
  * as a reusable typed SQL aggregate — SURVEY §4's optional Catalyst
  * item (2): expose the model's training as `slope_origin(x, y)` so it
  * composes with any GROUP BY (the streaming form keeps the same sums in
  * flatMapGroupsWithState state; the oracle-checked q12 keeps the
  * decimal-exact relational form).
  *
  * The buffer is the 3-sum state (n, Σxx, Σxy) — mergeable, so Spark
  * runs it as partial aggregates + merge, the scalable shape.
  */
object RegressionAggregator {

  case class Sums(n: Long, sxx: Double, sxy: Double)

  /** slope = Σxy/Σxx through the origin; -1.0 sentinel when untrained
    * (degenerate Σxx), mirroring the reference's untrained path.
    */
  val slopeOrigin: Aggregator[(Double, Double), Sums, Double] =
    new Aggregator[(Double, Double), Sums, Double] {
      override def zero: Sums = Sums(0L, 0.0, 0.0)
      override def reduce(b: Sums, xy: (Double, Double)): Sums =
        Sums(b.n + 1, b.sxx + xy._1 * xy._1, b.sxy + xy._1 * xy._2)
      override def merge(a: Sums, b: Sums): Sums =
        Sums(a.n + b.n, a.sxx + b.sxx, a.sxy + b.sxy)
      override def finish(r: Sums): Double =
        if (r.sxx > 0.0) r.sxy / r.sxx else -1.0
      override def bufferEncoder: Encoder[Sums] = Encoders.product[Sums]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Register for SQL: `SELECT key, slope_origin(x, y) FROM t GROUP BY key`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("slope_origin",
      org.apache.spark.sql.functions.udaf(slopeOrigin))
}
