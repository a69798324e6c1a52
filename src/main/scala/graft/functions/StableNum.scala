package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numerically *stable-across-engines* aggregation helpers.
  *
  * Problem: `sum(double)` is order-dependent (FP addition is not
  * associative), and Spark's parallel partial aggregation visits rows in a
  * different order than any single-node oracle. At 600 k rows the
  * accumulated difference can cross a rounding boundary and fail an exact
  * hash-compare — and at 100 TB the result would be non-deterministic
  * run-to-run, which is worse.
  *
  * Fix: sum in fixed-point. Casting a double to `DECIMAL(p, s)` is a
  * deterministic per-row operation; decimal addition is exact and
  * associative, so the aggregate is bit-identical regardless of
  * parallelism, partitioning, or engine. Cast the exact decimal result
  * back to double at the end (one deterministic conversion). This is also
  * the right call at scale: Spark's decimal sum is codegen'd and the extra
  * cost is tiny compared to the shuffle it sits behind.
  *
  * The driver's test data carries 2-decimal money-like doubles, so
  * `DECIMAL(18,2)` loses nothing; embeddings are floats (~7 significant
  * digits), so `DECIMAL(18,9)` loses nothing that survives a float anyway.
  */
object StableNum {
  val MoneyScale = 2
  val VecScale   = 9

  private def dec(scale: Int) = s"decimal(18,$scale)"

  /** Exact fixed-point sum of a double column, returned as double. */
  def stableSum(c: Column, scale: Int = MoneyScale): Column =
    sum(c.cast(dec(scale))).cast("double")

  /** Exact sum of a product of two double columns (e.g. revenue =
    * price * (1 - discount)); the product is computed in decimal so it is
    * exact before summing.
    */
  def stableProdSum(a: Column, b: Column, scale: Int = MoneyScale): Column =
    sum(a.cast(dec(scale)) * b.cast(dec(scale))).cast("double")

  /** Order-independent mean: exact decimal sum divided by count, both
    * deterministic, division done once in double.
    */
  def stableAvg(c: Column, scale: Int = MoneyScale): Column =
    sum(c.cast(dec(scale))).cast("double") / count(c)
}
