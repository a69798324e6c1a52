package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.LexExtreme.{lexMax, lexMin}

/** Laws for the flat-buffer struct-extreme aggregate
  * (plans.LexExtremeAgg): selection identical to the built-in
  * `min(struct)` / `max(struct)` — including the NULL-field,
  * NULL-struct, NaN and decimal edges — and a HashAggregate plan
  * (the whole point: the built-ins demote to Sort + SortAggregate).
  */
class LexExtremeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Adversarial fixture: long/double/decimal fields with NULLs, NaN,
    * ±0.0, ties on every prefix, and groups whose struct is sometimes
    * entirely NULL.
    */
  private def fixture = {
    import spark.implicits._
    val specials = Seq(Double.NaN, 0.0, -0.0, -1.5, 2.5,
      Double.PositiveInfinity, Double.NegativeInfinity)
    (0 until 4000).map { i =>
      val g = i % 37
      val a: java.lang.Long = if (i % 11 == 0) null else (i % 13).toLong
      val b: java.lang.Double =
        if (i % 7 == 0) null else specials(i % specials.length)
      val c = BigDecimal((i * 2654435761L) % 1000)
      (g, a, b, c, i.toLong)
    }.toDF("g", "a", "b", "c", "id").repartition(7)
  }

  test("lexMin/lexMax == min(struct)/max(struct) on the adversarial fixture") {
    import spark.implicits._
    val df = fixture
    val s = struct($"a", $"b", $"c", $"id")
    val got = df.groupBy($"g").agg(lexMin(s).as("mn"), lexMax(s).as("mx"))
    val want = df.groupBy($"g").agg(min(s).as("mn"), max(s).as("mx"))
    val gotRows = got.orderBy($"g").collect().map(_.toString).toSeq
    val wantRows = want.orderBy($"g").collect().map(_.toString).toSeq
    assert(gotRows == wantRows,
      s"diff: ${gotRows.zip(wantRows).filter(p => p._1 != p._2).take(3)}")
  }

  test("NULL struct inputs are skipped; all-null group evaluates NULL") {
    import spark.implicits._
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("g", "v")
    // when(v.isNotNull, ...) makes the struct itself NULL on None rows
    val s = when($"v".isNotNull, struct($"v", lit(1L).as("t")))
    val got = df.groupBy($"g")
      .agg(lexMax(s).as("mx"), max(s).as("ref"))
      .orderBy($"g").collect()
    assert(got.map(r => r.isNullAt(1)) sameElements Array(false, true))
    got.foreach(r => assert(r.get(1) == r.get(2)))
  }

  test("global aggregate (no keys) matches built-in, empty input is NULL") {
    import spark.implicits._
    val df = fixture
    val s = struct($"b", $"id")
    val g1 = df.agg(lexMin(s).as("x"), min(s).as("y")).head()
    assert(g1.get(0) == g1.get(1))
    val empty = df.filter($"g" < 0)
    val g2 = empty.agg(lexMax(s).as("x"), max(s).as("y")).head()
    assert(g2.isNullAt(0) && g2.isNullAt(1))
  }

  test("plan is a HashAggregate (no Sort, no SortAggregate)") {
    import spark.implicits._
    val df = fixture
    val plan = df.groupBy($"g")
      .agg(lexMin(struct($"a", $"id")).as("mn"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), s"demoted to SortAggregate:\n$plan")
    assert(plan.contains("HashAggregate"), s"no HashAggregate:\n$plan")
    // the built-in form IS the demoted shape — pin the contrast so this
    // test fails loudly if a future Spark fixes struct min/max buffers
    // (at which point LexExtremeAgg can retire)
    val ref = df.groupBy($"g").agg(min(struct($"a", $"id")).as("mn"))
      .queryExecution.executedPlan.toString
    assert(ref.contains("SortAggregate"),
      "built-in min(struct) no longer demotes — revisit LexExtremeAgg")
  }
}
