package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Laws for the native bounded-heap grouped top-k (plans.TopKRowsAgg). */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("groupTopK == row_number window top-k on a skewed fixture") {
    import spark.implicits._
    val df = (0 until 5000).map { i =>
      val g = if (i % 10 < 8) "hot" else if (i % 10 < 9) "warm" else "cold"
      (g, (i * 2654435761L) % 10007, i.toLong)
    }.toDF("g", "v", "id").repartition(7)
    val got = Ranks.groupTopK(df, 10, "rnk", Seq($"g"),
        struct($"v", $"id"))
      .select($"g", $"v", $"id", $"rnk")
    val w = Window.partitionBy($"g").orderBy($"v".asc, $"id".asc)
    val want = df.withColumn("rnk", row_number().over(w)).filter($"rnk" <= 10)
      .select($"g", $"v", $"id", $"rnk")
    val gotS = got.as[(String, Long, Long, Int)].collect().toSet
    val wantS = want.as[(String, Long, Long, Int)].collect().toSet
    assert(gotS == wantS,
      s"heap vs window diff: extra=${gotS -- wantS}, missing=${wantS -- gotS}")
  }

  test("groups smaller than k emit all rows, ranks dense") {
    import spark.implicits._
    val df = Seq(("a", 3L, 1L), ("a", 1L, 2L), ("b", 9L, 3L)).toDF("g", "v", "id")
    val got = Ranks.groupTopK(df, 10, "rnk", Seq($"g"), struct($"v", $"id"))
      .select($"g", $"v", $"id", $"rnk")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(("a", 1L, 2L, 1), ("a", 3L, 1L, 2), ("b", 9L, 3L, 1)))
  }
}
