package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.Hashing

class Md5Bits32ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val strs = Seq("", "a", "hll:123", "cms:3:999999", "split:0",
    "eval:18446744073709551615", "日本語テキスト", "x" * 500)

  test("native md5_bits32 == the composed builtin chain, every offset") {
    import spark.implicits._
    for (from <- Seq(1, 9, 17, 25)) {
      val rows = strs.toDF("s")
        .select(Hashing.md5Bits32($"s", from).as("native"),
          Hashing.md5Bits32Composed($"s", from).as("composed"))
        .as[(Long, Long)].collect()
      strs.zip(rows).foreach { case (s, (n, c)) =>
        assert(n == c, s"'$s' at from=$from")
        assert(n >= 0L && n <= 0xFFFFFFFFL)
      }
    }
  }

  test("native md5_bits32 == the JVM twin used by stateful processors") {
    import spark.implicits._
    val rows = strs.toDF("s")
      .select($"s", pmod(Hashing.md5Bits32($"s", 1), lit(100L)).as("b"))
      .as[(String, Long)].collect()
    rows.foreach { case (s, b) =>
      assert(b == Hashing.md5BucketJvm(s, 100L), s"'$s'")
    }
  }

  test("whole-stage codegen keeps md5_bits32 inline (no fallback)") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Hashing.md5Bits32(concat(lit("split:"),
        $"doc_id".cast("string")), 1))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [md5_bits32"), plan)
    assert(df.count() > 0)
  }
}
