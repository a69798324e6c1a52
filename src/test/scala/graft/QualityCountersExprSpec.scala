package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native quality_counters expression must be VALUE-IDENTICAL to
  * the four-HOF chain it replaces (size(split), size(filter(rlike)),
  * size(filter(array_contains)), aggregate-length) — q121/q136/q161's
  * DuckDB oracles mirror the builtin split semantics (including the
  * leading/trailing empty segments regex split produces), so any
  * divergence is an oracle break, not just a perf bug.
  */
class QualityCountersExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertEqualOn(df: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val stop = typedLit(graft.functions.TextFunctions.StopWords)
    val hof = df
      .select($"text", graft.functions.TextFunctions.tokens($"text").as("ws"))
      .select($"text",
        size($"ws").cast("long").as("h_tokens"),
        size(filter($"ws", t => array_contains(stop, t)))
          .cast("long").as("h_stop"),
        size(filter($"ws", t => t.rlike("\\A[a-z]+\\z")))
          .cast("long").as("h_alpha"),
        graft.functions.TextFunctions.tokenSum($"ws", length(_))
          .as("h_len"))
    val both = hof.withColumn("qc",
      graft.plans.QualityCountersOps.qualityCounters($"text"))
    val bad = both.filter(
      !($"qc.n_tokens" <=> $"h_tokens") || !($"qc.n_stop" <=> $"h_stop") ||
      !($"qc.n_alpha" <=> $"h_alpha") || !($"qc.sum_tok_len" <=> $"h_len"))
    assert(bad.count() === 0L,
      s"native/HOF divergence: ${bad.take(3).mkString("; ")}")
  }

  test("equality on the document corpus (sf0.001 + sf0.01)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      assertEqualOn(graft.core.Tables.documents(spark, sf).select("text"))
  }

  test("equality on adversarial strings (split edge semantics)") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "  ", "\t\n\r\f", "  double  spaces  ",
      "a", " a", "a ", " a ", "\ta\t",
      "The THE the tHe", "MESSAGE message",
      "abc123 abc 123 a1b",
      "héllo café naïve the",
      "ÅBC åbc STRASSE straße",
      "hello-world hello_world hello.world",
      "\nleading and trailing\t",
      "a an at are am for and or is there it this that on was by of to in not be with you have as can",
      "singleword", "x", "Z",
      "mixed CASE Words WITH Tabs\tbetween\nlines",
      "日本語 テスト mixed ascii",
      // Unicode line terminators that Java \s does NOT treat as
      // whitespace, so they stay INSIDE tokens: under the old
      // rlike("^[a-z]+$") reference, $ matched before a single
      // trailing one of these, silently counting "abc\u0085" as
      // alphabetic; the anchor-exact \A[a-z]+\z reference (matching
      // the DuckDB oracles' regexp_full_match) and the native byte
      // scan both reject them
      "abc\u0085 abc\u2028 abc\u2029",
      "\u0085abc a\u2028b \u2029",
      "abc\u0085\u0085 abc\u0085def end")
    assertEqualOn(rows.toDF("text"))
    // null text: the native struct is null, so every field is null —
    // matching the HOF columns on a null ws
    val n = Seq[Option[String]](None).toDF("text")
      .select(graft.plans.QualityCountersOps.qualityCounters($"text")
        .getField("n_tokens").as("native"),
        size(graft.functions.TextFunctions.tokens($"text"))
          .cast("long").as("hof"))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("quality_counters stays inside WholeStageCodegen") {
    import spark.implicits._
    // needs a bare scan: Tables.documents repartitions (AQE plan hides
    // the codegen marks) and a local relation folds to LocalTableScan
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.plans.QualityCountersOps.qualityCounters($"text").as("qc"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [quality_counters"),
      s"expected codegen span around quality_counters:\n$plan")
    assert(df.count() > 0)
  }
}
