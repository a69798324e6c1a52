package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The native clean_tokens expression must be VALUE-IDENTICAL to the
  * composed-builtin chain it replaces (filter(split(lower), rlike &&
  * !array_contains)) — the DuckDB oracles mirror the builtin semantics,
  * so any divergence is an oracle break, not just a perf bug.
  */
class CleanTokensExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertEqualOn(df: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val both = df.select($"text",
      TextFunctions.cleanTokens($"text").as("native"),
      TextFunctions.cleanTokensHof($"text").as("hof"))
    val bad = both.filter(!($"native" <=> $"hof"))
    assert(bad.count() === 0L,
      s"native/HOF divergence: ${bad.take(3).mkString("; ")}")
  }

  test("equality on the document corpus (sf0.001 + sf0.01)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
      assertEqualOn(graft.core.Tables.documents(spark, sf).select("text"))
  }

  test("equality on adversarial strings") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "\t\n\r\f", "  double  spaces  ",
      "The THE the tHe",                      // stop word via lowering
      "MESSAGE message",                      // stop word, mixed case
      "abc123 abc 123 a1b",                   // digits reject
      "héllo café naïve",                     // non-ASCII letters reject
      "ÅBC åbc STRASSE straße",               // unicode lowering paths
      "hello-world hello_world hello.world",  // punctuation rejects
      "\nleading and trailing\t",
      "a an at are am for and or is there it this that on was by of to in not be with you have as can",
      "singleword", "x", "Z",
      "mixed CASE Words WITH Tabs\tbetween\nlines",
      "日本語 テスト mixed ascii",
      // Unicode line terminators (NOT Java \s whitespace, so they stay
      // inside tokens): the HOF reference is anchor-exact \A[a-z]+\z —
      // matching the DuckDB oracles' regexp_full_match and the native
      // byte scan — so a trailing one of these rejects the token
      // (rlike("^[a-z]+$") would have silently accepted it)
      "abc\u0085 abc\u2028 abc\u2029",
      "\u0085abc a\u2028b \u2029",
      "abc\u0085\u0085 abc\u0085def end")
    assertEqualOn(rows.toDF("text"))
    // null text: both forms are null
    val n = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.cleanTokens($"text").as("native"),
        TextFunctions.cleanTokensHof($"text").as("hof"))
      .head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }
}
