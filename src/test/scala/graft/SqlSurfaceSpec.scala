package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerViews exposes the whole star schema to spark.sql") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) == 6000)
    // the relational exercises are expressible as plain SQL (SURVEY §3.3)
    val otm = spark.sql(
      """SELECT month, user_id FROM (
        |  SELECT month, user_id,
        |         rank() OVER (PARTITION BY month ORDER BY cnt DESC) AS rnk
        |  FROM (SELECT date_format(ts, 'yyyy-MM') AS month, user_id,
        |               count(*) AS cnt
        |        FROM events GROUP BY 1, 2))
        |WHERE rnk = 1""".stripMargin).collect()
    assert(otm.nonEmpty)
    // events view carries the converted timestamp (nanos handled)
    assert(spark.sql("SELECT min(ts) FROM events").collect()(0)
      .getTimestamp(0).toString.startsWith("2024-01-01"))
  }

  test("GraftFunctions exposes the native expression family to spark.sql") {
    import spark.implicits._
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    graft.plans.GraftFunctions.register(spark)
    // each SQL call must equal its Column-API twin on real data
    val viaSql = spark.sql(
      """SELECT doc_id, clean_tokens(text) AS ct,
        |       md5_bits32(text, 1) AS h,
        |       word_shingles(clean_tokens(text), 3) AS sh,
        |       simhash(clean_tokens(text)) AS sk
        |FROM documents ORDER BY doc_id LIMIT 50""".stripMargin).collect()
    val viaApi = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id",
        graft.functions.TextFunctions.cleanTokens($"text").as("ct"),
        graft.functions.Hashing.md5Bits32($"text", 1).as("h"),
        graft.functions.Hashing.shingles(
          graft.functions.TextFunctions.cleanTokens($"text"), 3).as("sh"),
        graft.functions.Hashing.simhash(
          graft.functions.TextFunctions.cleanTokens($"text")).as("sk"))
      .orderBy($"doc_id").limit(50).collect()
    assert(viaSql.length == 50)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // quantized_dot through SQL over the embeddings view
    val dot = spark.sql(
      """SELECT quantized_dot(
        |  transform(embedding, x -> cast(round(x * 10000000) AS bigint)),
        |  transform(embedding, x -> cast(round(x * 10000000) AS bigint))) AS n2
        |FROM embeddings ORDER BY vec_id LIMIT 1""".stripMargin)
      .collect()(0).getLong(0)
    assert(dot > 0L, "self dot of a nonzero vector is positive")
    // integer parameters must be literals — a column there is a loud error
    val err = intercept[Exception](
      spark.sql("SELECT md5_bits32(text, doc_id) FROM documents LIMIT 1")
        .collect())
    assert(err.getMessage.contains("integer literal")
        || err.getMessage.contains("md5_bits32"))
    // the similarity/geo natives: SQL call vs the Column-API twin
    val sigSql = spark.sql(
      """SELECT vec_id, hyperplane_sigs(
        |  transform(embedding, x -> cast(round(x * 10000000) AS bigint)),
        |  4, 8) AS sg
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin).collect()
    val sigApi = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", graft.plans.HyperplaneSigs.hyperplaneSigs(
        graft.functions.VectorFunctions.quantize($"embedding"), 4, 8).as("sg"))
      .orderBy($"vec_id").limit(20).collect()
    sigSql.zip(sigApi).foreach { case (a, b) => assert(a == b) }
    val walk = spark.sql(
      "SELECT cells_on_way_exact(10, 10, 13, 12) AS cs").collect()(0)
      .getSeq[Int](0)
    import org.apache.spark.sql.functions.lit
    val walkApi = spark.range(1).select(graft.plans.SlopeWalkCells
        .cellsOnWayExact(lit(10), lit(10), lit(13), lit(12)).as("cs"))
      .collect()(0).getSeq[Int](0)
    assert(walk == walkApi && walk.nonEmpty)
  }

  test("native aggregates are SQL-reachable: top_k_rows and slope_origin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    graft.plans.GraftFunctions.register(spark)
    // slope_origin over a y = 2x relation: sxy accumulates as exactly
    // 2·sxx (multiplication by 2 only shifts the exponent), so the SQL
    // result is exactly 2.0 per group — and must equal the Column twin
    val viaSql = spark.sql(
      """SELECT event_type, slope_origin(value, value * 2.0) AS sl
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    assert(viaSql.nonEmpty)
    viaSql.foreach(r => assert(r.getDouble(1) == 2.0, r.toString))
    val slopeUdf = udaf(graft.functions.RegressionAggregator.slopeOrigin)
    val viaApi = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy($"event_type")
      .agg(slopeUdf($"value", $"value" * 2.0).as("sl"))
      .orderBy($"event_type").collect()
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // top_k_rows through SQL == Ranks.groupTopK (the Column-API twin)
    val tkSql = spark.sql(
      """SELECT event_type, pos + 1 AS rnk, tk.nv AS nv, tk.event_id AS event_id
        |FROM (SELECT event_type,
        |        top_k_rows(struct(-value AS nv, event_id), 3) AS tks
        |      FROM events GROUP BY event_type)
        |LATERAL VIEW posexplode(tks) AS pos, tk
        |ORDER BY event_type, rnk""".stripMargin).collect()
    val tkApi = operators.Ranks.groupTopK(
        graft.core.Tables.events(spark, "/root/testdata/sf0.001"), 3, "rnk",
        Seq($"event_type"),
        struct((-$"value").as("nv"), $"event_id"))
      .select($"event_type", $"rnk".cast("int"), $"nv", $"event_id")
      .orderBy($"event_type", $"rnk").collect()
    assert(tkSql.length == tkApi.length && tkSql.nonEmpty)
    tkSql.zip(tkApi).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getInt(1) == b.getInt(1)
        && a.getDouble(2) == b.getDouble(2) && a.getLong(3) == b.getLong(3),
        s"$a vs $b")
    }
  }

  test("GraftExtensions wires the FULL surface: every symbol + the as-of strategy") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.ColumnBridge.extensionFunctions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    for (name <- Seq("grid_cell", "clean_tokens", "md5_bits32",
        "word_shingles", "simhash", "minhash_sigs", "quantized_dot",
        "hyperplane_sigs", "cells_on_way_exact", "top_k_rows",
        "slope_origin"))
      assert(reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from the extension-registered function family")
    assert(org.apache.spark.sql.graft.ColumnBridge
        .extensionStrategies(ext, spark).contains(graft.plans.AsOfStrategy),
      "as-of strategy missing from the extension hook")
  }

  test("as-of join output composes with spark.sql through the registered strategy") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    assert(spark.experimental.extraStrategies.contains(graft.plans.AsOfStrategy))
    val l = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("k", "t")
    val r = Seq((1L, 5L, "a"), (1L, 12L, "b"), (2L, 99L, "c"))
      .toDF("rk", "rt", "v")
    graft.plans.AsOf.asofJoin(l, r, "k", "rk", "t", "rt")
      .createOrReplaceTempView("asof_out")
    // the view's plan carries the custom logical node; spark.sql queries
    // over it plan through AsOfStrategy at execution
    val got = spark.sql("SELECT v FROM asof_out ORDER BY k, t")
      .collect().map(row => Option(row.getString(0)))
    assert(got.toSeq == Seq(Some("a"), Some("b"), None), got.mkString(","))
  }
}
