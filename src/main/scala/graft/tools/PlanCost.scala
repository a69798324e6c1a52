package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a query's wall time into DataFrame-construction/analysis,
  * optimization+physical planning, and execution (guide §7.3: when
  * nothing is running, the driver is planning). Run with --warm to
  * materialize shared Builds first, like ProfileJobs.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val warm = args.contains("--warm")
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val names = positional.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // diagnostic conf overrides, e.g. SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder = builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    if (warm) graft.Builds.all.foreach { case (name, fn) =>
      try fn(spark, sfDir) catch { case e: Throwable => println(s"ERR build:$name: $e") }
    }
    val qs = if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
             else names.toSeq
    // global meters: Catalyst rule wall (analysis+optimization, all
    // actions) and Janino compile wall — the two driver costs that
    // hide between jobs (guide §7.3)
    def ruleMs(): Double =
      org.apache.spark.sql.catalyst.rules.RuleExecutor.getCurrentMetrics()
        .time / 1e6
    val codegenTimer = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    def compileMs(): Double = {
      val sn = codegenTimer.getSnapshot
      codegenTimer.getCount * sn.getMean / 1e6
    }
    println(f"${"query"}%-28s ${"build_s"}%8s ${"plan_s"}%7s ${"exec_s"}%7s ${"total_s"}%8s ${"rule_s"}%7s ${"jit_s"}%7s")
    qs.foreach { name =>
      System.gc(); Thread.sleep(100)
      val r0 = ruleMs(); val c0 = compileMs()
      val t0 = System.nanoTime()
      try {
        // construction: builds the logical plan; actions INSIDE the
        // constructor (counts, checkpoints, collects) execute here too
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        // optimization + physical planning of the FINAL plan
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"$name%-28s ${(t1 - t0) / 1e9}%8.2f ${(t2 - t1) / 1e9}%7.2f ${(t3 - t2) / 1e9}%7.2f ${(t3 - t0) / 1e9}%8.2f ${(ruleMs() - r0) / 1e3}%7.2f ${(compileMs() - c0) / 1e3}%7.2f")
      } catch { case e: Throwable => println(s"ERR $name: $e") }
    }
    spark.stop()
  }
}
