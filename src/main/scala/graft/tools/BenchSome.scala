package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted bench: time only the named SparkEntry queries (all of them
  * if none named) at the given SF dir — the per-query A/B harness
  * behind PERF.md's same-host pairs. Same session shape as Bench
  * (local[32], 32 shuffle partitions, UTC), fresh JVM per run.
  *
  * Usage: runMain graft.tools.BenchSome <sfDir> [--warm] <q1> <q2> ...
  * `--warm` first materializes the shared Builds lineages (as Bench's
  * declared warm phase does), so the per-query times are build-free.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warm = args.drop(1).contains("--warm")
    val names = args.drop(1).filterNot(_ == "--warm")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    if (warm) graft.Builds.all.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir) catch { case e: Throwable => println(s"ERR build:$name: $e") }
      println(f"build:$name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val qs = if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
             else names.toSeq
    val results = qs.map { name =>
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, sfDir).count()
              catch { case e: Throwable => println(s"ERR $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $dt%8.2f s  ($n rows)")
      name -> dt
    }
    println(f"TOTAL ${results.map(_._2).sum}%.2f s over ${results.size} queries")
    spark.stop()
  }
}
