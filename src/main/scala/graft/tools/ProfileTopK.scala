package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-host A/B for the round-12 native grouped top-k: the heap
  * aggregate (q20/q189 defaults) vs the round-11 salted two-window
  * rungs, back-to-back in one JVM (the only comparison PERF.md
  * accepts — bench-host drift is documented at up to 2× intra-day).
  *
  * Usage: runMain graft.tools.ProfileTopK [sfDir] [reps]
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s ${times.map(_._1).min}%8.3f s (min of $reps, ${times.head._2} rows)")
    }
    // warm scans + codegen
    graft.operators.Relational.topKOrders(spark, sfDir).count()
    graft.operators.Sampling.groupPrioritySample(spark, sfDir).count()
    time("q20 heap (default)") {
      graft.operators.Relational.topKOrders(spark, sfDir).count()
    }
    time("q20 salted rung") {
      graft.operators.Relational.topKOrdersSalted(spark, sfDir).count()
    }
    time("q20 window rung") {
      graft.operators.Relational.topKOrdersWindow(spark, sfDir).count()
    }
    time("q189 heap (default)") {
      graft.operators.Sampling.groupPrioritySample(spark, sfDir).count()
    }
    time("q189 salted rung") {
      graft.operators.Sampling.groupPrioritySampleSalted(spark, sfDir).count()
    }
    spark.stop()
  }
}
