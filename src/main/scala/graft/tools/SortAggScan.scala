package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** One-off plan sweep: counts SortAggregate (and Sort) operators in
  * every declared query's initial physical plan — the r18 hunt for
  * struct-buffered aggregates (max(struct(...)), first(array)) that
  * silently demote HashAggregate to Sort + SortAggregate and pay a
  * per-partition sort of the full fan-out (guide §1.2 step 2).
  */
object SortAggScan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.explainString(FormattedMode)
        val sa = "SortAggregate".r.findAllIn(p).length
        val so = "(?m)^\\s*(?:[:+icolumn-]*\\s)?\\+- Sort ".r.findAllIn(p).length
        if (sa > 0) println(f"$name%-28s sortagg=$sa sort=$so")
      } catch { case e: Throwable => println(s"$name ERR: $e") }
    }
    spark.stop()
  }
}
