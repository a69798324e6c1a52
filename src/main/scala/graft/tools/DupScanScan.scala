package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** One-off plan sweep (r18): per declared query, counts how many times
  * each parquet file appears as a scan in the initial physical plan —
  * the generalized q232 finder (a base lineage referenced by both a
  * window/aggregate side and a broadcast-total side re-scans its
  * source once per reference). Joins and declared self-joins also
  * show duplicates, so the output is a lead list, not a verdict.
  */
object DupScanScan {
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
    val re = "file:[^\\]]*/(\\w+)\\.parquet".r
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.explainString(FormattedMode)
        val counts = re.findAllMatchIn(p).map(_.group(1)).toSeq
          .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2)
        if (counts.nonEmpty)
          println(f"$name%-28s " + counts.toSeq.sortBy(-_._2)
            .map { case (t, c) => s"$t=$c" }.mkString(" "))
      } catch { case e: Throwable => println(s"$name ERR: $e") }
    }
    spark.stop()
  }
}
