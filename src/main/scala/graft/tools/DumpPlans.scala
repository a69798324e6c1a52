package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for the named queries to
  * <outDir>/<query>_<suffix>.txt — the r17 before/after plan evidence
  * (plans/r17/). Usage:
  *   runMain graft.tools.DumpPlans <outDir> <suffix> <query...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, d)
        val out = new PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
        out.println(df.queryExecution.explainString(FormattedMode))
        out.close()
        println(s"[dumpplans] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable => println(s"[dumpplans] ERR $name: $e") }
    }
    spark.stop()
  }
}
