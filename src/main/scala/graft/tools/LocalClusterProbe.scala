package graft.tools

import org.apache.spark.sql.SparkSession

/** Feasibility probe for `local-cluster[n,cores,mem]` in this container:
  * the master string that launches REAL executor JVMs (Spark's own
  * multi-executor test harness) — the only way to rehearse speculation
  * locally, because TaskSchedulerImpl starts the speculation thread
  * only when `!isLocal`. Prints the executor count it actually got and
  * whether a shuffle round-trips; exit 0 = RetryDrill may use it.
  */
object LocalClusterProbe {
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sum = spark.range(100000).repartition(8)
      .map(_ * 2).toDF("v").agg(org.apache.spark.sql.functions.sum($"v"))
      .collect()(0).getLong(0)
    // wait for executors and report what registered
    val execs = spark.sparkContext.getExecutorMemoryStatus.size
    println(s"probe: sum=$sum executors=$execs (driver included)")
    spark.stop()
    if (sum != 100000L * 99999L) sys.exit(1)
  }
}
