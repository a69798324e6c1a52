package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by all suites (tests fork a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The physical plan of a streaming query's latest micro-batch, as a
    * string — for plan-shape assertions on the streaming RUNTIME (state
    * store operators, watermark plumbing) that batch projections can't
    * pin. Call after processAllAvailable().
    */
  def streamingPlan(query: org.apache.spark.sql.streaming.StreamingQuery): String = {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8"))(query.explain())
    buf.toString("UTF-8")
  }
}
