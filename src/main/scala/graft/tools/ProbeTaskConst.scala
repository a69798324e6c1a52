package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeTaskConst {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.scheduler._
    val t = new java.util.concurrent.atomic.AtomicLong(0)
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.taskInfo != null) { t.addAndGet(e.taskInfo.duration); n.incrementAndGet() }
      }
    })
    def leg(name: String)(f: => Long): Unit = {
      t.set(0); n.set(0)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(300)
      println(f"$name%-28s wall=${(System.nanoTime()-t0)/1e9}%6.2f s  tasks=${n.get}%4d  task_s=${t.get/1e3}%7.2f  rows=$r")
    }
    import spark.implicits._
    leg("raw range 64p #1")(spark.range(0, 6400, 1, 64).groupBy(($"id" % 97).as("k")).agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    leg("raw range 64p #2")(spark.range(0, 6400, 1, 64).groupBy(($"id" % 93).as("k")).agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    val memo = graft.operators.Graph.copurchaseEdges(spark, d)
    leg("memo materialize")(memo.count())
    val nb = { val e = memo.select($"p1", $"p2")
      e.select($"p1".as("v"), $"p2".as("u")).union(e.select($"p2".as("v"), $"p1".as("u"))) }
    leg("agg over memo cache #1")(nb.groupBy($"v").agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    leg("agg over memo cache #2")(nb.groupBy($"v").agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    val cut = graft.core.Lineage.cut(nb)
    leg("agg over cut #1")(cut.groupBy($"v").agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    leg("agg over cut #2")(cut.groupBy($"v").agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    spark.stop()
  }
}
