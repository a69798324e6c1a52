package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting — distinguishes "many tiny jobs"
  * (per-job overhead at toy scale, amortizes at 100 TB) from "few heavy
  * stages" (real compute that scales with data). Run with --warm to
  * materialize the shared Builds first so query costs are build-free.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    // flags parse position-independently so `--warm` first still warms;
    // unknown flags fail loud (a typo'd --warm must not profile cold)
    val unknown = args.filter(a => a.startsWith("--") && a != "--warm")
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(" ")}")
    val warm = args.contains("--warm")
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val names = positional.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shuffleReadB = new AtomicLong(0L)
    val shuffleWriteB = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskTimeMs.addAndGet(t.taskInfo.duration)
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shuffleReadB.set(0); shuffleWriteB.set(0)
    }

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    if (warm) graft.Builds.all.foreach { case (name, fn) =>
      try fn(spark, sfDir) catch { case e: Throwable => println(s"ERR build:$name: $e") }
    }
    val qs = if (names.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted
             else names.toSeq
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%8s ${"shufMB"}%7s")
    qs.foreach { name =>
      // settle any async cleanup from the previous query
      System.gc(); Thread.sleep(200)
      reset()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERR $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"$name%-28s $dt%7.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskTimeMs.get / 1e3}%8.1f ${(shuffleReadB.get + shuffleWriteB.get) / 1e6}%7.1f")
    }
    spark.stop()
  }
}
