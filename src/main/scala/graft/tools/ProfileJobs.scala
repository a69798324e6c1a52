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
    val unknown = args.filter(a =>
      a.startsWith("--") && a != "--warm" && a != "--jobs" && a != "--stages")
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(" ")}")
    val warm = args.contains("--warm")
    // --jobs: per-job attribution (callSite + wall + tasks) — answers
    // WHERE a 40-job query spends its job count (guide §1.5 labeling,
    // without touching query code)
    val perJob = args.contains("--jobs")
    // --stages: per-STAGE task-time attribution — job callsites under
    // AQE all read as the stage-materialization future, but STAGE names
    // carry the top RDD's callsite, so this is the view that answers
    // "which operator burns the task-seconds" (r17, the q194 drill)
    val perStage = args.contains("--stages")
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

    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, AtomicInteger, AtomicLong)]()
    val stageLog = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long)]()
    val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shuffleReadB = new AtomicLong(0L)
    val shuffleWriteB = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse(j.stageInfos.headOption.map(_.name).getOrElse("?"))
          val nTasks = j.stageInfos.map(_.numTasks).sum
          jobLog.put(j.jobId,
            (site, System.nanoTime(), new AtomicInteger(nTasks),
              new AtomicLong(0L))): Unit
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) {
          val v = jobLog.get(e.jobId)
          if (v != null) v._4.set(System.nanoTime() - v._2)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        if (perStage) stageLog.put(s.stageInfo.stageId,
          (s.stageInfo.name, s.stageInfo.numTasks,
            stageTaskMs.getOrDefault(s.stageInfo.stageId, new AtomicLong(0L)).get)): Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskTimeMs.addAndGet(t.taskInfo.duration)
          if (perStage) stageTaskMs
            .computeIfAbsent(t.stageId, _ => new AtomicLong(0L))
            .addAndGet(t.taskInfo.duration): Unit
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shuffleReadB.set(0); shuffleWriteB.set(0); jobLog.clear()
      stageLog.clear(); stageTaskMs.clear()
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
      if (perJob) {
        import scala.jdk.CollectionConverters._
        jobLog.asScala.toSeq.sortBy(_._1).foreach { case (id, (site, _, nt, wall)) =>
          println(f"    job $id%4d ${wall.get / 1e9}%7.3f s ${nt.get}%5d tasks  $site")
        }
      }
      if (perStage) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._2._3).take(12)
          .foreach { case (id, (sname, nt, ms)) =>
            println(f"    stage $id%4d ${ms / 1e3}%7.1f task-s $nt%5d tasks  $sname")
          }
      }
    }
    spark.stop()
  }
}
