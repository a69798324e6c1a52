package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Minimal speculation probe: 16-partition job, partition 0 sleeps 5 s,
  * rest are instant — the canonical straggler. Prints speculative-task
  * count under the RetryDrill speculation config; isolates scheduler
  * behavior from any query shape.
  */
object SpecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(args.headOption.getOrElse("local-cluster[2,8,4096]"))
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.executor.memory", "4g")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.multiplier", "1.5")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.task.duration.threshold", "1s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val spec = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        if (ts.taskInfo.speculative) spec.incrementAndGet(): Unit
    })
    val n = spark.sparkContext.parallelize(0 until 16, 16)
      .mapPartitionsWithIndex { (i, it) =>
        if (i == 0) Thread.sleep(5000)
        it
      }.count()
    ScaleSweep.drainBus(spark)
    println(s"specprobe: n=$n speculativeTasks=${spec.get()}")
    spark.stop()
    if (spec.get() < 1) sys.exit(1)
  }
}
