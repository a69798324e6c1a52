package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibrates the rank machinery's small-side dial: times BOTH arms of
  * `Ranks.globalRank` and `Ranks.groupRunningSum` over synthetic inputs
  * of increasing size to locate the crossover where the
  * range-partitioned machinery starts beating the single-sorted-task
  * window — the measurement behind the 2^18 default of
  * `spark.graft.rank.windowMaxRows`. Columns are the machinery's
  * typical shape (one group key, one value, one tiebreak — 24 bytes).
  */
object DialBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(65536L, 262144L, 1048576L, 4194304L, 16777216L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mk(n: Long) = spark.range(n).select(
      pmod(hash($"id"), lit(20L)).as("g"),
      pmod(hash($"id", lit(1)), lit(1000000L)).as("v"),
      $"id".as("rid")).localCheckpoint()

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm codegen for both plan shapes
    val w = mk(10000L)
    graft.operators.Ranks.globalRank(w, "r", $"v".asc, $"rid".asc).count()
    spark.conf.set("spark.graft.rank.windowMaxRows", "0")
    graft.operators.Ranks.globalRank(w, "r", $"v".asc, $"rid".asc).count()
    spark.conf.unset("spark.graft.rank.windowMaxRows")

    println("| rows | globalRank window | machinery | runningSum window | machinery |")
    println("|---|---|---|---|---|")
    for (n <- sizes) {
      val df = mk(n)
      def rank() = graft.operators.Ranks
        .globalRank(df, "r", $"v".asc, $"rid".asc).count()
      def scan() = graft.operators.Ranks
        .groupRunningSum(df, "s", Seq($"g"), Seq($"v", $"rid"), $"v").count()
      // window arm: force-enable regardless of size; machinery: force 0
      spark.conf.set("spark.graft.rank.windowMaxRows", Long.MaxValue.toString)
      val rw = math.min(time(rank()), time(rank()))
      val sw = math.min(time(scan()), time(scan()))
      spark.conf.set("spark.graft.rank.windowMaxRows", "0")
      val rm = math.min(time(rank()), time(rank()))
      val sm = math.min(time(scan()), time(scan()))
      spark.conf.unset("spark.graft.rank.windowMaxRows")
      println(f"| ${n}%,d | $rw%.2f s | $rm%.2f s | $sw%.2f s | $sm%.2f s |")
    }
    spark.stop()
  }
}
