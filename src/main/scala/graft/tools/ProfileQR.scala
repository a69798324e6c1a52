package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage dissection of the quality_rank build (q136): times
  * each lineage prefix separately in one session to find where the
  * ~90 task-seconds actually go.
  */
object ProfileQR {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    t("warmup (entry)")(try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => 0L })
    t("qualityScore")(graft.operators.Text.qualityScore(spark, d).count())
    t("qualityScore again")(graft.operators.Text.qualityScore(spark, d).count())
    val q = graft.operators.Text.qualityScore(spark, d)
      .select($"doc_id", $"stop_ratio")
      .join(graft.core.Tables.documents(spark, d).select($"doc_id", $"lang"), "doc_id")
    t("q = score join lang")(q.count())
    t("pinBase(q)")(graft.operators.Ranks.pinBase(q).count())
    val pinned = graft.operators.Ranks.pinBase(q)
    t("classes agg")(pinned.groupBy($"lang", $"stop_ratio").agg(count(lit(1))).count())
    t("groupRank full")(graft.operators.Ranks.groupRankPinned(pinned, "rnk",
      Seq($"lang"), Seq($"stop_ratio")).count())
    t("qualityRank memo")(graft.operators.Text.qualityRank(spark, d).count())
    t("qualityRank warm")(graft.operators.Text.qualityRank(spark, d).count())
    spark.stop()
  }
}
