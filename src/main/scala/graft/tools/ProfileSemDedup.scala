package graft.tools

import org.apache.spark.sql.SparkSession

/** q55's scale adjudication (round-14 catalog sweep): the bench form
  * (nLists = 8, oracle-static) against `semanticDedupScaled` (nLists =
  * N/targetCell — linear candidate volume) on the same directory.
  * Run against the ScaleSweep fixture (`--fixture-only` keeps it).
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2fs  $label")
      r
    }
    val n = time("corpusWithNorm fill")(
      graft.operators.Similarity.corpusWithNorm(spark, d).count())
    println(s"          corpus: $n vectors")
    val kb = time("semanticDedup (bench form, nLists=8)")(
      graft.operators.Similarity.semanticDedup(spark, d).count())
    val ks = time("semanticDedupScaled (nLists=N/256)")(
      graft.operators.Similarity.semanticDedupScaled(spark, d).count())
    println(s"          kept: bench=$kb scaled=$ks")
    val hb = time("hardNegatives (bench form, nLists=8)")(
      graft.operators.Similarity.hardNegatives(spark, d).count())
    val hs = time("hardNegativesScaled (nLists=N/256)")(
      graft.operators.Similarity.hardNegativesScaled(spark, d).count())
    println(s"          negatives: bench=$hb scaled=$hs")
    val rb = time("rrfFusion (DenseIvfGen, nLists=8)")(
      graft.operators.Retrieval.rrfFusion(spark, d).count())
    val rs = time("rrfFusion (DenseIvfScaledGen)")(
      graft.operators.Retrieval.rrfFusion(spark, d,
        denseGen = graft.operators.Retrieval.DenseIvfScaledGen).count())
    println(s"          fused rows: bench=$rb scaled=$rs")
    spark.stop()
  }
}
