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

  /** `DialBench assign [corpusN]` — calibrates the OTHER dial: the
    * centroid-assignment arm switch in `Similarity.centRanked`
    * (`spark.graft.ann.assign.broadcastMinLists`). Times both arms of
    * the probe primitive over a synthetic 64-dim quantized corpus at
    * growing nLists, with each arm FORCED via the conf. The literal
    * arm's cost is plan-sized (nLists·dims literals through analysis,
    * codegen and per-row evaluation); the broadcast arm's is an
    * N·nLists fan-out collapsed map-side by the k-bounded TopK
    * partial. The dial default is set from this table's crossover; an
    * ERR row for the literal arm at high nLists is itself the measured
    * plan-size bound the broadcast arm exists to remove.
    */
  private def assignMode(spark: SparkSession, corpusN: Long): Unit = {
    import spark.implicits._
    val dims = 64 // the fixture corpus dimensionality
    val nProbe = 4
    val corpus = spark.range(corpusN).select(
        $"id".as("vec_id"),
        transform(sequence(lit(0), lit(dims - 1)),
          i => pmod(hash($"id", i), lit(20000001L)) - 10000000L).as("qemb"))
      .withColumn("n2", aggregate(transform($"qemb", x => x * x),
        lit(0L), (a, x) => a + x))
      .localCheckpoint()
    val rnd = new scala.util.Random(7)
    def cents(k: Int): Array[(Long, Seq[Long])] =
      Array.tabulate(k)(i =>
        (i.toLong, Seq.fill(dims)(rnd.nextLong() % 10000000L)))
    def run(arm: String, cs: Array[(Long, Seq[Long])]): Double = {
      spark.conf.set("spark.graft.ann.assign.broadcastMinLists",
        if (arm == "literal") Int.MaxValue.toString else "1")
      try {
        val t0 = System.nanoTime()
        graft.operators.Similarity.centRanked(corpus, cs, nProbe)
          .select($"vec_id", get($"ds", lit(0)).getField("cid").as("c"))
          .agg(sum($"c")).collect(): Unit
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.unset("spark.graft.ann.assign.broadcastMinLists")
    }
    println(s"| nLists (corpus $corpusN x $dims) | literal | broadcast |")
    println("|---|---|---|")
    System.out.flush()
    // once a literal leg blows its budget, larger ks only get worse —
    // Spark's silent codegen→interpreted fallback on oversized
    // expressions turns the leg from seconds into hours (the first
    // sweep attempt measured exactly that); skip instead of hanging
    var litDead = false
    val budget = 120.0
    Seq(8, 64, 256, 1024, 4096, 16384).foreach { k =>
      val cs = cents(k)
      val lit =
        if (litDead) "skipped (prior leg over budget)"
        else try {
          val t = run("literal", cs)
          if (t > budget) litDead = true
          f"$t%.2f s"
        } catch { case e: Throwable =>
          litDead = true; "ERR " + e.getClass.getSimpleName
        }
      val bc = try f"${run("broadcast", cs)}%.2f s"
        catch { case e: Throwable => "ERR " + e.getClass.getSimpleName }
      println(s"| $k | $lit | $bc |")
      System.out.flush()
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val assignM = args.headOption.contains("assign")
    val sizes = if (args.nonEmpty && !assignM) args.map(_.toLong).toSeq
      else Seq(65536L, 262144L, 1048576L, 4194304L, 16777216L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (assignM) {
      assignMode(spark, args.lift(1).map(_.toLong).getOrElse(100000L))
      spark.stop()
      return
    }

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
