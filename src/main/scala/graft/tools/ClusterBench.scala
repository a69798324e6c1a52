package graft.tools

import org.apache.spark.sql.SparkSession

/** Real-cluster TIMING parity for the heavies (round-17 verdict ask 4).
  *
  * RetryDrill already certifies local ≡ cluster row MULTISETS; nothing
  * before this measured cluster TIMING — the axes local[n] hides
  * entirely: kryo/java task + result serialization across real process
  * boundaries, the netty shuffle transport (local mode short-circuits
  * shuffles through the one BlockManager), broadcast distribution to
  * remote executors, and per-stage scheduler RPC. A query whose
  * cluster/local ratio is an OUTLIER against its peers is hiding one of
  * those costs (an oversized broadcast, a task binary serialized per
  * task, a collect that local mode made free).
  *
  * Topology: RetryDrill's spawned standalone Master + two Workers on
  * distinct loopback hosts — 2 executors × 8 cores, so the comparable
  * local leg is local[16] with the same shuffle partitioning. Same
  * box, same disks, same JVM flags, back-to-back legs (the same-host
  * pair discipline), so the ratio isolates the distributed-runtime tax
  * rather than host drift. Each leg is ONE long-lived session (the
  * steady-state regime of a real deployment — executors register once,
  * memo-shared builds amortize exactly as they do in Bench); every
  * query runs twice and the WARM (second) time is compared, so codegen
  * and build memos drop out of the ratio. Digests are compared across
  * the two legs as a free parity re-check.
  *
  * This is a MEASUREMENT, not a pass/fail gate with fixed thresholds —
  * absolute ratios on one box under 16-way parallelism are not
  * deployment numbers. The adjudication rule: flag any query whose
  * warm cluster/local ratio exceeds `outlierX` × the MEDIAN ratio
  * (default 3) — the shape of a per-query serialization/broadcast
  * smell, as opposed to the uniform RPC+transport tax the median
  * itself captures. Exit code = flagged count + digest drifts (0
  * expected; a flag is a lead for PERF.md adjudication, committed
  * either way).
  *
  * Usage: `sbt "runMain graft.tools.ClusterBench [srcDir] [query...]"`
  * (default: sf0.01 gate tables × ScaleSweep's top-10 heavies).
  */
object ClusterBench {

  /** One leg: fresh session on `master`, each query twice, returning
    * (name, coldSecs, warmSecs, digest-or-error).
    */
  private def runLeg(master: String, src: String,
      queries: Seq[String]): Seq[(String, Double, Double, Either[String, String])] = {
    val spark = RetryDrill.session(master, Map())
    try {
      queries.map { name =>
        def once(): (Double, Either[String, String]) = {
          val t0 = System.nanoTime()
          val r =
            try Right(CanonDigest.of(InvarianceSweep.canon(
              graft.SparkEntry.queries(name)(spark, src))))
            catch { case scala.util.control.NonFatal(e) =>
              Left(e.getClass.getSimpleName + ": " +
                String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | "))
            }
          ((System.nanoTime() - t0) / 1e9, r)
        }
        val (cold, _) = once()
        val (warm, rWarm) = once()
        (name, cold, warm, rWarm)
      }
    } finally {
      ScaleSweep.drainBus(spark)
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queries =
      if (args.length > 1) args.drop(1).toSeq
      else ScaleSweep.heavies

    val procs = RetryDrill.startCluster()
    val (cluster, local) =
      try (runLeg(RetryDrill.masterUrl, src, queries),
        runLeg("local[16]", src, queries))
      finally procs.reverse.foreach(_.destroyForcibly(): Unit)

    var bad = 0
    val rows = cluster.zip(local).map {
      case ((n, ccold, cwarm, rc), (_, lcold, lwarm, rl)) =>
        if (rc.isLeft || rl.isLeft || rc != rl) {
          bad += 1
          println(s"DRIFT/ERR on $n: cluster=$rc local=$rl")
        }
        (n, ccold, cwarm, lcold, lwarm, cwarm / lwarm)
    }
    val ratios = rows.map(_._6).sorted
    val median = ratios(ratios.size / 2)
    val outlierX = 3.0
    println(f"median warm cluster/local ratio: $median%.2fx " +
      f"(outlier bar: ${outlierX * median}%.2fx)")
    println("| query | cluster cold/warm s | local[16] cold/warm s | " +
      "warm ratio | vs median | adjudication |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, cc, cw, lc, lw, r) =>
      val out = r > outlierX * median
      if (out) bad += 1
      println(f"| $n | $cc%.1f/$cw%.1f | $lc%.1f/$lw%.1f | $r%.2fx " +
        f"| ${r / median}%.2fx | " +
        f"${if (out) "OUTLIER — serialization/broadcast smell" else "uniform tax"} |")
    }
    println(s"clusterbench: ${rows.size} queries, $bad flags " +
      s"(outliers > ${outlierX}x median + digest drifts)")
    if (bad > 0) sys.exit(math.min(bad, 255))
  }
}
