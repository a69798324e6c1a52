package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executed fault-tolerance rehearsal — the promotion of
  * DeterminismSpec's plan-level certificate (zero non-deterministic
  * expressions ⇒ task retries/speculative duplicates commit identical
  * rows) into an OBSERVED law, the way MemSweep promoted the
  * cache-pressure adjudication into a rehearsed one.
  *
  * The drill runs against a REAL standalone cluster it spawns itself:
  * one Master and two Workers as separate JVMs, the workers bound to
  * DISTINCT loopback hosts (127.0.0.2 / 127.0.0.3). Both properties are
  * load-bearing, adjudicated by probe this round:
  *
  *   - a plain `local[n,f]` master cannot rehearse speculation at all
  *     (TaskSchedulerImpl starts the speculation thread only when
  *     `!isLocal`), and
  *   - `local-cluster[2,…]` marks stragglers speculatable but can NEVER
  *     launch the copy: both executors report host `localhost`, and the
  *     scheduler refuses a speculative attempt on any host that already
  *     has one (`dequeueSpeculativeTask`'s same-host exclusion — the
  *     rule that makes speculation useful against sick NODES). Distinct
  *     worker hosts are what makes the rehearsal real.
  *
  * Three legs per heavy, all on the spawned cluster:
  *
  *   - plain:     the uninjected reference digest, same topology; also
  *                asserted ≡ a `local[cpus]` session's digest, so the
  *                drill doubles as a local ≡ real-cluster row-multiset
  *                certificate for the swept heavies.
  *   - retry:     the query wrapped in an identity filter whose UDF
  *                throws ONCE per executor JVM — the first task that
  *                evaluates it fails with ExceptionFailure and
  *                `spark.task.maxFailures=4` absorbs the retry
  *                (possibly on the other executor, whose own first
  *                evaluation throws again — also absorbed). Asserts ≥1
  *                observed task failure (else the rehearsal was
  *                vacuous) and digest ≡ plain.
  *   - speculate: `spark.speculation=true` (100 ms interval) with an
  *                identity filter that SLEEPS 4 s once per executor
  *                JVM, manufacturing the straggler speculation exists
  *                to cover. `spark.speculation.task.duration.threshold`
  *                covers the AQE-coalesced single-task stages a
  *                gate-SF run produces (a 1-task stage has no median to
  *                speculate against). Asserts ≥1 speculative task
  *                LAUNCH and digest ≡ plain — duplicate attempts of a
  *                deterministic plan commit one result.
  *
  * Digests are InvarianceSweep.canon (column-sorted, row-sorted
  * multiset) — partitioning- and commit-order-independent by
  * construction, so any drift it reports is real row drift.
  *
  * Usage: `sbt "runMain graft.tools.RetryDrill [srcDir] [query...]"`
  * (default: sf0.01 gate tables × three heavies). Exit code = number of
  * failed assertions.
  */
object RetryDrill {

  /** One-shot fault injectors, class-loaded independently in each
    * executor JVM (statics are per-JVM, which is exactly the shape a
    * real transient fault has: node-local, not plan-global).
    */
  object Faults {
    val thrown = new AtomicBoolean(false)
    val slept  = new AtomicBoolean(false)
    def throwOnce(): Boolean = {
      if (!thrown.getAndSet(true))
        throw new RuntimeException("RetryDrill: injected one-shot task failure")
      true
    }
    def sleepOnce(): Boolean = {
      if (!slept.getAndSet(true)) Thread.sleep(4000)
      true
    }
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  private val masterPort = 17077
  private val masterUrl = s"spark://127.0.0.1:$masterPort"

  /** Spawn the standalone Master + two Workers on distinct loopback
    * hosts; returns the processes for teardown. The worker env needs
    * SPARK_SCALA_VERSION (normally exported by load-spark-env.sh) so
    * its ExecutorRunner can build the executor command from the dist.
    */
  private def startCluster(): Seq[Process] = {
    def spawn(cls: String, logName: String, clsArgs: String*): Process = {
      val cmd = (Seq("java") ++ addOpens ++
        Seq("-Xmx1g", "-cp", "/opt/spark/jars/*", cls) ++ clsArgs)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"/tmp/retrydrill_$logName.log"))
      pb.start()
    }
    val master = spawn("org.apache.spark.deploy.master.Master", "master",
      "--host", "127.0.0.1", "--port", masterPort.toString,
      "--webui-port", "0")
    Thread.sleep(4000)
    val workers = Seq("127.0.0.2", "127.0.0.3").zipWithIndex.map {
      case (host, i) =>
        spawn("org.apache.spark.deploy.worker.Worker", s"worker$i",
          "--host", host, "--cores", "8", "--memory", "5g",
          "--work-dir", s"/tmp/retrydrill_work$i", "--webui-port", "0",
          masterUrl)
    }
    // wait until both workers registered (the first session would
    // otherwise hang waiting for resources with no diagnostic)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def registered(): Int = {
      val f = new java.io.File("/tmp/retrydrill_master.log")
      if (!f.exists()) 0
      else scala.io.Source.fromFile(f).getLines()
        .count(_.contains("Registering worker"))
    }
    while (registered() < 2 && System.nanoTime() < deadline) Thread.sleep(500)
    require(registered() >= 2,
      "workers did not register with the drill master within 60s — " +
        "see /tmp/retrydrill_{master,worker0,worker1}.log")
    master +: workers
  }

  private def session(master: String, extra: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.executor.memory", "4g")
      .config("spark.task.maxFailures", "4")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // executors are fresh JVMs: they need the repo classes and the
      // JDK17 module opens the driver got from build.sbt
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", addOpens.mkString(" "))
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run `mk` in a fresh session, returning (digest, secs, failed-task
    * count, speculative-task count).
    */
  private def leg(master: String, extra: Map[String, String])(
      mk: SparkSession => DataFrame): (String, Double, Int, Int) = {
    val spark = session(master, extra)
    val failed = new AtomicInteger(0)
    val speculative = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        if (ts.taskInfo.speculative) speculative.incrementAndGet(): Unit
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.reason.isInstanceOf[org.apache.spark.ExceptionFailure])
          failed.incrementAndGet(): Unit
    })
    val t0 = System.nanoTime()
    val rows = InvarianceSweep.canon(mk(spark))
    val secs = (System.nanoTime() - t0) / 1e9
    ScaleSweep.drainBus(spark)
    val out = (CanonDigest.of(rows), secs, failed.get(), speculative.get())
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queries =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q109_prefix_jaccard", "q13_pagerank", "q91_ann_ivf_pq")
    var bad = 0
    def check(ok: Boolean, msg: String): Unit =
      if (!ok) { bad += 1; println(s"FAIL: $msg") }

    val procs = startCluster()
    try {
      println("| query | leg | secs | taskFails | specTasks | digest | law |")
      println("|---|---|---|---|---|---|---|")
      queries.foreach { name =>
        def q(spark: SparkSession) = graft.SparkEntry.queries(name)(spark, src)

        val (dLocal, _, _, _) =
          leg(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]", Map())(q)

        val (dPlain, tPlain, _, _) = leg(masterUrl, Map())(q)
        check(dPlain == dLocal,
          s"$name: cluster digest $dPlain != local digest $dLocal")
        println(f"| $name | plain | $tPlain%.1f | - | - | ${dPlain.take(12)} " +
          f"| ${if (dPlain == dLocal) "=local" else "DRIFT"} |")

        // retry leg: throw once per executor JVM inside an identity
        // filter; asNondeterministic pins it above the scan (no
        // pushdown), so the failure lands where retries re-run real work
        val (dRetry, tRetry, nFail, _) = leg(masterUrl, Map())(s =>
          q(s).filter(udf(() => Faults.throwOnce()).asNondeterministic()()))
        check(nFail >= 1, s"$name: retry leg observed no task failure -- " +
          "injection did not engage (vacuous)")
        check(dRetry == dPlain,
          s"$name: digest after retried task $dRetry != plain $dPlain")
        println(f"| $name | retry | $tRetry%.1f | $nFail%d | - | " +
          f"${dRetry.take(12)} | ${if (dRetry == dPlain && nFail >= 1) "PASS" else "FAIL"} |")

        // speculation leg: one 4 s straggler per executor JVM; the
        // 100 ms speculation interval re-launches it on the OTHER host
        val (dSpec, tSpec, _, nSpec) = leg(masterUrl, Map(
          "spark.speculation" -> "true",
          "spark.speculation.interval" -> "100ms",
          "spark.speculation.multiplier" -> "1.5",
          "spark.speculation.quantile" -> "0.5",
          // AQE coalesces the tiny gate-SF exchanges down to
          // single-task stages, which have no median to speculate
          // against — the duration threshold is the documented escape
          // hatch for that shape; 1 s sits far under the 4 s straggler
          "spark.speculation.task.duration.threshold" -> "1s"))(s =>
          q(s).filter(udf(() => Faults.sleepOnce()).asNondeterministic()()))
        check(nSpec >= 1, s"$name: speculation leg launched no speculative " +
          "task -- straggler not speculated (vacuous)")
        check(dSpec == dPlain,
          s"$name: digest under speculation $dSpec != plain $dPlain")
        println(f"| $name | speculate | $tSpec%.1f | - | $nSpec%d | " +
          f"${dSpec.take(12)} | ${if (dSpec == dPlain && nSpec >= 1) "PASS" else "FAIL"} |")
      }
    } finally {
      procs.reverse.foreach(_.destroyForcibly(): Unit)
    }
    println(s"retrydrill: ${queries.size} queries, $bad failed assertions")
    if (bad > 0) sys.exit(math.min(bad, 255))
  }
}

/** Shared canonical-rows digest (sha-256 over InvarianceSweep.canon's
  * sorted multiset) — the same digest MemSweep records, so drill and
  * sweep evidence are directly comparable.
  */
object CanonDigest {
  def of(rows: Vector[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach(r => md.update(r.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }
}
