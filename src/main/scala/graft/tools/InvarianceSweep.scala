package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Partition-count / AQE invariance sweep: every SparkEntry query must
  * return BIT-IDENTICAL rows under radically different physical
  * configurations — the session default (shuffle.partitions = cpus,
  * AQE on) vs a deliberately hostile leg (5 shuffle partitions, AQE
  * off, 2-row scan partitions so even the parquet reads split
  * differently).
  *
  * Why this is a law and not a nice-to-have: at 100 TB the same query
  * runs at 10³–10⁵ tasks depending on cluster size, AQE coalescing and
  * file layout, and a result that depends on partition count or
  * aggregate fold order is silent corruption, not a perf bug. The
  * catalog's exactness discipline (quantized integer sums, decimal(38)
  * folds via `StableNum`, md5-derived sampling and splits, struct-max
  * tie-breaks) exists precisely to make physical layout unobservable —
  * this sweep PROVES the property query-by-query instead of arguing it
  * per scaladoc. The degenerate-input sweep (DegenSweep) closes the
  * catalog under hostile DATA; this closes it under hostile LAYOUT.
  *
  * Method: leg A runs all queries on a fresh session with the default
  * config and canonicalizes each result (columns sorted by name, rows
  * collected and sorted as strings — the check.py convention); leg B
  * re-runs on a NEW session (its own Memo lineage cache, released
  * after) with the hostile config. Exit code = number of queries whose
  * canonical row multisets differ; each is printed with a 3-row diff
  * sample.
  *
  * Usage: runMain graft.tools.InvarianceSweep [sfDir] [query...]
  */
object InvarianceSweep {

  /** Canonical row multiset: column order and row order removed, so
    * only VALUES distinguish two runs. Row.toString is deterministic
    * for every type the catalog returns (primitives, decimals, arrays,
    * structs — no map columns exist in SparkEntry results).
    */
  def canon(df: DataFrame): Vector[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toVector
  }

  def runLeg(spark: SparkSession, sfDir: String,
      names: Seq[String]): Map[String, Either[String, Vector[String]]] = {
    names.map { name =>
      name -> (try Right(canon(graft.SparkEntry.queries(name)(spark, sfDir)))
      catch { case scala.util.control.NonFatal(e) =>
        Left(e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | "))
      })
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val base = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    val t0 = System.nanoTime()
    val a = runLeg(base, sfDir, names)

    // hostile leg: its own session → its own Memo/cache lineages, so
    // nothing built under the default config is reused
    val hostile = base.newSession()
    hostile.conf.set("spark.sql.shuffle.partitions", "5")
    hostile.conf.set("spark.sql.adaptive.enabled", "false")
    hostile.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val b = runLeg(hostile, sfDir, names)
    graft.core.Memo.release(hostile)

    var bad = 0
    names.foreach { name =>
      (a(name), b(name)) match {
        case (Right(ra), Right(rb)) if ra == rb => ()
        case (Right(ra), Right(rb)) =>
          bad += 1
          val onlyA = ra.diff(rb).take(3)
          val onlyB = rb.diff(ra).take(3)
          println(s"DIFF $name: ${ra.size} vs ${rb.size} rows; " +
            s"onlyDefault=${onlyA.mkString(";")} onlyHostile=${onlyB.mkString(";")}")
        case (Left(ea), _) => bad += 1; println(s"ERR default $name: $ea")
        case (_, Left(eb)) => bad += 1; println(s"ERR hostile $name: $eb")
      }
    }
    println(f"invariance sweep: ${names.size} queries x 2 configs, " +
      f"$bad divergent, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    base.stop()
    // exit codes wrap mod 256 — a 256-failure catastrophe must not
    // read as a clean pass at the round-close gate
    sys.exit(math.min(bad, 255))
  }
}
