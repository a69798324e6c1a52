package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession

/** Regenerates PLANSTATS.md — a one-row-per-query audit of physical-plan
  * shape across the ENTIRE query surface: shuffle count, scans,
  * join strategies, nested-loop/cartesian occurrences, codegen spans.
  * The grep-able complement to PLANS.md's full dumps: a regression that
  * turns a broadcast join into a nested loop, or doubles a query's
  * exchanges, shows up as a diff in this table.
  *
  * Counts come from the AQE initial physical plan at sf0.001 (plan
  * SHAPE, not runtime re-planning — AQE may still convert sort-merge
  * joins to broadcast at run time, so the table is conservative).
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new PrintWriter("PLANSTATS.md", "UTF-8")
    out.println("# PLANSTATS — physical-plan shape per query (sf0.001, AQE initial plan)")
    out.println()
    out.println("Columns: data-bearing Exchanges (shuffles), parquet scans,")
    out.println("broadcast-hash / sort-merge / nested-loop joins. Nested loops are")
    out.println("expected ONLY against 1-row/scalar or literal-bounded builds (corpus")
    out.println("bounds, totals, k-row grids) — audited: every bnlj > 0 row is one of")
    out.println("those or a declared-quadratic exact rung (q25; q210's 1-NN purity and")
    out.println("q215's agreement audit, which score the same quadratic embedding join;")
    out.println("their 100 TB path is the IVF probe candidate generator) — never between")
    out.println("two data-bearing sides. Scan AND shuffle counts are UNCACHED logical")
    out.println("lineages: a memo-shared table (e.g. the q205/q211/q215 pair table, or")
    out.println("the q111 copurchase basket) re-lists its scans and exchanges per")
    out.println("reference here but materializes once at execution — so a build whose")
    out.println("reshape trades a broadcast join for one extra group exchange (q111,")
    out.println("r17) raises every consumer's listed shuffle count while lowering the")
    out.println("executed cost; read consumer rows as build-lineage × references.")
    out.println()
    out.println("| query | shuffles | scans | bhj | smj | bnlj |")
    out.println("|---|---|---|---|---|---|")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        def c(pat: String) = pat.r.findAllIn(p).length
        val shuffles = c("(?m)^\\s*[+:]*-? ?Exchange hashpartitioning") +
          c("(?m)Exchange rangepartitioning") + c("Exchange SinglePartition")
        out.println(s"| $name | $shuffles | ${c("Scan parquet")} | " +
          s"${c("BroadcastHashJoin")} | ${c("SortMergeJoin")} | " +
          s"${c("BroadcastNestedLoopJoin") + c("CartesianProduct")} |")
      } catch {
        case e: Throwable =>
          out.println(s"| $name | ERR ${e.getClass.getSimpleName} | | | | |")
      }
    }
    out.close()
    println("wrote PLANSTATS.md")
    spark.stop()
  }
}
