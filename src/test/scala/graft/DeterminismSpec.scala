package graft

import org.scalatest.funsuite.AnyFunSuite

/** Task-retry / speculation safety, certified at the PLAN level.
  *
  * At cluster scale Spark re-executes failed tasks and speculatively
  * duplicates slow ones; a plan containing any non-deterministic
  * expression (rand, uuid, monotonically_increasing_id,
  * spark_partition_id, input_file_name, ...) can commit DIFFERENT rows
  * on the retry than the original attempt produced — silent corruption
  * that no single-run gate (correctness, invariance, degen) can see,
  * because every single-run gate only ever observes one attempt. The
  * catalog's sampling/split/salting machinery is md5/xxhash-based
  * precisely to avoid this class; this spec turns that convention into
  * a law: the optimized plan of EVERY declared query (subqueries
  * included) contains zero expressions with `deterministic == false`.
  *
  * Complements InvarianceSweep (same rows under hostile partitioning —
  * one attempt per task) by covering the axis it cannot: two attempts
  * of the SAME task must agree, which is exactly what the
  * deterministic flag asserts to the scheduler.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every catalog query's optimized plan is fully deterministic (task-retry safe)") {
    val sf = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan
      val nd = plan.collectWithSubqueries { case p =>
        p.expressions.flatMap(e => e.collect { case x if !x.deterministic => x })
      }.flatten
      if (nd.isEmpty) None
      else Some(name -> nd.map(_.prettyName).distinct.take(3))
    }
    assert(bad.isEmpty,
      s"non-deterministic expressions (unsafe under task retry) in: $bad")
  }
}
