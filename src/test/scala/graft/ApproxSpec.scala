package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.Relational

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.01"

  test("approximate sketches land within error bounds of exact answers") {
    import spark.implicits._
    val exact = Relational.distinctStats(spark, sf)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    val exactP50 = Relational.percentiles(spark, sf)
      .select($"event_type", $"p50").as[(String, Double)].collect().toMap
    // raw sketch values (the query itself now emits the bound contract)
    val approx = Tables.events(spark, sf).groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.05).as("u"),
        approx_percentile($"value", lit(0.5), lit(1000)).as("p"))
      .as[(String, Long, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (t, users, p50) =>
      // HLL++ rsd 5%
      assert(math.abs(users - exact(t)).toDouble / exact(t) < 0.1, s"$t users")
      // KLL with accuracy 1000 on ~2000 rows/group: within a few percent
      assert(math.abs(p50 - exactP50(t)) / math.max(1.0, exactP50(t)) < 0.05, s"$t p50")
    }
  }

  test("q44 emits the bound contract: all booleans TRUE") {
    import spark.implicits._
    val rows = Relational.approxStats(spark, sf)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, hllOk, p50Ok) =>
      assert(n > 0, s"$t n_events")
      assert(hllOk, s"$t hll_in_bound")
      assert(p50Ok, s"$t p50_in_bound")
    }
  }

  test("hllDistinct: md5-register HLL lands within the published rsd at both SFs") {
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Relational.hllDistinct(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (t, exact, vZero, raw, est) =>
        assert(vZero >= 0 && vZero <= 256, s"$t v_zero $vZero")
        // corrected estimate: 3σ of HLL's 1.04/√m rsd, plus LC's own
        // small-range slack — generous but a real regression (wrong
        // bucket math, dropped registers) lands far outside it
        assert(math.abs(est - exact) <= math.max(5.0, 0.25 * exact),
          s"$t exact=$exact est=$est")
        // the LC branch must engage exactly per the algorithm
        if (vZero > 0 && raw <= 640)
          assert(est == Relational.HllLcTable(vZero.toInt), s"$t LC branch")
        else assert(est == raw, s"$t raw branch")
      }
    }
  }

  test("histogramQuantiles: estimates land within one bin width of exact ranks") {
    import spark.implicits._
    val vals = Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    val rows = Relational.histogramQuantiles(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == vals.size * 3)
    rows.foreach { case (t, pct, n, b, cnt, est) =>
      val xs = vals(t)
      assert(n == xs.length.toLong, s"$t n")
      assert(b >= 0 && b < 64 && cnt > 0)
      val exact = xs(((pct * n + 99) / 100 - 1).toInt) // value at the rank
      val width = (xs.last - xs.head) / 64.0
      assert(math.abs(est - exact) <= width + 1e-9,
        s"$t p$pct: est $est vs exact $exact (bin width $width)")
    }
  }

  test("exactVariance matches a BigInt driver recompute and tracks var_samp") {
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val vals = Tables.events(spark, dir)
        .select($"event_type", $"value").as[(String, Double)].collect()
        .groupBy(_._1).map { case (t, vs) =>
          t -> vs.map(v => BigInt(math.round(v._2 * 100)))
        }
      val got = Relational.exactVariance(spark, dir)
        .as[(String, Long, Double, Double, Double)].collect()
      assert(got.length == vals.size)
      got.foreach { case (t, n, mean, vr, std) =>
        val xs = vals(t)
        assert(n == xs.length.toLong)
        val (sx, sxx) = (xs.sum, xs.map(x => x * x).sum)
        val num = BigInt(n) * sxx - sx * sx    // exact integer numerator
        val expVar = num.toDouble / (n.toDouble * (n - 1).toDouble) / 10000.0
        assert(math.abs(vr - expVar) <= math.ulp(expVar) * 4, s"$t var")
        assert(std == math.sqrt(vr), s"$t std")
        // sanity vs the double-precision two-pass variance
        val m = xs.sum.toDouble / n / 100.0
        val tp = vals(t).map(x => math.pow(x.toDouble / 100.0 - m, 2)).sum / (n - 1)
        assert(math.abs(vr - tp) < 1e-6 * math.max(1.0, tp), s"$t two-pass")
      }
    }
  }

  test("hllOverlap: union dominates, estimates track exact sets, identities hold") {
    import spark.implicits._
    val rows = graft.operators.Relational.hllOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, xi, xu, ea, eb, eu, ei, jq) =>
      assert(a < b)
      // register-max union dominates each side and never exceeds the sum
      assert(eu >= math.max(ea, eb), s"($a,$b) union lower bound")
      assert(eu <= ea + eb, s"($a,$b) union upper bound")
      // inclusion-exclusion + quantized-jaccard identities
      assert(ei == math.max(0L, ea + eb - eu), s"($a,$b) inter identity")
      assert(jq == (if (eu > 0) ei * 1000000L / eu else 0L), s"($a,$b) jaccard")
      // exact audit columns are internally consistent
      assert(xu >= xi && xi >= 0, s"($a,$b) exact sanity")
      // m=256 HLL rsd is ~6.5%; 4 sigma on the union estimate
      assert(math.abs(eu - xu).toDouble <= 0.26 * xu,
        s"($a,$b) union estimate off: est $eu vs exact $xu")
    }
  }
}
