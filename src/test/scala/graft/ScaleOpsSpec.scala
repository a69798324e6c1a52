package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Sampling, Similarity, Windowed}

/** The round-10 operator additions (q150–q156): CDC/interval relational
  * ops, the int8 quantization audit, anomaly monitoring, hard-negative
  * mining, and curriculum ordering. Every query has a full DuckDB
  * oracle; these tests pin the engine-side laws the hash compare can't
  * express — driver brute-force replays, plan-shape guarantees (no
  * nested-loop range join, no single-partition global sort), and the
  * IVF hard-negative recall contract vs the brute rung.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def quantHalfUp(x: Float): Long =
    new java.math.BigDecimal(x.toDouble * 1e7)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("sessionOverlap matches a driver brute-force BETWEEN join") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("tsu"),
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    // driver sessionize: gap-split at 30 min per user on (tsu, event_id)
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val seqIds = sorted.scanLeft((0L, Long.MinValue)) { case ((s, prev), r) =>
        (if (prev != Long.MinValue && r._3 - prev > 1800000000L) s + 1 else s, r._3)
      }.tail.map(_._1)
      sorted.zip(seqIds).groupBy(_._2).map { case (s, rs) =>
        (u, s, rs.map(_._1._3).min, rs.map(_._1._3).max)
      }
    }
    val purchases = ev.filter(_._4 == "purchase")
    val expected = sessions.map { case (u, s, lo, hi) =>
      val hits = purchases.filter(p => p._1 != u && p._3 >= lo && p._3 <= hi)
      val v = hits.map(p => BigDecimal(p._5).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (u, s, lo, hi) -> (hits.length.toLong, v)
    }.toMap
    val got = Windowed.sessionOverlap(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == expected.size, "one row per session")
    got.foreach { case (u, s, lo, hi, n, v) =>
      val (en, ev2) = expected((u, s, lo, hi))
      assert(n == en && math.abs(v - ev2) < 1e-9, s"session ($u,$s)")
    }
    assert(got.exists(_._5 > 0), "fixture has concurrent purchases")
    assert(got.exists(_._5 == 0), "and zero-overlap sessions survive the left join")
  }

  test("sessionOverlap plans as a hash join on the cell id, not a nested loop") {
    val plan = Windowed.sessionOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the range predicate must ride the cell-bucketized equi-join")
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString)
  }

  test("scd2History: versions are gapless, intervals chain, one open version per user") {
    import spark.implicits._
    val rows = Relational.scd2History(spark, sf)
      .select($"user_id", $"version", $"valid_from_us", $"valid_to_us",
        $"is_current")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.length == nEvents, "every change row becomes one version")
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to vs.length).toSeq, s"user $u versions")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u v${a._2}: valid_to chains to next valid_from")
          assert(!a._5, s"user $u v${a._2} closed version not current")
        case _ =>
      }
      val last = sorted.last
      assert(last._4 == -1L && last._5, s"user $u open version")
      assert(vs.count(_._5) == 1, s"user $u exactly one current")
    }
  }

  test("int8QuantAudit matches a driver recompute; errors bounded by the step size") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val q = emb.map { case (_, l, e) => (l, e.map(quantHalfUp)) }
    val dims = q.head._2.indices.map { i =>
      val vals = q.map(_._2(i))
      (vals.min, vals.max)
    }
    val errs = q.flatMap { case (l, e) =>
      e.zipWithIndex.map { case (v, i) =>
        val (mn, mx) = dims(i)
        val rng = mx - mn
        val code = if (rng == 0) 0L else (v - mn) * 255 / rng
        (l, v - (mn + code * rng / 255))
      }
    }
    val expect = errs.groupBy(_._1).map { case (l, es) =>
      l.toLong -> (es.length.toLong, es.map(_._2).sum, es.map(_._2).max,
        es.map(e => BigInt(e._2) * BigInt(e._2)).sum)
    }
    val got = Similarity.int8QuantAudit(spark, sf)
      .select($"label", $"n_vals", $"sum_err", $"max_err", $"sum_sq_err_d")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == expect.size)
    got.foreach { case (l, n, s, mx, ssq) =>
      val (en, es, emx, essq) = expect(l)
      assert(n == en && s == es && mx == emx, s"label $l integer error mass")
      assert(ssq == essq.toDouble, s"label $l sum of squares")
    }
    // every error is below one reconstruction step (rng/255 + 1)
    val maxStep = dims.map { case (mn, mx) => (mx - mn) / 255 + 1 }.max
    got.foreach { case (l, _, _, mx, _) =>
      assert(mx >= 0 && mx <= maxStep, s"label $l max_err $mx vs step $maxStep")
    }
  }

  test("dailyAnomaly matches a driver replay; warm-up days carry NULL z") {
    import spark.implicits._
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type",
        expr("unix_micros(ts::timestamp) div 86400000000").as("dy"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Windowed.dailyAnomaly(spark, sf)
      .select($"event_type", $"dy", $"cnt", $"n_prev", $"z", $"is_anomaly")
      .as[(String, Long, Long, Long, Option[Double], Boolean)].collect()
    assert(got.length == daily.size)
    got.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, dy, cnt, nPrev, z, flag), i) =>
        assert(cnt == daily((t, dy)), s"$t day $dy count")
        val prev = sorted.slice(math.max(0, i - 7), i).map(_._3)
        assert(nPrev == prev.length.toLong, s"$t day $dy n_prev")
        if (prev.length < 7) {
          assert(z.isEmpty && !flag, s"$t day $dy warm-up")
        } else {
          val mean = prev.sum.toDouble / prev.length
          val varr = (prev.length * prev.map(c => c * c).sum -
            prev.sum * prev.sum).toDouble / (prev.length.toLong * (prev.length - 1))
          if (varr > 0) {
            val ez = (cnt - mean) / math.sqrt(varr)
            assert(z.isDefined && math.abs(z.get - ez) < 1e-9, s"$t day $dy z")
            assert(flag == (math.abs(z.get) >= 2.0), s"$t day $dy flag")
          } else assert(z.isEmpty && !flag, s"$t day $dy degenerate variance")
        }
      }
    }
  }

  test("ivfBalance: populations conserve, shares and imbalance follow their laws") {
    import spark.implicits._
    val rows = graft.operators.Similarity.ivfBalance(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = rows.map(_._2).sum
    val corpus = graft.core.Tables.embeddings(spark, sf).count()
    assert(total == corpus, "every corpus vector lands in exactly one list")
    val mx = rows.map(_._2).max
    rows.foreach { case (lid, n, share, imb) =>
      assert(share == n * 1000000L / total, s"list $lid share law")
      assert(imb == mx * 8L * 1000000L / total, s"list $lid imbalance law")
    }
    // imbalance >= 1e6 always (max >= mean), == 1e6 iff perfectly balanced
    assert(rows.head._4 >= 1000000L - 8L) // integer floor slack
  }

  test("hardNegatives: labels differ, ranks contiguous, IVF default holds recall vs brute") {
    import spark.implicits._
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val ivf = Similarity.hardNegatives(spark, sf)
      .as[(Long, Int, Long, Int, Double, Long)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (a, al, n, nl, _, _) =>
      assert(al == labels(a) && nl == labels(n) && al != nl, s"pair ($a,$n)")
    }
    ivf.groupBy(_._1).foreach { case (a, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1L to rs.length).toSeq, s"anchor $a ranks")
    }
    val brute = Similarity.hardNegativesBrute(spark, sf)
      .as[(Long, Int, Long, Int, Double, Long)].collect()
      .map(r => (r._1, r._3)).toSet
    val ivfSet = ivf.map(r => (r._1, r._3)).toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    assert(recall >= 0.6, s"hard-negative recall $recall below 0.6")
  }

  test("hardNegatives default plan has no BroadcastNestedLoopJoin") {
    val plan = Similarity.hardNegatives(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "default generator must candidate-join on the IVF list id")
  }

  test("tokenizerFertility: piece mass conserves against the per-doc q94 encode") {
    import spark.implicits._
    val perLang = graft.operators.Text.tokenizerFertility(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, nw, nc, np, fert, cpp) =>
      assert(np >= nw, s"$lang: every word has at least one piece")
      assert(np <= nc, s"$lang: pieces cannot outnumber characters")
      assert(fert == np.toDouble / nw.toDouble && fert >= 1.0, s"$lang fertility")
      assert(cpp == nc.toDouble / np.toDouble && cpp >= 1.0, s"$lang compression")
    }
    // the same trained trajectory drives q94: total piece/word mass agrees
    val perDoc = graft.operators.Text.bpeEncode(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(perLang.map(_._2).sum == perDoc.map(_._2).sum, "word mass")
    assert(perLang.map(_._4).sum == perDoc.map(_._3).sum, "piece mass")
  }

  test("shardZoneMap: range zones are disjoint and skippable, hash zones are not") {
    import spark.implicits._
    val rows = graft.operators.Sharding.shardZoneMap(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val (hash, range) = rows.partition(_._1 == "hash")
    assert(hash.map(_._3).sum == nDocs && range.map(_._3).sum == nDocs,
      "both layouts cover the corpus")
    val span = rows.map(_._5).max - rows.map(_._4).min
    // hash shards: every zone spans essentially the whole id space —
    // a doc_id predicate can skip nothing
    hash.foreach { case (_, s, _, _, _, idr, _, _) =>
      assert(idr > span / 2, s"hash shard $s zone should span the corpus (got $idr/$span)")
    }
    // range shards: zones are pairwise disjoint — one-shard lookups
    val sorted = range.sortBy(_._4)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"range shards ${a._2}/${b._2} zones overlap")
      case _ =>
    }
  }

  test("curriculumOrder: positions = the global (decile DESC, shuf, doc_id) rank, " +
      "machinery arm never funnels") {
    import spark.implicits._
    val co = Sampling.curriculumOrder(spark, sf)
    // at spec scale the rank dial's single-sorted-task arm runs (one
    // SinglePartition exchange of ≤ 2^18 slim rows is the point);
    // forcing windowMaxRows=0 must re-engage the two-phase machinery
    // with no funnel
    spark.conf.set("spark.graft.rank.windowMaxRows", "0")
    val plan = try Sampling.curriculumOrder(spark, sf)
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.graft.rank.windowMaxRows")
    assert(!plan.contains("Exchange SinglePartition"), "two-phase rank must not funnel")
    val rows = co.as[(Long, Long, Long, Long)].collect()
    val expect = rows.sortBy { case (id, dec, sh, _) => (-dec, sh, id) }
      .zipWithIndex.map { case ((id, _, _, _), i) => id -> (i + 1L) }.toMap
    assert(rows.map(r => r._1 -> r._4).toMap == expect, "global positions")
    assert(rows.map(_._4).toSet == (1L to rows.length).toSet, "dense 1..n")
    // run-to-run determinism (fresh plan, fresh localCheckpoint)
    val again = Sampling.curriculumOrder(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.map(r => r._1 -> r._4).toMap == expect)
  }

  test("ivfProbeSweep: exact sentinel, monotone recall/candidates, full probe = full recall") {
    import spark.implicits._
    val rows = Similarity.ivfProbeSweep(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 4L, 8L))
    val nv = graft.core.Tables.embeddings(spark, sf).count()
    val nq = 10L
    val brute = rows.head
    assert(brute._2 == nq * (nv - 1), "sentinel scans the whole corpus")
    assert(brute._4 == 1000000L && brute._5 == 1000000L,
      "the brute sentinel row is the exact calibration reference")
    val ivf = rows.tail
    // candidate sets nest with the probe budget, and every truth member
    // inside a candidate set surfaces into its top-k (the total order),
    // so hits are monotone too
    ivf.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2 && a._3 <= b._3,
        s"monotonicity ${a._1} -> ${b._1}")
      case _ =>
    }
    // probing all 8 lists IS the exhaustive scan
    assert(ivf.last._2 == nq * (nv - 1) && ivf.last._4 == 1000000L)
    ivf.foreach(r => assert(r._4 >= 0 && r._4 <= 1000000L))
    // the sweep should show a real trade: 1 probe scans < half the corpus
    assert(ivf.head._2 < brute._2 / 2, "1-probe candidate volume is sub-corpus")
  }
}
