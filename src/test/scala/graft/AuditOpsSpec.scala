package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Sharding, Text, Windowed}

/** The round-10 audit/OLAP additions (q158–q165): vocabulary overlap,
  * growth reporting, multi-touch attribution, the quality committee,
  * CMS sketches, z-order layouts, and RFM segmentation. All have full
  * DuckDB oracles; these tests pin the engine-side laws the hash compare
  * can't express — driver replays, conservation laws, sketch one-sided
  * error, and the z-order span bounds that make data skipping work.
  */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("cusumChangePoint: exact deviation supremum, argmax, and rate replay") {
    import spark.implicits._
    val grid = graft.core.Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val got = Windowed.cusumChangePoint(spark, sf)
      .as[(String, Long, Long, java.sql.Date, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    grid.groupBy(_._1).foreach { case (t, cells) =>
      val days = cells.sortBy(_._2.toLocalDate.toEpochDay)
      val n = days.length.toLong
      val sn = days.map(_._3).sum
      var sk = 0L
      val devs = days.zipWithIndex.map { case ((_, d0, c), i) =>
        sk += c
        (BigInt(sk) * n - BigInt(i + 1) * sn).abs ->
          ((d0, i + 1, sk))
      }
      val mx = devs.map(_._1).max
      val (bd, bk, bsk) = devs.find(_._1 == mx).get._2
      val (_, nDays, nEv, gotDay, dev, rb, ra) = got(t)
      assert(nDays == n && nEv == sn, s"type $t totals")
      assert(gotDay == bd && BigInt(dev) == mx, s"type $t break day")
      assert(rb == math.round(bsk.toDouble / bk * 1000.0), s"type $t before")
      val expAfter = if (n > bk)
        math.round((sn - bsk).toDouble / (n - bk) * 1000.0) else 0L
      assert(ra == expAfter, s"type $t after")
    }
  }

  test("sessionGapSweep: one-scan sweep equals full re-sessionization at every tau") {
    import spark.implicits._
    val got = Windowed.sessionGapSweep(spark, sf)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(5L, 15L, 30L, 60L))
    val ev = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_micros($"ts").as("t"))
      .as[(Long, Long, Long)].collect()
    val nEvents = ev.length.toLong
    val byUser = ev.groupBy(_._1).values.map(_.sortBy(r => (r._3, r._2)))
    got.foreach { case (tau, (_, nUsers, nSessions, meanQ3)) =>
      // full independent re-sessionization at this tau
      val sessions = byUser.map { u =>
        val ts = u.map(_._3).toSeq
        1L + ts.zip(ts.tail).count { case (a, b) =>
          b - a > tau * 60000000L
        }.toLong
      }.sum
      assert(nUsers == byUser.size.toLong, s"tau $tau users")
      assert(nSessions == sessions, s"tau $tau sessions")
      assert(meanQ3 == math.round(nEvents.toDouble / sessions * 1000.0))
    }
    // tau=30 must agree with the q28 sessionizer it sweeps around
    val q28 = Windowed.sessionize(spark, sf).count()
    assert(got(30L)._3 == q28, "tau=30 equals q28 session count")
    // monotone: larger gaps merge sessions
    assert(got(5L)._3 >= got(15L)._3 && got(15L)._3 >= got(30L)._3
      && got(30L)._3 >= got(60L)._3)
  }

  test("skipRateSim: zone-map prune replay; z-order prunes the non-sort dim") {
    import spark.implicits._
    val stats = Sharding.zOrderAudit(spark, sf)
      .select($"layout", $"min_c", $"max_c", $"min_d", $"max_d")
      .as[(String, Long, Long, Long, Long)].collect()
    val got = Sharding.skipRateSim(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet ==
      Set(("zorder", "c"), ("zorder", "d"), ("linear", "c"), ("linear", "d")))
    for (layout <- Seq("zorder", "linear"); dim <- Seq("c", "d")) {
      val blocks = stats.filter(_._1 == layout)
      val checks = for (b <- blocks; p <- 0 until 8) yield {
        val (lo, hi) = (p * 8192L, p * 8192L + 8191L)
        val (mn, mx) = if (dim == "c") (b._2, b._3) else (b._4, b._5)
        mx < lo || mn > hi
      }
      val (_, _, nC, nS, rate) = got((layout, dim))
      assert(nC == checks.size.toLong, s"$layout/$dim checks")
      assert(nS == checks.count(identity).toLong, s"$layout/$dim skips")
      assert(rate == math.round(nS.toDouble / nC * 1e6), s"$layout/$dim rate")
    }
    // the point of z-order: it prunes the NON-sort dimension where the
    // linear layout cannot
    assert(got(("zorder", "c"))._5 > got(("linear", "c"))._5,
      "z-order must out-prune linear on the non-sort dim")
  }

  test("theilSenTrend: lower-median pairwise slope replay per type") {
    import spark.implicits._
    val grid = graft.core.Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val got = Windowed.theilSenTrend(spark, sf)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    grid.groupBy(_._1).foreach { case (t, cells) =>
      val days = cells.map(c => (c._2.toLocalDate.toEpochDay, c._3)).sortBy(_._1)
      val slopes = for {
        i <- days.indices; j <- days.indices if days(i)._1 < days(j)._1
      } yield {
        val s = (days(j)._2 - days(i)._2).toDouble /
          (days(j)._1 - days(i)._1) * 1e9
        (BigDecimal(s).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
          days(i)._1, days(j)._1)
      }
      val sorted = slopes.sortBy(identity)
      val median = sorted((sorted.size + 1) / 2 - 1)._1
      val (_, nDays, nPairs, sen) = got(t)
      assert(nDays == days.size.toLong, s"type $t days")
      assert(nPairs == slopes.size.toLong, s"type $t pairs")
      assert(sen == median, s"type $t lower-median slope")
      // the median slope is bracketed by the extreme pairwise slopes
      assert(sen >= sorted.head._1 && sen <= sorted.last._1, s"type $t bracket")
    }
  }

  test("burstiness: exact per-type gap-multiset replay; Goh-Barabási bounds") {
    import spark.implicits._
    val got = Windowed.burstiness(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val ev = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("t"))
      .as[(Long, String, Long, Long)].collect()
    ev.groupBy(_._2).foreach { case (typ, rows) =>
      val byUser = rows.groupBy(_._1)
      val gaps = byUser.values.flatMap { u =>
        val s = u.sortBy(r => (r._4, r._3)).map(_._4).toSeq
        s.zip(s.tail).map { case (a, b) => b - a }
      }.toSeq
      val users = byUser.count { case (_, u) => u.size >= 2 }.toLong
      val n = gaps.size.toLong
      val sg = gaps.map(BigInt(_)).sum
      val sgg = gaps.map(g => BigInt(g) * BigInt(g)).sum
      val dd = BigInt(n) * sgg - sg * sg
      val expB = if (n > 1 && sg > 0)
        (math.sqrt(dd.toDouble) - sg.toDouble) /
          (math.sqrt(dd.toDouble) + sg.toDouble)
      else 0.0
      val (_, nu, ng, mean, b) = got(typ)
      assert(ng == n && nu == users, s"type $typ counts")
      assert(mean == sg.toDouble / n, s"type $typ mean gap")
      assert(b == expB, s"type $typ burstiness")
      // B lives strictly inside (-1, 1) for positive gaps
      assert(b > -1.0 && b < 1.0, s"type $typ bound")
    }
  }

  private def quantHalfUp(x: Float): Long =
    new java.math.BigDecimal(x.toDouble * 1e7)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private def cleanToks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq
      .filter(t => t.matches("[a-z]+") &&
        !graft.functions.TextFunctions.StopWords.contains(t))

  test("vocabOverlap matches a driver set replay and its ratio laws") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(r => cleanToks(r._2)).toSet).toMap
    val got = Text.vocabOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, common, va, vb, jq, oovb) =>
      assert(a < b)
      val inter = (vocab(a) intersect vocab(b)).size.toLong
      assert(common == inter && va == vocab(a).size && vb == vocab(b).size)
      assert(jq == common * 1000000L / (va + vb - common))
      assert(oovb == (vb - common) * 1000000L / vb)
      assert(jq >= 0L && jq <= 1000000L && oovb >= 0L && oovb <= 1000000L)
    }
    // every unordered source pair with nonempty intersection appears once
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.size == got.length)
  }

  test("periodGrowth count ratios match a driver lag replay") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
      .select($"event_type", unix_micros($"ts").as("tsu"))
      .as[(String, Long)].collect()
    val weekly = ev.groupBy(e => (e._1, e._2 / 1000000L / 604800L)).view
      .mapValues(_.length.toLong).toMap
    val got = Windowed.periodGrowth(spark, sf)
      .select($"event_type", $"week_id", $"cnt", $"prev_cnt", $"cnt_wow_q6")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
    assert(got.length == weekly.size)
    val byType = got.groupBy(_._1)
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((t, wk, cnt, prev, wow), i) =>
        assert(cnt == weekly((t, wk)))
        if (i == 0) assert(prev.isEmpty && wow.isEmpty)
        else {
          val p = sorted(i - 1)._3
          assert(prev.contains(p))
          assert(wow.contains((cnt - p) * 1000000L / p))
        }
      }
    }
  }

  test("linearAttribution conserves the purchase mass exactly") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val totalUnits = ev.filter(_._1 == "purchase").map { case (_, v) =>
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 1000000
    }.sum.toLongExact
    val got = Windowed.linearAttribution(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._3).sum == totalUnits,
      "attributed mass == purchase mass (remainder-to-last-touch law)")
    assert(got.map(_._1).toSet.subsetOf(Set("view", "click", "direct")))
  }

  test("qualityCommittee sums the three per-lang signal ranks") {
    import spark.implicits._
    val got = Text.qualityCommittee(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val byLang = got.groupBy(_._2)
    got.foreach { case (_, lang, rs, ra, re, committee, crnk, dec) =>
      val n = byLang(lang).length.toLong
      assert(committee == rs + ra + re)
      assert(rs >= 1L && rs <= n && ra >= 1L && ra <= n && re >= 1L && re <= n)
      assert(crnk >= 1L && crnk <= n)
      assert(dec >= 0L && dec <= 9L)
    }
  }

  test("CMS estimates are one-sided (never under the exact count)") {
    import spark.implicits._
    val counts = Relational.cmsUserCounts(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(counts.length > 0)
    counts.foreach { case (_, exact, est, over) =>
      assert(est >= exact && over == est - exact)
    }
    val Array((exactSz, estSz, overQ6)) = Relational.cmsSelfJoinSize(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(estSz >= exactSz, "F2 estimate upper-bounds the self-join size")
    assert(overQ6 == (estSz - exactSz) * 1000000L / exactSz)
  }

  test("shardDedupMiss: conservation, monotone-in-k miss mass, shard-law replay") {
    import spark.implicits._
    val total = graft.operators.Dedup.jaccardPairs(spark, sf).count()
    val rows = Sharding.shardDedupMiss(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L, 32L))
    rows.foreach { case (k, n, intra, cross, missQ, randQ) =>
      assert(n == total, s"k=$k sees every pair exactly once")
      assert(intra + cross == n, s"k=$k conservation")
      assert(missQ == math.round(cross.toDouble / n * 1000000.0))
      assert(randQ == math.round((k - 1).toDouble / k * 1000000.0))
    }
    // the intra set at 2k shards is a subset of the intra set at k when
    // 2k-shard ids refine k-shard ids mod k — md5 % k doesn't nest, so
    // assert the weaker law that holds by construction: a pair intra at
    // EVERY k is a hash collision chain; at minimum intra mass cannot
    // exceed the k=2 level for any larger k in expectation. Pin the
    // deterministic fixture ordering instead of the expectation:
    val intraByK = rows.map(r => r._1 -> r._3).toMap
    assert(intraByK(32L) <= intraByK(2L),
      "32-shard locality cannot beat 2-shard locality on this fixture")
  }

  test("z-order blocks bound BOTH dims; the linear layout only one") {
    import spark.implicits._
    val rows = Sharding.zOrderAudit(spark, sf)
      .select($"layout", $"block", $"c_span_q6", $"d_span_q6")
      .as[(String, Long, Long, Long)].collect()
    val (zo, lin) = rows.partition(_._1 == "zorder")
    assert(zo.nonEmpty && lin.nonEmpty)
    // 8 z blocks fix d16's top 2 bits and c16's top 1 bit: spans are
    // bounded at 50% / 25% of each dimension BY CONSTRUCTION
    zo.foreach { case (_, blk, cs, ds) =>
      assert(cs <= 500000L, s"z block $blk custkey span $cs")
      assert(ds <= 250000L, s"z block $blk day span $ds")
    }
    // the day-sorted control is tight on day but spans custkey freely
    lin.foreach { case (_, blk, _, ds) =>
      assert(ds <= 125000L, s"linear block $blk day span $ds")
    }
    assert(lin.map(_._3).max > 500000L,
      "some linear block spans most of the custkey range — no pruning there")
  }

  test("dimHealth matches a driver quantized two-moment replay") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"embedding").as[Array[Float]].collect()
    val got = graft.operators.Similarity.dimHealth(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect().sortBy(_._1)
    assert(got.length == vecs.head.length)
    got.foreach { case (dim, n, sumQ, minQ, maxQ, nZero, mean, varS) =>
      val qs = vecs.map(v => quantHalfUp(v(dim.toInt)))
      assert(n == qs.length.toLong && sumQ == qs.sum)
      assert(minQ == qs.min && maxQ == qs.max)
      assert(nZero == qs.count(_ == 0L).toLong)
      assert(math.abs(mean - sumQ.toDouble / n / 1e7) < 1e-12)
      val num = BigInt(n) * qs.map(q => BigInt(q) * q).sum - BigInt(sumQ) * sumQ
      assert(varS.exists(v =>
        math.abs(v - num.toDouble / (n * (n - 1)).toDouble / 1e14) < 1e-9))
    }
  }

  test("joinSkewAdvisor orders its percentiles and derives the ceil salt") {
    import spark.implicits._
    val got = Relational.joinSkewAdvisor(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 2)
    got.foreach { case (_, rows, keys, mx, p50, p99, skew, salt) =>
      assert(p50 <= p99 && p99 <= mx)
      assert(skew == mx * keys * 1000000L / rows)
      assert(salt == math.max(1L, (mx * keys + rows - 1) / rows))
    }
  }

  test("deletionAudit counts exactly the md5 1% customer set's footprint") {
    import spark.implicits._
    val got = Relational.deletionAudit(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val delKeys = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey").as[Long].collect()
      .filter(k => graft.functions.Hashing.md5BucketJvm(s"del:$k", 100L) < 1L)
      .toSet
    assert(got("customer") == ((delKeys.size.toLong, delKeys.size.toLong)))
    val evUsers = graft.core.Tables.events(spark, sf)
      .select($"user_id").as[Long].collect()
    val hit = evUsers.filter(delKeys)
    assert(got("events") == ((hit.length.toLong,
      hit.toSet.size.toLong)))
    assert(got.keySet == Set("customer", "orders", "lineitem", "events"))
  }

  test("refIntegrityAudit reports zero orphans on the healthy fixture") {
    import spark.implicits._
    val got = Relational.refIntegrityAudit(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.length == 7)
    got.foreach { case (edge, total, orphans) =>
      assert(total > 0L, edge)
      assert(orphans == 0L, s"$edge has orphans")
    }
  }

  test("reach curve: exact cumulative is monotone and the sketch tracks it") {
    import spark.implicits._
    val got = Relational.hllReachCurve(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      // distinct-so-far can only grow, for both the exact and the sketch
      assert(sorted.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"$t exact monotone")
      assert(sorted.map(_._6).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"$t sketch monotone")
      // m=256 rsd ≈ 6.5%: generous 4-sigma bound like ApproxSpec's
      sorted.foreach { case (_, dy, exact, _, _, est) =>
        assert(math.abs(est - exact).toDouble / exact < 0.26, s"$t day $dy")
      }
      // the final day's sketch equals the all-time q127 sketch
      val all = Relational.hllDistinct(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._5).toMap
      assert(sorted.last._6 == all(t), s"$t final merge == all-time sketch")
    }
  }

  test("funnel latency percentiles are ordered and ride stage-3 users") {
    import spark.implicits._
    val got = Windowed.funnelLatency(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet ==
      Set("view_to_click", "click_to_purchase", "view_to_purchase"))
    val nStage3 = Windowed.funnelStages(spark, sf)
      .filter(col("stage") === 3L).count()
    got.foreach { case (m, n, mn, p50, p90, mx, mean) =>
      assert(n == nStage3, s"$m count")
      assert(mn <= p50 && p50 <= p90 && p90 <= mx, s"$m order")
      assert(mean >= mn.toDouble && mean <= mx.toDouble, s"$m mean")
    }
  }

  test("session stats aggregate the q28 sessions consistently") {
    import spark.implicits._
    val s = Windowed.sessionize(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val Array(got) = Windowed.sessionStats(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Double)].collect()
    val (nSess, nUsers, bounce, bounceQ6, p50e, p90e, p50d, meanE, meanD) =
      (got._1, got._2, got._3, got._4, got._5, got._6, got._7, got._8, got._9)
    assert(nSess == s.length.toLong)
    assert(nUsers == s.map(_._1).distinct.length.toLong)
    assert(bounce == s.count(_._3 == 1L).toLong)
    assert(bounceQ6 == bounce * 1000000L / nSess)
    val evs = s.map(_._3).sorted
    assert(p50e == evs((((50 * nSess + 99) / 100) - 1).toInt))
    assert(p90e == evs((((90 * nSess + 99) / 100) - 1).toInt))
    val durs = s.map(_._5).sorted
    assert(p50d == durs((((50 * nSess + 99) / 100) - 1).toInt))
    assert(math.abs(meanE - evs.sum.toDouble / nSess) < 1e-9)
    assert(math.abs(meanD - durs.sum.toDouble / nSess) < 1e-6)
  }

  test("dedupEval metrics satisfy the exact F1 identity") {
    import spark.implicits._
    val Array((nT, nP, nTp, prec, rec, f1)) =
      graft.operators.Dedup.dedupEval(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nTp <= nT && nTp <= nP)
    assert(prec == nTp * 1000000L / nP && rec == nTp * 1000000L / nT)
    assert(f1 == 2L * nTp * 1000000L / (nP + nT))
    assert(nT > 0L, "fixture has true near-dup pairs")
  }

  test("effectiveTokens conserves the canonical set and bounds the discount") {
    import spark.implicits._
    val got = graft.operators.Dedup.effectiveTokens(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, rd, rt, ed, et, disc) =>
      assert(ed <= rd && et <= rt, s"$src effective ≤ raw")
      assert(disc == (rt - et) * 1000000L / rt, s"$src discount")
    }
    val nClusters = graft.operators.Dedup.canonicalDocs(spark, sf).count()
    assert(got.map(_._4).sum == nClusters,
      "one effective doc per cluster, summed across sources")
    assert(got.map(_._2).sum > got.map(_._4).sum,
      "fixture has near-dups to discount")
  }

  test("watermarkAdvisor lateness matches a driver running-max replay") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
      .select($"event_type", $"event_id", unix_micros($"ts").as("tsu"))
      .as[(String, Long, Long)].collect()
    val got = Windowed.watermarkAdvisor(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n, ooo, oooQ6, p50, p99, mx) =>
      val rows = ev.filter(_._1 == t).sortBy(_._2)
      val lates = rows.scanLeft((Long.MinValue, 0L)) { case ((runMax, _), r) =>
        val late = if (runMax == Long.MinValue) 0L
          else math.max(0L, runMax - r._3)
        (math.max(runMax, r._3), late)
      }.tail.map(_._2)
      assert(n == rows.length.toLong)
      assert(ooo == lates.count(_ > 0L).toLong)
      assert(oooQ6 == ooo * 1000000L / n)
      assert(mx == lates.max)
      val sorted = lates.sorted
      assert(p50 == sorted((((50 * n + 99) / 100) - 1).toInt))
      assert(p99 == sorted((((99 * n + 99) / 100) - 1).toInt))
      assert(p50 <= p99 && p99 <= mx)
    }
  }

  test("valueDrift: PSI is zero on the baseline week and non-negative after") {
    import spark.implicits._
    val got = Windowed.valueDrift(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(got.length >= 2, "fixture spans multiple weeks")
    val w0 = got.map(_._1).min
    got.foreach { case (wk, n, psiQ, psi, flagged) =>
      assert(n > 0L)
      // every PSI term (p-q)ln(p/q) is >= 0, so the quantized sum is too
      assert(psiQ >= 0L, s"week $wk")
      assert(flagged == (psi > 0.2))
      if (wk == w0) assert(psiQ == 0L, "self-comparison is exactly zero")
    }
  }

  test("kAnonymityAudit conserves rows and its risk ratio") {
    import spark.implicits._
    val nEvents = graft.core.Tables.events(spark, sf).count()
    val Array((nRows, nGroups, minSz, nSmall, atRisk, riskQ6)) =
      Relational.kAnonymityAudit(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(nRows == nEvents, "every event lands in exactly one QI group")
    assert(minSz >= 1L && nGroups > 0L)
    assert(atRisk <= nRows && nSmall <= nGroups)
    assert(riskQ6 == atRisk * 1000000L / nRows)
  }

  test("dupTopology conserves the corpus and its share ratios") {
    import spark.implicits._
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val got = graft.operators.Dedup.dupTopology(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._3).sum == nDocs, "every doc in exactly one cluster")
    got.foreach { case (sz, nc, nd, share) =>
      assert(nd == sz * nc)
      assert(share == nd * 1000000L / nDocs)
    }
    assert(got.exists(_._1 == 1L), "singletons exist")
    assert(got.exists(_._1 > 1L), "fixture has non-trivial clusters")
  }

  test("langIdConfusion: cells conserve the corpus, shares and diagonal follow the laws") {
    import spark.implicits._
    val rows = graft.operators.Text.langIdConfusion(spark, sf)
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    val corpus = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == corpus, "every doc lands in exactly one cell")
    rows.groupBy(_._1).foreach { case (label, cells) =>
      val nLabel = cells.map(_._3).sum
      cells.foreach { case (_, pred, n, share, correct) =>
        assert(share == n * 1000000L / nLabel, s"$label->$pred share law")
        assert(correct == (label == pred), s"$label->$pred diagonal flag")
      }
    }
    // the prediction column is drawn from the marker languages + 'und'
    val langs = graft.functions.TextFunctions.LangMarkers.map(_._1).toSet + "und"
    assert(rows.map(_._2).toSet.subsetOf(langs))
  }

  test("packWaste matches a driver next-fit replay and the capacity identity") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", $"text").as[(String, Long, String)].collect()
    def bpe(text: String): Long =
      text.toLowerCase.split("\\s+").map(w => (w.length + 3) / 4).sum.toLong
    val got = graft.operators.Sampling.packWaste(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, nDocs, total, packs, waste, wasteQ6, contig) =>
      val ts = docs.filter(_._1 == src).sortBy(_._2).map(r => bpe(r._3))
      assert(nDocs == ts.length.toLong && total == ts.sum)
      var (f, p, w) = (0L, 1L, 0L)
      ts.foreach { t =>
        // f == 0: the open pack is empty — an oversized doc fills it
        // rather than closing it (no phantom pack, round-10 advice)
        if (f == 0L || f + t <= 2048L) f += t
        else { w += math.max(0L, 2048L - f); p += 1; f = t }
      }
      val fullWaste = w + math.max(0L, 2048L - f)
      assert(packs == p && waste == fullWaste, s"$src fold")
      // capacity identity: waste = p·b − total + Σ oversize overflow
      val overflow = ts.map(t => math.max(0L, t - 2048L)).sum
      assert(waste == p * 2048L - total + overflow, s"$src identity")
      assert(wasteQ6 == waste * 1000000L / (p * 2048L))
      assert(contig == (total + 2047L) / 2048L && p >= contig,
        s"$src next-fit never beats contiguous")
    }
  }

  test("writeZOrdered files bound both dims like the q164 audit promises") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Sharding.writeZOrdered(spark, sf, out)
    val back = spark.read.parquet(out)
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(back.count() == n, "rewrite conserves rows")
    // per written FILE: both-dim spans bounded (the skipping property) —
    // file z-ranges are contiguous so custkey/date min-max stats are tight
    val spans = back
      .select(input_file_name().as("f"), $"o_custkey",
        expr("unix_micros(o_orderdate) div 86400000000").as("dy"), $"zv")
      .groupBy($"f")
      .agg(min($"zv").as("zlo"), max($"zv").as("zhi"),
        (max($"o_custkey") - min($"o_custkey")).as("cspan"),
        (max($"dy") - min($"dy")).as("dspan"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(spans.length > 1, "multiple z-range files written")
    // files own disjoint z ranges
    val sorted = spans.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, "z ranges disjoint")
      case _ =>
    }
    // rows inside each file are zv-sorted (the write contract)
    val firstFile = sorted.head._1
    val zs = back.filter(input_file_name() === firstFile)
      .select($"zv").as[Long].collect()
    assert(zs.sameElements(zs.sorted), "zv-sorted within file")
  }

  test("RFM quartiles are balanced within one and segments are consistent") {
    import spark.implicits._
    val got = Windowed.rfmSegments(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    for (dim <- Seq[((Long, Long, Long, Long, Long, Long, Long, String)) => Long](
        _._5, _._6, _._7)) {
      val sizes = got.groupBy(dim).view.mapValues(_.length).values
      assert(got.map(dim).forall(q => q >= 0L && q <= 3L))
      assert(sizes.max - sizes.min <= 1,
        "((rank-1)*4) div n buckets differ by at most one")
    }
    got.foreach { case (_, _, _, _, r, f, m, seg) =>
      assert(seg == s"R${r}F${f}M${m}")
    }
  }

  test("compactionPlan: driver fold replay; capacity law; files stay time-contiguous") {
    import spark.implicits._
    // small capacity so the sf0.001 fixture forces multi-file packing
    val cap = 100L
    val parts = graft.core.Tables.events(spark, sf)
      .groupBy($"event_type",
        org.apache.spark.sql.functions.expr("unix_micros(ts) div 86400000000L").as("day"))
      .agg(count(lit(1)).as("n_rows"))
      .as[(String, Long, Long)].collect()
    val expected = parts.groupBy(_._1).toSeq.flatMap { case (tp, ps) =>
      val ordered = ps.sortBy(_._2)
      var f = 0L; var load = 0L
      val assigned = ordered.map { case (_, day, n) =>
        if (load + n > cap && load > 0) { f += 1; load = n }
        else load += n
        (day, n, f)
      }
      val files = assigned.groupBy(_._3).view
        .mapValues(rs => (rs.length.toLong, rs.map(_._2).sum)).toMap
      assigned.map { case (day, n, fi) =>
        (tp, day, n, fi, files(fi)._1, files(fi)._2) }
    }.toSet
    val got = graft.operators.Sharding.compactionPlan(spark, sf, cap)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.toSet == expected)
    got.groupBy(r => (r._1, r._4)).foreach { case ((tp, fi), rs) =>
      val fileRows = rs.head._6
      // capacity respected unless the file is one oversized partition
      assert(fileRows <= cap || rs.head._5 == 1L, s"$tp file $fi capacity")
      // time-contiguity: the file's days are an interval within the
      // type's day sequence (next-fit in day order guarantees it)
      val tpDays = got.filter(_._1 == tp).map(_._2).sorted
      val fDays = rs.map(_._2).sorted
      val lo = tpDays.indexOf(fDays.head)
      assert(tpDays.slice(lo, lo + fDays.length).toSeq == fDays.toSeq,
        s"$tp file $fi contiguity")
    }
    // the fixture actually exercises multi-file packing
    assert(got.map(r => (r._1, r._4)).distinct.length >
      got.map(_._1).distinct.length)
  }

  test("snapshotDiff matches a driver replay of both keyed snapshots") {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts"), $"value")
      .as[(Long, String, Long, Long, Double)].collect()
    val t1 = ev.map(_._4).max - 30L * 86400L * 1000000L
    def latest(rows: Array[(Long, String, Long, Long, Double)]) =
      rows.groupBy(r => (r._1, r._2)).view
        .mapValues(_.maxBy(r => (r._4, r._3))._5).toMap
    val s2 = latest(ev)
    val s1 = latest(ev.filter(_._4 <= t1))
    val expected = s2.keys.groupBy(_._2).map { case (tp, keys) =>
      val added = keys.count(k => !s1.contains(k)).toLong
      val changed = keys.count(k => s1.contains(k) && s1(k) != s2(k)).toLong
      val t1k = keys.size - added
      val cq = if (t1k == 0) 0L else changed * 1000000L / t1k
      (tp, added, changed, keys.size - added - changed, t1k,
        keys.size.toLong, 0L, cq)
    }.toSet
    val got = Relational.snapshotDiff(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got == expected)
    assert(got.exists(r => r._2 > 0 || r._3 > 0),
      "a 30-day window on this fixture adds or changes keys")
  }

  test("equiDepthHist: two-phase rank equals the window rung; depths balanced; bounds nest") {
    import spark.implicits._
    val dec = Relational.equiDepthHist(spark, sf)
    val win = Relational.equiDepthHistWindow(spark, sf)
    assert(dec.exceptAll(win).isEmpty && win.exceptAll(dec).isEmpty,
      "two-phase rank drifted from the single-window rung")
    val rows = dec.as[(String, Long, Long, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (tp, bins) =>
      assert(bins.length == 8, s"$tp bin count")
      val sizes = bins.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$tp equi-depth balance")
      val byBin = bins.sortBy(_._2)
      assert(byBin.map(_._2).toSeq == (0L until 8L), s"$tp dense bins")
      byBin.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$tp bounds nest")
        case _ =>
      }
    }
  }
}
