package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.apps.PageRankWithEdgeWeights.pageRankOnEdges
import graft.sources.TaxiSource

class GraphAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PageRank on a strongly-connected 5-vertex digraph (FIXTURES.md §3)") {
    import spark.implicits._
    // every vertex has >=1 in and >=1 out edge (the reference's own
    // prerequisite, gelly_java/PageRankWithEdgeWeights.java:38-41)
    val edges = Seq(
      ("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 1.0), ("d", "e", 3.0),
      ("e", "a", 1.0), ("a", "c", 1.0), ("c", "a", 2.0), ("d", "b", 1.0)
    ).toDF("src", "dst", "weight")
    val ranks = pageRankOnEdges(edges, 20)
      .as[(String, Double)].collect().toMap
    assert(ranks.size == 5)
    // seeded at 1.0 per vertex (reference semantics), total rank decays
    // geometrically toward the fixed point 1: Σ_t = 0.85^t·5 + (1−0.85^t)
    val expectedSum = math.pow(0.85, 20) * 5 + (1 - math.pow(0.85, 20))
    assert(math.abs(ranks.values.sum - expectedSum) < 1e-9, ranks)
    // vertex c receives weight from a (prob 1/2) and b (prob 1) — more
    // central than e which only receives d's 3/4 share
    assert(ranks("c") > ranks("e"), ranks)
    assert(ranks.values.forall(_ > 0))
  }

  test("triangleCounts matches a driver brute force; apex rule counts each once") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val und = graft.operators.Graph.tradeEdges(spark, sf)
      .filter($"src" =!= $"dst")
      .select(org.apache.spark.sql.functions.least($"src", $"dst").as("a"),
        org.apache.spark.sql.functions.greatest($"src", $"dst").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
    // brute-force all id-ordered vertex triples on the toy graph
    val triples = for {
      i <- verts; j <- verts if i < j; k <- verts if j < k
      if und((i, j)) && und((i, k)) && und((j, k))
    } yield (i, j, k)
    val expected = triples.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
    val got = graft.operators.Graph.triangleCounts(spark, sf)
      .select($"nationkey", $"n_triangles").as[(Long, Long)].collect().toMap
    verts.foreach { v =>
      assert(got(v) == expected.getOrElse(v, 0L), s"vertex $v")
    }
    assert(got.values.sum == 3L * triples.size, "each triangle counted thrice")
    assert(triples.nonEmpty, "trade graph should be triangle-rich")
  }

  test("pageRankConverged: tol=0 is superstep-identical to the oracle loop") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val fixed = graft.operators.Graph.pageRank(spark, sf, iterations = 10)
      .as[(Long, Double)].collect().toMap
    // tol=0 never fires the exit: 10 rounds of the same quantized-exact
    // math must be BIT-identical to the fixed-iteration form
    val conv = graft.operators.Graph
      .pageRankConverged(spark, sf, maxIterations = 10, tol = 0.0)
      .as[(Long, Double)].collect().toMap
    assert(conv == fixed, s"$conv vs $fixed")
  }

  test("pageRankConverged stops at a genuine fixed point of the PR equation") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // the reference's PR variant decays total mass from |V| toward 1, so
    // the exit fires when the chain has actually settled, ~50+ rounds on
    // this graph (NOT at iteration 10 — the early exit is a different,
    // stronger stopping contract than the q13 snapshot)
    val tol = 1e-3
    val r = graft.operators.Graph
      .pageRankConverged(spark, sf, maxIterations = 200, tol = tol)
      .as[(Long, Double)].collect().toMap
    // residual check against an independent in-JVM power step:
    // ‖F(r) − r‖₁ ≤ damping·tol when the loop exited on delta ≤ tol
    val edges = graft.operators.Graph.tradeEdges(spark, sf)
      .as[(Long, Long, Long)].collect()
    val outSum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = r.size.toDouble
    val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
      r(s) * (w.toDouble / outSum(s))
    }.sum).toMap
    val residual = r.keys.map { id =>
      val next = 0.85 * contrib.getOrElse(id, 0.0) + 0.15 / n
      math.abs(next - r(id))
    }.sum
    assert(residual <= tol, s"residual $residual > $tol")
  }

  test("connectedComponentsStar equals union-find on seeded random graphs") {
    import spark.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to the component MINIMUM (roots are minima by the
      // max-under-min union above)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- Seq(7L, 23L); nEdges <- Seq(30, 120)) {
      val rnd = new scala.util.Random(seed)
      val n = 100
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = graft.operators.Graph
        .connectedComponentsStar(edges.toDF("x", "y"))
        .as[(Long, Long)].collect().toMap
      val expect = unionFind(n, edges)
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      assert(got.keySet == touched, s"seed=$seed nEdges=$nEdges endpoints")
      touched.foreach { id =>
        assert(got(id) == expect(id),
          s"seed=$seed nEdges=$nEdges node $id: ${got(id)} vs ${expect(id)}")
      }
    }
  }

  test("connectedComponentsStar collapses a 400-deep chain (log rounds, not diameter)") {
    import spark.implicits._
    val chain = (0 until 400).map(i => (i.toLong, i + 1L)).toDF("x", "y")
    // maxRounds 20 ≪ 400: only the path-halving algorithm can finish —
    // a per-hop propagation would need 400 supersteps
    val got = graft.operators.Graph.connectedComponentsStar(chain, maxRounds = 20)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 401)
    assert(got.values.toSet == Set(0L), "single component rooted at 0")
  }

  test("tripsToEvents: one trip row becomes ordered START/END events (P12)") {
    import spark.implicits._
    val trips = Seq(
      (1L, java.sql.Timestamp.valueOf("2013-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2013-01-01 00:10:00"),
        -73.98f, 40.75f, -73.9f, 40.8f, 1.toShort),
      (2L, java.sql.Timestamp.valueOf("2013-01-01 00:05:00"),
        java.sql.Timestamp.valueOf("2013-01-01 00:07:00"),
        -73.97f, 40.76f, -73.91f, 40.81f, 2.toShort)
    ).toDF("rideId", "startTime", "endTime", "startLon", "startLat",
      "endLon", "endLat", "passengerCnt")
    val events = TaxiSource.tripsToEvents(trips).collect()
    assert(events.length == 4)
    // globally ordered by event time: start1, start2, end2, end1
    assert(events.map(r => (r.getAs[Long]("rideId"), r.getAs[Boolean]("isStart"))).toSeq ==
      Seq((1L, true), (2L, true), (2L, false), (1L, false)))
    // START rows carry the placeholder end time
    val start1 = events(0)
    assert(start1.getAs[java.sql.Timestamp]("endTime") ==
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
  }

  test("modularity: conservation laws and an exact driver replay (q204)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Graph.modularity(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val edges = graft.operators.Graph.copurchaseEdges(spark, sf)
      .select($"p1", $"p2").as[(Long, Long)].collect()
    val labels = graft.operators.Graph.labelPropagation(spark, sf)
      .as[(Long, Long)].collect().toMap
    val m = edges.length.toLong
    assert(rows.map(_._2).sum == labels.size, "every vertex in one community")
    assert(rows.map(_._3).sum == 2 * m, "degree mass = 2m")
    assert(rows.map(_._4).sum <= m, "intra edges bounded by m")
    // exact replay per community + global Q in (-0.5, 1]
    val degByC = edges.flatMap(e => Seq(labels(e._1), labels(e._2)))
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val intraByC = edges.filter(e => labels(e._1) == labels(e._2))
      .groupBy(e => labels(e._1)).map { case (c, xs) => c -> xs.length.toLong }
    var q = 0.0
    rows.foreach { case (c, _, dSum, intra, q6) =>
      assert(dSum == degByC(c) && intra == intraByC.getOrElse(c, 0L), s"community $c")
      val contrib = intra.toDouble / m.toDouble -
        (dSum.toDouble / (2 * m).toDouble) * (dSum.toDouble / (2 * m).toDouble)
      assert(q6 == BigDecimal(contrib * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"community $c contrib")
      q += contrib
    }
    assert(q > -0.5 && q <= 1.0, s"modularity Q=$q out of range")
    // a single-community partition has Q = 1 - 1 = 0 exactly; with more
    // than one community, label-prop-found structure must beat random
    if (rows.length > 1) assert(q > 0.0, s"modularity Q=$q should be positive")
  }

  test("labelPropChurn: monotone-ish decay to the pinned cutoff; exact replay (q220)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Graph.labelPropChurn(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val nV = rows.head._3
    rows.foreach { case (t, ch, nv, q6) =>
      assert(nv == nV && ch <= nV, s"round $t bounds")
      assert(q6 == BigDecimal(ch.toDouble / nV.toDouble * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"round $t q6")
    }
    // driver replay of the sweep trajectory's churn counts
    val edges = graft.operators.Graph.copurchaseEdges(spark, sf)
      .select($"p1", $"p2").as[(Long, Long)].collect()
    val nb = (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    var lbl = nb.keys.map(v => v -> v).toMap
    val want = (1 to 4).map { _ =>
      val next = nb.map { case (v, us) =>
        val freq = us.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        v -> freq.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
      val changed = next.count { case (v, l) => lbl(v) != l }.toLong
      lbl = next
      changed
    }
    assert(rows.map(_._2).toSeq == want, "churn trajectory replay")
    // the pinned 4 sweeps must have largely settled on this fixture
    assert(rows.last._2 * 10 <= nV, "last-sweep churn under 10%")
  }

  test("degreeAssortativity: stub-level Pearson replay on the fixture") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val edges = graft.operators.Graph.copurchasePairs(spark, sf)
      .select($"p1", $"p2").as[(Long, Long)].collect()
    val deg = scala.collection.mutable.HashMap.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val stubs = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val n = stubs.length.toLong
    val sx = stubs.map(_._1).sum
    val sxy = stubs.map { case (x, y) => x * y }.sum
    val sxx = stubs.map { case (x, _) => x * x }.sum
    val expect =
      if (n * sxx - sx * sx > 0)
        (n * sxy - sx * sx).toDouble / (n * sxx - sx * sx).toDouble
      else 0.0
    val Array((m, meanQ6, r)) =
      graft.operators.Graph.degreeAssortativity(spark, sf)
        .as[(Long, Long, Double)].collect()
    assert(m == edges.length.toLong)
    assert(meanQ6 == math.round(sx.toDouble / n * 1e6))
    assert(r == expect, s"got $r want $expect")
    assert(math.abs(r) <= 1.0 + 1e-12, "Pearson bound")
  }
}
