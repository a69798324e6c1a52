package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Retrieval

/** q116 BM25 against an independent driver-side reimplementation —
  * tokenization, split, tf/df/dl statistics and the Okapi weight are all
  * recomputed from the raw text in plain Scala, so an engine-side error
  * in any piece (eval split, posting join, quantization, ranking)
  * surfaces as a mismatch the DuckDB oracle alone could miss (oracle and
  * engine could share a wrong constant; this replay shares nothing).
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("bm25TopK matches a driver-side BM25 replay") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", lower($"text"))
      .as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def evalDoc(id: Long): Boolean = {
      val hex = md.digest(s"eval:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100 < 5
    }
    val stop = TextFunctions.StopWords.toSet
    def toks(t: String): Seq[String] = t.split("\\s+").toSeq
      .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z') && !stop(w))
    val train = docs.filterNot(d => evalDoc(d._1))
    val tf = train.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    }.toMap
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val n = dl.size.toLong
    val sumdl = dl.values.sum
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val expected = docs.filter(d => evalDoc(d._1)).flatMap { case (qid, t) =>
      val scores = tf.toSeq.flatMap { case (did, m) =>
        val s = toks(t).distinct.flatMap { w =>
          m.get(w).map { tfv =>
            val idf = math.log((((n - df(w)) + 0.5) / (df(w) + 0.5)) + 1.0) /
              math.log(2.0)
            val w0 = idf * (tfv * 2.2) /
              (tfv + 1.2 * (0.25 + 0.75 * ((dl(did) * n).toDouble / sumdl.toDouble)))
            math.round(w0 * 1000000.0)
          }
        }.sum
        if (s != 0L || toks(t).distinct.exists(m.contains)) Some(did -> s) else None
      }
      scores.sortBy { case (did, s) => (-s, did) }.take(10).zipWithIndex.map {
        case ((did, s), r) => (qid, did, (r + 1).toLong, s)
      }
    }.toSet
    val got = Retrieval.bm25TopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "eval split should produce queries with hits")
  }

  test("rrfFusion fuses a driver-recomputed dense ranking with engine BM25") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def evalDoc(id: Long): Boolean = {
      val hex = md.digest(s"eval:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100 < 5
    }
    // dense side recomputed from raw embeddings with the same 1e7
    // quantization + exact-integer dot the engine uses
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.round(x.toDouble * 1e7)).toArray
      }
    val n2 = embs.map { case (id, q) => id -> q.map(v => v * v).sum }.toMap
    val (qs, cands) = embs.partition { case (id, _) => evalDoc(id) }
    val denseRanks = qs.flatMap { case (qid, qv) =>
      cands.map { case (did, dv) =>
        val dot = qv.zip(dv).map { case (a, b) => a * b }.sum
        val cos = dot.toDouble /
          (math.sqrt(n2(qid).toDouble) * math.sqrt(n2(did).toDouble))
        (did, cos)
      }.sortBy { case (did, cos) => (-cos, did) }.take(20).zipWithIndex.map {
        case ((did, _), r) => (qid, did) -> (r + 1).toLong
      }
    }.toMap
    // BM25 side from the engine (itself pinned by the replay test above)
    val bmRanks = Retrieval.bm25TopK(spark, sf, k = 20)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Long)].collect()
      .map { case (q, dcd, r) => (q, dcd) -> r }.toMap
    def rc(rank: Long): Long = 1000000000000L / (60L + rank)
    val fusedExpected = (denseRanks.keySet ++ bmRanks.keySet)
      .groupBy(_._1).flatMap { case (qid, pairs) =>
        pairs.toSeq.map { p =>
          (p._1, p._2,
            denseRanks.get(p).map(rc).getOrElse(0L) +
              bmRanks.get(p).map(rc).getOrElse(0L))
        }.sortBy { case (_, did, s) => (-s, did) }.take(10).zipWithIndex.map {
          case ((q, did, s), r) => (q, did, s, (r + 1).toLong)
        }
      }.toSet
    val got = Retrieval.rrfFusion(spark, sf, denseGen = Retrieval.DenseBruteGen)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == fusedExpected)
    assert(got.nonEmpty)
    // both systems must actually contribute somewhere: some fused score
    // exceeds any single-system maximum contribution ⌊1e12/61⌋
    assert(got.exists(_._3 > 1000000000000L / 61L), "no doc fused from both systems")
  }

  test("default (IVF-dense) fusion holds recall against the brute fusion") {
    import spark.implicits._
    val brute = Retrieval.rrfFusion(spark, sf, denseGen = Retrieval.DenseBruteGen)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    val ivf = Retrieval.rrfFusion(spark, sf)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty && ivf.nonEmpty)
    // fused-top-10 recall: the IVF dense rung may rank differently below
    // the fold, but the fused lists must substantially agree — the
    // contract that makes the sub-quadratic rung a safe default
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"fused-list recall $recall below 0.8")
  }

  test("default fusion plan has no BroadcastNestedLoopJoin") {
    val plan = Retrieval.rrfFusion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "default dense rung must candidate-join on the IVF list id, not cross-join")
  }

  test("maxDf ceiling: no-op ceiling is bit-identical, real ceiling shrinks candidates") {
    import spark.implicits._
    val base = Retrieval.bm25TopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val noop = Retrieval.bm25TopK(spark, sf, maxDf = Some(Long.MaxValue))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(noop == base, "a ceiling above every df must not change results")
    val candAll = Retrieval.bm25Candidates(spark, sf, None).count()
    // ceiling at half the max observed query-term df must prune something
    // on this small-vocabulary corpus (every doc shares common terms)
    val maxDf = Retrieval.bm25Candidates(spark, sf, None)
      .groupBy($"t").agg(org.apache.spark.sql.functions.count_distinct($"doc_id"))
      .as[(String, Long)].collect().map(_._2).max
    val candCeil = Retrieval.bm25Candidates(spark, sf, Some(maxDf / 2)).count()
    assert(candCeil < candAll,
      s"ceiling ${maxDf / 2} should shrink candidates ($candCeil vs $candAll)")
  }

  /** The round-9 verdict's skew rehearsal: a synthetic heavy-tail
    * vocabulary — one term in half the corpus — proving (a) the BM25
    * candidate volume IS Σ_t df(t) over query terms (computed here from
    * first principles), and (b) the df ceiling bounds it by exactly the
    * saturated term's contribution.
    */
  test("skew rehearsal: candidate volume tracks sum of df(t); ceiling bounds it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25skew").toString
    val docs = (0L until 400L).map { id =>
      val rare = s"term${id % 97}"  // rare-ish terms, df ~4
      val common = if (id % 2 == 0) " common" else ""
      (id, s"$rare alpha$common")
    }
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // replay the split + tokenization from first principles
    val md = java.security.MessageDigest.getInstance("MD5")
    def evalDoc(id: Long): Boolean = {
      val hex = md.digest(s"eval:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100 < 5
    }
    val stop = TextFunctions.StopWords.toSet
    def toks(t: String): Seq[String] = t.split("\\s+").toSeq.distinct
      .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z') && !stop(w))
    val (ev, train) = docs.partition { case (id, _) => evalDoc(id) }
    assert(ev.nonEmpty, "fixture must produce eval queries")
    val dfMap = train.flatMap { case (_, t) => toks(t) }
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val expectedAll = ev.map { case (_, t) =>
      toks(t).map(w => dfMap.getOrElse(w, 0L)).sum }.sum
    val gotAll = Retrieval.bm25Candidates(spark, dir, None).count()
    assert(gotAll == expectedAll,
      s"candidate volume $gotAll != sum-of-df $expectedAll")
    // the saturated term ('common', df = half the train corpus) dominates;
    // a ceiling below its df removes exactly its contribution
    val dfCommon = dfMap("common")
    assert(dfCommon * 2 >= train.size, "fixture: 'common' must be in half the docs")
    val ceiling = dfCommon - 1
    val expectedCeil = ev.map { case (_, t) =>
      toks(t).map(w => dfMap.getOrElse(w, 0L)).filter(_ <= ceiling).sum }.sum
    val gotCeil = Retrieval.bm25Candidates(spark, dir, Some(ceiling)).count()
    assert(gotCeil == expectedCeil,
      s"ceilinged candidate volume $gotCeil != $expectedCeil")
    assert(gotCeil < gotAll, "the ceiling must bound the saturated term's fan-out")
  }

  test("retrievalAgreement: overlap fold replay off both rank tables") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val lex = Retrieval.bm25TopK(spark, sf, 20)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Long)].collect()
    val dense = Retrieval.DenseBruteGen(spark, sf, 20)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Long)].collect()
    val queries = lex.map(_._1).distinct
    val got = Retrieval.retrievalAgreement(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(5L, 10L, 20L))
    got.foreach { case (k, (_, nq, nd, so, mo)) =>
      val ovs = queries.map { q =>
        val l = lex.filter(r => r._1 == q && r._3 <= k).map(_._2).toSet
        val d0 = dense.filter(r => r._1 == q && r._3 <= k).map(_._2).toSet
        (l & d0).size.toLong
      }
      assert(nq == queries.length.toLong, s"k=$k queries")
      assert(so == ovs.sum && nd == ovs.count(_ == 0).toLong, s"k=$k overlap")
      assert(mo == math.round(so.toDouble / (nq * k) * 1e6), s"k=$k mean")
    }
    // intersections grow with k; full disjointness can only shrink
    val Seq(a, b, c) = Seq(5L, 10L, 20L).map(got)
    assert(a._4 <= b._4 && b._4 <= c._4, "sum overlap monotone")
    assert(a._3 >= b._3 && b._3 >= c._3, "disjoint count nonincreasing")
  }

  test("retrievalEval: metric fold replay from truth x rankings; k-monotonicity") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val got = Retrieval.retrievalEval(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 5L, 10L, 20L))
    // independent metric fold off the two source frames
    val truth = graft.operators.Dedup.jaccardPairs(spark, sf)
      .select($"x", $"y").as[(Long, Long)].collect()
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"eval:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100 < 5
    }
    val pairs = truth.collect {
      case (x, y) if isEval(x) != isEval(y) =>
        if (isEval(x)) (x, y) else (y, x)
    }
    assert(pairs.nonEmpty, "fixture must have cross-bucket near-dups")
    val ranked = Retrieval.bm25TopK(spark, sf, 20)
      .select($"query_id", $"doc_id", $"rank")
      .as[(Long, Long, Long)].collect()
      .map { case (q, d0, r) => (q, d0) -> r }.toMap
    val firstRel = pairs.groupBy(_._1).map { case (q, ps) =>
      q -> ps.flatMap(p => ranked.get((p._1, p._2))).sorted.headOption
    }
    got.foreach { case (k, nq, nh, rec, mrr) =>
      assert(nq == firstRel.size.toLong, s"k=$k query count")
      val hits = firstRel.values.count(r => r.exists(_ <= k)).toLong
      val rrSum = firstRel.values.collect {
        case Some(r) if r <= k => 1000000L / r
      }.sum
      assert(nh == hits, s"k=$k hits")
      assert(rec == math.round(hits.toDouble / nq * 1e6), s"k=$k recall")
      assert(mrr == math.round(rrSum.toDouble / nq), s"k=$k MRR")
      assert(mrr <= rec, s"k=$k MRR bounded by recall")
    }
    // both metrics are monotone nondecreasing in k
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 && a._5 <= b._5, "k-monotonicity")
    }
  }

  test("DenseIvfScaledGen: identical to DenseIvfGen below the dial knee") {
    import spark.implicits._
    val base = Retrieval.DenseIvfGen(spark, sf, 20)
      .as[(Long, Long, Long)].collect().toSet
    val scaled = Retrieval.DenseIvfScaledGen(spark, sf, 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(base.nonEmpty && scaled == base,
      "below the knee the dense-ranking dial must be a no-op")
  }
}
