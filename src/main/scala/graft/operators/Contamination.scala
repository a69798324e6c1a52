package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.Hashing
import graft.functions.TextFunctions._

/** Contamination controls for a training corpus: benchmark-overlap
  * decontamination (drop training documents that share long n-grams with
  * a held-out evaluation set) and cross-document boilerplate measurement
  * (the fraction of a document made of corpus-frequent n-grams). Both are
  * standard large-corpus hygiene passes (the n-gram-overlap decontam rule
  * popularized by the GPT-3 appendix; boilerplate fractions per C4/CCNet —
  * see PAPERS.md) re-expressed as declarative Spark plans.
  */
object Contamination {

  private def evalBucket(idCol: org.apache.spark.sql.Column) =
    pmod(Hashing.md5Bits32(concat(lit("eval:"), idCol.cast("string")), 1), lit(100L))

  /** Benchmark decontamination: a deterministic 5 % of documents stands
    * in for the eval/benchmark set (md5 bucket of the doc id — the same
    * partition-independent membership primitive as Sampling.hashSplit);
    * every remaining document reports how many of its distinct 5-gram
    * shingles appear anywhere in the eval set, and a contaminated flag.
    *
    * Scale: the eval n-gram dictionary is ∝ eval-set size (bounded —
    * benchmarks are MBs, corpora are TBs), so the membership join is a
    * broadcast in practice; here it is left to AQE rather than hinted,
    * because "eval set" is 5 % of the corpus in this harness. One
    * (doc_id) count aggregation after the semi-ish join; docs with no
    * hit re-enter via the left join with n_overlap = 0.
    */
  /** The distinct eval-bucket n-gram dictionary — memo-cached per
    * (dir, n, evalPct): q59's membership join, q105's Bloom build AND
    * q105's exact re-check all read this one materialization instead of
    * re-deriving the eval-side shingle pass per use.
    */
  private[graft] def evalGramSet(spark: SparkSession, d: String,
      n: Int, evalPct: Int): DataFrame =
    graft.core.Memo(spark, cache = true, "evalGrams", d, s"$n:$evalPct") {
      import spark.implicits._
      documents(spark, d)
        .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
        .filter($"b" < evalPct)
        .select(explode(Hashing.shingles($"ws", n)).as("s"))
        .distinct()
    }

  def decontaminate(spark: SparkSession, d: String,
      n: Int = 5, evalPct: Int = 5): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, d)
      .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
    val shingled = docs.select($"doc_id", $"b",
      explode(Hashing.shingles($"ws", n)).as("s"))
    val evalGrams = evalGramSet(spark, d, n, evalPct)
    val overlap = shingled.filter($"b" >= evalPct)
      .join(evalGrams, "s")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.filter($"b" >= evalPct).select($"doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        (coalesce($"n_overlap", lit(0L)) > 0L).as("contaminated"))
  }

  /** EXACT-SUBSTRING decontamination — the stronger form of
    * `decontaminate` (distinct-shingle overlap counting): per training
    * document, the length of the longest token run shared VERBATIM with
    * any eval-set document, plus how many of its tokens sit inside such
    * runs. This is the overlap the Lee et al. suffix-array method reads
    * off and what large-model decontamination actually gates on (a long
    * contiguous copy of a benchmark item is disqualifying even when the
    * distinct-n-gram overlap count looks mild).
    *
    * Same diagonal-run construction as Dedup.maxDupRuns, made ASYMMETRIC:
    * only grams that occur in the eval set seed the position join
    * (dictionary semi-join first — eval is benchmark-sized, so the seed
    * filter kills almost the whole corpus before any pairing), and runs
    * pair train positions against eval positions only — never
    * train×train. Cost ∝ train occurrences of eval grams, not corpus².
    */
  /** `decontaminate` with a broadcast BLOOM pre-filter in place of the
    * full eval-dictionary join on every training shingle: the eval
    * 5-gram set is folded into an m = 2^`logM`-bit Bloom filter (three
    * md5-derived probes — disjoint 32-bit windows of the hash the
    * engine already computes elsewhere), the filter words ship to every
    * task as a plan literal (16 KiB at the default — the whole point:
    * a Bloom of a GB-scale eval dictionary still fits in a broadcast),
    * and only shingles the filter admits reach the exact membership
    * join. False positives are killed by that exact re-check, so the
    * output is row-identical to `decontaminate` (the oracle is shared);
    * false negatives are impossible (Bloom guarantee) — candidates are
    * a strict superset of true hits (asserted in CurationOpsSpec).
    *
    * Scale: the training-side shingle stream is pre-filtered in the
    * scan stage at Bloom FP rate (~(1−e^(−3n/m))³), so the shuffle into
    * the membership join carries hits + ε instead of the whole corpus —
    * the standard runtime-filter/semi-join-pushdown shape, built from
    * plain column expressions (array literal + bit tests, codegen'd).
    */
  def bloomDecontaminate(spark: SparkSession, d: String,
      n: Int = 5, evalPct: Int = 5, logM: Int = 17): DataFrame = {
    import spark.implicits._
    val m = 1L << logM
    val words = (m / 64).toInt
    val docs = documents(spark, d)
      .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
    val shingled = docs.select($"doc_id", $"b",
      explode(Hashing.shingles($"ws", n)).as("s"))
    val evalGrams = evalGramSet(spark, d, n, evalPct)
    // three probe positions per gram: disjoint 32-bit md5 windows mod m
    def probes(s: Column): Seq[Column] =
      (0 until 3).map(i => pmod(Hashing.md5Bits32(s, 1 + 8 * i), lit(m)))
    val pow2 = typedlit((0 until 64).map(1L << _))
    val bitRows = graft.core.Bounded.collect(
      evalGrams
        .select(explode(array(probes($"s"): _*)).as("p"))
        .select(($"p" / 64).cast("int").as("wi"),
          element_at(pow2, ($"p" % 64).cast("int") + 1).as("mk"))
        .groupBy($"wi").agg(bit_or($"mk").as("word")),
      words.toLong, "bloomDecontaminate filter words (m/64 rows)")
    val filterWords = new Array[Long](words)
    bitRows.foreach(r => filterWords(r.getInt(0)) = r.getLong(1))
    val wlit = typedlit(filterWords.toSeq)
    def bloomHas(s: Column): Column =
      probes(s).map { p =>
        (element_at(wlit, (p / 64).cast("int") + 1)
          .bitwiseAND(element_at(pow2, (p % 64).cast("int") + 1))) =!= 0L
      }.reduce(_ && _)
    val candidates = shingled.filter($"b" >= evalPct).filter(bloomHas($"s"))
    val overlap = candidates.join(evalGrams, "s")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.filter($"b" >= evalPct).select($"doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        (coalesce($"n_overlap", lit(0L)) > 0L).as("contaminated"))
  }

  /** q231: Bloom false-positive-rate audit of the q105 pre-filter — the
    * operational calibration read a pipeline takes before TRUSTING a
    * deployed sketch tier: per distinct training 5-gram, whether the
    * broadcast Bloom admits it and whether it truly belongs to the eval
    * dictionary, aggregated to the empirical FPR next to the
    * occupancy-PREDICTED FPR (realized-bits form: p̂ = bits_set/m per
    * probe, FPR ≈ p̂³ — sharper than the Poisson (1−e^{−kn/m})^k
    * formula because it uses the filter's actual fill, and, unlike it,
    * integer-exact: bits_set³ < 2^53 and m³ = 2^51 are both exact
    * doubles, so no libm transcendental enters the contract). A
    * divergence between the two columns means the probe hashes are
    * correlated for this key distribution — the filter needs wider
    * windows, not more bits. `n_fn` is emitted as the Bloom guarantee
    * audit: anything nonzero is a build bug, not noise.
    *
    * Shape: the filter build and the eval dictionary are the SAME
    * memo-shared lineages as q59/q105 (driver-bounded m/64-word
    * collect); the probe stream is one distinct-shingle scan against
    * plan-literal bit tests (codegen'd, no join for the Bloom side) +
    * the exact membership left-join, then ONE 1-row aggregate.
    */
  def bloomFprAudit(spark: SparkSession, d: String,
      n: Int = 5, evalPct: Int = 5, logM: Int = 17): DataFrame = {
    import spark.implicits._
    val m = 1L << logM
    val words = (m / 64).toInt
    val evalGrams = evalGramSet(spark, d, n, evalPct)
    def probes(s: Column): Seq[Column] =
      (0 until 3).map(i => pmod(Hashing.md5Bits32(s, 1 + 8 * i), lit(m)))
    val pow2 = typedlit((0 until 64).map(1L << _))
    val bitRows = graft.core.Bounded.collect(
      evalGrams
        .select(explode(array(probes($"s"): _*)).as("p"))
        .select(($"p" / 64).cast("int").as("wi"),
          element_at(pow2, ($"p" % 64).cast("int") + 1).as("mk"))
        .groupBy($"wi").agg(bit_or($"mk").as("word")),
      words.toLong, "bloomFprAudit filter words (m/64 rows)")
    val filterWords = new Array[Long](words)
    bitRows.foreach(r => filterWords(r.getInt(0)) = r.getLong(1))
    val bitsSet = filterWords.map(java.lang.Long.bitCount(_).toLong).sum
    val wlit = typedlit(filterWords.toSeq)
    def bloomHas(s: Column): Column =
      probes(s).map { p =>
        (element_at(wlit, (p / 64).cast("int") + 1)
          .bitwiseAND(element_at(pow2, (p % 64).cast("int") + 1))) =!= 0L
      }.reduce(_ && _)
    val trainGrams = documents(spark, d)
      .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
      .filter($"b" >= evalPct)
      .select(explode(Hashing.shingles($"ws", n)).as("s"))
      .distinct()
    val probed = trainGrams
      .join(evalGrams.select($"s", lit(1L).as("in_eval")), Seq("s"), "left")
      .select(bloomHas($"s").as("pos"), $"in_eval".isNotNull.as("member"))
    val fprPredQ9 = math.round(
      bitsSet.toDouble * bitsSet * bitsSet / (m.toDouble * m * m)
        * 1000000000.0)
    probed.agg(
        count(lit(1)).as("n_probes"),
        sum(when($"member", 1L).otherwise(0L)).as("n_members"),
        sum(when($"pos" && !$"member", 1L).otherwise(0L)).as("n_fp"),
        sum(when($"member" && !$"pos", 1L).otherwise(0L)).as("n_fn"))
      .select(lit(m).as("m_bits"), lit(3L).as("k_probes"),
        lit(bitsSet).as("n_bits_set"),
        $"n_probes", $"n_members", $"n_fp", $"n_fn",
        when($"n_probes" > $"n_members",
          round($"n_fp".cast("double")
            / ($"n_probes" - $"n_members").cast("double")
            * lit(1000000000.0)).cast("long"))
          .otherwise(lit(0L)).as("fpr_emp_q9"),
        lit(fprPredQ9).as("fpr_pred_q9"))
  }

  def substringDecontaminate(spark: SparkSession, d: String,
      n: Int = 8, evalPct: Int = 5): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val docs = documents(spark, d)
      .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
    val pg = docs.select($"doc_id", $"b",
        posexplode(Hashing.shinglesAll($"ws", n)).as(Seq("p0", "s")))
      .select($"doc_id", $"b", ($"p0" + 1).as("p"), $"s")
    val evalOcc = pg.filter($"b" < evalPct).select($"doc_id".as("ed"), $"p".as("ep"), $"s")
    val trainOcc = pg.filter($"b" >= evalPct).select($"doc_id", $"p", $"s")
    val pairs = trainOcc.join(evalOcc, "s")
      .select($"doc_id", $"p", $"ed", ($"p" - $"ep").as("diag"))
    val runs = pairs
      .withColumn("grp", $"p" - row_number().over(
        w.partitionBy($"doc_id", $"ed", $"diag").orderBy($"p")))
      .groupBy($"doc_id", $"ed", $"diag", $"grp")
      .agg(min($"p").as("start"), (count(lit(1)) + (n - 1)).as("len"))
    val sweep = w.partitionBy($"doc_id")
      .orderBy($"start", ($"start" + $"len").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val perDoc = runs
      .withColumn("prev_end", max($"start" + $"len" - 1).over(sweep))
      .groupBy($"doc_id")
      .agg(max($"len").as("max_eval_run"),
        sum(greatest(lit(0), ($"start" + $"len" - 1) -
          greatest(coalesce($"prev_end", lit(0)), $"start" - 1))).as("covered"))
    docs.filter($"b" >= evalPct)
      .select($"doc_id", size($"ws").cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"max_eval_run", lit(0L)).cast("long").as("max_eval_run"),
        coalesce($"covered", lit(0L)).cast("long").as("covered_tokens"),
        (coalesce($"max_eval_run", lit(0L)) >= n).as("contaminated"))
  }

  /** Cross-document boilerplate fraction: a 3-gram shingle is boilerplate
    * when it occurs in ≥ `minFrac` of all documents (headers, footers,
    * navigation chrome in a crawl); each document reports its distinct
    * shingle count and the fraction of them that are boilerplate.
    *
    * Scale: document frequency per shingle is one map-side-combined
    * aggregation (shingles are distinct per doc, so count(*) IS the DF);
    * the boilerplate dictionary — shingles above a corpus-relative
    * threshold — is tiny by Zipf and broadcast back. The doc-count
    * scalar is an eager count() (the reference's A3 closed-over-scalar
    * shape, MailTFIDF.java:74).
    */
  def boilerplate(spark: SparkSession, d: String,
      minFrac: Double = 0.01): DataFrame = {
    import spark.implicits._
    val sh = documents(spark, d)
      .select($"doc_id", explode(Hashing.shingles(tokens($"text"), 3)).as("s"))
    val nDocs = documents(spark, d).count()
    val minDf = math.ceil(minFrac * nDocs).toLong
    val boiler = sh.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" >= minDf)
      .select($"s")
    val perDoc = sh
      .join(broadcast(boiler.withColumn("hit", lit(1L))), Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum(coalesce($"hit", lit(0L))).as("n_boiler"))
    perDoc.select($"doc_id", $"n_shingles", $"n_boiler",
      ($"n_boiler".cast("double") / $"n_shingles").as("boiler_frac"))
  }
}
