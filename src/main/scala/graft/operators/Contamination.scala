package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  def decontaminate(spark: SparkSession, d: String,
      n: Int = 5, evalPct: Int = 5): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, d)
      .select($"doc_id", tokens($"text").as("ws"), evalBucket($"doc_id").as("b"))
    val shingled = docs.select($"doc_id", $"b",
      explode(Hashing.shingles($"ws", n)).as("s"))
    val evalGrams = shingled.filter($"b" < evalPct).select($"s").distinct()
    val overlap = shingled.filter($"b" >= evalPct)
      .join(evalGrams, "s")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.filter($"b" >= evalPct).select($"doc_id")
      .join(overlap, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_overlap", lit(0L)).as("n_overlap"),
        (coalesce($"n_overlap", lit(0L)) > 0L).as("contaminated"))
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
