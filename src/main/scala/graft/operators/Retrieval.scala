package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.functions.{Hashing, TextFunctions}

/** Lexical retrieval over the document corpus — the inverted-index
  * ranking family (BM25) a contamination audit, RAG-index eval, or
  * query-driven corpus probe runs against a 100 TB training set.
  *
  * Extends the reference's TF-IDF batch family (`MailTFIDF.java` — see
  * Text.scala:39) from per-document term scoring to full query→document
  * ranked retrieval.
  */
object Retrieval {

  /** q116: BM25 top-k retrieval. The q59 "eval:" hash split (5 % of
    * docs) stands in for the query workload; each eval document's
    * distinct clean-token set is a query against the remaining train
    * corpus. Okapi BM25 with k1 = 1.2, b = 0.75:
    *
    *   idf(t)   = log2((N − df + 0.5)/(df + 0.5) + 1)
    *   w(t, d)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Cross-engine determinism: every input to the per-posting weight is
    * an exact integer (tf, df, dl, N, Σdl — avgdl enters as dl·N/Σdl);
    * the weight is ONE double expression of identical shape in both
    * engines, quantized to a 1e6 integer per (query, term, doc), and
    * document scores are exact integer sums of those (the q77/q107
    * surprisal discipline). Ties rank by doc_id.
    *
    * Scale: the classic inverted-index plan — postings (term → doc, tf)
    * shuffle once on the term key to meet the bounded query-term
    * dictionary (eval sets are MBs; AQE broadcasts it, un-hinted per the
    * round-5 tripScores lesson); candidate volume is Σ_t df(t) over
    * query terms, never |queries|×|corpus|; the per-query top-k window
    * partitions by query_id so the sort is per-group, not global.
    */
  def bm25TopK(spark: SparkSession, d: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val win = Window.partitionBy($"query_id")
      .orderBy($"score_q".desc, $"doc_id")
    bm25Scored(spark, d).withColumn("rank", row_number().over(win).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"doc_id", $"rank", $"score_q")
  }

  /** The full (query, doc) BM25 score table — memo-cached because both
    * retrieval queries (q116's top-10 cut, q125's top-20 fusion input)
    * consume it; only the final per-query window differs.
    *
    * The per-posting weight w(t, d) is QUERY-INDEPENDENT, so it is
    * computed once per (t, doc) posting — the double math and the 1e6
    * quantization run on |postings| rows — and the (query-term ⋈
    * posting) join then carries just the precomputed long. On the
    * synthetic small-vocabulary corpus the candidate set degenerates
    * toward |queries|×|corpus| (every doc shares terms with every
    * query), which is exactly when keeping the per-candidate work to an
    * integer sum matters.
    */
  private def bm25Scored(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val isEval =
      pmod(Hashing.md5Bits32(concat(lit("eval:"), $"doc_id".cast("string")), 1),
        lit(100L)) < 5
    val toks = documents(spark, d)
      .select($"doc_id", isEval.as("ev"),
        explode(TextFunctions.cleanTokens($"text")).as("t"))
    // the postings table feeds FOUR consumers (dl, df, the N/Σdl stats
    // action, the score join) — memo-cached so the tokenize+count pass
    // runs once per session, not once per consumer
    val tf = graft.core.Memo(spark, cache = true, "bm25tf", d) {
      toks.filter(!$"ev")
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
    }
    graft.core.Memo(spark, cache = true, "bm25scored", d) {
      val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val dfT = tf.groupBy($"t").agg(count(lit(1)).as("df"))
      // corpus constants, driver-collected once (the q07 eager-scalar shape)
      val statsRow = dl.agg(count(lit(1)), sum($"dl")).head()
      val n = statsRow.getLong(0)
      val sumdl = statsRow.getLong(1)
      val wtd = tf.join(dfT, "t").join(dl, "doc_id")
        .select($"t", $"doc_id",
          round(
            log2(((lit(n) - $"df" + lit(0.5)) / ($"df" + lit(0.5))) + lit(1.0))
              * ($"tf" * lit(2.2))
              / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75)
                  * (($"dl" * lit(n)).cast("double") / lit(sumdl).cast("double"))))
              * lit(1000000.0)).cast("long").as("sq"))
      val qterms = toks.filter($"ev")
        .select($"doc_id".as("query_id"), $"t").distinct()
      qterms.join(wtd, "t")
        .groupBy($"query_id", $"doc_id")
        .agg(sum($"sq").as("score_q"))
    }
  }

  /** q125: reciprocal-rank fusion (Cormack et al., SIGIR 2009) of the
    * two retrieval systems this engine exposes — q116's lexical BM25 and
    * a dense embedding-cosine ranking — over the SAME eval-split query
    * workload (vec_id ≡ doc_id across `documents`/`embeddings`). Each
    * system contributes its top-`kSys` list; a hit at rank r is worth
    * ⌊10¹²/(c + r)⌋ — the classic 1/(60+r) fused INTEGER-EXACTLY via
    * integer division, so fused scores are exact integer sums in both
    * engines (no FP summation order to pin). Final ranking: top-`k` per
    * query by (rrf DESC, doc_id ASC).
    *
    * Scale: the BM25 side is q116's inverted-index plan (memo-shared tf
    * table); the dense side broadcasts the bounded eval query set
    * against one corpus scan (the q14 BroadcastNestedLoop shape — an IVF
    * probe drops in when the corpus outgrows it); fusion itself is one
    * hash aggregate on (query, doc) and a per-query top-k window — both
    * keyed on the query id, no global sort.
    */
  def rrfFusion(spark: SparkSession, d: String, k: Int = 10,
      kSys: Int = 20, c: Int = 60): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val bm = bm25TopK(spark, d, kSys).select($"query_id", $"doc_id", $"rank")
    val emb = embeddings(spark, d)
      .select($"vec_id", quantize($"embedding").as("qemb"))
      .withColumn("n2", dotPreQ($"qemb", $"qemb"))
      .withColumn("ev",
        pmod(Hashing.md5Bits32(concat(lit("eval:"), $"vec_id".cast("string")), 1),
          lit(100L)) < 5)
    val queries = emb.filter($"ev")
      .select($"vec_id".as("query_id"), $"qemb".as("qq"), $"n2".as("qn2"))
    val dense = emb.filter(!$"ev")
      .crossJoin(broadcast(queries))
      .select($"query_id", $"vec_id".as("doc_id"),
        cosineFromParts(dotPreQ($"qq", $"qemb"), $"qn2", $"n2").as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos".desc, $"doc_id".asc))
        .cast("long"))
      .filter($"rank" <= kSys)
      .select($"query_id", $"doc_id", $"rank")
    val fused = bm.unionByName(dense)
      .select($"query_id", $"doc_id",
        expr(s"1000000000000 div ($c + rank)").as("rc"))
      .groupBy($"query_id", $"doc_id").agg(sum($"rc").as("rrf"))
    fused.withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"rrf".desc, $"doc_id".asc))
        .cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"doc_id", $"rrf", $"rank")
  }
}
