package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/tokenization column library.
  *
  * Mirrors the reference's tokenizer semantics
  * (dataset_java/tf_idf/MailTFIDF.java:50-54, 126, 134-147): lowercase,
  * whitespace split, keep purely-alphabetic tokens, drop the 29-word stop
  * list. Everything here is built from `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs — so the expressions stay inside
  * WholeStageCodegen and Catalyst can prune/push around them; at 100 TB
  * the tokenizer runs in the scan stage with zero extra exchanges.
  */
object TextFunctions {

  /** Stop-word list of the reference (MailTFIDF.java:50-54; 29 distinct,
    * "to" appears twice there).
    */
  val StopWords: Seq[String] = Seq(
    "the", "i", "a", "an", "at", "are", "am", "for", "and", "or", "is",
    "there", "it", "this", "that", "on", "was", "by", "of", "to", "in",
    "message", "not", "be", "with", "you", "have", "as", "can")

  /** Whitespace tokenization after lowercasing. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Reference token filter: alphabetic-only and not a stop word.
    * Native single-pass expression (plans.CleanTokensExpr) — the HOF
    * chain below is kept as the equality reference; every consumer of
    * this column (TF-IDF, BM25 postings, quality gates, language-ID)
    * shares the speedup.
    */
  def cleanTokens(text: Column): Column =
    graft.plans.CleanTokensOps.cleanTokens(text)

  /** The composed-builtin form of `cleanTokens` — the directly-
    * oracle-shaped rung and CleanTokensExprSpec's equality reference.
    */
  def cleanTokensHof(text: Column): Column =
    filter(tokens(text), t =>
      t.rlike("\\A[a-z]+\\z") && !array_contains(typedLit(StopWords), t))

  /** Language-marker word lists for the n-gram/stopword language-ID
    * heuristic (public high-frequency function words per language).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "que", "por", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "vous", "ce", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Sum over tokens of f(token) as a long — stays codegen'd. */
  def tokenSum(toks: Column, f: Column => Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + f(t).cast("long"))

  /** Crude BPE-ish subword budget: ceil(len/4) pieces per word,
    * floor((len+3)/4) in integer-safe double math (mirrors the oracle SQL).
    */
  def bpePieces(tok: Column): Column = floor((length(tok) + lit(3)) / lit(4))

  /** Deterministic polynomial rolling hash over a token array (document
    * fingerprinting): h = fold((h * 31 + md5_32(token)) mod 2^57).
    * Modular form keeps every intermediate below 2^62 so it is safe under
    * Spark's ANSI overflow checking; order-sensitive by construction.
    * The token hash is the md5-derived 32-bit value (Hashing.md5Bits32),
    * so the whole fold is mirrored by a DuckDB list_reduce oracle
    * (SparkEntry q27) — round 1's xxhash64 form was engine-specific and
    * therefore rows-only.
    */
  def rollingFingerprint(toks: Column): Column = {
    val m = lit(1L << 57)
    aggregate(transform(toks, t => Hashing.md5Bits32(t, 1)),
      lit(0L), (acc, h) => pmod(acc * lit(31L) + h, m))
  }

  /** Content fingerprint with a cross-engine oracle: md5 of
    * whitespace-normalized lowercase text.
    */
  def md5Fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** PII patterns, deliberately kept in the regex subset Java and RE2
    * share (no lookaround/backrefs) so the DuckDB oracle runs the exact
    * same patterns: email, dotted/dashed US phone, IPv4-ish, SSN-ish.
    * Order matters for redaction: phone before IP (a dotted phone
    * contains an IP-shaped substring; replacement tokens contain no
    * digits, so earlier passes can't create later matches).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phone" -> "\\d{3}[-.]\\d{3}[-.]\\d{4}",
    "ssn"   -> "\\d{3}-\\d{2}-\\d{4}",
    "ip"    -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}")

  /** Replace every PII match with `<KIND>` tokens, applying the patterns
    * in declaration order.
    */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<${kind.toUpperCase}>")
    }
}
