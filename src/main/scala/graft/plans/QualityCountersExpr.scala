package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document quality counters (the q18 signals behind the
  * reference's length/stopword heuristics — MailTFIDF.java:50-54 for
  * the stop list) in ONE byte scan per row: token count, stop-word
  * count, alphabetic-token count, and summed token length, replacing
  * FOUR interpreted HOF passes (`size(split(...))`, two
  * `size(filter(...))` with a regex `find` / 29-way linear scan per
  * token, and an `aggregate` length fold) that dominate every
  * quality-scoring lineage (q18 and its 6 consumers + the
  * quality_rank build).
  *
  * Value-identical to the HOF chain by construction, including the
  * regex-split edge semantics `split(lower(text), "\\s+")` exposes:
  * a leading whitespace run yields one empty leading segment, a
  * trailing run one empty trailing segment (Java `Pattern.split`
  * with limit −1), and the empty string yields ONE empty segment —
  * all counted by `n_tokens`, none of which are stop words or
  * alphabetic, and all adding 0 length. Token lengths count
  * CHARACTERS (`UTF8String.numChars`), matching `length()`. The
  * alpha check is ANCHOR-EXACT, like the HOF reference `\A[a-z]+\z`
  * and the DuckDB oracles' regexp_full_match — a token carrying a
  * trailing Unicode line terminator (\u0085/\u2028/\u2029, not Java
  * `\s` whitespace) is NOT alphabetic, where `^…$` would have
  * silently accepted it. QualityCountersExprSpec asserts equality
  * against the HOF form over the corpus and adversarial strings
  * including those terminators.
  */
object QualityCounters {
  // shared with CleanTokens (plans.TokenScan): one stop set, one
  // whitespace predicate — the two expressions' value-identity contract
  private def Stop = TokenScan.Stop
  private def isWs(c: Byte): Boolean = TokenScan.isWs(c)

  /** Hot path — called once per row from generated code. */
  def count(text: UTF8String): GenericInternalRow = {
    val lowered = text.toLowerCase
    val b = lowered.getBytes
    val n = b.length
    var nTokens = 0L
    var nStop = 0L
    var nAlpha = 0L
    var sumLen = 0L
    if (n == 0) {
      // split("", "\s+") is [""] — one empty segment
      nTokens = 1L
    } else {
      // every maximal non-whitespace run is a segment; a leading or
      // trailing whitespace run contributes one EMPTY segment each
      if (isWs(b(0))) nTokens += 1L
      if (isWs(b(n - 1))) nTokens += 1L
      var start = 0
      var alpha = true
      var i = 0
      while (i <= n) {
        if (i == n || isWs(b(i))) {
          if (i > start) {
            nTokens += 1L
            if (alpha) nAlpha += 1L
            val t = UTF8String.fromBytes(b, start, i - start)
            if (Stop.contains(t)) nStop += 1L
            sumLen += t.numChars().toLong
          }
          start = i + 1
          alpha = true
        } else {
          val c = b(i)
          if (c < 'a'.toByte || c > 'z'.toByte) alpha = false
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, nStop, nAlpha, sumLen))
  }
}

case class QualityCountersExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quality_counters requires string, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false)))

  override def prettyName: String = "quality_counters"

  override protected def nullSafeEval(a: Any): Any =
    QualityCounters.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.QualityCounters.count($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityCountersOps {
  def qualityCounters(text: Column): Column =
    ColumnBridge.column(QualityCountersExpr(ColumnBridge.expression(text)))
}
