package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native reference tokenizer (MailTFIDF.java:50-54,126,134-147 —
  * lowercase, whitespace split, keep purely-alphabetic tokens, drop the
  * 29-word stop list) in ONE generated call per row, replacing the
  * interpreted `filter(split(lower(text)), rlike && !array_contains)`
  * HOF chain: that form pays a regex `find` per token plus a 29-way
  * linear string scan per token, lambda-dispatched — the dominant cost
  * of every tokenizing lineage (TF-IDF, BM25 postings, quality gates).
  * Here: one byte scan over the lowered text (Java regex `\s` is the
  * six ASCII whitespace chars, so byte-level splitting is exact even in
  * multi-byte UTF-8 — continuation bytes are ≥ 0x80 and never match),
  * an a–z byte check per token, and a hash-set stop lookup.
  *
  * Value-identical to the HOF form by construction: empty tokens from
  * leading/trailing/repeated whitespace fail `[a-z]+` in both forms;
  * any non-ASCII byte fails the a–z check exactly as the regex rejects
  * the char. The declared HOF reference is ANCHOR-EXACT
  * (`\A[a-z]+\z`, matching the DuckDB oracles' regexp_full_match) —
  * `^…$` would silently accept one trailing Unicode line terminator
  * (\u0085/\u2028/\u2029, which Java `\s` does not split on).
  * CleanTokensExprSpec asserts equality over the corpus and
  * adversarial strings including those terminators.
  */
/** The byte-scan vocabulary CleanTokens and QualityCounters share —
  * ONE definition of the stop set and the whitespace predicate, so the
  * documented value-identity between `clean_tokens` and
  * `quality_counters` cannot drift from a one-sided edit.
  */
private[plans] object TokenScan {
  val Stop: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](64)
    graft.functions.TextFunctions.StopWords
      .foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // Java regex \s = the six ASCII whitespace chars; UTF-8 continuation
  // bytes are >= 0x80 and can never match
  def isWs(c: Byte): Boolean =
    c == ' '.toByte || c == '\t'.toByte || c == '\n'.toByte ||
      c == 0x0B.toByte || c == '\f'.toByte || c == '\r'.toByte
}

object CleanTokens {
  private def Stop = TokenScan.Stop
  private def isWs(c: Byte): Boolean = TokenScan.isWs(c)

  /** Hot path — called once per row from generated code. */
  def clean(text: UTF8String): ArrayData = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    val out = new java.util.ArrayList[Any]()
    var start = 0
    var alpha = true
    var i = 0
    while (i <= n) {
      if (i == n || isWs(b(i))) {
        if (i > start && alpha) {
          val t = UTF8String.fromBytes(b, start, i - start)
          if (!Stop.contains(t)) out.add(t)
        }
        start = i + 1
        alpha = true
      } else {
        val c = b(i)
        if (c < 'a'.toByte || c > 'z'.toByte) alpha = false
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class CleanTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"clean_tokens requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "clean_tokens"

  override protected def nullSafeEval(a: Any): Any =
    CleanTokens.clean(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.CleanTokens.clean($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CleanTokensOps {
  def cleanTokens(text: Column): Column =
    ColumnBridge.column(CleanTokensExpr(ColumnBridge.expression(text)))
}
