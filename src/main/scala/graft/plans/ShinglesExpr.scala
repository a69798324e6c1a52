package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling: the n-gram join of a token array in one
  * generated call, replacing the interpreted zip_with/slice chain
  * (n − 1 lambda-dispatched zips, each allocating an intermediate array
  * and re-concatenating prefixes — the dominant cost of the dedup
  * family's shared shingle build). For null-free input (all graft
  * tokenizers — tokens() never emits nulls) output order and values are
  * bit-identical to the HOF form: element k (1-based) is the space-join
  * of tokens k..k+n−1; the distinct variant keeps first-occurrence
  * order exactly like `array_distinct`. Equality vs the HOF reference is
  * asserted in DedupSimilaritySpec.
  *
  * Null elements are a DELIBERATE divergence from the HOF form: the
  * native expression compacts nulls away before windowing (a shingle is
  * always n real tokens), whereas the HOF chain windows over raw
  * positions and lets `concat_ws` drop nulls inside each window —
  * yielding short (even empty) shingles around a null. The compact-first
  * semantic is the user-facing contract; the spec pins it by comparing
  * null-bearing input against the pre-compacted equivalent.
  */
object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Hot path — called once per row from generated code. Null array
    * elements are dropped before windowing (a null token never appears
    * inside a shingle; the remaining tokens close ranks — see the class
    * doc for how this deliberately differs from the HOF chain's
    * window-then-concat_ws null handling). tokens() never emits nulls,
    * but this is a user-facing function surface and must not NPE on one.
    */
  def shingles(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val raw = toks.numElements()
    var cnt = 0
    val dense = new Array[UTF8String](raw)
    var r = 0
    while (r < raw) {
      if (!toks.isNullAt(r)) { dense(cnt) = toks.getUTF8String(r); cnt += 1 }
      r += 1
    }
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val m = cnt - n + 1
    val parts = new Array[UTF8String](n)
    if (!distinct) {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = dense(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { parts(j) = dense(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}

case class WordShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1) TypeCheckResult.TypeCheckFailure(
      // n <= 0 would NegativeArraySizeException per row (n < 0) or emit
      // cnt+1 empty-string universal shingles (n == 0) — fail at analysis
      s"word_shingles requires n >= 1, got $n")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any): Any =
    WordShingles.shingles(a.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.WordShingles.shingles($a, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesOps {
  def wordShingles(toks: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(
      WordShinglesExpr(ColumnBridge.expression(toks), n, distinct))
}
