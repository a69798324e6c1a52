package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array — one tight loop per row in
  * generated code, replacing the interpreted HOF pipeline (transform +
  * aggregate over a 64-long vote array + zip_with per token: ~130 lambda
  * dispatches and two array allocations PER TOKEN, the last interpreted
  * hot path of the sketch family).
  *
  * Token hashes are the SAME md5-derived 64-bit values as
  * `Hashing.md5Hash64` — md5 bytes 0–3 as the high word, 4–7 as the low
  * word, exactly `(conv(substr(md5,1,8),16,10) << 32) | conv(substr(
  * md5,9,8),16,10)` — so for null-free token arrays (all graft
  * tokenizers) sketches are bit-identical to the HOF form and the DuckDB
  * oracle's re-derivation (SparkEntry q23). Equality against the HOF
  * reference is asserted in DedupSimilaritySpec.
  */
object SimHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hot path — called once per row from generated code. Null array
    * elements are skipped (they contribute no votes). This is a
    * DELIBERATE semantic choice, not HOF parity: the HOF chain's
    * `when(bit-and = 1, +1).otherwise(-1)` gives a null token a −1 vote
    * on every bit (the null comparison falls to the otherwise branch) —
    * an accident we don't reproduce. Tokenizers never emit nulls, so the
    * two agree on every real pipeline input; the spec pins the skip
    * semantic by comparing null-bearing input to its pre-compacted form.
    */
  def sketch(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = digest.get()
    val n = toks.numElements()
    var j = 0
    while (j < n) {
      if (toks.isNullAt(j)) { j += 1 }
      else {
      md.reset()
      val bytes = md.digest(toks.getUTF8String(j).getBytes)
      val hi = ((bytes(0) & 0xFFL) << 24) | ((bytes(1) & 0xFFL) << 16) |
        ((bytes(2) & 0xFFL) << 8) | (bytes(3) & 0xFFL)
      val lo = ((bytes(4) & 0xFFL) << 24) | ((bytes(5) & 0xFFL) << 16) |
        ((bytes(6) & 0xFFL) << 8) | (bytes(7) & 0xFFL)
      val h = (hi << 32) | lo
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      j += 1
      }
    }
    var res = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) res |= (1L << k)
      k += 1
    }
    res
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any =
    SimHash.sketch(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHash.sketch($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashes {
  def simhash64(toks: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(toks)))
}
