package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native dot product of two pre-quantized long arrays — the hot inner
  * loop of every similarity operator. The higher-order-function form
  * (`aggregate(zip_with(...))`) is interpreted: per element it allocates
  * lambda bindings and evaluates an expression tree. This expression
  * generates a tight Java loop over the unsafe array data inside
  * WholeStageCodegen — same exact integer semantics, an order of
  * magnitude less per-pair overhead in the quadratic joins.
  *
  * Inputs must be non-null-element long arrays (VectorFunctions.quantize
  * guarantees this); result is the exact Σ a_i·b_i over the common
  * prefix length.
  */
case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"quantized_dot requires (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  // the HOF reference (aggregate(zip_with(...))) propagates a NULL
  // element to a NULL result; mirror it — but only pay the per-element
  // branch when the schema admits null elements (quantize() emits
  // containsNull=false arrays, so the hot path stays branch-free)
  private lazy val mayHaveNullElems =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  // MUST be declared nullable whenever the body can null out: codegen's
  // nullSafeCodeGen builds the result code (which assigns ev.isNull)
  // BEFORE branching on nullability, and its non-nullable branch never
  // declares that variable — the generated class then fails to compile
  // (Janino "not an rvalue") and the whole stage silently falls back to
  // interpreted execution. The GetArrayItem convention.
  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElems

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    if (mayHaveNullElems) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        sum += x.getLong(i) * y.getLong(i); i += 1
      }
    } else {
      while (i < n) { sum += x.getLong(i) * y.getLong(i); i += 1 }
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: this expression can appear several times in one
      // fused codegen scope (e.g. dot and norm in the same projection)
      val n = ctx.freshName("qdotN")
      val sum = ctx.freshName("qdotSum")
      val i = ctx.freshName("qdotI")
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def quantizedDot(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
