package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the hot GeoUtils scalar
  * `mapToGridCell` (GeoUtils.java:75-80) — the builder-prompt preference
  * ladder's option (b): a codegen'd `Expression` beats a UDF because the
  * generated Java inlines into WholeStageCodegen (no boxing, no closure
  * call) and stays analyzable by Catalyst (null-intolerant, foldable on
  * literals).
  *
  * Semantics are bit-identical to the column-math form in
  * `graft.functions.Geo.mapToGridCell` (same double ops, same floor/int
  * casts) — GridCellExprSpec asserts all three forms (native, column
  * math, plain Scala) agree.
  */
case class MapToGridCellExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"grid_cell requires (double, double), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "grid_cell"

  override protected def nullSafeEval(lon: Any, lat: Any): Any = {
    val xIndex = math.floor((74.05d - math.abs(lon.asInstanceOf[Double])) / 0.0014d).toInt
    val yIndex = math.floor((41.0d - lat.asInstanceOf[Double]) / 0.00125d).toInt
    xIndex + yIndex * 250
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"((int)(java.lang.Math.floor((74.05D - java.lang.Math.abs($lon)) / 0.0014D))" +
        s" + 250 * (int)(java.lang.Math.floor((41.0D - $lat) / 0.00125D)))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GridCell {
  /** Column form: `grid_cell(lon, lat)` with native codegen. */
  def gridCellNative(lon: Column, lat: Column): Column =
    ColumnBridge.column(
      MapToGridCellExpr(
        ColumnBridge.expression(lon.cast("double")),
        ColumnBridge.expression(lat.cast("double"))))

  /** SQL registration: `SELECT grid_cell(lon, lat) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "grid_cell",
      exprs => MapToGridCellExpr(exprs(0), exprs(1)),
      "scala_udf")
}

/** SparkSessionExtensions hook — `spark.sql.extensions=graft.plans.
  * GraftExtensions` makes the native functions available in every
  * session without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("grid_cell"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MapToGridCellExpr].getName, "grid_cell"),
        (exprs: Seq[Expression]) => MapToGridCellExpr(exprs(0), exprs(1))))
  }
}
