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
  * GraftExtensions` makes the ENTIRE native surface available to
  * `spark.sql` in every session without touching application code:
  * the expression family (grid_cell, clean_tokens, md5_bits32,
  * word_shingles, simhash, minhash_sigs, quantized_dot,
  * hyperplane_sigs, cells_on_way_exact), the native aggregates
  * (top_k_rows, slope_origin), and the as-of join planner strategy
  * (plans.AsOfStrategy — the whole-operator hook). Integer parameters
  * (hex offset, shingle width, signature length, table/plane counts,
  * k) must be LITERALS — they parameterize the generated code.
  * SqlSurfaceSpec exercises each registered symbol through SQL against
  * its Column-API twin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfStrategy)
  }
}

/** The registration triples behind GraftExtensions, exposed so a live
  * session can also register them directly
  * (`GraftFunctions.register(spark)` — SqlSurfaceSpec's path; builder
  * extensions only apply at session construction).
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def one(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    one("grid_cell", classOf[MapToGridCellExpr],
      exprs => MapToGridCellExpr(exprs(0), exprs(1))),
    one("clean_tokens", classOf[CleanTokensExpr],
      exprs => CleanTokensExpr(exprs(0))),
    one("md5_bits32", classOf[Md5Bits32Expr],
      exprs => Md5Bits32Expr(exprs(0), litInt(exprs(1), "md5_bits32 offset"))),
    one("word_shingles", classOf[WordShinglesExpr],
      exprs => WordShinglesExpr(exprs(0),
        litInt(exprs(1), "word_shingles width"), distinct = true)),
    one("simhash", classOf[SimHashExpr],
      exprs => SimHashExpr(exprs(0))),
    one("minhash_sigs", classOf[MinHashSigExpr],
      exprs => MinHashSigExpr(exprs(0), litInt(exprs(1), "minhash_sigs k"))),
    one("quantized_dot", classOf[QuantizedDotExpr],
      exprs => QuantizedDotExpr(exprs(0), exprs(1))),
    one("hyperplane_sigs", classOf[HyperplaneSigsExpr],
      exprs => HyperplaneSigsExpr(exprs(0),
        litInt(exprs(1), "hyperplane_sigs nTables"),
        litInt(exprs(2), "hyperplane_sigs nPlanes"))),
    one("cells_on_way_exact", classOf[SlopeWalkExpr],
      exprs => SlopeWalkExpr(exprs(0), exprs(1), exprs(2), exprs(3))),
    // native aggregates ride the same registry: the analyzer wraps a
    // returned AggregateFunction in its AggregateExpression itself
    one("top_k_rows", classOf[TopKRowsAgg],
      exprs => TopKRowsAgg(exprs(0), litInt(exprs(1), "top_k_rows k"))),
    one("slope_origin", graft.functions.RegressionAggregator.getClass,
      exprs => org.apache.spark.sql.graft.ColumnBridge.scalaAggregator(
        org.apache.spark.sql.functions.udaf(
          graft.functions.RegressionAggregator.slopeOrigin), exprs)))

  /** Register the full native surface into an already-running session:
    * the function family above plus the as-of join planner strategy —
    * the live-session equivalent of the GraftExtensions builder hook.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    AsOf.registerStrategy(spark)
  }
}
