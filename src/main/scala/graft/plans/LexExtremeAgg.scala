package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Coalesce, CreateNamedStruct, EqualNullSafe, Expression, GetStructField, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Not, Or, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** `min(struct(...))` / `max(struct(...))` with a FLAT mutable buffer —
  * the struct-extreme argmin/argmax the operators use everywhere
  * (canonical-doc picks, latest-per-key CDC states, 1-NN argmax, CUSUM
  * break rows), compiled to a real `HashAggregate`.
  *
  * Spark's own `Min`/`Max` over a struct carries the struct itself as
  * the aggregation buffer; a struct is not an UnsafeRow-mutable type,
  * so every such aggregate silently demotes the whole operator to
  * `Sort + SortAggregate` — each partition SORTS its full input
  * fan-out (the 250k-pair quadratic stream in q210, the corpus-sized
  * doc table in the q82 canonical pick) to answer a per-group MAX the
  * hash aggregate answers in O(n) streaming updates (guide §1.2: fix
  * the operator, not the config). This aggregate flattens the struct
  * into one nullable buffer slot per field plus a `set` flag — all
  * primitive/decimal, so `HashAggregateExec` accepts it and the whole
  * stage keeps WholeStageCodegen.
  *
  * Ordering semantics are IDENTICAL to Spark's struct ordering by
  * construction: per-field comparison via Spark's own `LessThan` /
  * `GreaterThan` / `EqualNullSafe` (same NaN-greatest and -0.0 == 0.0
  * rules the interpreted row ordering applies), fields compared left
  * to right, a NULL field sorting FIRST ascending (so it wins a min
  * and loses a max against any non-null), NULL struct inputs skipped,
  * all-null groups evaluating to NULL — the `min(struct)`/`max(struct)`
  * contract bit for bit. LexExtremeSpec pins the equivalence
  * property-style against the built-ins, including the NaN/null/decimal
  * edges, and pins the HashAggregate plan shape.
  *
  * Restricted to structs whose fields are UnsafeRow-mutable orderable
  * atomics (long/double/decimal/date/timestamp/boolean...) — exactly
  * the shapes the call sites use; a string field (q241's source pick)
  * cannot be a mutable buffer slot and keeps the built-in form.
  */
case class LexExtremeAgg(
    child: Expression,
    greatest: Boolean)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case st: StructType if st.nonEmpty && st.fields.forall(f =>
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(f.dataType) && UnsafeRow.isMutable(f.dataType)) =>
        TypeCheckResult.TypeCheckSuccess
      case st: StructType =>
        TypeCheckResult.TypeCheckFailure(
          s"${prettyName} needs non-empty mutable orderable struct fields " +
            s"(numeric/decimal/date/timestamp), got ${st.catalogString}")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"${prettyName} needs a STRUCT argument, got ${other.catalogString}")
    }

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (greatest) "lex_max" else "lex_min"

  private lazy val set = AttributeReference("set", BooleanType, nullable = false)()
  private lazy val fieldBufs: Seq[AttributeReference] =
    structType.fields.map(f =>
      AttributeReference(f.name, f.dataType, nullable = true)()).toSeq

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    set +: fieldBufs

  override lazy val initialValues: Seq[Expression] =
    Literal(false) +: structType.fields.map(f =>
      Literal.create(null, f.dataType)).toSeq

  /** Strict lexicographic "cand beats cur" under Spark's struct
    * ordering (NULL field first ascending; NaN greatest via Spark's
    * own comparison operators). `cur` fields may only be NULL where the
    * data had NULLs — the `set` guard handles the untouched buffer.
    */
  private def beats(cand: Seq[Expression], cur: Seq[Expression]): Expression =
    cand.zip(cur).foldRight(Literal(false): Expression) {
      case ((n, o), tieRest) =>
        val strictly =
          if (greatest)
            Or(And(IsNotNull(n), IsNull(o)),
              Coalesce(Seq(GreaterThan(n, o), Literal(false))))
          else
            Or(And(IsNull(n), IsNotNull(o)),
              Coalesce(Seq(LessThan(n, o), Literal(false))))
        Or(strictly, And(EqualNullSafe(n, o), tieRest))
    }

  override lazy val updateExpressions: Seq[Expression] = {
    val inNonNull = IsNotNull(child)
    val newFs = structType.fields.indices.map(i =>
      GetStructField(child, i, Some(structType.fields(i).name)): Expression)
    val better = And(inNonNull, Or(Not(set), beats(newFs, fieldBufs)))
    Or(set, inNonNull) +:
      fieldBufs.indices.map(i => If(better, newFs(i), fieldBufs(i)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = And(set.right,
      Or(Not(set.left), beats(fieldBufs.map(_.right), fieldBufs.map(_.left))))
    Or(set.left, set.right) +:
      fieldBufs.indices.map(i =>
        If(better, fieldBufs(i).right, fieldBufs(i).left))
  }

  override lazy val evaluateExpression: Expression =
    If(set,
      CreateNamedStruct(structType.fields.zip(fieldBufs).flatMap {
        case (f, b) => Seq(Literal(f.name), b)
      }.toSeq),
      Literal.create(null, dataType))

  override protected def withNewChildInternal(newChild: Expression): LexExtremeAgg =
    copy(child = newChild)
}

object LexExtreme {
  /** Drop-in `min(struct(...))` — same selection, HashAggregate plan. */
  def lexMin(s: Column): Column =
    ColumnBridge.column(
      LexExtremeAgg(ColumnBridge.expression(s), greatest = false)
        .toAggregateExpression())

  /** Drop-in `max(struct(...))` — same selection, HashAggregate plan. */
  def lexMax(s: Column): Column =
    ColumnBridge.column(
      LexExtremeAgg(ColumnBridge.expression(s), greatest = true)
        .toAggregateExpression())
}
