package graft.plans

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane LSH signatures as one fused native expression.
  *
  * Round 1 derived each plane weight PER ROW with nested interpreted
  * higher-order functions (~3k xxhash64 evals per vector — the bench's
  * q29 hot spot, 10.3 s at sf0.1). The weight matrix is a deterministic
  * CONSTANT: it is now materialized once on the driver and the projection
  * runs as a tight generated loop over the pre-quantized vector.
  *
  * Weight derivation is cross-engine reproducible INTEGER math so the
  * whole LSH pipeline is DuckDB-oracle-checkable:
  *   wq(t,p,i) = h32(md5("t,p,i")) - 2^31   ∈ [-2^31, 2^31)
  * where h32 = first 8 hex nibbles of the md5 digest as an unsigned int
  * (DuckDB mirror: nibble arithmetic over md5(t||','||p||','||i)).
  * Signature bit p of table t = (Σ_i qemb_i · wq(t,p,i)) > 0 — an exact
  * integer sign, immune to FP summation order. Overflow bound: |Σ| ≤
  * dims·1e7·2^31 (unit-scale embeddings), < 2^63 for dims ≤ 429 — far
  * above the 64-dim corpus; wider vectors would need a wider
  * accumulator, not silent wraparound.
  */
object Hyperplanes {
  /** First 4 md5 bytes of "t,p,i" as unsigned int, shifted to signed. */
  def weight(t: Int, p: Int, i: Int): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s"$t,$p,$i".getBytes("UTF-8"))
    val h32 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    h32 - 2147483648L
  }

  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Array[Long]]]]()

  /** [table][plane][dim] weight matrix, built once per shape per JVM. */
  def matrix(nTables: Int, nPlanes: Int, dims: Int): Array[Array[Array[Long]]] =
    cache.computeIfAbsent((nTables, nPlanes, dims), _ =>
      Array.tabulate(nTables, nPlanes, dims)(weight))

  /** Hot path: signatures of one pre-quantized vector. Called from
    * generated code — one invocation per row, all loops JIT-compiled.
    */
  def sigs(qemb: ArrayData, nTables: Int, nPlanes: Int): ArrayData = {
    val dims = qemb.numElements()
    val w = matrix(nTables, nPlanes, dims)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      val wt = w(t)
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val wp = wt(p)
        var acc = 0L
        var i = 0
        while (i < dims) { acc += qemb.getLong(i) * wp(i); i += 1 }
        sig = sig * 2 + (if (acc > 0) 1L else 0L)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class HyperplaneSigsExpr(child: Expression, nTables: Int, nPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (nPlanes < 1 || nPlanes > 64) TypeCheckResult.TypeCheckFailure(
      // > 64 planes silently shift earlier bits out of the 64-bit
      // signature — colliding signatures across DIFFERENT hyperplane
      // sets, corrupting LSH banding with no error
      s"hyperplane_sigs packs one 64-bit signature per table: nPlanes must be in [1, 64], got $nPlanes")
    else if (nTables < 1 || nTables.toLong * nPlanes > 65536L)
      TypeCheckResult.TypeCheckFailure(
        // the weight matrix (nTables x nPlanes x dims longs) is cached
        // per JVM for the process lifetime — bound it at analysis so one
        // mistyped literal cannot OOM every executor
        s"hyperplane_sigs weight matrix too large: nTables*nPlanes must be in [1, 65536], got ${nTables}x$nPlanes")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sigs requires array<long> (quantized), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  override protected def nullSafeEval(a: Any): Any =
    Hyperplanes.sigs(a.asInstanceOf[ArrayData], nTables, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.Hyperplanes.sigs($a, $nTables, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigs {
  def hyperplaneSigs(qemb: Column, nTables: Int, nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneSigsExpr(
      ColumnBridge.expression(qemb), nTables, nPlanes))
}
