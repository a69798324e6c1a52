package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: k simulated permutations over a shingle
  * array in one generated call.
  *
  * The higher-order-function fold (aggregate + zip_with + transform)
  * evaluates k interpreted hash expressions PER SHINGLE — ~64·|shingles|
  * lambda dispatches per row, the dominant cost of the whole dedup
  * family at sf0.1 (~5 s of sig build). Here each shingle is hashed once
  * (Murmur3-32 over its UTF-8 bytes — 32 bits of base entropy, so two
  * distinct shingles collide in ALL k slots with prob ~2^-32; the
  * resulting spurious band candidates are absorbed by the exact-Jaccard
  * re-check every consumer runs) and the k per-permutation values are
  * derived by a splitmix64 finalizer of (h + i·φ) — the standard cheap
  * construction of k pairwise-independent-ish hash functions from one
  * base hash (Broder's simulated permutations; see PAPERS.md). Banding
  * probabilities are unchanged; concrete signature values differ from
  * the HOF form, which no contract depends on (q15's oracle is the
  * engine-independent exact-pair set; recall is re-asserted in
  * DedupSimilaritySpec).
  *
  * Docs with no shingles keep the all-MaxValue signature sentinel; their
  * band collisions are discarded by the exact-Jaccard re-check.
  */
object MinHashSig {
  private final val Golden = -7046029254386353131L // 0x9E3779B97F4A7C15

  /** splitmix64 finalizer — full-avalanche 64-bit mixer. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * -4658895280553007687L // 0xBF58476D1CE4E5B9
    z = (z ^ (z >>> 27)) * -7723592293110705685L // 0x94D049BB133111EB
    z ^ (z >>> 31)
  }

  /** Hot path — called once per row from generated code. Null array
    * elements are skipped (the interpreted HOF form this replaces was
    * null-tolerant; tokens()/shingles() never emit them, but this is a
    * user-facing function surface).
    */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val out = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (shingles.isNullAt(j)) { j += 1 }
      else {
      val s = shingles.getUTF8String(j)
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      val h64 = mix(h.toLong)
      var i = 0
      var acc = h64
      while (i < k) {
        acc += Golden
        val v = mix(acc)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
      }
    }
    new GenericArrayData(out)
  }
}

case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.MinHashSig.sig($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), k))
}
