package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native form of the engine's universal hash primitive
  * `conv(substring(md5(t), from, 8), 16, 10)::long` (Hashing.md5Bits32)
  * — the md5-derived 32-bit bucket behind every deterministic split,
  * shard map, CMS/HLL register, LSH band and sampling decision.
  *
  * The composed chain pays, per row: a 32-char hex ENCODE of the digest,
  * a substring copy, and a radix-16 string PARSE — three string
  * round-trips to extract four bytes. This expression reads the nibbles
  * straight out of the digest (no hex string ever exists), with the
  * digest instance thread-local like SimHash's. Value-identical to the
  * composed form for every input (asserted in Md5Bits32ExprSpec), so
  * every oracle built on the DuckDB strpos-arithmetic mirror is
  * untouched.
  */
object Md5Bits32 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hot path — called once per row from generated code. `from` is the
    * 1-based hex-nibble offset (the substring convention): nibbles
    * [from-1, from+7) of the 32-nibble digest, big-endian.
    */
  def bits(s: org.apache.spark.unsafe.types.UTF8String, from: Int): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes)
    var v = 0L
    var i = from - 1
    val end = from + 7
    while (i < end) {
      val b = bytes(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

case class Md5Bits32Expr(child: Expression, from: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if from >= 1 && from + 7 <= 32 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"md5_bits32 needs 1 <= from <= 25, got $from")
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_bits32 requires string, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_bits32"

  override protected def nullSafeEval(a: Any): Any =
    Md5Bits32.bits(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      from)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.Md5Bits32.bits($a, $from)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Bits32s {
  def md5Bits32(t: Column, from: Int): Column =
    ColumnBridge.column(Md5Bits32Expr(ColumnBridge.expression(t), from))
}
