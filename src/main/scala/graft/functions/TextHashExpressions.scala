package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd Catalyst expressions for the hot text-hashing path.
  *
  * The declarative formulation (split -> transform -> aggregate lambdas)
  * is semantically identical but Spark evaluates higher-order-function
  * lambdas INTERPRETED, one expression-tree walk per element — measured
  * ~100x slower than a fused byte-level pass at bench scale. These
  * expressions compute the exact same values (the DuckDB oracle twins in
  * TextQueries are unchanged) in a single scan of the UTF8 bytes, inside
  * whole-stage codegen.
  *
  * Semantics (must stay in lockstep with TextOps.wordHashExpr and the
  * oracle SQL): words split on single spaces; per word
  * h = fold(acc*31 + byte) over ASCII bytes; token id = h % 50257;
  * fingerprint = sum_i (h_i % 1000003) * ((i * 2654435761) % 1000003),
  * i = 1-based word position. ASCII input contract: `ascii()` in both
  * engines returns the codepoint == the byte for ASCII (the fixtures and
  * driver corpus are ASCII).
  */
object TextHash {
  final val TokenMod = 50257L
  final val FpMod = 1000003L
  final val FpMul = 2654435761L

  /** One-pass tokenizer: text -> array<int> of word-hash token ids. */
  def tokenHashAll(bytes: Array[Byte]): Array[Int] = {
    if (bytes.isEmpty) return Array(0) // split('', ' ') == [''] -> hash 0
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val out = new Array[Int](n)
    var w = 0
    var acc = 0L
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { out(w) = (acc % TokenMod).toInt; w += 1; acc = 0L }
      else acc = acc * 31 + (b & 0xff)
      i += 1
    }
    out(w) = (acc % TokenMod).toInt
    out
  }

  /** One-pass positional rolling-hash fingerprint. */
  def fingerprint(bytes: Array[Byte]): Long = {
    var fp = 0L
    var pos = 1L
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        fp += (acc % FpMod) * ((pos * FpMul) % FpMod)
        pos += 1; acc = 0L
      } else acc = acc * 31 + (b & 0xff)
      i += 1
    }
    fp + (acc % FpMod) * ((pos * FpMul) % FpMod)
  }

  import org.apache.spark.sql.graftx.Bridge
  def token_hash_all(c: Column): Column =
    Bridge.column(TokenHashAllExpr(Bridge.expression(c)))
  def fingerprint64(c: Column): Column =
    Bridge.column(FingerprintExpr(Bridge.expression(c)))
}

case class TokenHashAllExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.tokenHashAll(input.asInstanceOf[UTF8String].getBytes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.tokenHashAll($c.getBytes()))")
  override protected def withNewChildInternal(newChild: Expression): TokenHashAllExpr =
    copy(child = newChild)
}

/** Codegen'd cosine kernel: dot(a,b) / sqrt(dot(a,a)*dot(b,b)) over two
  * float arrays, accumulating in double with a strict left-to-right fold —
  * bit-identical to the declarative `aggregate(zip_with(...))` form and to
  * DuckDB's list_inner_product, but one fused loop instead of interpreted
  * per-element lambdas (the q24 hot path).
  */
object VectorOps {
  def dotDouble(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  import org.apache.spark.sql.graftx.Bridge
  def dot_f(x: Column, y: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(x), Bridge.expression(y)))
}

case class DotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotDouble(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotDouble($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.fingerprint(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fingerprint($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}
