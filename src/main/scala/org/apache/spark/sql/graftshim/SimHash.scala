// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarity.scala: the expression-extension surface it needs is
// private[sql]; graft.functions re-exports the public face.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for a SimHash sketch over a token array:
  * bit i of the result is set iff more than half the tokens have bit i
  * set in their 60-bit md5-derived hash (first 15 hex digits — the
  * engine-portable `Dedup.hashLong` definition, byte-for-byte).
  *
  * This replaces the interpreted `aggregate` fold (per-token lambda
  * frames, a Column-expression md5 → hex → conv chain, and a 32-term
  * finish projection) with one tight JVM loop per document: md5 straight
  * from the digest bytes, popcount bookkeeping in a primitive int array.
  * The expression participates in whole-stage codegen — `doGenCode`
  * emits a single static call, so the surrounding project stays fused.
  *
  * Numerics/semantics are IDENTICAL to the HOF formulation and the
  * DuckDB oracle: hash = (first 8 digest bytes, big-endian) >>> 4
  * (= first 15 hex digits), majority test `2·count > n` with n the
  * total element count. A spec asserts equality with the HOF fold.
  */
case class SimHash(child: Expression, bits: Int)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  require(bits >= 1 && bits <= 64, s"simhash bits must be in [1,64], got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash"

  override protected def nullSafeEval(toks: Any): Any =
    SimHashUtil.compute(toks.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.SimHashUtil.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHashUtil {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 hash of a UTF-8 byte string: value of the first 15 hex
    * digits of the digest = first 8 bytes big-endian, shifted right 4.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** One pass over the token array; null elements contribute no set bits
    * but still count toward n (tokenizers in this engine never emit null
    * elements, so the branch is dead in practice).
    */
  def compute(toks: ArrayData, bits: Int): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](bits)
    var k = 0
    while (k < n) {
      if (!toks.isNullAt(k)) {
        val h = hash60(toks.getUTF8String(k).getBytes)
        var i = 0
        while (i < bits) { counts(i) += ((h >>> i) & 1L).toInt; i += 1 }
      }
      k += 1
    }
    var sk = 0L
    var i = 0
    while (i < bits) { if (2L * counts(i) > n) sk |= 1L << i; i += 1 }
    sk
  }
}
