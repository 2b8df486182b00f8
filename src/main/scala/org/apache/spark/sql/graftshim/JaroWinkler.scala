// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarity.scala: the expression-extension surface it needs is
// private[sql]; graft.functions re-exports the public face.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native JARO-WINKLER similarity — the prefix-boosted transposition
  * tolerant string score record linkage prefers for NAMES, where
  * Levenshtein's unit-cost edits over-penalize swapped syllables and
  * under-reward shared prefixes. Complements the fuzzy-join family:
  * `lev_within` verifies a distance THRESHOLD; this scores a pair in
  * [0, 1] for rank-then-resolve flows.
  *
  * Semantics are pinned to the standard (and DuckDB's
  * `jaro_winkler_similarity`, the oracle of q267): match window
  * ⌊max(|a|,|b|)/2⌋ − 1, greedy left-to-right matching,
  * transpositions = ⌊mismatched matched positions / 2⌋ (INTEGER floor —
  * an odd mismatch count is possible and the halving truncates),
  * Winkler boost l·0.1·(1 − jaro) over the ≤4-char common prefix
  * applied only when jaro > 0.7. Operates on UTF-8 BYTES (exactly
  * what DuckDB compares on ASCII data; multi-byte text scores by
  * bytes on both engines — the ER corpus contract is ASCII
  * identifiers/names).
  *
  * O(|a|·window) time, two small boolean scratch arrays, no
  * allocation beyond them; codegen emits one static call per row.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.JaroWinklerUtil.sim($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerUtil {
  /** Byte-wise (UTF-8 code units — DuckDB compares the same way on
    * ASCII; no String materialization, two boolean scratch arrays).
    */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val la = ua.numBytes()
    val lb = ub.numBytes()
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = ua.getByte(i)
      val hi = math.min(lb - 1, i + win)
      var j = math.max(0, i - win)
      var matched = false
      while (j <= hi && !matched) {
        if (!bm(j) && ca == ub.getByte(j)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (ua.getByte(i) != ub.getByte(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      val maxl = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxl && ua.getByte(l) == ub.getByte(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
