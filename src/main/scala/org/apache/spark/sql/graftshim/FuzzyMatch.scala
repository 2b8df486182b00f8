// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarity.scala: the expression-extension surface it needs is
// private[sql]; graft.functions re-exports the public face.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the blocked fuzzy (edit-distance) join's hot
  * path. The blocked candidate join (Text.fuzzyJoin) generates tens of
  * millions of pairs at warehouse scale; verifying each with a full
  * Levenshtein DP costs microseconds per pair (built-in `levenshtein`
  * measured ~5–7 µs on 40-char names even with the threshold arg), which
  * is tens of core-minutes. The fix is the classic filter-verify split:
  *
  *  1. `fuzzy_sig(name)` — ONE 64-bit signature per ROW (32 buckets of
  *     2-bit, saturating-at-3 code-point counts), computed on the small
  *     pre-join sides, carried through the join as a long.
  *  2. `sig_bound(sigA, sigB)` — per PAIR, a Levenshtein LOWER bound
  *     from the signatures: ⌈Σ|laneA−laneB|/2⌉. Pure register bit-ops,
  *     no string access, ~30 ns; rejects the vast majority of
  *     non-matching candidates.
  *  3. `lev_within(a, b, k)` — the exact verifier for survivors:
  *     common prefix/suffix trimming (code-point safe) + Ukkonen-banded
  *     two-row DP with early exit, returning the exact distance when
  *     ≤ k and −1 otherwise. On true near-matches the trim reduces the
  *     DP to a handful of cells; on same-letter-multiset false
  *     candidates (word permutations — the pairs the histogram bound
  *     cannot reject) the band's row-minimum exceeds k within a few
  *     columns and exits.
  *
  * Soundness of the bound: one edit operation touches at most one code
  * point on each side, moving the exact histogram L1 by ≤ 2
  * (substitution −1/+1, insert/delete ±1), so lev ≥ ⌈L1/2⌉; folding
  * code points into 32 buckets and clamping counts at 3 are both
  * per-bucket contractions (|min(a,3)−min(b,3)| ≤ |a−b|), so the
  * packed bound only ever shrinks. A pair rejected by
  * `sig_bound > k` therefore can never satisfy `lev ≤ k`: the filter
  * changes no result, only the work done (FuzzyJoinSpec pins both the
  * soundness property and lev_within ≡ levenshtein).
  */
case class FuzzySig(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "fuzzy_sig"

  override protected def nullSafeEval(a: Any): Any =
    FuzzyMatchUtil.sig(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.FuzzyMatchUtil.sig($c);")

  override protected def withNewChildInternal(newChild: Expression): FuzzySig =
    copy(child = newChild)
}

/** Levenshtein lower bound from two `fuzzy_sig` signatures (see
  * FuzzySig doc for the soundness argument).
  */
case class SigBound(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_bound"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzyMatchUtil.sigBound(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.FuzzyMatchUtil.sigBound($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigBound =
    copy(left = newLeft, right = newRight)
}

/** Exact thresholded Levenshtein: the distance when ≤ k, −1 otherwise —
  * the same contract as the built-in 3-arg `levenshtein`, with the
  * trim + band + early-exit implementation the verify path needs (see
  * FuzzyMatchUtil.levWithin).
  */
case class LevWithin(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  require(k >= 0, s"lev_within threshold must be >= 0, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "lev_within"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzyMatchUtil.levWithin(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftshim.FuzzyMatchUtil.levWithin($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevWithin =
    copy(left = newLeft, right = newRight)
}

object FuzzyMatchUtil {

  /** 32-bucket, 2-bit saturating code-point histogram packed in a long.
    * UTF-8 continuation bytes are skipped so every code point lands in
    * exactly one bucket (its lead byte & 31).
    */
  def sig(a: UTF8String): Long = {
    val x = a.getBytes
    var s = 0L
    var i = 0
    while (i < x.length) {
      val c = x(i) & 0xff
      if ((c & 0xc0) != 0x80) {
        val sh = (c & 31) << 1
        if (((s >>> sh) & 3L) != 3L) s += 1L << sh
      }
      i += 1
    }
    s
  }

  /** ⌈Σ|laneA−laneB|/2⌉ over the 32 2-bit lanes — a Levenshtein lower
    * bound (see FuzzySig doc).
    */
  def sigBound(sa: Long, sb: Long): Int = {
    var a = sa
    var b = sb
    var d = 0
    var i = 0
    while (i < 32) {
      val la = (a & 3L).toInt
      val lb = (b & 3L).toInt
      d += math.abs(la - lb)
      a >>>= 2
      b >>>= 2
      i += 1
    }
    (d + 1) >> 1
  }

  /** Exact Levenshtein distance if ≤ k, else −1.
    *
    * Steps: (1) trim the common byte prefix/suffix, backing up to code
    * point boundaries so a multi-byte char is never split; (2) decode
    * the (short) remainders to packed code points; (3) Ukkonen-banded
    * two-row DP over the remainders — only cells within ±k of the
    * diagonal are computed, and the column exits early when the band's
    * minimum exceeds k (every later cell is ≥ some cell of the current
    * column along its diagonal, so the threshold can never be met
    * again). Distances count CODE POINTS, matching the built-in
    * `levenshtein` and DuckDB's.
    */
  def levWithin(a: UTF8String, b: UTF8String, k0: Int): Int = {
    val xa = a.getBytes
    val xb = b.getBytes
    val na = xa.length
    val nb = xb.length
    // Distance never exceeds the longer length (in code points ≤ in
    // bytes), so clamping k to the byte length loses nothing and keeps
    // `inf = k + 1` below overflow-free for any caller-supplied k
    // (lev_within is SQL-registered — k arrives unvalidated).
    val maxLen = if (na > nb) na else nb
    val k = if (k0 > maxLen) maxLen else k0
    // common prefix (bytes), then back up to a code point boundary:
    // prefixes are byte-identical so boundaries coincide below lo
    var lo = 0
    val minLen = if (na < nb) na else nb
    while (lo < minLen && xa(lo) == xb(lo)) lo += 1
    while (lo > 0 && ((lo < na && (xa(lo) & 0xc0) == 0x80) ||
        (lo < nb && (xb(lo) & 0xc0) == 0x80))) lo -= 1
    // common suffix (bytes), not crossing the prefix; then forward to a
    // code point boundary in BOTH remainders
    var hi = 0
    while (hi < minLen - lo && xa(na - 1 - hi) == xb(nb - 1 - hi)) hi += 1
    while (hi > 0 && (((xa(na - hi) & 0xc0) == 0x80) ||
        ((xb(nb - hi) & 0xc0) == 0x80))) hi -= 1
    val s = decode(xa, lo, na - hi)
    val t = decode(xb, lo, nb - hi)
    val (u, v) = if (s.length <= t.length) (s, t) else (t, s)
    val n = u.length
    val m = v.length
    if (m - n > k) return -1
    if (n == 0) return m // m - n = m <= k here
    val inf = k + 1
    val d = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { d(i) = if (i <= k) i else inf; i += 1 }
    var j = 1
    while (j <= m) {
      val bandLo = if (j - k > 1) j - k else 1
      val bandHi = if (j + k < n) j + k else n
      // d(bandLo-1) still holds column j−1's value: bandLo−1 ≥ (j−1)−k,
      // i.e. inside the previous column's band
      var prevDiag = if (bandLo == 1) d(0) else d(bandLo - 1)
      var above = inf
      if (bandLo == 1) {
        d(0) = if (j <= k) j else inf
        above = d(0)
      }
      var rowMin = above
      val tj = v(j - 1)
      i = bandLo
      while (i <= bandHi) {
        // old d(i) = d[i][j−1]; outside the previous band when i = j+k
        val up = if (i > j - 1 + k) inf else d(i)
        var cell = prevDiag + (if (u(i - 1) == tj) 0 else 1)
        if (up + 1 < cell) cell = up + 1
        if (above + 1 < cell) cell = above + 1
        if (cell > inf) cell = inf
        d(i) = cell
        above = cell
        if (cell < rowMin) rowMin = cell
        prevDiag = up
        i += 1
      }
      if (rowMin > k) return -1
      j += 1
    }
    if (d(n) <= k) d(n) else -1
  }

  /** Code points of bytes [from, until) packed one per int (lead byte
    * length–driven; equality on packed values ≡ equality on code points
    * for valid UTF-8, which is all this DP needs).
    */
  private def decode(x: Array[Byte], from: Int, until: Int): Array[Int] = {
    val out = new Array[Int](until - from)
    var n = 0
    var i = from
    while (i < until) {
      val c = x(i) & 0xff
      val len =
        if (c < 0x80) 1
        else if (c < 0xe0) 2
        else if (c < 0xf0) 3
        else 4
      var cp = c
      var j = 1
      while (j < len && i + j < until) { cp = (cp << 8) | (x(i + j) & 0xff); j += 1 }
      out(n) = cp
      n += 1
      i += len
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }
}
