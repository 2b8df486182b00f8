// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarity.scala: the expression-extension surface is
// private[sql]; graft.functions re-exports the public face.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: SET-intersection cardinality of two
  * long arrays — the candidate-verification kernel of the hashed
  * Jaccard joins, where `size(array_intersect(a, b))` builds a hash
  * set (boxed longs, one allocation churn per pair) for every one of
  * the hundreds of thousands of surviving candidate pairs. This
  * evaluates as copy → primitive `Arrays.sort` → one merge walk:
  * no boxing, no per-element hashing, whole-stage codegen.
  *
  * SET semantics exactly like `array_intersect`: duplicate values
  * count once (the merge walk skips equal runs on both sides), so the
  * result is value-identical to `size(array_intersect(a, b))` on any
  * input — the engine's shingle arrays are distinct by construction,
  * but the contract does not rely on it. Null elements are not
  * supported (shingle hashes are never null); null ARRAYS null out via
  * the standard nullSafeEval contract.
  */
case class IntersectCountLong(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes
  with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else {
        c += 1
        val v = x(i)
        while (i < x.length && x(i) == v) i += 1
        while (j < y.length && y(j) == v) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val v = ctx.freshName("v")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |java.util.Arrays.sort($x);
         |java.util.Arrays.sort($y);
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $x.length && $j < $y.length) {
         |  if ($x[$i] < $y[$j]) { $i++; }
         |  else if ($x[$i] > $y[$j]) { $j++; }
         |  else {
         |    $c++;
         |    long $v = $x[$i];
         |    while ($i < $x.length && $x[$i] == $v) { $i++; }
         |    while ($j < $y.length && $y[$j] == $v) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountLong =
    copy(left = newLeft, right = newRight)
}
