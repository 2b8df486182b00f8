// Lives under org.apache.spark.sql for the same reason as
// CosineSimilarity.scala: the expression-extension surface is
// private[sql]; graft.functions re-exports the public face.
package org.apache.spark.sql.graftshim

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC / NFD /
  * NFKC / NFKD via `java.text.Normalizer` — JVM-public, no library).
  * Spark ships no built-in for this, and it is the FIRST text-pipeline
  * step exact dedup needs: "café" composed (U+00E9) and decomposed
  * (`e` + U+0301) are different byte strings with identical rendering,
  * so every fingerprint/shingle/suffix operator silently treats mirror
  * crawls of the same page as distinct until the corpus is normalized
  * to one form. Codegen'd (one static call, stays inside whole-stage
  * codegen) with an already-normalized fast path: `Normalizer
  * .isNormalized` is a scan without allocation, and real corpora are
  * overwhelmingly NFC already, so the common row pays no rewrite.
  */
case class UnicodeNorm(child: Expression, form: String)
  extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  require(UnicodeNormUtil.forms.contains(form),
    s"form must be one of ${UnicodeNormUtil.forms.keys.mkString("/")}, got $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormUtil.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graftshim.UnicodeNormUtil
         |  .normalize($c, "$form");""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNormUtil {
  val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
