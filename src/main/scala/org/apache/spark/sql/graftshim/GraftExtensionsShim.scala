// Lives under org.apache.spark.sql because injectFunction's
// FunctionDescription members (ExpressionInfo constructors and the
// expression builders' types) sit behind private[sql] surfaces the
// public graft package cannot name.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The `spark.sql.extensions` injection body: registers every native
  * graft expression into the session's function registry at session
  * build time — the idiomatic cluster-deployment path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`), as opposed to
  * the session-local `NativeFunctions.register(spark)` call.
  */
object GraftExtensionsShim {
  def inject(ext: SparkSessionExtensions): Unit = {
    NativeFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // optimizer: unbounded levenshtein-vs-literal comparisons run the
    // banded early-exit kernel instead (graft.plans.BandedLevenshteinRule)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
  }

  /** Apply the injector to an EXISTING session's function registry —
    * what Spark's session builder does with the injected functions at
    * bootstrap. Used by specs: `spark.sql.extensions` is a STATIC conf,
    * so a suite-shared SparkContext can't exercise the --conf route
    * in-process.
    */
  def applyTo(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    inject(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}
