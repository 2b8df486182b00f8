package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-expression utilities. */
object Cols {

  /** Let-binding for column expressions: evaluate `value` once per row
    * and reference it many times in `body` via a lambda variable.
    *
    * Two failure modes this prevents, both real measured costs because
    * higher-order lambdas are interpreted (no codegen, no common
    * subexpression elimination):
    *  - Catalyst's projection collapse inlining an expensive column
    *    (md5 per element, a signature array) into every use site;
    *  - a lambda body referencing an enclosing expression subtree,
    *    which re-evaluates that subtree once per array element
    *    (O(n²) tokenization in shingling, 60× md5 in MinHash).
    */
  def bound(value: Column)(body: Column => Column): Column =
    transform(array(value), v => body(v)).getItem(0)
}
