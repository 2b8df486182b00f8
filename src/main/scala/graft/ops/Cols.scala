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

  /** A constant-valued single-partition window key that SURVIVES the
    * optimizer. The engine's bounded-table windows (bucket offsets,
    * m-row source tables, post-limit ranks) deliberately run in one
    * partition; leaving their partition spec empty makes WindowExec
    * log "No Partition Defined" on every execution, drowning the one
    * warning that WOULD signal an accidental data-sized global window.
    * A literal key doesn't help — constant folding strips foldable
    * partition expressions and the warning fires anyway — so this key
    * derives the constant from a data column: pmod(xxhash64(c), 1) is
    * 0 on every row but non-foldable. Execution is identical to the
    * empty spec (one hash partition, same global order); use ONLY on
    * frames documented to be bounded.
    */
  def onePartitionKey(c: Column): Column = pmod(xxhash64(c), lit(1))
}
