package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact frequent-items (heavy hitters) with bounded memory — the
  * vocabulary/URL/host frequency primitive of a corpus pipeline.
  */
object Frequent {

  /** Misra-Gries summary of one partition: every item whose partition
    * count exceeds n_p/(k+1) survives in the k-counter map (the
    * classical guarantee; decrement-all is amortized O(1) per input).
    */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      m.get(x) match {
        case Some(c) => m.update(x, c + 1)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          val dead = List.newBuilder[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1)
          }
          dead.result().foreach(m.remove)
      }
    }
    m.keysIterator
  }

  /** All items of `item` whose exact global frequency is ≥ num/den
    * (count·den ≥ N·num, all-integer), with their exact counts —
    * output (item, cnt). Nulls are excluded from both the items and
    * the denominator N.
    *
    * Why not one `groupBy(item).count().filter(...)`? That shuffles
    * EVERY distinct item — correct, and what the DuckDB oracle does,
    * but at 100 TB the distinct set (URLs, hosts, n-grams) can exceed
    * the shuffle budget by orders of magnitude while the answer is a
    * handful of rows. This is the classical two-pass alternative with
    * memory bounded by k = den/num + 1 counters per partition:
    *
    *  1. candidate pass — per-partition Misra-Gries via
    *     `mapPartitions` (genuinely imperative per-partition state; no
    *     Expression equivalent). An item with global count ≥ N·num/den
    *     must exceed n_p/(k+1) in SOME partition: if it were dropped
    *     everywhere, its total would be ≤ Σ n_p/(k+1) = N/(k+1) <
    *     N·num/den (k+1 > den/num by construction) — pigeonhole. So
    *     the union of partition summaries (≤ partitions·k rows, no
    *     shuffle of the data itself) is a SUPERSET of the answer.
    *  2. verify pass — exact counts of candidates only: the candidate
    *     set rides back as a semi-join, so the groupBy shuffles only
    *     rows matching a candidate, then the all-integer threshold
    *     filters against the exact N.
    *
    * Memory bound, precisely: the candidate set is ≤ partitions·k
    * rows, NOT k — at num/den = 10⁻⁶ over 10⁴ partitions that is 10¹⁰,
    * far past any driver/broadcast budget. The semi-join therefore
    * broadcasts only while partitions·k stays comfortably inside a
    * broadcast (≤ 4M candidate rows) and falls back to a shuffled
    * semi-join beyond it — same result, the shuffle then carries the
    * candidate-matching rows instead of the whole map.
    *
    * False positives die in the verify pass; false negatives cannot
    * exist (step 1); the result is exact, not approximate. Two scans
    * of the input is the price of bounded memory — at PB scale, scans
    * are cheap and shuffles are not.
    */
  def heavyHitters(df: DataFrame, item: Column,
                   num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= num, "need a frequency 0 < num/den <= 1")
    val k = den / num + 1
    val items = df.select(item.cast("string").as("it"))
      .filter(col("it").isNotNull)
    val cands = items.as[String](Encoders.STRING)
      .mapPartitions(p => misraGries(p, k))(Encoders.STRING)
      .toDF("it").distinct()
    val total = items.agg(count(lit(1)).as("n_total"))
    val candSide =
      if (items.rdd.getNumPartitions.toLong * k <= 4000000L) broadcast(cands)
      else cands
    items.join(candSide, Seq("it"), "left_semi")
      .groupBy(col("it"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * den >= col("n_total") * num)
      .select(col("it").as("item"), col("cnt"))
  }
}
