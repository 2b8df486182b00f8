package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference analytics — the RLHF data tier (reference
  * analog: none; the reference never ranks, but every preference
  * dataset a reward model trains on needs exactly this read): turn a
  * large table of duels (winner, loser) into per-item skill ratings
  * and per-pair agreement stats, entirely inside the engine.
  *
  * Determinism contract: the Bradley–Terry MM iteration (Hunter 2004)
  * runs in ×1e6 fixed point — every per-pair term and every rating
  * update is one integer floor division of exact integer sums, so a
  * fixed round count replays bit-for-bit in SQL with the rounds
  * unrolled (the logisticGd/kmeansTrain convention).
  *
  * Scale shape: the duel table is data-sized but collapses to the
  * item-pair matrix in ONE map-side-combinable aggregate; everything
  * after lives on the model-sized matrix (items², items bounded —
  * model identifiers, not documents), iterated on the driver exactly
  * like logisticGd's dims+1 weight collect. No per-duel work ever
  * repeats across rounds.
  */
object Preference {

  /** Collapse raw duels (winner, loser) to the directed win matrix
    * (i, j, wins) — the one data-sized pass every consumer shares.
    */
  def duelMatrix(duels: DataFrame, winner: Column,
                 loser: Column): DataFrame =
    duels.groupBy(winner.as("i"), loser.as("j"))
      .agg(count(lit(1)).as("wins"))

  /** BRADLEY–TERRY ratings via `rounds` minorization–maximization
    * steps from a flat 1e6 start: with N_ij = duels between i and j
    * and W_i = total wins of i,
    *   π'_i = ⌊W_i·1e12 / Σ_j ⌊N_ij·1e12/(π_i + π_j)⌋⌋   (micro).
    * Undefeated (or winless) items stay meaningful: W_i = 0 pins the
    * rating to 0; an item with no duels at all never appears (it has
    * no matrix row). Items must be a BOUNDED model-sized set — the
    * matrix collects to the driver once and each round is O(items²)
    * driver arithmetic (the bounded-collect precedent of
    * [[LinearModel.logisticGd]]'s weight vector).
    * Output: (item, wins, duels, rating_micro) after `rounds`.
    */
  def bradleyTerry(duels: DataFrame, winner: Column, loser: Column,
                   rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = duels.sparkSession
    import spark.implicits._
    val wm = duelMatrix(duels, winner, loser)
      .select(col("i").cast("string"), col("j").cast("string"),
        col("wins"))
      .as[(String, String, Long)].collect()
    val undirected = wm.map { case (i, j, w) =>
      (if (i <= j) (i, j) else (j, i)) -> w
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val winsOf = wm.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._3).sum
    }
    val duelsOf = undirected.toSeq
      .flatMap { case ((i, j), n) => Seq(i -> n, j -> n) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val items = duelsOf.keys.toSeq.sorted
    var pi = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      pi = items.map { it =>
        val denom = undirected.iterator.collect {
          case ((a, b), n) if a == it || b == it =>
            val other = if (a == it) b else a
            BigInt(n) * BigInt(1000000000000L) / (pi(it) + pi(other))
        }.sum
        val w = winsOf.getOrElse(it, 0L)
        it -> (if (denom == 0) 1000000L
               else (BigInt(w) * BigInt(1000000000000L) / denom).toLong)
      }.toMap
    }
    items.map { it =>
      (it, winsOf.getOrElse(it, 0L), duelsOf(it), pi(it))
    }.toDF("item", "wins", "duels", "rating_micro")
  }
}
