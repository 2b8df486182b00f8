package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi joins re-expressed as equi-joins so they scale.
  *
  * Spark plans a bare `p.t BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits a broadcast) — O(|points|·|intervals|) work that simply does
  * not finish at warehouse scale. Bucketing both sides on a coarse
  * grid turns the range predicate into an equi-join key: candidate
  * pairs are generated only inside a bucket, and the exact predicate
  * filters inside the (tiny) block, the same blocking idea as
  * `Text.fuzzyJoin`.
  */
object Joins {

  /** Range (point-in-interval) join: rows of `points` whose integral
    * column `pt` falls in `[lo, hi]` of a row of `intervals`,
    * inclusive both ends. Returns `points.columns ++
    * intervals.columns` for every matching pair, each pair exactly
    * once.
    *
    * Mechanics: a point lives in ONE grid cell `floor(pt/W)`; an
    * interval is exploded to every cell its `[lo, hi]` span overlaps
    * (`span/W + 1` rows, ≥1 even for empty/inverted intervals, which
    * then match nothing). The equi-join on the cell id meets each
    * (point, interval) pair in exactly the point's cell — no
    * post-join dedup — and the exact `between` runs only inside the
    * block.
    *
    * Scale shape: ONE shuffle per side on the cell id; the point side
    * never expands. Pick `bucketWidth` near the MEDIAN interval span:
    * the interval side then replicates ~2×, and a cell holds
    * ~(points-per-width) candidates. Too-small W blows up the
    * interval explode; too-big W degenerates toward all-pairs inside
    * one cell. Dense hot cells (every point in one day) are ordinary
    * aggregate-join skew — AQE skew-join or `Skew.saltedJoin` on the
    * cell id composes on top, because the cell id is just an ordinary
    * join key. `pt`/`lo`/`hi` must be integral (days, epoch seconds,
    * …); floor semantics make negative values land in the right cell.
    *
    * Column names must be disjoint across the two inputs (same
    * contract as Spark's own join with a column-name clash — callers
    * project first).
    */
  def rangeJoin(points: DataFrame, ptCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names")
    // EXACT integer floor-division: `floor(c / w)` routes through
    // double division and loses exactness past 2^53 — epoch micros or
    // nanos (which the integral-domain contract invites) would land
    // points in the WRONG cell and silently drop matches. Subtracting
    // pmod first makes the dividend an exact multiple (pmod ≥ 0 also
    // fixes negative-value flooring), and the decimal(38,0) divide is
    // exact at any long magnitude; cast back truncates nothing.
    def cellOf(c: org.apache.spark.sql.Column) = {
      val cl = c.cast("long")
      ((cl.cast("decimal(38,0)") - pmod(cl, lit(bucketWidth))) /
        lit(bucketWidth)).cast("long")
    }
    val p = points.withColumn("__cell", cellOf(col(ptCol)))
    val i = intervals.withColumn("__cell",
      explode(sequence(cellOf(col(loCol)),
        greatest(cellOf(col(hiCol)), cellOf(col(loCol))))))
    p.join(i, Seq("__cell"))
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__cell")
  }

  /** Interval×interval OVERLAP join: pairs (a, b) with
    * `[loA, hiA] ∩ [loB, hiB] ≠ ∅` (inclusive ends), each pair exactly
    * once. The genuinely-two-sided sibling of [[rangeJoin]]: both
    * sides explode to their covered grid cells, the equi-join on the
    * cell id generates candidates, and the exact overlap predicate
    * (`loA ≤ hiB && loB ≤ hiA`) verifies inside the block.
    *
    * Dedup without a distinct: an overlapping pair co-occurs in every
    * cell their spans share, so the join keeps only the canonical
    * meeting cell — the one holding `max(loA, loB)`, the start of the
    * overlap, which both sides necessarily cover. One row per true
    * pair, no post-join shuffle.
    *
    * Scale shape: each side replicates ~span/W + 1; candidate volume
    * is Σ_cell |A_cell|·|B_cell| — the same skew surface as
    * [[rangeJoin]] (AQE/salting composes on the cell key). Both
    * bounds must be integral; column names disjoint.
    */
  def intervalOverlapJoin(a: DataFrame, loACol: String, hiACol: String,
                          b: DataFrame, loBCol: String, hiBCol: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "the two interval frames must not share column names")
    def cellOf(c: org.apache.spark.sql.Column) = {
      val cl = c.cast("long")
      ((cl.cast("decimal(38,0)") - pmod(cl, lit(bucketWidth))) /
        lit(bucketWidth)).cast("long")
    }
    def exploded(df: DataFrame, lo: String, hi: String, cell: String) =
      df.withColumn(cell,
        explode(sequence(cellOf(col(lo)),
          greatest(cellOf(col(hi)), cellOf(col(lo))))))
    val ea = exploded(a, loACol, hiACol, "__cell")
    val eb = exploded(b, loBCol, hiBCol, "__cellb")
    ea.join(eb, col("__cell") === col("__cellb"))
      .filter(col(loACol) <= col(hiBCol) && col(loBCol) <= col(hiACol) &&
        col("__cell") === cellOf(greatest(col(loACol), col(loBCol))))
      .drop("__cell", "__cellb")
  }

  /** BROADCAST-vs-SHUFFLE join advisor from SNAPSHOT manifests — the
    * planning read a pipeline makes before joining two governed
    * tables: row counts come from manifest stats (no scan), the
    * smaller side broadcasts when it fits under `thresholdRows`,
    * otherwise both sides shuffle. Output one row: (rows_a, rows_b,
    * shuffle_rows — what the shuffle strategy would move — and
    * strategy ∈ {broadcast_a, broadcast_b, shuffle}).
    */
  def broadcastAdvisor(spark: org.apache.spark.sql.SparkSession,
                       tableA: String, tableB: String,
                       thresholdRows: Long): DataFrame = {
    import spark.implicits._
    def rowsOf(t: String): Long = {
      val v = graft.sources.Snapshot.latestVersion(t).getOrElse(
        throw new IllegalArgumentException(s"$t has no snapshot"))
      val m = graft.sources.Snapshot.readManifest(t, v)
      m.dirs.flatMap(m.stats.get).map(_.rows).sum
    }
    val (ra, rb) = (rowsOf(tableA), rowsOf(tableB))
    val strategy =
      if (ra <= thresholdRows && ra <= rb) "broadcast_a"
      else if (rb <= thresholdRows) "broadcast_b"
      else "shuffle"
    Seq((ra, rb, ra + rb, strategy))
      .toDF("rows_a", "rows_b", "shuffle_rows", "strategy")
  }
}
