package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset-API aggregators (SURVEY §2.12's showcase UDAF).
  * `firstByOrd`/`lastByOrd` are the Aggregator formulation of ordered
  * first/last — the engine's hot paths use the codegen'd built-ins
  * min_by/max_by (Resample.ohlc); this is the typed face for
  * Dataset[T] pipelines and the fallback pattern for aggregations the
  * built-ins can't express. Both are commutative+associative (merge
  * order free), so they are safe under partial aggregation.
  */
object TypedAggs {

  final case class OrdVal(ord: Long, value: Double)

  val firstByOrd: Aggregator[OrdVal, OrdVal, Double] =
    new Aggregator[OrdVal, OrdVal, Double] {
      override def zero: OrdVal = OrdVal(Long.MaxValue, Double.NaN)
      override def reduce(b: OrdVal, a: OrdVal): OrdVal = if (a.ord < b.ord) a else b
      override def merge(x: OrdVal, y: OrdVal): OrdVal = if (x.ord <= y.ord) x else y
      override def finish(r: OrdVal): Double = r.value
      override def bufferEncoder: Encoder[OrdVal] = Encoders.product[OrdVal]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  val lastByOrd: Aggregator[OrdVal, OrdVal, Double] =
    new Aggregator[OrdVal, OrdVal, Double] {
      override def zero: OrdVal = OrdVal(Long.MinValue, Double.NaN)
      override def reduce(b: OrdVal, a: OrdVal): OrdVal = if (a.ord > b.ord) a else b
      override def merge(x: OrdVal, y: OrdVal): OrdVal = if (x.ord >= y.ord) x else y
      override def finish(r: OrdVal): Double = r.value
      override def bufferEncoder: Encoder[OrdVal] = Encoders.product[OrdVal]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Upper-triangular Gramian buffer: `d` the vector width (0 = still
    * empty), `tri` the d(d+1)/2 cells G[i][j] (i ≤ j) in row-major
    * order — cell (i,j) at index i·d − i(i−1)/2 + (j−i).
    */
  final case class GramTri(d: Int, tri: Array[Long])

  /** The d(d+1)/2-long triangle rides EVERY partial-aggregate buffer
    * and the driver collects d² doubles for the local eigen-solve —
    * tall-skinny PCA economics hold only while d is small. 2048 caps
    * the buffer at ~16 MB; past that the right tool is a sketched or
    * sharded-column method, so the aggregator fails fast on row one
    * instead of OOMing an executor mid-job.
    */
  val MaxGramianDim: Int = 2048

  /** Exact fixed-point GRAMIAN partial aggregate — the scale path for
    * [[graft.ops.Similarity.gramianFixedPoint]]: each input row (a
    * snapped ×scale integer vector) folds its d(d+1)/2 upper-triangular
    * outer products straight into a per-partition long array (n·d²
    * multiply-adds on primitive arrays, NO exploded rows, no hash-map
    * probes), and partitions merge by element-wise addition — one
    * partial-aggregate exchange moves exactly d(d+1)/2 longs per
    * partition no matter the corpus size.
    *
    * Overflow contract: cells accumulate through Math.addExact /
    * multiplyExact, so exceeding 2⁶³ THROWS (as DuckDB's HUGEINT cast
    * comparison would surface) instead of silently wrapping — at
    * scale 10³ and unit-norm vectors that bound allows ≳9·10¹² rows;
    * beyond it, shard the corpus and sum per-shard Gramians (exact
    * integer cells make the combination exact). Commutative +
    * associative (integer sums), safe under partial aggregation;
    * `reduce`/`merge` mutate and return their left buffer (the
    * documented Aggregator contract).
    */
  val gramian: Aggregator[Array[Long], GramTri, GramTri] =
    new Aggregator[Array[Long], GramTri, GramTri] {
      override def zero: GramTri = GramTri(0, Array.emptyLongArray)
      override def reduce(b: GramTri, c: Array[Long]): GramTri = {
        val d = c.length
        if (d == 0) return b
        require(d <= MaxGramianDim,
          s"gramian: vector width $d exceeds MaxGramianDim=$MaxGramianDim" +
            " — the triangle buffer would ride every partial aggregate;" +
            " use a sharded/sketched method for wide embeddings")
        val acc =
          if (b.d == 0) GramTri(d, new Array[Long](d * (d + 1) / 2)) else b
        require(acc.d == d,
          s"gramian: ragged vector widths (${acc.d} vs $d)")
        val tri = acc.tri
        var k = 0
        var i = 0
        while (i < d) {
          val ci = c(i)
          var j = i
          while (j < d) {
            tri(k) = Math.addExact(tri(k), Math.multiplyExact(ci, c(j)))
            k += 1; j += 1
          }
          i += 1
        }
        acc
      }
      override def merge(x: GramTri, y: GramTri): GramTri =
        if (x.d == 0) y
        else if (y.d == 0) x
        else {
          require(x.d == y.d,
            s"gramian: ragged vector widths (${x.d} vs ${y.d})")
          var k = 0
          while (k < x.tri.length) {
            x.tri(k) = Math.addExact(x.tri(k), y.tri(k)); k += 1
          }
          x
        }
      override def finish(r: GramTri): GramTri = r
      override def bufferEncoder: Encoder[GramTri] = Encoders.product[GramTri]
      override def outputEncoder: Encoder[GramTri] = Encoders.product[GramTri]
    }
}
