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
}
