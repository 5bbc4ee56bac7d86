package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import java.sql.Timestamp

/** Typed min/max time-bounds aggregator — the `Dataset` (typed) face of
  * the reference's per-file `df['TIME'].min()/.max()`
  * (createHarvestObsFileMeta.py:156-157; SURVEY §2.10 suggested typed
  * Aggregator). Usage:
  *
  * {{{
  * ds.groupByKey(_.file_name)
  *   .agg(TimeBoundsAggregator.onField(_.time).toColumn)
  * }}}
  *
  * Buffer is a pair of epoch-micros (Long.MaxValue/MinValue sentinels),
  * so partial aggregation merges are two comparisons — as cheap as the
  * untyped min/max pair, but usable where the pipeline is a typed
  * `Dataset[T]`.
  */
object TimeBoundsAggregator {

  final case class Bounds(minMicros: Long, maxMicros: Long) {
    def begin: Option[Timestamp] =
      if (minMicros == Long.MaxValue) None
      else Some(new Timestamp(minMicros / 1000))
    def end: Option[Timestamp] =
      if (maxMicros == Long.MinValue) None
      else Some(new Timestamp(maxMicros / 1000))
  }

  def onField[IN](time: IN => Option[Timestamp]): Aggregator[IN, Bounds, Bounds] =
    new Aggregator[IN, Bounds, Bounds] {
      override def zero: Bounds = Bounds(Long.MaxValue, Long.MinValue)
      override def reduce(b: Bounds, a: IN): Bounds = time(a) match {
        case Some(ts) =>
          val m = ts.getTime * 1000
          Bounds(math.min(b.minMicros, m), math.max(b.maxMicros, m))
        case None => b
      }
      override def merge(x: Bounds, y: Bounds): Bounds =
        Bounds(math.min(x.minMicros, y.minMicros), math.max(x.maxMicros, y.maxMicros))
      override def finish(b: Bounds): Bounds = b
      override def bufferEncoder: Encoder[Bounds] = Encoders.product[Bounds]
      override def outputEncoder: Encoder[Bounds] = Encoders.product[Bounds]
    }
}
