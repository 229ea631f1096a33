package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.SensorReading

/** Typed aggregation over `Dataset[SensorReading]` (SURVEY §1.3: typed
  * edges at the API boundary; §2 M reserves `Aggregator[IN,BUF,OUT]`
  * for custom aggregates).
  *
  * `SensorStats` folds the reference's F4 aggregate set (avg/min/max/
  * count) in one pass with an algebraic buffer — mergeable, so it runs
  * as partial+final aggregation exactly like the untyped built-ins, and
  * works in both `Dataset.groupByKey.agg` and streaming groupByKey.
  */
object TypedAggs {

  case class Stats(sum: Double, min: Double, max: Double, count: Long) {
    def avg: Double = if (count == 0) Double.NaN else sum / count
  }

  object SensorStats extends Aggregator[SensorReading, Stats, Stats] {
    override def zero: Stats =
      Stats(0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0L)

    override def reduce(b: Stats, r: SensorReading): Stats =
      Stats(b.sum + r.value, math.min(b.min, r.value),
        math.max(b.max, r.value), b.count + 1)

    override def merge(a: Stats, b: Stats): Stats =
      Stats(a.sum + b.sum, math.min(a.min, b.min),
        math.max(a.max, b.max), a.count + b.count)

    override def finish(b: Stats): Stats = b

    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** As a TypedColumn for `ds.groupByKey(...).agg(sensorStats)`. */
  def sensorStats: TypedColumn[SensorReading, Stats] = SensorStats.toColumn
}
