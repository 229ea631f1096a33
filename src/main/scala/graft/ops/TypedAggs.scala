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

  /** `sum` is exact decimal, not double: readings are fixed-point (2 dp
    * sensor values), so a decimal accumulator makes the fold order
    * irrelevant — partial/merge order across partitions can never shift
    * the average's last ulp (the engine's decimal-routed-sums oracle
    * convention, applied to the typed path). */
  case class Stats(sum: BigDecimal, min: Double, max: Double, count: Long) {
    def avg: Double = if (count == 0) Double.NaN else sum.toDouble / count

    /** Average rounded HALF_UP at 4 dp in EXACT decimal arithmetic —
      * rounding the double quotient instead is engine-dependent when
      * the true quotient lands exactly on a half (e.g. 563.81/8 =
      * 70.47625: the nearest double is *below* the half, so
      * binary-rounding engines emit 70.4762 while decimal-string
      * rounding emits 70.4763). */
    def avg4: Double =
      if (count == 0) Double.NaN
      else sum.bigDecimal
        .divide(java.math.BigDecimal.valueOf(count), 4, java.math.RoundingMode.HALF_UP)
        .doubleValue
  }

  object SensorStats extends Aggregator[SensorReading, Stats, Stats] {
    override def zero: Stats =
      Stats(BigDecimal(0), Double.PositiveInfinity, Double.NegativeInfinity, 0L)

    override def reduce(b: Stats, r: SensorReading): Stats =
      Stats(b.sum + BigDecimal.valueOf(r.value), math.min(b.min, r.value),
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
