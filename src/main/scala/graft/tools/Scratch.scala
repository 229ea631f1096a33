package graft.tools

import java.time.Instant
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    import s.implicits._
    val readings = graft.gen.DataGen.backfill(s, Instant.parse("2025-01-08T00:00:00Z"))
      .select(col("timestamp"), col("machine_id"), col("sensor_type"), col("value"))
      .as[graft.model.SensorReading]
    val typed = readings.groupByKey(r => (r.machine_id, r.sensor_type))
      .agg(graft.ops.TypedAggs.sensorStats).collect()
      .map { case ((m, st), x) => (m, st) -> (x.avg, x.min, x.max, x.count) }.toMap
    val untyped = readings.toDF().groupBy("machine_id", "sensor_type")
      .agg(avg("value"), min("value"), max("value"), count(lit(1))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    val mismatches = typed.keySet.count(k =>
      math.abs(typed(k)._1 - untyped(k)._1) > 1e-9 || typed(k)._4 != untyped(k)._4 ||
      typed(k)._2 != untyped(k)._2 || typed(k)._3 != untyped(k)._3)
    println(s"PROBE groups=${typed.size} mismatches_vs_untyped=$mismatches")
    println(s"PROBE sample temp avg=${typed(("CNC-001","temperature"))._1}")
    s.stop()
  }
}
