package graft.stream

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state via `flatMapGroupsWithState` (SURVEY §2 J
  * extension surface; the reference has no stateful op beyond windows,
  * but an IIoT pipeline's canonical custom-state need is anomaly-run
  * detection: "alert when a sensor is out of range for N consecutive
  * readings").
  *
  * State per (machine_id, sensor_type): the open run of out-of-range
  * readings. A run closes (and emits an alert) when an in-range reading
  * arrives after ≥ minRun anomalous ones. State is O(keys) — bounded by
  * the dimension cardinality, not the stream length.
  */
object Stateful {

  case class Keyed(
      machine_id: String, sensor_type: String, tus: Long, value: Double)

  case class RunState(count: Int, startUs: Long, lastUs: Long)

  case class AnomalyAlert(
      machine_id: String, sensor_type: String,
      run_length: Int, start_us: Long, end_us: Long)

  /** @param lo/hi inclusive in-range bounds per reading value
    * @param minRun emit when a closed run has at least this many readings */
  def anomalyRuns(
      spark: SparkSession,
      readings: Dataset[Keyed],
      lo: Double, hi: Double, minRun: Int): Dataset[AnomalyAlert] = {
    import spark.implicits._
    readings
      .groupByKey(r => (r.machine_id, r.sensor_type))
      .flatMapGroupsWithState[RunState, AnomalyAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), rows: Iterator[Keyed], state: GroupState[RunState]) =>
          val (m, st) = key
          // micro-batch rows arrive unordered within the group
          val sorted = rows.toSeq.sortBy(_.tus)
          var cur = state.getOption
          val alerts = Seq.newBuilder[AnomalyAlert]
          sorted.foreach { r =>
            val anomalous = r.value < lo || r.value > hi
            cur match {
              case Some(run) if anomalous =>
                cur = Some(RunState(run.count + 1, run.startUs, r.tus))
              case Some(run) =>
                if (run.count >= minRun)
                  alerts += AnomalyAlert(m, st, run.count, run.startUs, run.lastUs)
                cur = None
              case None if anomalous =>
                cur = Some(RunState(1, r.tus, r.tus))
              case None => ()
            }
          }
          cur match {
            case Some(run) => state.update(run)
            case None      => state.remove()
          }
          alerts.result().iterator
      }
  }

  /** The same detector on Spark 4's `transformWithState` — the
    * successor arbitrary-state API: typed `ValueState` handles instead
    * of one opaque state object, per-state TTL, timers, and RocksDB-only
    * backing (the API is built for state that outgrows the heap). Kept
    * alongside [[anomalyRuns]] so both stateful surfaces are exercised;
    * StatefulSpec asserts they produce identical alerts.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`. */
  class AnomalyRunProcessor(lo: Double, hi: Double, minRun: Int)
      extends StatefulProcessor[(String, String), Keyed, AnomalyAlert] {
    @transient private var run: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      run = getHandle.getValueState[RunState](
        "run", Encoders.product[RunState], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[Keyed],
        timerValues: TimerValues): Iterator[AnomalyAlert] = {
      val (m, st) = key
      val sorted = rows.toSeq.sortBy(_.tus)
      var cur = if (run.exists()) Some(run.get()) else None
      val alerts = Seq.newBuilder[AnomalyAlert]
      sorted.foreach { r =>
        val anomalous = r.value < lo || r.value > hi
        cur match {
          case Some(open) if anomalous =>
            cur = Some(RunState(open.count + 1, open.startUs, r.tus))
          case Some(open) =>
            if (open.count >= minRun)
              alerts += AnomalyAlert(m, st, open.count, open.startUs, open.lastUs)
            cur = None
          case None if anomalous =>
            cur = Some(RunState(1, r.tus, r.tus))
          case None => ()
        }
      }
      cur match {
        case Some(open) => run.update(open)
        case None       => run.clear()
      }
      alerts.result().iterator
    }
  }

  /** [[anomalyRuns]] via `transformWithState` (see [[AnomalyRunProcessor]]). */
  def anomalyRunsTws(
      spark: SparkSession,
      readings: Dataset[Keyed],
      lo: Double, hi: Double, minRun: Int): Dataset[AnomalyAlert] = {
    import spark.implicits._
    readings
      .groupByKey(r => (r.machine_id, r.sensor_type))
      .transformWithState(new AnomalyRunProcessor(lo, hi, minRun),
        TimeMode.None(), OutputMode.Append())
  }
}
