package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints one JSON line {"metric":"total",...,"queries":{...}}.
  *
  * Reproducibility (round-1 lesson): queries share one JVM/session, so
  * any cached blocks a query leaks inflate every later query (the
  * round-1 bench read 720 s where fresh-session probes read ~90 s).
  * Between queries we clear BOTH the SQL cache catalog and every
  * persisted RDD (localCheckpoints, GraphX leftovers) — each query is
  * timed against a state-clean session. Failures are never silent: a
  * failed query is excluded from the total and reported under "failed".
  *
  * SPARK_GRAFT_BENCH_RUNS=n (default 3) times each query n times and
  * reports the per-query median. The default is 3, not 1, because this
  * machine is a shared VM: rounds 1 and 2 both recorded 720-752 s totals
  * for plans that measure ~42 s minutes later on a quiet window — a
  * single timed pass has no defense against an external CPU-contention
  * burst landing mid-run. Medians over three passes reject a one-pass
  * spike; the JSON additionally records /proc/loadavg at start and end
  * plus wall-vs-timed seconds, so a still-inflated run is
  * self-diagnosing (loadavg >> 32 ⇒ external load, not plan cost).
  * Per-query warm-up plans were tried and REGRESSED the timed loop
  * (doubling compiled plans pressures the JIT code cache); the single
  * generic warm-up below is deliberate.
  */
object Bench {
  private def clearAllState(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  /** First three /proc/loadavg fields (1/5/15-min run-queue averages). */
  private def loadavg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).mkString(",")
      finally src.close()
    } catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val loadStart = loadavg()
    val wall0 = System.nanoTime()
    val spark = GraftSession.local("graft-bench")
    // Generic warm-up only (session init, shuffle infra).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        clearAllState(spark)
        val t0 = System.nanoTime()
        val status =
          try { fn(spark, sfDir).count(); "ok" }
          catch { case t: Throwable => s"${t.getClass.getSimpleName}: ${t.getMessage}" }
        ((System.nanoTime() - t0) / 1e9, status)
      }
      val med = timed.map(_._1).sorted.apply((timed.size - 1) / 2)
      val status = timed.map(_._2).find(_ != "ok").getOrElse("ok")
      System.err.println(f"[bench] $name%-22s $med%8.2fs  ${if (status == "ok") "" else status}")
      (name, med, status)
    }
    clearAllState(spark)
    val loadEnd = loadavg()
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._3 != "ok")
      .map { case (k, _, s) => "\"" + k + "\":\"" + s.replace("\"", "'").take(120) + "\"" }
      .mkString("{", ",", "}")
    val total = results.filter(_._3 == "ok").map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,""" +
        s""""runs_per_query":$runs,"wall_sec":$wallSec,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd","sf":"$sfDir"}""")
    spark.stop()
  }
}
