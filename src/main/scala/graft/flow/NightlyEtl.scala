package graft.flow

import scala.annotation.tailrec
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.io.{LakeSink, Source}
import graft.ops.Ingest

/** Nightly batch ETL + orchestration semantics — the reference's Task 4
  * (spark-jobs/timescale_to_deltalake.py) and Task 5 (Prefect flow,
  * spec-only: Lab_Assignment.pdf p.4).
  *
  * Flow (L1): check source conn → check lake conn → run job → verify
  * output counts. Retries 3× with 10 s delay (L2; the reference's own
  * retry precedent is the producer connect loop, ingest_data.py:43-55).
  * Schedulable entry point, cron-ready (L3 — 2:00 AM UTC in the spec).
  *
  * The extract is full-table per run with `overwrite` (K4, the
  * assignment's mandate); partitioning derives year/month/day from the
  * time column (K1). Dynamic partition overwrite keeps re-runs
  * idempotent AND cheap at scale — only partitions present in the
  * extract are rewritten.
  */
object NightlyEtl {

  final case class StageResult(name: String, rows: Long)

  /** Retry combinator (L2). */
  @tailrec
  def retry[T](n: Int, delay: FiniteDuration)(body: => T): T =
    Try(body) match {
      case Success(v) => v
      case Failure(e) if n > 1 =>
        System.err.println(s"[etl] stage failed (${e.getMessage}); " +
          s"retrying in ${delay.toSeconds}s (${n - 1} left)")
        Thread.sleep(delay.toMillis)
        retry(n - 1, delay)(body)
      case Failure(e) => throw e
    }

  /** One table's extract → transform → load → verify. */
  def runTable(
      spark: SparkSession,
      source: Source,
      sink: LakeSink,
      timeCol: String,
      retries: Int = 3,
      delay: FiniteDuration = 10.seconds): StageResult = {

    retry(retries, delay) {
      require(source.probe(spark), s"source probe failed: $source")
    }
    retry(retries, delay) {
      require(sink.probe(spark), s"sink probe failed: $sink")
    }
    val written = retry(retries, delay) {
      val extracted = source.read(spark)
      val partitioned = Ingest.withDateParts(extracted, col(timeCol))
      sink.write(partitioned)
      partitioned.count()
    }
    // post-write verification (L1 step 4): lake row count matches extract
    val inLake = sink.read(spark).count()
    require(inLake == written,
      s"verification failed: wrote $written rows, lake has $inLake")
    StageResult(sink.path, inLake)
  }
}
