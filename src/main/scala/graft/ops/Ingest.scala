package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Message decode/encode + scalar projections from the ingestion path
  * (SURVEY §2 C1-C7, D1).
  *
  * Reference behavior: the producer emits JSON envelopes
  * `{timestamp, machine_id, sensor_type, value}` with an ISO-8601
  * 'T'-separated timestamp string (`ingestion/ingest_data.py:63-73`);
  * the stream job decodes them leniently (malformed → dropped, missing
  * fields → NULL; `flink-jobs/sensor_aggregation.py:30-32`) and computes
  * event time via `TO_TIMESTAMP(REPLACE(ts,'T',' '))`
  * (`sensor_aggregation.py:22`).
  *
  * All pure codegen'd built-ins — no UDFs (SURVEY §2 M: zero custom
  * expressions needed for parity).
  */
object Ingest {

  /** Envelope schema (FIXTURES.md §A1). Explicit — never inferSchema. */
  val MessageSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("machine_id", StringType),
    StructField("sensor_type", StringType),
    StructField("value", DoubleType)
  ))

  /** C7 encode: row → JSON envelope string (producer side). */
  def encode(df: DataFrame): DataFrame =
    df.select(
      col("machine_id").as("key"),
      to_json(struct(
        date_format(col("event_time"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("timestamp"),
        col("machine_id"), col("sensor_type"), col("value"))).as("value"))

  /** C7/D1 decode: JSON string column → typed columns; malformed rows
    * dropped, missing fields NULL — exactly the reference's
    * `ignore-parse-errors` / `fail-on-missing-field=false` semantics.
    *
    * Spark's PERMISSIVE `from_json` yields an all-NULL struct (not a
    * NULL struct) on parse failure, so "malformed" is detected via the
    * corrupt-record column, not `isNotNull`. */
  def decode(df: DataFrame, json: Column): DataFrame = {
    val withCorrupt = MessageSchema.add("_corrupt", StringType)
    df.withColumn("msg",
        from_json(json, withCorrupt,
          Map("columnNameOfCorruptRecord" -> "_corrupt")))
      .filter(col("msg").isNotNull && col("msg._corrupt").isNull)
      .select(col("msg.*")).drop("_corrupt")
  }

  /** C1 event-time projection: ISO-8601 'T'-separated string → timestamp.
    * Keeps the reference's REPLACE form for semantic fidelity (Spark
    * parses ISO-8601 natively, but the contract is the expression). */
  def withEventTime(df: DataFrame, tsString: Column): DataFrame =
    df.withColumn("event_time",
      to_timestamp_ntz(regexp_replace(tsString, "T", " ")))

  /** C3 date-part derivation for partitioned lake writes
    * (`spark-jobs/timescale_to_deltalake.py:36`). */
  def withDateParts(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
}
