package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("decode drops malformed JSON, keeps missing fields as NULL (D1)") {
    val raw = Seq(
      """{"timestamp":"2025-11-20T10:00:00.123456","machine_id":"CNC-001","sensor_type":"temperature","value":87.42}""",
      """{"machine_id":"LATHE-002","value":1.5}""", // missing fields → NULL
      """not json at all{{{"""                      // malformed → dropped
    ).toDF("json")
    val out = Ingest.decode(raw, col("json"))
    assert(out.count() == 2)
    val row = out.filter(col("machine_id") === "LATHE-002").head()
    assert(row.isNullAt(row.fieldIndex("timestamp")))
    assert(row.isNullAt(row.fieldIndex("sensor_type")))
    assert(row.getDouble(row.fieldIndex("value")) == 1.5)
  }

  test("encode → decode round-trips the envelope (C7)") {
    val src = Seq(("CNC-001", "temperature", 87.42, "2025-11-20T10:00:00.123456"))
      .toDF("machine_id", "sensor_type", "value", "ts_str")
      .withColumn("event_time", to_timestamp_ntz(regexp_replace(col("ts_str"), "T", " ")))
    val encoded = Ingest.encode(src)
    assert(encoded.select("key").as[String].head() == "CNC-001")
    val decoded = Ingest.decode(encoded, col("value"))
    val r = decoded.head()
    assert(r.getString(r.fieldIndex("machine_id")) == "CNC-001")
    assert(r.getString(r.fieldIndex("timestamp")) == "2025-11-20T10:00:00.123456")
    assert(r.getDouble(r.fieldIndex("value")) == 87.42)
  }

  test("event-time parse handles the 'T' separator via REPLACE (C1)") {
    val df = Seq("2025-11-20T10:30:45").toDF("iso")
    val out = Ingest.withEventTime(df, col("iso"))
      .select(date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(out == "2025-11-20 10:30:45")
  }

  test("date-part derivation matches the lake partition layout (C3)") {
    val df = Seq("2025-11-20T10:30:45").toDF("iso")
    val out = Ingest.withDateParts(
      Ingest.withEventTime(df, col("iso")), col("event_time"))
    val r = out.select("year", "month", "day").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2025, 11, 20)))
  }
}
