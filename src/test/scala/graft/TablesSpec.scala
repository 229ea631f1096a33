package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins BOTH precision-normalization branches of [[Tables.events]]
  * regardless of which encoding the current driver corpus happens to
  * ship (a corpus flip must not land on an untested cast path).
  *
  * The NANOS fixture is a raw int64 `ts` column: under
  * `nanosAsLong=true` (GraftSession) a parquet TIMESTAMP(NANOS)
  * column surfaces with the SAME LongType schema, so the identity
  * branch is exercised exactly as the corpus would. The MICROS fixture
  * writes TIMESTAMP_NTZ, matching the driver's
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) shipments.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one pre-epoch, one epoch, one recent instant (micros precision)
  private val instantsUs = Seq(-1234567L, 0L, 1704067200123456L)

  private def writeFixtures(): String = {
    val dir = Files.createTempDirectory("graft-tables").toString
    instantsUs.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    instantsUs.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/micros/events.parquet")
    dir
  }

  test("events yields identical epoch-nanos longs for NANOS and MICROS shipments") {
    val dir = writeFixtures()
    def tsOf(sub: String): Seq[Long] = {
      val df = Tables.events(spark, s"$dir/$sub")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType, sub)
      df.select(col("ts")).as[Long].collect().toSeq.sorted
    }
    val expected = instantsUs.map(_ * 1000L).sorted
    assert(tsOf("nanos") == expected)
    assert(tsOf("micros") == expected)
  }

  test("events fails fast on the cast path under a non-UTC session timezone") {
    val dir = writeFixtures()
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Brussels")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, s"$dir/micros")
      }
      assert(e.getMessage.contains("UTC"))
      // the already-long NANOS path is offset-free — must still load
      assert(Tables.events(spark, s"$dir/nanos").count() == 3)
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }
}
