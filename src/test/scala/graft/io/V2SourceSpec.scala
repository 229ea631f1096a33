package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DataSourceV2 sensor-topic connector: parallel file partitions,
  * column pruning, reader-side filter pushdown, malformed-line drop. */
class V2SourceSpec extends SparkSpec with graft.LowStatePartitions {

  private val Fmt = "graft.io.v2.SensorJsonSource"

  private def writeTopic(): String = {
    val dir = Files.createTempDirectory("v2src").toString
    Files.writeString(Paths.get(dir, "part-0.jsonl"),
      """{"timestamp":"2025-01-01T10:00:00","machine_id":"CNC-001","sensor_type":"temperature","value":85.5}
        |{"timestamp":"2025-01-01T10:00:05","machine_id":"LATHE-002","sensor_type":"vibration","value":1.5}
        |not json at all {{{
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "part-1.jsonl"),
      """{"timestamp":"2025-01-01T10:00:10","machine_id":"CNC-001","sensor_type":"pressure","value":150.0}
        |{"machine_id":"WELD-004"}
        |""".stripMargin)
    dir
  }

  test("reads the envelope, drops malformed lines, one partition per file") {
    val dir = writeTopic()
    val df = spark.read.format(Fmt).load(dir)
    assert(df.schema.fieldNames.toSeq ===
      Seq("timestamp", "machine_id", "sensor_type", "value"))
    val rows = df.collect()
    assert(rows.length === 4) // 3 complete + 1 partial object; junk line dropped
    assert(df.rdd.getNumPartitions === 2)
    val weld = rows.find(_.getString(1) == "WELD-004").get
    assert(weld.isNullAt(0) && weld.isNullAt(3)) // missing fields → NULL (D1)
  }

  test("column pruning reaches the scan") {
    val dir = writeTopic()
    val df = spark.read.format(Fmt).load(dir).select(col("machine_id"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.output.map(_.name) === Seq("machine_id"))
    assert(df.collect().map(_.getString(0)).sorted ===
      Array("CNC-001", "CNC-001", "LATHE-002", "WELD-004"))
  }

  test("equality filter pushes into the reader; no post-scan Filter remains") {
    val dir = writeTopic()
    val df = spark.read.format(Fmt).load(dir)
      .filter(col("machine_id") === "CNC-001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"filter should be fully pushed:\n$plan")
    assert(df.count() === 2)
    // a predicate the source rejects stays as a Spark-side Filter
    val mixed = spark.read.format(Fmt).load(dir).filter(col("value") > 100)
    assert(mixed.queryExecution.executedPlan.toString.contains("Filter"))
    assert(mixed.count() === 1)
  }

  test("micro-batch stream: new segment files become new batches; restart resumes from offsets") {
    val dir = writeTopic() // part-0, part-1 exist up front
    val ckpt = Files.createTempDirectory("v2ckpt").toString
    val outDir = Files.createTempDirectory("v2out").toString + "/t"

    // file sink: supports checkpoint recovery (memory sink does not),
    // and makes the exactly-once claim checkable by row count.
    def start() = spark.readStream.format(Fmt).load(dir)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    def outCount(): Long = spark.read.parquet(outDir).count()

    val q = start()
    try {
      q.processAllAvailable()
      assert(outCount() === 4) // both initial segments
      // a new segment appended by the producer → exactly one new batch
      Files.writeString(Paths.get(dir, "part-2.jsonl"),
        """{"timestamp":"2025-01-01T10:01:00","machine_id":"CNC-001","sensor_type":"temperature","value":86.0}
          |""".stripMargin)
      q.processAllAvailable()
      assert(outCount() === 5)
    } finally q.stop()

    // restart from the checkpoint: offsets resume — the already-committed
    // segments are NOT re-emitted (exactly-once into the file sink),
    // and the segment written while the query was down is picked up.
    Files.writeString(Paths.get(dir, "part-3.jsonl"),
      """{"timestamp":"2025-01-01T10:02:00","machine_id":"WELD-004","sensor_type":"pressure","value":151.0}
        |""".stripMargin)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(outCount() === 6)
      // exactly the down-time segment's row arrived (the field-less
      // WELD-004 row from part-1 was already committed pre-restart)
      assert(spark.read.parquet(outDir)
        .filter(col("value") === 151.0).count() === 1)
    } finally q2.stop()
  }

  test("V2 write: two-phase commit lands whole segments, round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("v2write").toString + "/topic"
    Files.createDirectories(Paths.get(dir))
    val rows = Seq(
      ("2025-01-01T10:00:00", "CNC-001", "temperature", 85.5),
      ("2025-01-01T10:00:05", "LATHE-002", "vibration", 1.5),
      (null, "WELD-004", "pressure", 150.0))
      .toDF("timestamp", "machine_id", "sensor_type", "value")
    rows.repartition(2).write.format(Fmt).mode("append").save(dir)

    // no staging residue after driver commit
    val leftover = java.nio.file.Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(!leftover.exists(_.contains(".staging-")), leftover.mkString(","))
    assert(leftover.count(_.endsWith(".jsonl")) === 2) // one segment per task

    // round-trip through the read side of the same connector
    val back = spark.read.format(Fmt).load(dir)
    assert(back.count() === 3)
    val weld = back.filter(col("machine_id") === "WELD-004").head()
    assert(weld.isNullAt(0) && weld.getDouble(3) === 150.0)
  }

  test("V2 write: a second append from a fresh write never clobbers segments") {
    import spark.implicits._
    val dir = Files.createTempDirectory("v2append").toString + "/topic"
    Files.createDirectories(Paths.get(dir))
    def append(tag: String): Unit =
      Seq(("2025-01-01T10:00:00", tag, "temperature", 1.0))
        .toDF("timestamp", "machine_id", "sensor_type", "value")
        .coalesce(1).write.format(Fmt).mode("append").save(dir)
    append("FIRST"); append("SECOND")
    val back = spark.read.format(Fmt).load(dir)
    // both appends survive — segment names can't collide across writes
    assert(back.count() === 2)
    assert(back.select("machine_id").collect().map(_.getString(0)).sorted
      === Array("FIRST", "SECOND"))
  }

  test("V2 write commits monotone segment names — appends sort after every existing file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("v2mono").toString + "/topic"
    Files.createDirectories(Paths.get(dir))
    // pre-existing producer files with arbitrary names (one sorting
    // ABOVE the connector's seg- prefix — the adversarial case)
    Files.writeString(Paths.get(dir, "part-0.jsonl"),
      """{"timestamp":"2025-01-01T10:00:00","machine_id":"A","sensor_type":"t","value":1.0}
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "zzz-manual.jsonl"),
      """{"timestamp":"2025-01-01T10:00:01","machine_id":"B","sensor_type":"t","value":2.0}
        |""".stripMargin)
    def names(): Seq[String] =
      java.nio.file.Files.list(Paths.get(dir)).toArray.map(_.toString)
        .map(p => Paths.get(p).getFileName.toString)
        .filter(_.endsWith(".jsonl")).sorted.toSeq
    val before = names()
    def append(tag: String): Unit =
      Seq(("2025-01-01T10:01:00", tag, "temperature", 3.0))
        .toDF("timestamp", "machine_id", "sensor_type", "value")
        .coalesce(1).write.format(Fmt).mode("append").save(dir)
    append("C"); append("D")
    val after = names()
    val newNames = after.filterNot(before.contains)
    assert(newNames.size === 2)
    // the streaming-offset contract: every committed name sorts after
    // every file that existed at its commit time — a consumed
    // lexicographic boundary can never have a file inserted behind it.
    assert(newNames.forall(n => before.forall(_ < n)),
      s"new $newNames do not all sort after $before")
    // and the two appends are mutually ordered by commit sequence
    assert(newNames.sorted === newNames)
  }

  test("present-but-non-numeric value is a malformed line, not a 0.0 reading") {
    val dir = Files.createTempDirectory("v2badval").toString
    Files.writeString(Paths.get(dir, "part-0.jsonl"),
      """{"timestamp":"2025-01-01T10:00:00","machine_id":"OK-1","sensor_type":"t","value":5.5}
        |{"timestamp":"2025-01-01T10:00:01","machine_id":"BAD-1","sensor_type":"t","value":"abc"}
        |{"timestamp":"2025-01-01T10:00:02","machine_id":"STR-1","sensor_type":"t","value":"7.25"}
        |{"timestamp":"2025-01-01T10:00:03","machine_id":"OBJ-1","sensor_type":"t","value":{"x":1}}
        |{"timestamp":"2025-01-01T10:00:04","machine_id":"NUL-1","sensor_type":"t","value":null}
        |""".stripMargin)
    val rows = spark.read.format(Fmt).load(dir).collect()
    val byId = rows.map(r => r.getString(1) -> r).toMap
    // numeric and numeric-string parse (reference float() semantics);
    // non-numeric value drops the LINE; explicit null stays null.
    assert(byId.keySet === Set("OK-1", "STR-1", "NUL-1"))
    assert(byId("OK-1").getDouble(3) === 5.5)
    assert(byId("STR-1").getDouble(3) === 7.25)
    assert(byId("NUL-1").isNullAt(3))
    // projection does not change which lines survive
    assert(spark.read.format(Fmt).load(dir).select(col("machine_id")).count() === 3)
  }
}
