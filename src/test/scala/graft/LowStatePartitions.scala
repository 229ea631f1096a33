package graft

import org.scalatest.BeforeAndAfterAll

/** Test-speed mixin for state-heavy suites (round 21, VERDICT r20
  * item 1): pin `spark.sql.shuffle.partitions` low for the suite and
  * restore it afterwards.
  *
  * Why: the shared test session inherits the bench's 32 shuffle
  * partitions, and every STATEFUL STREAMING operator opens/commits
  * one state store PER PARTITION PER MICRO-BATCH — a 3-batch windowed
  * aggregate costs ~100 HDFSBackedStateStore round trips at 32
  * partitions for a handful of rows (the state-store WARN spam that
  * dominated the r20 driver test tail and blew its time budget).
  * Lowering partitions changes NOTHING these suites assert — every
  * assertion is value-based; parallelism and file layout are not part
  * of any contract here — and the bench/Verify paths build their own
  * sessions, so shipped behavior is untouched.
  *
  * Suites run sequentially in the forked test JVM
  * (`Test / testForkedParallel` is false), so the set/restore pair
  * cannot race another suite.
  */
trait LowStatePartitions extends SparkSpec with BeforeAndAfterAll {
  private var prev: Option[String] = None

  override protected def beforeAll(): Unit = {
    prev = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    super.beforeAll()
  }

  override protected def afterAll(): Unit =
    try super.afterAll()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
      case None => spark.conf.unset("spark.sql.shuffle.partitions")
    }
}
