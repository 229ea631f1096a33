package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one SparkSession per suite (lazy), canonical
  * graft configs (UTC, nanosAsLong, AQE). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("graft-test")
  lazy val sf: String = "/root/testdata/sf0.001"
}
