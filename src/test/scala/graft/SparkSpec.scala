package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared lazy SparkSession for all suites (one JVM, sequential suites —
  * getOrCreate returns the same session; stop() is left to JVM exit so
  * suites can't kill each other's session).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    Sessions.build(master = "local[4]", shufflePartitions = "4")

  /** Smallest fixture — tests must stay fast. */
  val sf: String = "/root/testdata/sf0.001"
}
