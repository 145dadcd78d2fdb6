package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def assertSeqAlmost(actual: Seq[Option[Double]], expected: Seq[Option[Double]],
                      eps: Double = 1e-9): Unit = {
    assert(actual.length == expected.length, s"length: $actual vs $expected")
    actual.zip(expected).zipWithIndex.foreach {
      case ((Some(a), Some(e)), i) => assert(math.abs(a - e) <= eps, s"at $i: $a != $e\n$actual\n$expected")
      case ((a, e), i)             => assert(a == e, s"at $i: $a != $e\n$actual\n$expected")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table specs write catalog tables; keep them out of the
      // repo, and per-JVM: the in-memory catalog forgets tables across
      // runs while their directories persist (LOCATION_ALREADY_EXISTS)
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-test-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
