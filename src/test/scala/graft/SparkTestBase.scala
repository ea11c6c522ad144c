package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for e2e suites. local[4] is deliberately
  * multi-threaded so shuffle nondeterminism (the thing the order-restore
  * invariant defends against) actually occurs in tests. */
trait SparkTestBase extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for other suites in the same JVM (fork := true)
    super.afterAll()
  }
}
