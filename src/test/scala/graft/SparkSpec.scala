package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (UTC, small shuffle width). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkSpec.session
    // fail FAST with a diagnosis when the shared context was stopped
    // under us (r16: the test JVM began shutting down mid-suite and every
    // remaining test died inside operator internals with "cannot call
    // methods on a stopped SparkContext" — this names the real cause)
    if (s.sparkContext.isStopped)
      fail("shared SparkContext is stopped — the test JVM is shutting " +
        "down (timeout/kill?); remaining suites cannot run. See r16 " +
        "VERDICT item 2.")
    s
  }
  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
