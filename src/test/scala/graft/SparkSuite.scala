package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark
  * getOrCreate dedups across suites run in the same forked JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session
  def sf(name: String) = s"/root/testdata/$name"
}

object SparkSuite {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** A SECOND session on the same SparkContext with GraftExtensions
    * INSTALLED AT BUILD — the real deployment shape for the injected
    * analyzer rules (SQL DML, TVFs), which have no live-session
    * registration hook. Built once; the shared plain session is
    * restored as default so unrelated suites are untouched. */
  lazy val extSession: SparkSession = synchronized {
    val plain = session // force the shared session first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test-ext")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // withExtensions, NOT the spark.sql.extensions config: that conf
      // is STATIC and silently ignored when the SparkContext already
      // exists (this is the second session on the shared test context)
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(plain)
    SparkSession.setActiveSession(plain)
    s
  }
}
