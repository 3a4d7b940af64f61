package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local session for Spark-backed specs. */
trait SparkTestBase extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkTestBase.session

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestBase {
  /** One session per JVM — ScalaTest suites share it; sbt forks one JVM. */
  lazy val session: SparkSession = graft.core.GraftSession.local("graft-test", 8)
}
