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
  lazy val session: SparkSession = {
    // test runs build serving artifacts (p7 model, s9 index) under a
    // per-JVM temp root, so `sbt test` can never clobber the artifact a
    // concurrently-running driver gate is reading (ADVICE r12)
    System.setProperty("graft.artifacts.root",
      java.nio.file.Files.createTempDirectory("graft_test_artifacts")
        .toString)
    graft.core.GraftSession.local("graft-test", 8)
  }
}
