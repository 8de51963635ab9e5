package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Shared local session for suites (getOrCreate → one JVM-wide
  * session; never stopped so suites can run in any order).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test", 4)

  def tmpDir(prefix: String = "graft-test"): String =
    Files.createTempDirectory(prefix).toString
}
