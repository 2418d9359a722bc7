package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Shared local SparkSession for suites (one per forked test JVM).
  * Usage in suites: `import spark.implicits._` (lazy val is a stable id).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("graft-test")
}
