package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.GraftSession

/** Shared local SparkSession for all specs (one JVM-wide session —
  * getOrCreate makes suites reuse it; never stopped between suites).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}
