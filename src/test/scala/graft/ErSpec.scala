package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.EntityResolution

class ErSpec extends SparkSpec {

  private val blocks = Seq("c_nationkey", "c_mktsegment")

  test("banded hamming pairs equal the quadratic levenshtein form at maxDist 1") {
    val cust = Tables.customer(spark, sfDir)
    val quad = EntityResolution.blockedEditDistancePairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1)
    val banded = EntityResolution.bandedHammingPairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1)
    assert(quad.exceptAll(banded).isEmpty && banded.exceptAll(quad).isEmpty)
    assert(banded.count() > 0, "fixture should contain near-identical names")
  }

  test("banded form emits no pair above the bound and no self/duplicate pairs") {
    val cust = Tables.customer(spark, sfDir)
    val banded = EntityResolution.bandedHammingPairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1)
    assert(banded.where(col("dist") > 1 || col("id_a") >= col("id_b")).isEmpty)
    assert(banded.groupBy("id_a", "id_b").count().where(col("count") > 1).isEmpty)
  }
}
