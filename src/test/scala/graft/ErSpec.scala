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

  test("banded form survives a planted constant prefix (dead-prefix case)") {
    // Every name shares a long dead prefix: under the classic
    // one-segment-per-band scheme the prefix band is one block-sized
    // hot bucket; the omit-k-of-nSeg keys keep the high-entropy tail
    // in every key. Result equality with the quadratic form must hold
    // for the auto segment count AND the degenerate classic count.
    val cust = Tables.customer(spark, sfDir)
      .withColumn("c_name", concat(lit("DEADCONSTANTPREFIX##"), col("c_name")))
    val quad = EntityResolution.blockedEditDistancePairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1)
    val auto = EntityResolution.bandedHammingPairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1)
    val classic = EntityResolution.bandedHammingPairs(
      cust, "c_custkey", "c_name", blocks, maxDist = 1, nSeg = 2)
    assert(quad.exceptAll(auto).isEmpty && auto.exceptAll(quad).isEmpty)
    assert(quad.exceptAll(classic).isEmpty && classic.exceptAll(quad).isEmpty)
    assert(auto.count() > 0, "prefix must not change the pair set size")
  }

  test("passJoin pairs equal the quadratic form at maxDist 2 with indel variants") {
    // Fixture plants one insertion, one deletion, and one two-char
    // substitution per base name — the insert/delete-shifted pairs
    // the Hamming band is blind to at k >= 2 by construction.
    val cust = Tables.customer(spark, sfDir).limit(300)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))
    val variants = cust
      .selectExpr("c_custkey * 10 + 1 AS c_custkey",
        "substr(c_name, 1, 4) || 'Q' || substr(c_name, 5) AS c_name",
        "c_nationkey", "c_mktsegment")
      .unionByName(cust.selectExpr("c_custkey * 10 + 2 AS c_custkey",
        "substr(c_name, 1, 6) || substr(c_name, 8) AS c_name",
        "c_nationkey", "c_mktsegment"))
      .unionByName(cust.selectExpr("c_custkey * 10 + 3 AS c_custkey",
        "substr(c_name, 1, 2) || 'ZZ' || substr(c_name, 5) AS c_name",
        "c_nationkey", "c_mktsegment"))
    val fixture = cust.selectExpr("c_custkey * 10 AS c_custkey", "c_name",
      "c_nationkey", "c_mktsegment").unionByName(variants)
    val quad = EntityResolution.blockedEditDistancePairs(
      fixture, "c_custkey", "c_name", blocks, maxDist = 2)
    val passed = EntityResolution.passJoinPairs(
      fixture, "c_custkey", "c_name", blocks, maxDist = 2)
    assert(quad.exceptAll(passed).isEmpty && passed.exceptAll(quad).isEmpty)
    // indel pairs (length difference 1) MUST be present — the regime
    // under test
    assert(passed.join(fixture.selectExpr("c_custkey AS id_a", "length(c_name) AS la"), "id_a")
      .join(fixture.selectExpr("c_custkey AS id_b", "length(c_name) AS lb"), "id_b")
      .where(col("la") =!= col("lb")).count() > 0)
  }

  test("passJoin handles tiny strings (shorter than k+1 segments)") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "ab", "x"), (2L, "a", "x"), (3L, "", "x"), (4L, "abcd", "x"),
      (5L, "ba", "x"), (6L, "zzzz", "x")).toDF("id", "nm", "blk")
    val quad = EntityResolution.blockedEditDistancePairs(
      tiny, "id", "nm", Seq("blk"), maxDist = 2)
    val passed = EntityResolution.passJoinPairs(
      tiny, "id", "nm", Seq("blk"), maxDist = 2)
    assert(quad.exceptAll(passed).isEmpty && passed.exceptAll(quad).isEmpty)
  }

  test("envelope guards: passJoin k<=5, banded k<64, auto nSeg self-consistent") {
    val cust = Tables.customer(spark, sfDir).limit(0)
    // passJoin probe fan-out is O(k^3) keys/row: the envelope is a
    // stated contract (verdict r13 task 7), not an implicit cost cliff
    val e1 = intercept[IllegalArgumentException] {
      EntityResolution.passJoinPairs(cust, "c_custkey", "c_name", blocks, maxDist = 6)
    }
    assert(e1.getMessage.contains("maxDist <= 5"), e1.getMessage)
    // banded: nSeg > k and nSeg <= 64 are unsatisfiable past k = 63 —
    // reject up front with the honest message (advice r13)
    val e2 = intercept[IllegalArgumentException] {
      EntityResolution.bandedHammingPairs(cust, "c_custkey", "c_name", blocks, maxDist = 64)
    }
    assert(e2.getMessage.contains("envelope"), e2.getMessage)
    // the auto segment pick must satisfy its own requires at EVERY
    // admissible k (the k+1 fallback used to violate segs <= 64 when
    // the clamp was missing) — plan construction runs the requires
    (0 until 64).foreach { k =>
      EntityResolution.bandedHammingPairs(cust, "c_custkey", "c_name", blocks, maxDist = k)
    }
  }
}
