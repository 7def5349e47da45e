package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Privacy

class PrivacySpec extends SparkSpec {

  private def quasi = Seq(col("c_nationkey"), col("c_mktsegment"),
    floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))

  test("suppression keeps exactly the rows of k-satisfying classes") {
    val cust = Tables.customer(spark, sfDir)
    val audit = Privacy.kAnonymityAudit(cust, quasi, col("c_acctbal"), k = 2, l = 2)
    val kept = Privacy.suppressBelowK(cust, quasi, k = 2)
    // released rows == sum of sizes of classes meeting k
    val expected = audit.where(col("meets_k"))
      .agg(coalesce(sum(col("class_size")), lit(0L))).head().getLong(0)
    assert(kept.count() === expected)
    // and no released class is smaller than k
    val reAudit = Privacy.kAnonymityAudit(kept, quasi, col("c_acctbal"), k = 2, l = 2)
    assert(reAudit.where(!col("meets_k")).isEmpty)
    // the audit is non-trivial on the fixture: both verdicts occur
    assert(audit.where(col("meets_k")).count() > 0)
    assert(audit.where(!col("meets_k")).count() > 0)
  }

  test("audit identities: diversity never exceeds class size; guards reject bad k/l") {
    val cust = Tables.customer(spark, sfDir)
    val audit = Privacy.kAnonymityAudit(cust, quasi, col("c_acctbal"), k = 2, l = 2)
    assert(audit.where(col("l_diversity") > col("class_size")).isEmpty)
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(cust, quasi, col("c_acctbal"), k = 1, l = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.suppressBelowK(cust, quasi, k = 0)
    }
  }

  test("entropyLDiversity: uniform class meets ln(l), skewed class fails") {
    import spark.implicits._
    // X = {a,a,b,b}: H = ln 2 exactly → esum = 4·693147, meets l=2 at
    // equality. Y = {a,a,a,b}: H ≈ 0.5623 < ln 2 → fails. Z single
    // value: H = 0.
    val df = Seq(("X", "a"), ("X", "a"), ("X", "b"), ("X", "b"),
      ("Y", "a"), ("Y", "a"), ("Y", "a"), ("Y", "b"),
      ("Z", "a"), ("Z", "a")).toDF("qi", "s")
    val audit = Privacy.entropyLDiversityAudit(df, Seq(col("qi")), col("s"), l = 2)
    val byQi = audit.collect().map(r => r.getAs[String]("qi") ->
      (r.getAs[Long]("entropy_x1e6"), r.getAs[Boolean]("meets_el"))).toMap
    assert(byQi("X") === ((693147L, true)))
    assert(byQi("Z") === ((0L, false)))
    assert(!byQi("Y")._2 && byQi("Y")._1 > 0L && byQi("Y")._1 < 693147L)
    intercept[IllegalArgumentException] {
      Privacy.entropyLDiversityAudit(df, Seq(col("qi")), col("s"), l = 1)
    }
  }

  test("tCloseness: exact ppm TVD on a constructed distribution") {
    import spark.implicits._
    // global: a=2, b=2 (n=4). class X = {a,a}: p=(1,0) vs (.5,.5)
    // → TVD 0.5 = 500000 ppm; class Y = {b,b} symmetric.
    val df = Seq(("X", "a"), ("X", "a"), ("Y", "b"), ("Y", "b"))
      .toDF("qi", "s")
    val audit = Privacy.tClosenessAudit(df, Seq(col("qi")), col("s"),
      tPpm = 400000L)
    val rows = audit.orderBy("qi").collect()
    assert(rows.map(_.getAs[Long]("tvd_ppm")).toSeq === Seq(500000L, 500000L))
    assert(rows.forall(!_.getAs[Boolean]("meets_t")))
    assert(rows.forall(_.getAs[Long]("class_size") === 2L))
    // identical distribution → TVD 0, meets any threshold
    val uniform = Seq(("X", "a"), ("X", "b"), ("Y", "a"), ("Y", "b"))
      .toDF("qi", "s")
    val u = Privacy.tClosenessAudit(uniform, Seq(col("qi")), col("s"), 0L)
    assert(u.where(col("tvd_ppm") =!= 0L || !col("meets_t")).isEmpty)
  }

  test("tCloseness: null sensitive is a category; null QI rows excluded") {
    import spark.implicits._
    val df = Seq(
      (Some("X"), Option.empty[String]), (Some("X"), Option.empty[String]),
      (Some("Y"), Some("a")), (Some("Y"), Some("a")),
      (Option.empty[String], Some("a"))) // null QI: not a class
      .toDF("qi", "s")
    val audit = Privacy.tClosenessAudit(df, Seq(col("qi")), col("s"),
      tPpm = 600000L)
    val byQi = audit.collect().map(r =>
      r.getAs[String]("qi") -> r.getAs[Long]("tvd_ppm")).toMap
    assert(byQi.keySet === Set("X", "Y"), "null-QI row must not form a class")
    // n=4 after exclusion: global null=2, a=2. X all-null: TVD .5
    assert(byQi("X") === 500000L && byQi("Y") === 500000L)
    assert(audit.where(col("class_size") =!= 2L).isEmpty)
    intercept[IllegalArgumentException] {
      Privacy.tClosenessAudit(df, Seq(col("qi")), col("s"), tPpm = 2000000L)
    }
  }
}
