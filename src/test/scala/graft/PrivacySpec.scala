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
}
