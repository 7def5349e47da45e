package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bucketing: pre-shuffled at-rest layout so co-keyed joins and
  * aggregations run with NO exchange — the storage-side half of the
  * 100 TB join strategy (SURVEY §7.4.10).
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key needs no shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum("l_extendedprice"), 4).as("rev"))
      val p = joined.queryExecution.executedPlan.toString
      // the join itself reads bucketed files directly: no exchange
      // below the SortMergeJoin (the final small aggregate may shuffle)
      val joinSection = p.substring(p.indexOf("SortMergeJoin"))
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!joinSection.contains("Exchange hashpartitioning"), joinSection.take(1200))
      assert(p.contains("Bucketed: true"), p.take(1200))
      // and it computes the right thing
      val expect = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum("l_extendedprice"), 4).as("rev"))
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
