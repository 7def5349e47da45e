package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Specs for the injected optimizer rule (CollectSizeToCount). */
class RuleSpec extends SparkSpec {

  test("size(collect_list(x)) is rewritten to count(x)") {
    val df = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(size(collect_list(col("event_type"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("collect_list"), optimized.take(600))
    assert(optimized.contains("count("), optimized.take(600))
    // and the values equal a plain count
    val expect = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(col("event_type")).cast("int").as("n"))
    assert(df.exceptAll(expect).isEmpty && expect.exceptAll(df).isEmpty)
  }

  test("collect_list survives when the array itself is consumed") {
    val df = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(concat_ws(",", array_sort(collect_list(col("event_type")))).as("s"),
        size(collect_list(col("event_type"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("collect_list"), optimized.take(600))
    assert(optimized.contains("count("), optimized.take(600))
  }

  test("distinct collect_list sizes are NOT rewritten (count-distinct differs)") {
    val df = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(size(collect_set(col("event_type"))).as("n"))
    // collect_set is a different aggregate — rule must not touch it
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("collect_set"), optimized.take(600))
  }
}
