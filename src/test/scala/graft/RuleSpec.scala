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

  test("row_number top-k windows plan as partial+final TopKPerKey, results unchanged") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
    def q() = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    val p = q().queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal") && p.contains("TopKPerKeyPartial"), p.take(1200))
    assert(!p.toLowerCase.contains("windowexec"), p.take(1200))
    // the partial stage bounds what shuffles: exactly one key exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(1200))

    val on = q().collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.topk.enabled", "false")
    try {
      val offPlan = q().queryExecution.executedPlan.toString
      assert(!offPlan.contains("TopKPerKey"), offPlan.take(600))
      assert(on === q().collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.set("spark.graft.topk.enabled", "true")
  }

  test("partial-stage key cap: pass-through keeps results exact") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
    def q() = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
    val normal = q().collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.topk.partialMaxKeys", "1") // force pass-through
    try assert(q().collect().map(_.toString).sorted.toSeq === normal)
    finally spark.conf.unset("spark.graft.topk.partialMaxKeys")
  }

  test("decorrelated LATERAL LIMIT plans drop the global sort for TopKPerKey") {
    val df = graft.queries.TpchQueries.queries("sql_lateral")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal"), p.take(1500))
    // the decorrelation's global range-partitioned sort must be gone
    assert(!p.contains("rangepartitioning"), p.take(1500))
  }

  test("top-k heap ordering honors null ordering exactly like row_number") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(9.0), 3L),
      (2L, None, 4L), (2L, None, 5L), (2L, Some(1.0), 6L)
    ).toDF("k", "v", "id")
    def topk(nullsFirst: Boolean) = {
      val ord = if (nullsFirst) col("v").desc_nulls_first else col("v").desc_nulls_last
      val w = Window.partitionBy(col("k")).orderBy(ord, col("id").asc)
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .collect().map(_.toString).sorted.toSeq
    }
    for (nf <- Seq(true, false)) {
      val on = topk(nf)
      spark.conf.set("spark.graft.topk.enabled", "false")
      try assert(topk(nf) === on, s"nullsFirst=$nf")
      finally spark.conf.set("spark.graft.topk.enabled", "true")
    }
  }

  test("rank()/frames/multi-window-expression plans are NOT rewritten") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
    // rank() has different tie semantics — must stay a window
    val ranked = Tables.events(spark, sfDir)
      .withColumn("r", rank().over(w)).where(col("r") <= 3)
    assert(!ranked.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // a second window expression rides along — must stay a window
    val multi = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("value")).over(Window.partitionBy(col("user_id"))))
      .where(col("rn") <= 3)
    assert(multi.queryExecution.executedPlan.toString.contains("Window"))
  }
}
