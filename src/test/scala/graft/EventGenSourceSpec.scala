package graft

import org.apache.spark.sql.functions._
import graft.sources.EventGenSource

class EventGenSourceSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.EventGenSource")
      .option("rows", rows).option("partitions", parts).load()

  test("generates deterministic rows across the requested partitions") {
    val df = gen(1000, parts = 8)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 8)
    val r = df.where(col("event_id") === 7).collect()(0)
    assert(r.getLong(1) === EventGenSource.userOf(7))
    assert(r.getString(2) === EventGenSource.typeOf(7))
    assert(r.getDouble(3) === EventGenSource.valueOf(7))
    // re-read is identical (no rand anywhere)
    assert(df.exceptAll(gen(1000, 8)).isEmpty)
  }

  test("range predicates are pushed into the source, residuals stay with Spark") {
    val df = gen(100000)
      .where(col("event_id") >= 500 && col("event_id") < 600 &&
        col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    // the scan's description advertises the narrowed generation range
    assert(plan.contains("range=[500,600)"), s"range not pushed:\n$plan")
    // residual (non-range) filter still applied by Spark
    val expected = (500L until 600L).count(i => EventGenSource.typeOf(i) == "click")
    assert(df.count() === expected)
  }

  test("int-typed literals push down too (any Number boxing)") {
    // lit(500) is an Integer — the filter must still narrow the range
    // rather than silently fall through to residual
    val df = gen(100000).where(col("event_id") >= lit(500) &&
      col("event_id") < lit(600))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[500,600)"), s"int literal not pushed:\n$plan")
    assert(df.count() === 100)
  }

  test("scan builder accepts Integer-boxed range literals directly") {
    import org.apache.spark.sql.sources
    val b = new graft.sources.EventGenScanBuilder(100000, 4)
    val residual = b.pushFilters(Array[sources.Filter](
      sources.GreaterThanOrEqual("event_id", Integer.valueOf(500)),
      sources.LessThan("event_id", java.lang.Short.valueOf(600.toShort)),
      sources.EqualTo("event_type", "click")))
    assert(b.pushedFilters().length === 2, "integral boxings must be accepted")
    assert(residual.toSeq === Seq(sources.EqualTo("event_type", "click")))
  }

  test("fractional literals stay residual (truncation would drop rows)") {
    import org.apache.spark.sql.sources
    val b = new graft.sources.EventGenScanBuilder(100000, 4)
    val residual = b.pushFilters(Array[sources.Filter](
      sources.LessThan("event_id", java.lang.Double.valueOf(599.5)),
      sources.EqualTo("event_id", new java.math.BigDecimal("500.5"))))
    assert(b.pushedFilters().isEmpty, "fractional values must not be accepted")
    assert(residual.length === 2)
  }

  test("column pruning reaches the reader") {
    val df = gen(1000).select("event_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=event_id,value"), s"columns not pruned:\n$plan")
    assert(df.agg(sum("value")).head().getDouble(0) > 0)
  }

  test("an aggregation over the source scales with partitions") {
    val byType = gen(5000, parts = 16).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.values.sum === 5000)
    assert(byType.keySet === EventGenSource.EventTypes.toSet)
  }
}
