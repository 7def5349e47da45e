package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Runtime row-level filtering — the Spark-native answer to "don't
  * scan 100 TB of fact rows that a selective dimension filter will
  * throw away after the join". With the bloom-filter optimization on,
  * Catalyst injects a BloomFilterAggregate over the filtered creation
  * side and a BloomFilterMightContain predicate into the application
  * side's SCAN, pruning fact rows before the shuffle.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom filter into the fact scan") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // production default is 10GB of application-side scan before the
      // filter pays for itself; the fixtures are far smaller, so drop
      // the floor to observe the injection
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffle join so the runtime filter is worth injecting
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 200000.0)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_extendedprice")).as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered result still matches the unfiltered semantics
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try joined.collect().toSeq finally
          spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      }
      assert(joined.collect().toSeq === expected)
    }
  }
}
