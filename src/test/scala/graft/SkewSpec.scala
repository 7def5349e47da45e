package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key") {
    // events.event_type is a 5-value key — exactly the skew shape.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("user_id"))
    val dim = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("type_total"))

    val plain = ev.join(dim, Seq("event_type"))
      .select("event_id", "event_type", "type_total")
    val salted = Skew.saltedJoin(ev, dim, Seq("event_type"), "event_id", 8)
      .select("event_id", "event_type", "type_total")

    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-sized thresholds (sizes are POST-compression shuffle
      // bytes): skewed past 8KB and 2× the median, split to ~2KB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 400k rows on ONE hot key vs 2k spread over the rest; payload is
      // hash-scrambled so LZ4 can't shrink the hot partition under the
      // skew threshold
      val left = spark.range(402000).select(
        when(col("id") < 400000, 0L).otherwise(col("id") % 100 + 1).as("k"),
        (col("id") * 2654435761L % 1000003L).as("v"))
      val right = spark.range(101).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("chk"))
      // collect() finalizes THIS dataframe's adaptive plan (head() would
      // plan a separate limit execution and leave this one un-finalized)
      assert(joined.collect()(0).getLong(0) === 402000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"AQE did not mark the skewed join:\n${plan.take(4000)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt is deterministic and spans the full range") {
    val ev = Tables.events(spark, sfDir)
    val salts = ev.select(Skew.salt(col("event_id"), 8).as("s"))
    val distinct = salts.distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(distinct === (0 until 8))
    // stable across evaluations
    val again = ev.select(Skew.salt(col("event_id"), 8).as("s"))
    assert(salts.exceptAll(again).isEmpty)
  }
}
