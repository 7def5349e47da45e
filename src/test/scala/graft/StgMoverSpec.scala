package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.jobs.StgMoverJob

class StgMoverSpec extends SparkSpec {

  test("nest → flatten round-trips the shared columns") {
    val flat = Tables.events(spark, sfDir)
    val back = StgMoverJob.flatten(StgMoverJob.nest(flat))
    // second-precision ts round-trip (raw layer stores string seconds)
    val orig = flat.select(
      col("event_id"), col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
      col("value"), col("event_type"), col("props"))
    val got = back.select(
      col("event_id"), col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
      col("value"), col("event_type"), col("props"))
    assert(got.exceptAll(orig).isEmpty && orig.exceptAll(got).isEmpty)
  }

  test("mover writes a Hive-partitioned STG layer readable with pruning") {
    val out = Files.createTempDirectory("graft-stg").toString + "/events"
    val raw = StgMoverJob.nest(Tables.events(spark, sfDir))
    StgMoverJob.run(spark, raw, out)
    val stg = spark.read.option("basePath", out).parquet(out)
    assert(stg.count() === Tables.events(spark, sfDir).count())
    // partition columns materialized in the directory layout
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")))
    val clicks = stg.where(col("event_type") === "click" && col("date") === "2024-01-03")
    assert(clicks.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
