package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Layout

class LayoutSkipSpec extends SparkSpec {

  test("zone-map pruning skips files and loses no rows") {
    val dir = Files.createTempDirectory("graft_zmap").toString + "/t"
    val ev = Tables.events(spark, sfDir)
    Layout.writeZoneMapped(ev,
      pmod(col("user_id"), lit(65536L)),
      pmod(floor(col("event_id") / 16).cast("long"), lit(65536L)),
      nFiles = 16, dir, statsCols = Seq("user_id", "event_id"))

    val ranges = Seq(("user_id", 2L, 5L), ("event_id", 50L, 400L))
    val (pruned, read, total) = Layout.statsPrunedRead(spark, dir, ranges)
    assert(total === 16)
    assert(read < total, s"expected skipping, read $read of $total files")

    val full = spark.read.parquet(dir)
      .where(col("user_id").between(2, 5) && col("event_id").between(50, 400))
    val a = pruned.select(col("event_id"))
    val b = full.select(col("event_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(pruned.count() === ev
      .where(col("user_id").between(2, 5) && col("event_id").between(50, 400))
      .count())
  }

  test("a predicate outside every file's range reads zero files") {
    val dir = Files.createTempDirectory("graft_zmap_none").toString + "/t"
    Layout.writeZoneMapped(Tables.events(spark, sfDir),
      pmod(col("user_id"), lit(65536L)),
      pmod(floor(col("event_id") / 16).cast("long"), lit(65536L)),
      nFiles = 4, dir, statsCols = Seq("user_id"))
    val (out, read, total) =
      Layout.statsPrunedRead(spark, dir, Seq(("user_id", 900000L, 900001L)))
    assert(read === 0 && total === 4)
    assert(out.isEmpty)
  }
}
