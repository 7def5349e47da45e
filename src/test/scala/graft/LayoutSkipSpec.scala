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

  test("re-Z-ordering compaction keeps skipping effective; plain compaction scrambles it") {
    val x = pmod(col("user_id"), lit(65536L))
    val y = pmod(floor(col("event_id") / 16).cast("long"), lit(65536L))
    val stats = Seq("user_id", "event_id")
    val ranges = Seq(("user_id", 2L, 5L), ("event_id", 50L, 400L))
    val ev = Tables.events(spark, sfDir)

    def writeSmallFiles(dir: String): Unit =
      Layout.writeZoneMapped(ev, x, y, nFiles = 16, dir, stats)
    def targetBytesFor(dir: String, want: Int): Long = {
      val bytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      math.max(1L, bytes / want)
    }

    // zone-map-aware compaction: 16 small files -> ~4, still Z-ordered
    val dirA = Files.createTempDirectory("graft_zmap_rez").toString + "/t"
    writeSmallFiles(dirA)
    val n = Layout.compactZoneMapped(spark, dirA, targetBytesFor(dirA, 4), x, y, stats)
    assert(n < 16)
    val (prunedA, readA, totalA) = Layout.statsPrunedRead(spark, dirA, ranges)
    assert(totalA === n)
    assert(readA < totalA,
      s"re-Z-ordered compaction must keep skipping: read $readA of $totalA")
    // no rows lost by the rewrite
    val full = ev.where(col("user_id").between(2, 5) && col("event_id").between(50, 400))
    assert(prunedA.count() === full.count())
    val a = prunedA.select(col("event_id"))
    val b = full.select(col("event_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // the counterfactual: plain byte-packing compaction at the same
    // target scrambles rows across every output file — the regenerated
    // zone map can no longer prove anything and pruning collapses
    val dirB = Files.createTempDirectory("graft_zmap_plain").toString + "/t"
    writeSmallFiles(dirB)
    graft.operators.Lakehouse.compact(spark, dirB, targetBytesFor(dirB, 4))
    Layout.zoneMap(spark.read.parquet(dirB), stats)
      .repartition(1).write.mode("overwrite").parquet(dirB + "/_zonemap")
    val (_, readB, totalB) = Layout.statsPrunedRead(spark, dirB, ranges)
    val ratioA = readA.toDouble / totalA
    val ratioB = readB.toDouble / totalB
    assert(ratioA < ratioB,
      s"Z-ordered compaction ($readA/$totalA) should skip more than plain ($readB/$totalB)")
  }

  test("vacuum deletes only unreferenced-AND-expired files, never metadata") {
    val dir = Files.createTempDirectory("graft_zmap_vac").toString + "/t"
    Layout.writeZoneMapped(Tables.events(spark, sfDir),
      pmod(col("user_id"), lit(65536L)),
      pmod(floor(col("event_id") / 16).cast("long"), lit(65536L)),
      nFiles = 4, dir, statsCols = Seq("user_id"))
    val before = spark.read.parquet(dir).count()
    // plant two orphans: compaction/overwrite debris the manifest
    // doesn't reference
    val orphanOld = new java.io.File(dir, "part-99999-orphan.parquet")
    val orphanNew = new java.io.File(dir, "part-99998-orphan.parquet")
    Seq(orphanOld, orphanNew).foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    }
    orphanOld.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)

    // 24h retention: the old orphan goes, the fresh one is still
    // inside the reader-safety window, live files untouched
    val deleted = graft.operators.Lakehouse.vacuumZoneMapped(
      spark, dir, retentionMs = 24L * 3600 * 1000)
    assert(deleted.map(p => new java.io.File(p).getName) === Seq(orphanOld.getName))
    assert(!orphanOld.exists() && orphanNew.exists())

    // retention 0 sweeps the remaining orphan
    val deleted2 = graft.operators.Lakehouse.vacuumZoneMapped(spark, dir, 0L)
    assert(deleted2.map(p => new java.io.File(p).getName) === Seq(orphanNew.getName))

    // table reads identically and the zone map is intact
    assert(spark.read.parquet(dir).count() === before)
    val (_, read, total) =
      Layout.statsPrunedRead(spark, dir, Seq(("user_id", 2L, 5L)))
    assert(total === 4 && read <= total)
  }

  test("hilbert index: bijective on the full grid, consecutive cells Manhattan-adjacent") {
    import graft.operators.Layout
    val order = 5
    val n = 1 << order // 32×32 grid, exhaustive
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (Layout.hilbertXY2D(x.toLong, y.toLong, order), x, y)
    // bijective: every d in [0, n²) hit exactly once
    assert(cells.map(_._1).sorted === (0L until (n.toLong * n)).toSeq)
    // the Hilbert property Z-order lacks: walking the curve moves one
    // Manhattan step at a time — the locality argument for clustering
    val byD = cells.sortBy(_._1)
    byD.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between d-neighbors ($x1,$y1)->($x2,$y2)")
    }
    // the codegen'd expression agrees with the kernel
    import spark.implicits._
    val df = cells.take(100).map { case (_, x, y) => (x.toLong, y.toLong) }
      .toDF("x", "y")
      .withColumn("h", graft.expressions.GraftFunctions.hilbertIndex(
        col("x"), col("y"), order))
    df.collect().foreach { r =>
      assert(r.getLong(2) === Layout.hilbertXY2D(r.getLong(0), r.getLong(1), order))
    }
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
