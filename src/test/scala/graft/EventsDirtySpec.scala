package graft

import org.apache.spark.sql.functions._

/** Dirty-data robustness for the EVENTS tier — the third dirty
  * surface next to TextDirtySpec (documents) and MultimodalDirtySpec
  * (payload codecs). The gate fixtures' events are clean (dense ids,
  * non-null everything, finite values, well-formed props JSON); a
  * real event stream is none of that. This spec appends pathological
  * rows to a CLEAN sf0.001 corpus — null ts / event_type / value /
  * props, NaN and ±Infinity values, negative value, negative and
  * huge user_id, malformed and non-numeric-k props, a duplicate
  * event_id — and runs EVERY registered query against the dirty dir
  * (non-events queries ride along for free: their tables are
  * untouched copies). Contract: no query throws — no ANSI
  * NaN-to-long cast abort, no NPE in custom state logic, no
  * divide-by-zero — the dirty minority degrades to nulls/dropped
  * rows, never a task failure.
  */
class EventsDirtySpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_events").toString
    // untouched clean tables: copy the parquet files as-is
    val src = new java.io.File(sfDir)
    src.listFiles().filter(_.getName != "events.parquet").foreach { f =>
      val dst = java.nio.file.Paths.get(dir, f.getName)
      if (f.isDirectory) {
        java.nio.file.Files.createDirectories(dst)
        f.listFiles().foreach(p => java.nio.file.Files.copy(p.toPath,
          dst.resolve(p.getName)))
      } else java.nio.file.Files.copy(f.toPath, dst)
    }
    val clean = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val dirty = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (900001L, null.asInstanceOf[java.sql.Timestamp], 3L, "click", 10.0, """{"k": 7}"""),
      (900002L, t0, 4L, null.asInstanceOf[String], 20.0, """{"k": 8}"""),
      (900003L, t0, 5L, "view", Double.NaN, """{"k": 9}"""),
      (900004L, t0, 6L, "purchase", Double.PositiveInfinity, """{"k": 10}"""),
      (900005L, t0, 7L, "click", Double.NegativeInfinity, """{"k": 11}"""),
      (900006L, t0, 8L, "view", -42.5, """{"k": 12}"""),
      (900007L, t0, -9L, "click", 30.0, """{"k": 13}"""),
      (900008L, t0, 9_999_999_999L, "view", 31.0, """{"k": 14}"""),
      (900009L, t0, 10L, "click", 32.0, null.asInstanceOf[String]),
      (900010L, t0, 11L, "view", 33.0, "not json at all"),
      (900011L, t0, 12L, "click", 34.0, """{"k": "xyz"}"""),
      (900012L, t0, 13L, "purchase", null.asInstanceOf[Any].asInstanceOf[Double], """{"k": 15}"""),
      // duplicate event_id colliding with a clean row's id space
      (1L, t0, 14L, "view", 35.0, """{"k": 16}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // null `value` can't ride a Scala Double tuple — patch it in
    val dirtyFixed = dirty.withColumn("value",
      when(col("event_id") === 900012L, lit(null).cast("double"))
        .otherwise(col("value")))
    clean.unionByName(dirtyFixed)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every registered query survives a pathological events table") {
    val failures = scala.collection.mutable.ListBuffer[(String, String)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, dirtyDir).collect(); () }
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n -> $m" }.mkString)
  }
}
