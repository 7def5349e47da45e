package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Source/sink format coverage beyond the reference's parquet-only
  * lake: JSON lines, CSV (with explicit schema — inference is a full
  * extra pass at scale), and ORC all round-trip the same events
  * projection losslessly. Timestamps travel as ISO strings in the
  * text formats (CSV/JSON have no native timestamp type) and are
  * re-parsed on read.
  */
class FormatsSpec extends SparkSpec {

  private def projected = Tables.events(spark, sfDir)
    .select(
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value"), 4).as("value"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_s", StringType)))

  private def roundTrip(format: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
    val orig = projected
    orig.write.mode("overwrite").format(format)
      .options(if (format == "csv") Map("header" -> "true") else Map.empty[String, String])
      .save(dir)
    val back = spark.read.format(format)
      .options(if (format == "csv") Map("header" -> "true") else Map.empty[String, String])
      .schema(schema)
      .load(dir)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty, format)
  }

  test("JSON lines round-trip is lossless")(roundTrip("json"))
  test("CSV round-trip with explicit schema is lossless")(roundTrip("csv"))
  test("ORC round-trip is lossless")(roundTrip("orc"))

  test("mergeSchema unions drifted partition schemas (S2 semantic)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // partition 1 predates the `score` column; partition 2 has it
    Seq((1L, "a")).toDF("id", "tag")
      .write.parquet(s"$dir/date=2024-01-01")
    Seq((2L, "b", 0.5)).toDF("id", "tag", "score")
      .write.parquet(s"$dir/date=2024-01-02")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "tag", "score", "date"))
    val row1 = merged.where(col("id") === 1).head()
    assert(row1.isNullAt(row1.fieldIndex("score"))) // old rows null-fill
    assert(merged.where(col("id") === 2).head().getAs[Double]("score") === 0.5)
  }

  test("text-format reads push filters and prune columns like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_plan").toString
    projected.write.mode("overwrite").orc(dir)
    val p = spark.read.schema(schema).orc(dir)
      .where(col("event_type") === "click")
      .select("event_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]") ||
      p.contains("EqualTo(event_type,click)"), p.take(800))
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("event_id") && !read.contains("value"), read)
  }

  test("malformed ingest rows quarantine under PERMISSIVE, drop under DROPMALFORMED") {
    // a 100 TB ingest WILL contain garbage lines; the pipeline must
    // quarantine them reproducibly, not die or silently corrupt
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    val lines = Seq(
      "1,42,click,1.5", "2,notanumber,view,2.0", "3,7,purchase,oops", "4,9,view,4.0")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.csv"),
      String.join("\n", lines: _*).getBytes)
    val s = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("_corrupt", StringType)))

    val permissive = spark.read.schema(s)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir).cache()
    try {
      assert(permissive.count() === 4)
      val bad = permissive.where(col("_corrupt").isNotNull)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(bad === Seq(2L, 3L)) // quarantined rows keep parseable prefix cols
      // DROPMALFORMED judges rows against the REQUIRED schema after
      // column pruning — a count() that needs no columns drops nothing.
      // Materialize the full row set to get the strict semantics.
      val good = spark.read.schema(s.copy(fields = s.fields.dropRight(1)))
        .option("mode", "DROPMALFORMED").csv(dir)
        .collect()
      assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
      assert(good.map(_.getDouble(3)).sum === 5.5)
    } finally permissive.unpersist()
  }

  test("ignoreCorruptFiles skips garbage files instead of failing the scan") {
    // at 100 TB some object-store file WILL be truncated/corrupt; the
    // scan must be able to quarantine-and-continue on explicit opt-in
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    Tables.events(spark, sfDir).select("event_id", "user_id")
      .write.mode("overwrite").parquet(dir)
    val n = spark.read.parquet(dir).count()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part-corrupt.parquet"),
      "this is not parquet".getBytes)
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      intercept[Exception] {
        spark.read.parquet(dir).count()
      }
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() === n)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      import spark.implicits._
      Seq((1L, "2024-01-01"), (2L, "2024-01-02"))
        .toDF("id", "date").write.partitionBy("date").mode("overwrite").parquet(dir)
      // re-run of ONE day must not wipe the other day's partition
      Seq((99L, "2024-01-02"))
        .toDF("id", "date").write.partitionBy("date").mode("overwrite").parquet(dir)
      // partition values come back type-inferred (DATE here)
      val rows = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.get(1).toString)).toSet
      assert(rows === Set((1L, "2024-01-01"), (99L, "2024-01-02")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
