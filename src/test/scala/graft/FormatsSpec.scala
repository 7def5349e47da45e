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
}
