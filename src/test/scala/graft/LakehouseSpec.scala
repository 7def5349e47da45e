package graft

import org.apache.spark.sql.functions._
import graft.operators.Lakehouse

class LakehouseSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("mergeUpsert: source overwrites, inserts, and keeps by key") {
    import spark.implicits._
    val target = Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "n", "s")
    val source = Seq((2L, 99, "b2"), (3L, 30, "c")).toDF("k", "n", "s")
    val out = Lakehouse.mergeUpsert(target, source, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq ===
      Seq((1L, 10, "a", "keep"), (2L, 99, "b2", "update"), (3L, 30, "c", "insert")))
  }

  test("mergeUpsert: null source data column falls back to target value") {
    import spark.implicits._
    val target = Seq((1L, Some("old"))).toDF("k", "v")
    val source = Seq((1L, Option.empty[String])).toDF("k", "v")
    val out = Lakehouse.mergeUpsert(target, source, Seq("k")).collect()(0)
    assert(out.getAs[String]("v") === "old" && out.getAs[String]("merge_action") === "update")
  }

  test("mergeUpsert rejects mismatched schemas") {
    import spark.implicits._
    val t = Seq((1L, 1)).toDF("k", "a")
    val s = Seq((1L, 1)).toDF("k", "b")
    intercept[IllegalArgumentException](Lakehouse.mergeUpsert(t, s, Seq("k")))
  }

  test("scd2 collapses runs, closes intervals with the next change, flags current") {
    import spark.implicits._
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "low"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "low"),   // unchanged — collapsed
      (1L, ts("2024-01-03 00:00:00"), 3L, "high"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "mid")
    ).toDF("uid", "t", "eid", "band")
    val out = Lakehouse.scd2(log, "uid", "t", "eid", col("band"))
      .orderBy("uid", "valid_from").collect()
    assert(out.length === 3)
    val r0 = out(0)
    assert(r0.getAs[String]("attr_value") === "low" &&
      r0.getAs[java.sql.Timestamp]("valid_to") === ts("2024-01-03 00:00:00") &&
      !r0.getAs[Boolean]("is_current"))
    assert(out(1).getAs[String]("attr_value") === "high" && out(1).getAs[Boolean]("is_current"))
    assert(out(2).getAs[Long]("uid") === 2L && out(2).getAs[Boolean]("is_current"))
  }

  test("scd2 breaks equal-timestamp ties deterministically by the tie column") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val log = Seq((1L, t0, 2L, "b"), (1L, t0, 1L, "a")).toDF("uid", "t", "eid", "band")
    val out = Lakehouse.scd2(log, "uid", "t", "eid", col("band"))
      .orderBy("valid_from", "attr_value").collect()
    // eid 1 ("a") sorts first, eid 2 ("b") is the change row and current
    assert(out.map(_.getAs[String]("attr_value")).toSeq === Seq("a", "b"))
    assert(out.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, true))
  }

  test("scd2 plans a single exchange for both window passes") {
    import spark.implicits._
    val log = (1 to 200).map(i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:00:00"), i.toLong, s"v${i % 3}"))
      .toDF("uid", "t", "eid", "band")
    val p = Lakehouse.scd2(log, "uid", "t", "eid", col("band"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(1200))
  }
}
