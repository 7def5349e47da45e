package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 10:05:00"), "t2"),
      (2L, ts("2024-01-01 10:00:00"), "t3")
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 100.0),
      (1L, ts("2024-01-01 10:03:00"), 101.0),
      (2L, ts("2024-01-01 10:30:00"), 50.0) // after the trade — invisible
    ).toDF("sym", "qt", "px")

    val out = AsofJoin.backward(trades, quotes, "sym", "t", "qt", Seq("px"))
      .orderBy("trade_id").collect()

    assert(out(0).getAs[Double]("px") === 100.0) // t1 sees 09:59
    assert(out(1).getAs[Double]("px") === 101.0) // t2 sees 10:03
    assert(out(2).isNullAt(out(2).fieldIndex("px"))) // t3: nothing earlier
  }

  test("null keys match nothing — equi-join semantics, not null-partition carry") {
    import spark.implicits._
    // a null-key left row and an EARLIER null-key right row land in
    // the same window partition; SQL `l.k = r.k` yields no match, so
    // the left row must keep a null payload — the right payload must
    // not be carried across the shared null partition
    val l = Seq(
      (Option.empty[Long], ts("2024-01-01 10:00:00"), "null_key"),
      (Option(1L), ts("2024-01-01 10:00:00"), "real_key")
    ).toDF("k", "t", "id")
    val r = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 99.0),
      (Option(1L), ts("2024-01-01 09:00:00"), 7.0)
    ).toDF("k", "qt", "v")
    val out = AsofJoin.backward(l, r, "k", "t", "qt", Seq("v"))
      .orderBy("id").collect()
    assert(out(0).getString(2) === "null_key" && out(0).isNullAt(out(0).fieldIndex("v")))
    assert(out(1).getString(2) === "real_key" && out(1).getAs[Double]("v") === 7.0)
  }

  test("right row exactly at the left time is visible (inclusive bound)") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "id")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "qt", "v")
    val out = AsofJoin.backward(l, r, "k", "t", "qt", Seq("v")).collect()
    assert(out(0).getAs[Double]("v") === 7.0)
  }

  test("left columns all survive and multiple payload columns attach") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-02 00:00:00"), "a", 9)).toDF("k", "t", "tag", "n")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.5, "q1")).toDF("k", "qt", "v", "src")
    val out = AsofJoin.backward(l, r, "k", "t", "qt", Seq("v", "src"))
    assert(out.columns.toSeq === Seq("k", "t", "tag", "n", "v", "src"))
    val row = out.collect()(0)
    assert(row.getAs[String]("src") === "q1" && row.getAs[Int]("n") === 9)
  }

  test("as-of plan shuffles the union exactly once") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong % 5, ts(f"2024-01-01 10:${i % 60}%02d:00"), i)).toDF("k", "t", "id")
    val r = (1 to 50).map(i => (i.toLong % 5, ts(f"2024-01-01 09:${i % 60}%02d:00"), i * 1.0)).toDF("k", "qt", "v")
    val p = AsofJoin.backward(l, r, "k", "t", "qt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(1200))
  }
}
