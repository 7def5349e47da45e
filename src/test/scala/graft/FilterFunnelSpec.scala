package graft

import org.apache.spark.sql.functions._
import graft.operators.FilterFunnel

class FilterFunnelSpec extends SparkSpec {

  private def df(xs: Seq[Long]) = {
    import spark.implicits._
    xs.toDF("x")
  }

  test("attribution goes to the FIRST failing rule; funnel is additive") {
    // x=1 fails both rules; must be attributed to rule 1 only
    val out = FilterFunnel.audit(df(Seq(1L, 2L, 3L, 10L, 20L)), Seq(
      "ge2" -> (col("x") >= 2L),   // drops 1
      "even" -> (col("x") % 2 === 0L), // drops 3 (1 already gone)
      "ge15" -> (col("x") >= 15L)  // drops 2, 10
    )).collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("ge2") === (1L, 4L))
    assert(out("even") === (1L, 3L))
    assert(out("ge15") === (2L, 1L))
    assert(out("pass") === (0L, 1L))
    assert(out.values.map(_._1).sum + out("pass")._2 === 5L)
  }

  test("a rule that drops nothing still appears with zero and an unchanged remainder") {
    val out = FilterFunnel.audit(df(Seq(2L, 4L)), Seq(
      "pos" -> (col("x") > 0L),
      "even" -> (col("x") % 2 === 0L)
    )).orderBy("stage").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("pos", "even", "pass"))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L, 0L))
    assert(out.map(_.getLong(3)).toSeq === Seq(2L, 2L, 2L))
  }

  test("empty input yields an all-zero funnel with every rule row present") {
    val out = FilterFunnel.audit(df(Seq.empty[Long]), Seq(
      "a" -> (col("x") > 0L), "b" -> (col("x") < 0L)))
      .orderBy("stage").collect()
    assert(out.length === 3)
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }
}
