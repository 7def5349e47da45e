package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.MoneyFx

/** Core relational operator queries (SURVEY §2.2-§2.8 inventory), each
  * paired with a DuckDB oracle over the same parquet tables.
  *
  * Conventions (driver compare hashes values after sorting columns by
  * name):
  *   - every computed column is aliased identically in Spark and SQL;
  *   - doubles are rounded to 4 decimals on both sides;
  *   - timestamps are emitted as strings or epoch seconds (the events
  *     table is ns-precision parquet; Spark truncates to micros while
  *     DuckDB keeps ns — never emit a raw timestamp).
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style aggregation (SURVEY A3: groupBy + count/sum).
    * Money sums ride the MoneyFx exact integer grid — the 10× gate
    * caught `sum(ep·(1−d))` diverging between engines by summation
    * order once groups held ~1M rows (r14); avg_disc is the same
    * grid over count so neither sum is order-dependent.
    */
  private val q1Agg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        MoneyFx.sumDiscPrice(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        round(sum(MoneyFx.cents(col("l_discount"))) /
          (count(col("l_discount")) * lit(100.0)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(round(l_extendedprice*100, 0) * (100 - round(l_discount*100, 0))) / 10000.0, 4) AS sum_disc_price,
        |  round(sum(round(l_discount*100, 0)) / (count(l_discount) * 100.0), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
