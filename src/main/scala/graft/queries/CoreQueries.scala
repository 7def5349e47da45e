package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

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

  /** TPC-H Q1-style aggregation (SURVEY A3: groupBy + count/sum). */
  private val q1Agg: Q = (spark, dir) => {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
