package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suites — the ingestion gate a
  * production pipeline runs before publishing a table (the Deequ /
  * dbt-test shape): each check reports its violation count, total, and
  * pass/fail as one result row.
  *
  * Scale shapes, per check family:
  *  - row checks (completeness / bounds / set-membership): ALL checks
  *    in ONE map-side-combined aggregation pass — adding a check adds
  *    a column to the aggregate, never a pass over the data;
  *  - uniqueness: two-level aggregate (group by the key, then count
  *    groups vs rows) — no Expand, both levels partial-combine;
  *  - referential integrity: left join against the distinct reference
  *    keys, violations counted in the same pass (the planner
  *    broadcasts dimension-sized reference sides).
  * Every family's result is a 1-row aggregate; the suite unions these
  * constant-size frames, so the report never grows with the data.
  */
object Expectations {

  /** A named row-level expectation: `violation` is the predicate that
    * marks a BAD row (true = violates).
    */
  final case class RowCheck(name: String, violation: Column)

  private def report(name: String, violations: Column, total: Column) =
    Seq(lit(name).as("check_name"), violations.as("violations"), total.as("total"))

  /** All row-level checks in one aggregation pass; one result row per
    * check.
    */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    val aggs = count(lit(1)).as("__total") +:
      checks.map(c => sum(when(c.violation, lit(1L)).otherwise(lit(0L))).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    checks.map { c =>
      one.select(report(c.name, col(c.name), col("__total")): _*)
    }.reduce(_.unionAll(_))
  }

  /** Duplicate-key violations: rows beyond the first per key value.
    * Two-level aggregate — no Expand from mixing count_distinct with
    * plain aggregates.
    */
  def uniqueness(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__cnt"))
      .agg(sum(col("__cnt")).as("__total"), count(lit(1)).as("__distinct"))
      .select(report(name, col("__total") - col("__distinct"), col("__total")): _*)

  /** Referential-integrity violations: non-null foreign keys absent
    * from the reference column. Violations and total ride one pass
    * over the left join.
    */
  def referential(df: DataFrame, name: String, fkCol: String,
                  ref: DataFrame, refCol: String): DataFrame = {
    val refKeys = ref.select(col(refCol).as("__ref_key")).distinct()
      .withColumn("__present", lit(1))
    df.join(refKeys, col(fkCol) === col("__ref_key"), "left")
      .agg(count(lit(1)).as("__total"),
        sum(when(col(fkCol).isNotNull && col("__present").isNull, lit(1L))
          .otherwise(lit(0L))).as("__viol"))
      .select(report(name, col("__viol"), col("__total")): _*)
  }

  /** Union per-family reports into the final suite result:
    * (check, violations, total, passed), one row per check.
    */
  def suite(parts: DataFrame*): DataFrame =
    parts.reduce(_.unionAll(_))
      .withColumn("passed", col("violations") === 0L)
}
