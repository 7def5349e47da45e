package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered filter-cascade attrition audit — the per-rule accounting a
  * curation pipeline publishes next to its output (the C4/Gopher
  * papers report exactly this table): rule i examines only the
  * survivors of rules 1..i-1, every document is attributed to the
  * FIRST rule that drops it, and the audit emits one row per rule
  * (n_dropped, n_remaining) plus a final `pass` row.
  *
  * Built as ONE pass: the first-failing-stage verdict is a single
  * nested CASE inside whole-stage codegen, the count agg map-side
  * combines to ≤ rules+1 rows per partition, and the only
  * unpartitioned window (the cumulative drop sum) runs over the
  * RULE-cardinality frame — never the corpus. Attribution semantics
  * (first failure, not all failures) is what makes the funnel
  * additive: Σ n_dropped + n_pass = corpus size, asserted in the spec.
  */
object FilterFunnel {

  /** @param rules ordered (name, pass-predicate) pairs; a row failing
    *              rule i (and passing 1..i-1) is attributed to stage
    *              i+1. Returns (stage, rule, n_dropped, n_remaining)
    *              sorted by stage, with a trailing `pass` row.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 64, "need 1..64 rules")
    import df.sparkSession.implicits._
    val passStage = (rules.size + 1).toLong
    val stage = rules.zipWithIndex.foldRight(lit(passStage)) {
      case (((_, pred), i), els) => when(!pred, lit((i + 1).toLong)).otherwise(els)
    }
    val counts = df.select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n"))
    val names = (rules.zipWithIndex.map { case ((name, _), i) =>
      ((i + 1).toLong, name)
    } :+ (passStage, "pass")).toDF("stage", "rule")
    // the funnel frame is rule-cardinality — the unbounded windows
    // below run over ≤ rules+1 rows, not the corpus
    val whole = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val upTo = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    names.join(counts, Seq("stage"), "left")
      .select(col("stage"), col("rule"),
        when(col("stage") === passStage, lit(0L))
          .otherwise(coalesce(col("n"), lit(0L))).as("n_dropped"),
        coalesce(col("n"), lit(0L)).as("_n0"))
      .withColumn("n_remaining",
        sum(col("_n0")).over(whole) - sum(col("n_dropped")).over(upTo))
      .drop("_n0")
  }
}
