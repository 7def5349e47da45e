package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for publishable datasets — the release gate that
  * complements content-level PII redaction (`text_pii_redact`):
  * k-anonymity (no quasi-identifier equivalence class smaller than k)
  * and l-diversity (each class carries at least l distinct sensitive
  * values), per Sweeney's and Machanavajjhala's published definitions.
  *
  * Scale: the audit is ONE map-side-combinable aggregation keyed by
  * the quasi-identifier tuple — class cardinality is bounded by the
  * generalized QI space, which the caller controls via banding.
  * Suppression is one window keyed the same way; partitions are
  * class-sized, never corpus-sized.
  */
object Privacy {

  /** Per-equivalence-class audit: class size, sensitive-value
    * diversity, and the k/l verdicts. `quasi` columns must be aliased
    * by the caller (they become the output's class key).
    */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                      k: Int, l: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitive).as("l_diversity"))
      .withColumn("meets_k", col("class_size") >= k)
      .withColumn("meets_l", col("l_diversity") >= l)
  }

  /** Row-level suppression: keep only rows whose quasi-identifier
    * class has at least k members (the minimal-loss release of a
    * failing table: small classes are dropped, nothing is perturbed).
    */
  def suppressBelowK(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(quasi: _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .where(col("__n") >= k)
      .drop("__n")
  }
}
