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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 —
    * published definition) for a CATEGORICAL sensitive attribute:
    * per quasi-identifier class, the total-variation distance between
    * the class's sensitive-value distribution and the corpus-global
    * one (= EMD under the uniform ground metric), in EXACT ppm fixed
    * point so both engines agree bit for bit:
    *
    *   tvd_ppm = (1e6 · Σ_v |n_cv·n − n_v·n_c|) div (2·n_c·n)
    *
    * Values absent from a class contribute algebraically —
    * Σ_{v absent} n_v·n_c = n_c·(n − Σ_{v present} n_v) — so no
    * class × domain grid ever materializes. All products run in
    * DECIMAL(38,0) per the fixed-point envelope policy (n_c·n crosses
    * BIGINT in the 1e10-row regime the audit exists for).
    *
    * Null handling: a NULL sensitive value is a category of its own
    * (null-safe join against the global distribution); rows with a
    * NULL quasi-identifier are excluded up front — a null class key
    * is not a publishable equivalence class, and equality-join
    * semantics would silently drop it half-way through otherwise.
    *
    * Scale: two map-side-combinable aggregations keyed by the QI
    * tuple (± sensitive), a broadcast of the |domain|-row global
    * table, and one class-keyed re-aggregation — nothing quadratic.
    */
  def tClosenessAudit(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                      tPpm: Long): DataFrame = {
    require(tPpm >= 0 && tPpm <= 1000000L, s"tPpm must be in [0, 1e6], got $tPpm")
    val base0 = df.select((quasi :+ sensitive.as("__s")): _*)
    val qiNames = base0.columns.dropRight(1).toSeq
    val base = base0.where(qiNames.map(col(_).isNotNull).reduce(_ && _))
    val global = base.groupBy(col("__s").as("__gs"))
      .agg(count(lit(1)).as("__nv"))
    val total = base.agg(count(lit(1)).as("__n"))
    val cs = base.groupBy(qiNames.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__ncv"))
    val classes = cs.groupBy(qiNames.map(col): _*)
      .agg(sum(col("__ncv")).as("class_size"))
    cs.join(broadcast(global), col("__s") <=> col("__gs"))
      .join(classes, qiNames)
      .crossJoin(broadcast(total))
      .groupBy(qiNames.map(col) :+ col("class_size") :+ col("__n"): _*)
      .agg(
        sum(abs(col("__ncv").cast("decimal(38,0)") * col("__n") -
          col("__nv").cast("decimal(38,0)") * col("class_size"))).as("__dev_present"),
        sum(col("__nv")).as("__nv_present"))
      .withColumn("__dev",
        col("__dev_present") +
          col("class_size").cast("decimal(38,0)") * (col("__n") - col("__nv_present")))
      .withColumn("tvd_ppm", expr(
        "CAST((CAST(__dev AS DECIMAL(38,0)) * 1000000) div " +
          "(2 * CAST(class_size AS DECIMAL(38,0)) * __n) AS BIGINT)"))
      .withColumn("meets_t", col("tvd_ppm") <= tPpm)
      .select(qiNames.map(col) :+ col("class_size") :+
        col("tvd_ppm") :+ col("meets_t"): _*)
  }

  /** Entropy l-diversity audit (Machanavajjhala et al., ICDE 2006 —
    * the stricter form of the distinct-count check in
    * [[kAnonymityAudit]]): a class passes when the Shannon entropy of
    * its sensitive distribution is at least ln(l), so one dominant
    * value cannot hide behind l-1 rare ones.
    *
    * Cross-engine arithmetic follows the DSIR quantized-log pattern:
    * each (class, value) row contributes n_cv · floor(1e6·ln(n_c/n_cv))
    * — an order-free BIGINT sum — and the verdict compares the
    * UNDIVIDED sum against class_size · floor(1e6·ln(l)) (division-
    * free, so no truncation seam). The reported `entropy_x1e6` is the
    * integral division of that sum by class_size. Residual risk is a
    * floor landing within one double ulp of an integer for some
    * n_c/n_cv ratio — the documented DSIR boundary class, negligible
    * at class-cardinality row counts.
    *
    * Null handling matches [[tClosenessAudit]]: a NULL sensitive
    * value is a category of its own; NULL quasi-identifiers are
    * excluded up front.
    */
  def entropyLDiversityAudit(df: DataFrame, quasi: Seq[Column],
                             sensitive: Column, l: Int): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    val base0 = df.select((quasi :+ sensitive.as("__s")): _*)
    val qiNames = base0.columns.dropRight(1).toSeq
    val base = base0.where(qiNames.map(col(_).isNotNull).reduce(_ && _))
    val threshold = math.floor(1e6 * math.log(l.toDouble)).toLong
    base.groupBy(qiNames.map(col) :+ col("__s"): _*)
      .agg(count(lit(1)).as("__ncv"))
      .withColumn("__nc",
        sum(col("__ncv")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(qiNames.map(col): _*)))
      .groupBy(qiNames.map(col) :+ col("__nc").as("class_size"): _*)
      // per-term floor cast to LONG before the multiply: the sum is a
      // plain BIGINT fold on both engines, order-free by construction.
      // GUARD BAND (advice r14): JVM Math.log and libm ln can differ
      // by an ulp (~4e-9 after the 1e6 multiply); if a computed value
      // lands within 1e-7 of an integer, snap to that integer instead
      // of flooring — both engines then agree anywhere inside the
      // band, and the seam moves from the integers (where quantized
      // logs of near-integer-power ratios cluster; measured minimum
      // true distance 2.3e-7 over 2.1M fuzz pairs, see
      // docs/ROBUSTNESS.md) to the unstructured band edge m±1e-7.
      // Mirrored verbatim in the DuckDB twin.
      .agg(sum(col("__ncv") *
        quantizedLogTerm(col("__nc"), col("__ncv"))).as("__esum"))
      .withColumn("entropy_x1e6", expr("__esum div class_size"))
      .withColumn("meets_el", col("__esum") >= col("class_size") * threshold)
      .select(qiNames.map(col) :+ col("class_size") :+
        col("entropy_x1e6") :+ col("meets_el"): _*)
  }

  /** The per-term quantized log the entropy audit folds:
    * floor(1e6·ln(nc/ncv)) with the snap-to-integer guard band.
    * SHARED by the audit and [[graft.tools.LogBoundaryFuzz]] so the
    * boundary-fuzz harness certifies the exact shipping expression,
    * never a reimplementation. Mirrored verbatim in the DuckDB twin
    * (LakehouseQueries privacy_entropy_l) and the fuzz driver's
    * oracle-side SQL (tools/log_boundary_fuzz.py).
    */
  private[graft] def quantizedLogTerm(nc: Column, ncv: Column): Column = {
    val y = lit(1e6) * log(nc.cast("double") / ncv)
    when(abs(y - round(y)) <= lit(1e-7), round(y))
      .otherwise(floor(y)).cast("long")
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
