package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** DSIR-style importance weighting (Xie et al., NeurIPS 2023,
  * arXiv:2302.03169): score every raw document by how much more
  * likely its hashed bag-of-words is under the TARGET domain's
  * feature distribution than under the raw corpus's — the
  * trained-classifier-free way to focus a 100 TB crawl on a domain
  * given only example documents of that domain.
  *
  * Features are FNV-1a-hashed word buckets (the seed-free kernel the
  * simhash/CMS oracles already rebuild in SQL), add-one smoothed over
  * the full bucket domain. The per-bucket log-likelihood ratio
  * log2(p_t(b)/p_r(b)) is quantized to fixed point ONCE per bucket
  * (floor(·1e4) of a double both engines derive from identical exact
  * integer counts), so each document's score is an order-free BIGINT
  * sum of bucket constants — summation order cannot perturb it, and
  * the only cross-engine float step is B bucket-level log2 calls, not
  * a per-token float reduction.
  *
  * Scale shape: one corpus pass builds the B-row bucket table
  * (map-side-combinable count agg → B rows, broadcast back), one
  * corpus pass scores (hash → broadcast-join → per-doc sum agg). The
  * smoothed totals are a single bounded driver pull. No shuffle ever
  * exceeds min(corpus tokens, B) rows beyond the doc-keyed sum.
  *
  * Returns (idCol, is_target, n_feats, score_fp, avg_fp): `score_fp`
  * the summed fixed-point log-ratio, `avg_fp` its truncating per-
  * feature mean — resample raw docs ∝ exp2(score) or rank on avg_fp.
  */
object Dsir {

  val LogScale = 10000L

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 512): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be 2..2^20, got $buckets")
    val spark = docs.sparkSession
    val words = docs.select(col(idCol).as("_ds_id"), isTarget.as("_ds_t"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    val wb = words.select(col("_ds_id"), col("_ds_t"),
      pmod(GraftFunctions.tokenHashes(col("w")).getItem(0),
        lit(buckets.toLong)).as("b"))

    val agg = wb.groupBy("b").agg(
      count(lit(1)).as("cr0"),
      sum(when(col("_ds_t"), 1L).otherwise(0L)).as("ct0"))
    val tbl = spark.range(buckets).select(col("id").as("b"))
      .join(agg, Seq("b"), "left")
      .select(col("b"),
        (coalesce(col("cr0"), lit(0L)) + lit(1L)).as("cr"),
        (coalesce(col("ct0"), lit(0L)) + lit(1L)).as("ct"))
    // smoothed totals: bounded (2-long) driver pull off the B-row table
    val totals = tbl.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt")).head()
    val nr = totals.getLong(0)
    val nt = totals.getLong(1)
    val qlog = tbl.select(col("b"),
      floor(log2((col("ct") * lit(nr)).cast("double") / (col("cr") * lit(nt)))
        * lit(LogScale.toDouble)).cast("long").as("qlog"))

    wb.join(broadcast(qlog), "b")
      .groupBy(col("_ds_id"), col("_ds_t"))
      .agg(count(lit(1)).as("n_feats"), sum(col("qlog")).as("score_fp"))
      .select(col("_ds_id").as(idCol), col("_ds_t").as("is_target"),
        col("n_feats"), col("score_fp"),
        expr("score_fp div n_feats").as("avg_fp"))
  }
}
