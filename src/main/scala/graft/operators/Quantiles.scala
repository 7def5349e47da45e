package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles — the companion to the approximate
  * [[QuantileSketch]]: when the cut VALUES must be reproducible to
  * the bit (gate thresholds, equi-depth optimizer statistics, CCNet
  * bucket edges), a sketch's ±εn rank slack is the wrong tool.
  *
  * The scale problem with exact quantiles is the global ordered
  * cumsum; this module factors it through [[Packing.prefixSum]]'s
  * two-level shape instead: value-histogram aggregation (distinct
  * values ≤ rows, usually ≪), bucket totals, ONE window over the
  * bucket-aggregate table, in-bucket windows — no stage ever sees the
  * dataset in a single partition. Cuts come back as a tiny broadcast
  * table.
  */
object Quantiles {

  /** For each target rank r (1-based, ascending), the smallest value
    * whose inclusive cumulative count reaches r — i.e. the exact
    * r-th smallest element. `valueCol` must be a non-negative BIGINT
    * column (quantize floats first: one IEEE multiply+floor is
    * deterministic on every engine). Returns (rank, cut), one row per
    * requested rank — model-sized, broadcastable.
    *
    * `bucketWidth` groups adjacent values for the two-level prefix
    * sum; size it so that (value domain / bucketWidth) stays small —
    * the bucket-total table goes through ONE window task and a
    * broadcast. The 1000 default fits dense integer domains (counts,
    * permille scores); for sparse/wide domains (hash-like values,
    * byte sizes to 1e12) pass bucketWidth ≈ domain / sqrt(distinct)
    * or the offsets frame approaches histogram size and the single
    * window task becomes the bottleneck the module exists to avoid.
    */
  def exactCutsByRank(df: DataFrame, valueCol: String,
                      ranks: Seq[Long], bucketWidth: Long = 1000L): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(_ >= 1), s"ranks must be >= 1: $ranks")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val byVal = df.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val cum = Packing.prefixSum(byVal, "__v", "__cnt", "__excl", bucketWidth)
      .withColumn("__cum", col("__excl") + col("__cnt"))
    // ALL cuts in one aggregation pass (B min-if columns), then
    // unpivoted to (rank, cut) rows — never B scans of the histogram
    val sorted = ranks.distinct.sorted
    val aggs = sorted.map(r => min(when(col("__cum") >= r, col("__v"))).as(s"__c$r"))
    cum.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(sorted.map(r =>
        struct(lit(r).as("rank"), col(s"__c$r").as("cut"))): _*)).as("s"))
      .select(col("s.rank").as("rank"), col("s.cut").as("cut"))
  }
}
