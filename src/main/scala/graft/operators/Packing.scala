package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Sequence packing for LLM training pipelines: lay every document's
  * tokens end-to-end in a deterministic global order and split the
  * stream into fixed-budget context windows ("concat-and-chunk", the
  * standard GPT-style pack). The hard part at scale is the global
  * running token offset — a naive `Window.orderBy(id)` with no
  * partition column funnels the whole corpus through ONE task. This
  * module ships the two-level distributed prefix sum instead:
  *
  *   1. bucket rows by `floor(order / bucketWidth)`;
  *   2. aggregate per-bucket totals — a table of ~N/bucketWidth rows;
  *   3. running-sum THAT small table (the only unpartitioned window,
  *      over bucket-cardinality rows) into per-bucket start offsets;
  *   4. broadcast the offsets back and window only WITHIN each bucket.
  *
  * Choose bucketWidth ≈ sqrt(N): at 10^11 documents that is ~316k
  * buckets (a few MB broadcast) and ≤316k rows per in-bucket window
  * partition — both sides stay bounded. No stage sees the corpus in a
  * single partition.
  *
  * The reference repo has no packing surface; this is part of the
  * training-data extension mandated by the builder prompt.
  */
object Packing {

  /** Exclusive running total of `valueCol` in `orderCol` order, as
    * column `outCol`. `orderCol` must be unique non-negative (a doc
    * id); `valueCol` non-negative. See class doc for the two-level
    * shape; result equals
    * `sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer DIV, not floor(/): fp division loses ulps above 2^53,
    // and content-addressed (hashed) ids live there legitimately.
    val bucketed = df.withColumn("__bkt",
      expr(s"CAST(`$orderCol` AS BIGINT) DIV $bucketWidth"))
    // Bucket-level start offsets: tiny table, safe to sort in one task
    // and broadcast (N/bucketWidth rows — see sizing note above).
    val offsets = bucketed
      .groupBy(col("__bkt"))
      .agg(sum(col(valueCol)).as("__btot"))
      .withColumn("__boff",
        coalesce(
          sum(col("__btot")).over(
            Window.orderBy(col("__bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__boff"))
    val inBucket = Window
      .partitionBy(col("__bkt"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn(outCol,
        col("__boff") + coalesce(sum(col(valueCol)).over(inBucket), lit(0L)))
      .drop("__bkt", "__boff")
  }

  /** Concat-and-chunk pack: one output row per (document × context
    * window it occupies). A document whose token span [start, start+n)
    * crosses a budget boundary is split across consecutive chunks —
    * exactly how a pretraining loader packs. Output columns:
    * id, `chunk_id` (0-based global window index), `tok_in_chunk`
    * (this document's token count inside that window), `tok_offset`
    * (the document's global start offset — makes the pack auditable).
    * Zero-token documents occupy no chunk and are dropped.
    */
  def packChunks(docs: DataFrame, idCol: String, nTokCol: String,
                 budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val withStart =
      prefixSum(docs, idCol, nTokCol, "tok_offset", bucketWidth)
        .where(col(nTokCol) > 0)
    val start = col("tok_offset")
    val end = start + col(nTokCol) // exclusive
    withStart
      // integer DIV, not floor(/): fp division loses ulps above 2^53,
      // exactly the cumulative-offset regime the two-level prefix sum
      // exists for — a boundary doc would land in the wrong chunk
      .withColumn("chunk_id",
        explode(sequence(expr(s"tok_offset div $budget"),
          expr(s"(tok_offset + `$nTokCol` - 1) div $budget"))))
      .withColumn("tok_in_chunk",
        least(end, (col("chunk_id") + 1) * budget) -
          greatest(start, col("chunk_id") * budget))
      .select(col(idCol), col("chunk_id"), col("tok_in_chunk"),
        col("tok_offset"))
  }

  /** Length-bucketed batching for inference: group documents of
    * similar token count (linear width-`bucketWidth` buckets — integer
    * DIV, engine-portable; log buckets would ride on libm log2 ulps)
    * and form fixed-size batches inside each (bucket, shard), so
    * per-batch padding waste = batch max − doc length stays small.
    * The shard (hash of the id) bounds every window partition at
    * corpus/(buckets·shards) rows — without it a popular length
    * bucket becomes ONE window task at 100 TB. Batching within a
    * shard costs nothing: batches are still length-homogeneous.
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String, nTokCol: String,
                          bucketWidth: Int, nShards: Int,
                          batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && nShards > 0 && batchSize > 0,
      "bucketWidth, nShards, batchSize must be positive")
    val byBatch = docs
      .withColumn("bucket", expr(s"`$nTokCol` DIV $bucketWidth"))
      .withColumn("shard", Sampling.modBucket(col(idCol), nShards))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bucket"), col("shard"))
          .orderBy(col(idCol))))
      .withColumn("batch", expr(s"(CAST(rn AS BIGINT) - 1) DIV $batchSize"))
    byBatch
      .withColumn("padding_waste",
        max(col(nTokCol)).over(
          Window.partitionBy(col("bucket"), col("shard"), col("batch"))) -
          col(nTokCol))
      .select(col(idCol), col("bucket"), col("shard"), col("batch"),
        col(nTokCol), col("padding_waste"))
  }

  /** Per-document sliding token windows (RAG-style chunking): window k
    * covers tokens [k·stride, k·stride+size); the last window may be
    * short; a document shorter than `size` yields one window. A pure
    * per-row projection — no shuffle at any scale. Emits content
    * anchors (first/last token of each window) so a checker is
    * sensitive to slicing, not just counts.
    */
  def slidingChunks(docs: DataFrame, idCol: String, toks: Column,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val n = F.size(toks)
    // ceil((n - size) / stride) extra windows beyond the first.
    val nChunks =
      when(n <= 0, lit(0L))
        .otherwise(lit(1L) +
          greatest(lit(0L), ceil((n - lit(size)).cast("double") / stride).cast("long")))
    docs
      .withColumn("__toks", toks)
      .where(nChunks > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("__from", (col("chunk_idx") * stride).cast("int"))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(F.size(col("__toks")) - col("__from"), lit(size))
          .cast("long").as("n_in_chunk"),
        element_at(col("__toks"), col("__from") + 1).as("first_tok"),
        element_at(col("__toks"),
          least(F.size(col("__toks")), col("__from") + size))
          .as("last_tok"))
  }
}
