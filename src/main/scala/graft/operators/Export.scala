package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the last mile of the curation pipeline
  * (dedup → quality filter → pack → EXPORT): write the corpus as a
  * deterministic set of token-budgeted shards a training loader
  * streams sequentially. The reference stops at datamart parquet
  * (reference src/spark/collector.py:541,875,1130 — plain partitioned
  * writes); sharded export is part of the training-data extension
  * surface.
  *
  * Shard assignment is a pure function of the corpus: documents are
  * laid out in id order, each document's global token offset comes
  * from the two-level distributed prefix sum ([[Packing.prefixSum]] —
  * no corpus-wide single-partition window), and a document belongs to
  * `shard = tok_offset div tokensPerShard`. Documents never split
  * across shards (loaders want whole records); a shard's token total
  * therefore overshoots the budget by at most one document. Everything
  * is integer arithmetic in a deterministic order — rerunning the
  * export on the same corpus reproduces byte-identical assignments,
  * which is what makes incremental re-export and train-resume sane.
  */
object Export {

  /** (idCol, nTokCol, tok_offset, shard) — one row per document.
    * Zero-token documents are dropped (they occupy no loader bytes;
    * keeping them would pin empty records to boundary shards).
    *
    * Shard ids are contiguous 0..n-1 ONLY because no document exceeds
    * the budget: a doc with n_tok ≤ tokensPerShard advances the next
    * offset by at most one whole shard, so `offset div budget` never
    * skips an index. An oversize doc would silently leave empty shard
    * indices behind it (breaking the "one file per shard id" loader
    * contract), so it is rejected per-row via assert_true — a codegen'd
    * check inside the same pass, not an extra aggregation.
    */
  def shardAssignments(docs: DataFrame, idCol: String, nTokCol: String,
                       tokensPerShard: Long, bucketWidth: Long): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    Packing.prefixSum(docs, idCol, nTokCol, "tok_offset", bucketWidth)
      .where(col(nTokCol) > 0)
      .where(assert_true(col(nTokCol) <= lit(tokensPerShard),
        concat(lit(s"shardAssignments: document exceeds tokensPerShard=$tokensPerShard "),
          lit("(would leave gaps in shard numbering); split or chunk it first: id="),
          col(idCol).cast("string"))).isNull)
      .withColumn("shard", expr(s"tok_offset DIV $tokensPerShard"))
  }

  /** Write the shard layout at rest: `dir/shard=N/...` with one
    * parquet file per shard (each shard is one sequential read for the
    * loader). Returns the number of shards written. The repartition
    * keys rows by their FINAL shard so the writer emits each shard
    * from one task — without it every task would append a sliver file
    * to every shard directory, recreating the small-file problem the
    * export exists to avoid.
    */
  def writeShards(docs: DataFrame, idCol: String, nTokCol: String,
                  tokensPerShard: Long, bucketWidth: Long, dir: String): Long = {
    val assigned = shardAssignments(docs, idCol, nTokCol, tokensPerShard, bucketWidth)
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
    // count shards from what was WRITTEN: a partition-column-only scan
    // is directory-listing work — re-running `assigned`'s lineage
    // (tokenize + prefix sum, two shuffles) just for a count would
    // double the export's cost
    assigned.sparkSession.read.parquet(dir)
      .select(col("shard")).distinct().count()
  }

  /** Append-only incremental export for corpus increments: new
    * documents get shards AFTER the current maximum, existing shard
    * files are never rewritten — at 100 TB a daily increment must not
    * rewrite yesterday's layout (and byte-stable old shards are what
    * keeps loader caches and train-resume valid). The increment
    * starts at a FRESH shard boundary rather than topping up the
    * possibly-partial last shard — topping up would rewrite an
    * existing file, which is the thing this path exists to avoid; the
    * cost is one undershot shard per increment, amortized to nothing.
    *
    * Contract: increments are id-ordered batches — every new id must
    * exceed the last exported id (enforced per-row via assert_true;
    * out-of-order ids would silently violate the id-ordered layout
    * the manifest and dedup-by-prefix rely on). The existing layout's
    * bounds are read cheaply: max shard from the partition column
    * (directory-listing work) and max exported id from ONLY the last
    * shard's file via partition pruning (ids are laid out in order,
    * so the global max id lives in the max shard).
    *
    * Returns the total shard count after the append.
    */
  def appendShards(newDocs: DataFrame, idCol: String, nTokCol: String,
                   tokensPerShard: Long, bucketWidth: Long, dir: String): Long = {
    val spark = newDocs.sparkSession
    val existing = spark.read.parquet(dir)
    val maxShard = existing
      .agg(max(col("shard").cast("long"))).head().getLong(0)
    val maxId = existing
      .where(col("shard") === maxShard)
      .agg(max(col(idCol))).head().getLong(0)
    val guarded = newDocs.where(assert_true(col(idCol) > lit(maxId),
      concat(lit(s"appendShards: id not past the exported prefix (max exported id $maxId): "),
        col(idCol).cast("string"))).isNull)
    val assigned = shardAssignments(guarded, idCol, nTokCol, tokensPerShard, bucketWidth)
      .withColumn("shard", col("shard") + lit(maxShard + 1))
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.partitionBy("shard").mode("append").parquet(dir)
    spark.read.parquet(dir).select(col("shard")).distinct().count()
  }

  /** Per-shard manifest aggregated from the AT-REST files (not the
    * in-flight assignment): doc/token counts and the id span. Reading
    * back is the point — the manifest certifies what a loader will
    * actually see, and hash-checking it against an independent rebuild
    * of the assignment proves the write path end to end.
    */
  def shardManifest(spark: SparkSession, dir: String,
                    idCol: String, nTokCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokCol)).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
}
