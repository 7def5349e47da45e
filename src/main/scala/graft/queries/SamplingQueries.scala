package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Layout, Sampling}

/** Deterministic sampling / splitting / layout queries over `events`.
  * All three use engine-portable integer arithmetic (multiplicative
  * hash, bit interleave), so every row-level membership decision is
  * hash-compared against the DuckDB twin — not just row counts.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val SplitWeights = Seq("train" -> 800, "val" -> 100, "test" -> 100)
  private val StrataPerMille = Map("click" -> 100, "purchase" -> 500, "view" -> 200)
  private val DefaultPerMille = 50

  val queries: Map[String, Q] = Map(
    // Train/val/test split: membership is a pure function of the row
    // id — reproducible across runs, partitionings, and engines.
    "sample_hash_split" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_id"),
          Sampling.splitLabel(col("event_id"), SplitWeights).as("split"))
    }),

    // Dedup-aware (leakage-safe) split: membership is a function of
    // the duplicate GROUP's canonical id, not the row id, so copies of
    // a document can never straddle train/test — the classic
    // eval-contamination bug in training-data pipelines. Exact-dup
    // groups (content hash) keep the oracle fully row-checkable; for
    // NEAR-dup safety the same shape composes with the minhash cluster
    // ids from Dedup.connectedComponents (dedup_pipeline) in place of
    // the md5 group key.
    "sample_dedup_aware_split" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val canon = docs.groupBy(md5(col("text")).as("k"))
        .agg(min(col("doc_id")).as("canonical_id"))
      docs.select(col("doc_id"), md5(col("text")).as("k"))
        .join(canon, Seq("k"))
        .select(col("doc_id"), col("canonical_id"),
          Sampling.splitLabel(col("canonical_id"), SplitWeights).as("split"))
    }),

    // Per-stratum deterministic Bernoulli sample with differing
    // allocations (replaces rand()-based sampleBy).
    "sample_stratified" -> ((spark, dir) => {
      Sampling.stratifiedSample(
        Tables.events(spark, dir), col("event_type"), col("event_id"),
        StrataPerMille, DefaultPerMille)
        .select(col("event_id"), col("event_type"))
    }),

    // Per-stratum deterministic reservoir: the k rows with the
    // smallest multiplicative hash per event_type — uniform without
    // replacement, stable across runs/partitionings, and planned by
    // the custom TopKPerKey operator (map-side bounded heaps) via the
    // engine-wide row_number rewrite, so only k rows per key per
    // partition ever move.
    "sample_reservoir_per_key" -> ((spark, dir) => {
      val h = pmod(col("event_id") * lit(Sampling.KnuthMultiplier), lit(1000000007L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(h.asc, col("event_id").asc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 20)
        .select(col("event_type"), col("rn").cast("long").as("rn"), col("event_id"))
    }),

    // Morton (Z-order) clustering key over two dimensions — the value
    // a layout-optimizing writer range-partitions by (Layout
    // .zorderCluster); checked bit-for-bit against DuckDB.
    "layout_zorder" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_id"),
          Layout.zorderKey(
            pmod(col("event_id"), lit(65536L)),
            pmod(col("user_id"), lit(65536L))).as("zkey"))
    })
  )

  private val splitSql: String = {
    val b = Sampling.modBucketSql("event_id", 1000)
    // Same cut points as SplitWeights, same first-match-wins order.
    s"""SELECT event_id,
       |  CASE WHEN $b < 800 THEN 'train'
       |       WHEN $b < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM events""".stripMargin
  }

  private val stratifiedSql: String = {
    val b = Sampling.modBucketSql("event_id", 1000)
    val alloc = StrataPerMille.foldRight(DefaultPerMille.toString) {
      case ((s, m), rest) => s"CASE WHEN event_type = '$s' THEN $m ELSE $rest END"
    }
    s"SELECT event_id, event_type FROM events WHERE $b < $alloc"
  }

  private val dedupAwareSplitSql: String = {
    val b = Sampling.modBucketSql("canonical_id", 1000)
    s"""WITH canon AS (
       |  SELECT md5(text) AS k, min(doc_id) AS canonical_id
       |  FROM documents GROUP BY 1
       |)
       |SELECT doc_id, canonical_id,
       |  CASE WHEN $b < 800 THEN 'train'
       |       WHEN $b < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents d JOIN canon ON md5(d.text) = canon.k""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sample_hash_split" -> splitSql,
    "sample_dedup_aware_split" -> dedupAwareSplitSql,
    "sample_reservoir_per_key" ->
      s"""SELECT event_type, rn, event_id FROM (
         |  SELECT event_type, event_id, row_number() OVER (
         |    PARTITION BY event_type
         |    ORDER BY (event_id * ${Sampling.KnuthMultiplier}) % 1000000007 ASC,
         |      event_id ASC) AS rn
         |  FROM events
         |) WHERE rn <= 20""".stripMargin,
    "sample_stratified" -> stratifiedSql,
    "layout_zorder" ->
      s"""SELECT event_id,
         |  ${Layout.zorderKeySql("event_id % 65536", "user_id % 65536")} AS zkey
         |FROM events""".stripMargin
  )
}
