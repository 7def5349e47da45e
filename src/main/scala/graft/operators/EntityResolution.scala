package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find near-identical records
  * (vendor lists, user registries, catalog entries) whose keys differ
  * — the structured-data twin of document near-dup detection.
  *
  * Scale: the classic blocked design — the quadratic pair space is
  * confined to blocking-key groups (choose keys so blocks stay
  * bounded; unblockable corpora go through MinHash/LSH exactly like
  * text). Two cheap prunes run before the edit distance: the length
  * difference bound (|len a − len b| > k can never pass) and Spark's
  * THRESHOLDED levenshtein, which abandons a pair once its running
  * distance exceeds k (O(n·k) per pair, not O(n²)).
  */
object EntityResolution {

  /** All within-block record pairs with edit distance <= maxDist. */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                               blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCols.nonEmpty, "blocked matching needs at least one blocking key")
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("__id") :+ col(nameCol).as("__nm")): _*)
    val l = base.select(blockCols.map(col) :+
      col("__id").as("id_a") :+ col("__nm").as("nm_a"): _*)
    val r = base.select(blockCols.map(col) :+
      col("__id").as("id_b") :+ col("__nm").as("nm_b"): _*)
    l.join(r, blockCols)
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("__d", levenshtein(col("nm_a"), col("nm_b"), maxDist))
      .where(col("__d") >= 0) // thresholded form returns -1 past maxDist
      .select(col("id_a"), col("id_b"), col("__d").cast("long").as("dist"))
  }
}
