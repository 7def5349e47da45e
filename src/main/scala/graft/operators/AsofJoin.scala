package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark's built-in join set lacks.
  *
  * For each left row, attaches the payload of the LATEST right row with
  * `rightTime <= leftTime` for the same key (the classic trades⋈quotes
  * shape). Left rows with no earlier right row keep a null payload
  * (left-outer semantics).
  *
  * Implementation is the scale-correct union+carry plan, not a range
  * join: tag both inputs, union them, and run ONE ordered window pass
  * per key carrying the last-seen right payload forward. Cost is a
  * single hash shuffle of (left + right) by key plus a per-key sort —
  * no |left| × |right-window| intermediate ever materializes, so the
  * plan survives arbitrarily dense right sides (where a range-join
  * rewrite explodes). Skewed keys fall back to
  * [[Skew.saltedJoin]]-style salting on the union key.
  *
  * Determinism: callers must make (key, rightTime) unique on the right
  * side (pre-aggregate duplicates); at equal timestamps the right row
  * sorts first, so a right row exactly at `leftTime` IS visible to that
  * left row (inclusive bound), matching DuckDB's `ASOF JOIN ... ON
  * l.t >= r.t` used by the oracle.
  */
object AsofJoin {

  /** @param payloadCols right-side columns to attach (others dropped) */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val payload: Column = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val leftCols = left.columns
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(payloadType).as("__p"))
    // Equi-join null semantics: a NULL key matches NOTHING. Without
    // this filter the window's partitionBy would group null-key rows
    // from BOTH sides into one partition and carry right payloads onto
    // null-key left rows — diverging from the oracle's `l.k = r.k`.
    // Dropping null-key right rows suffices: null-key left rows then
    // sit alone in the null partition and keep the left-outer null.
    // Null-TIME right rows drop for the same reason: Spark sorts a
    // null __t FIRST, so an undated version would carry onto every
    // probe, while ASOF's `l.t >= r.t` can never match it. A
    // null-time LEFT row then has nothing before it and keeps the
    // left-outer null on both engines. The filter runs on the CAST
    // column (not the raw one): a non-null value that casts to null
    // would otherwise slip through and become exactly the
    // sorts-first-carries-everywhere row the guard exists to drop.
    val taggedRight = right.select(
        col(key).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"),
        lit(null).cast(taggedLeft.schema("__l").dataType).as("__l"),
        payload.as("__p"))
      .where(col("__k").isNotNull && col("__t").isNotNull)

    // Right rows (__side 0) sort before left rows at equal __t, so the
    // carried payload includes a right row timestamped exactly at the
    // left row's time.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__carry.$c").as(c)): _*)
  }
}
