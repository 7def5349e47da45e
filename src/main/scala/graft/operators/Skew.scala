package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation kernels (SURVEY §7.3/§7.4.10).
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * runtime skew; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions bottleneck — e.g.
  * the per-channel pair generation in the friend-recs shape, where one
  * hot channel holds a large share of all subscribers.
  *
  * Salted equi-join: the skewed LEFT side gets a deterministic salt in
  * [0, saltFactor); the (smaller) RIGHT side is replicated saltFactor
  * times. The join key becomes (key, salt) — fan-out of the hot key
  * across saltFactor partitions — and results are exactly those of the
  * unsalted join.
  */
object Skew {

  /** Deterministic salt derived from stable row identity — never use
    * rand() (breaks retries/resume and determinism).
    */
  def salt(idCol: Column, saltFactor: Int): Column =
    pmod(xxhash64(idCol), lit(saltFactor.toLong)).cast("int")

  /** Salted inner equi-join of `left` and `right` on `keys`.
    * `leftId` must be a stable per-row identity column on the left
    * (drives the deterministic salt). Result equals
    * left.join(right, keys).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftId: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = left.withColumn("__salt", salt(col(leftId), saltFactor))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
