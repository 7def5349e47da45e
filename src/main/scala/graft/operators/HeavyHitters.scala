package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent items) via Misra-Gries sketch + exact
  * verify — the two-pass shape used at corpus scale: a bounded-memory
  * sketch pass nominates candidates (provable superset of every item
  * with frequency > n/k), then an exact count restricted to the
  * candidate set (broadcast-sized by construction) filters to the true
  * heavy hitters. Output is EXACT and deterministic even though sketch
  * merge order is not — which is what makes it oracle-checkable.
  */
object HeavyHitters {

  /** Misra-Gries: at most k counters; admitting an item when full
    * decrements all counters (dropping zeros). Any item occurring more
    * than n/k times survives. Merge sums counters then re-caps by
    * subtracting the (k+1)-th largest count — the standard mergeable
    * summary.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k >= 1)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          // decrement-all; zeros fall out
          b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (i, c) =>
          if (c > cut) Some(i -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Exact heavy hitters of `itemCol`: items occurring more than
    * `minFreqFraction` of the total. `sketchK` must exceed
    * 1/minFreqFraction so the sketch's guarantee covers the threshold.
    * Result: (item, freq), exact.
    */
  def topItems(items: DataFrame, itemCol: String,
               minFreqFraction: Double, sketchK: Int): DataFrame = {
    require(sketchK > 1.0 / minFreqFraction,
      s"sketchK=$sketchK must exceed 1/minFreqFraction=${1 / minFreqFraction} " +
        "or the sketch may miss qualifying items")
    val mg = udaf(new MisraGries(sketchK), ExpressionEncoder[String]())
    // total rides along in the sketch pass — two passes over the
    // items plan total, as documented, not three
    val sketchRow = items
      .agg(count(lit(1)).as("total"), mg(col(itemCol)).as("cands"))
      .head()
    val total = sketchRow.getLong(0)
    val threshold = (total * minFreqFraction).toLong
    val spark = items.sparkSession
    import spark.implicits._
    val candidates = sketchRow.getSeq[String](1).toDF(itemCol)
    items
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(itemCol)
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") > threshold)
  }

  /** Column form of the sketch for direct use. */
  def misraGries(c: Column, k: Int): Column =
    udaf(new MisraGries(k), ExpressionEncoder[String]())(c)
}
