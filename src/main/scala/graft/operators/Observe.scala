package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via `Dataset.observe` — counters
  * computed DURING the job's single pass (accumulator-style, no second
  * scan, no action of their own). At 100 TB an extra validation pass
  * is a day of cluster time; observed metrics are free.
  *
  * Usage:
  * {{{
  *   val obs = Observation("ingest")
  *   val out = Observe.withQualityMetrics(df, obs, "user_id", "value")
  *   out.write.parquet(...)                  // the real action
  *   val m = Observe.decode(obs.get)         // metrics of THAT pass
  * }}}
  */
object Observe {

  final case class QualityMetrics(rows: Long, nullKeys: Long,
                                  negValues: Long, distinctApprox: Long)

  /** Attach standard ingest-quality counters over (key, value). */
  def withQualityMetrics(df: DataFrame, obs: Observation,
                         key: String, value: String): DataFrame =
    df.observe(obs,
      count(lit(1)).as("rows"),
      // coalesce: sum over ZERO rows is null, and decode's Long cast
      // would NPE on the very path meant to report ingest health
      coalesce(sum(when(col(key).isNull, 1L).otherwise(0L)), lit(0L)).as("null_keys"),
      coalesce(sum(when(col(value) < 0, 1L).otherwise(0L)), lit(0L)).as("neg_values"),
      approx_count_distinct(col(key)).as("distinct_approx"))

  /** Decode the metric map produced by [[withQualityMetrics]]. */
  def decode(metrics: Map[String, Any]): QualityMetrics =
    QualityMetrics(
      metrics("rows").asInstanceOf[Long],
      metrics("null_keys").asInstanceOf[Long],
      metrics("neg_values").asInstanceOf[Long],
      metrics("distinct_approx").asInstanceOf[Long])
}
