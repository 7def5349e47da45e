package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column extension query: binary payload → batched
  * per-partition decode (stubbed) → fixed-width features. The rolling
  * byte checksum doubles as the oracle-checkable stand-in for a real
  * feature extractor (documents.text is ASCII, so bytes == chars in
  * the DuckDB twin).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_decode_features" -> ((spark, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
      Multimodal.extractFeatures(spark, assets).toDF()
    }),

    // Full media pipeline: frame-sample (every 3rd byte) → resize
    // (truncate to 64) → feature-extract, all batched per partition.
    "mm_resize_sample" -> ((spark, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
      val sampled = Multimodal.frameSampleStub(spark, assets, stride = 3)
      val resized = Multimodal.resizeStub(spark, sampled.toDF(), targetBytes = 64)
      Multimodal.extractFeatures(spark, resized.toDF()).toDF()
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id AS asset_id,
        |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
        |  strlen(text) AS n_bytes,
        |  ascii(substring(text, 1, 1)) AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(range(1, strlen(text) + 1),
        |        i -> ascii(substring(text, i::INTEGER, 1)))),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM documents""".stripMargin,

    "mm_resize_sample" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substring(array_to_string(
        |      list_transform(range(1, strlen(text) + 1, 3),
        |        i -> substring(text, i::INTEGER, 1)), ''), 1, 64) AS st
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
        |  strlen(st) AS n_bytes,
        |  CASE WHEN strlen(st) = 0 THEN -1 ELSE ascii(substring(st, 1, 1)) END AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(range(1, strlen(st) + 1),
        |        i -> ascii(substring(st, i::INTEGER, 1)))),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM s""".stripMargin
  )
}
