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
        |FROM documents""".stripMargin
  )
}
