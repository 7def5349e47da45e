package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; per-asset work
  * (decode → feature-extract → resize / frame-sample) runs batched per
  * partition via the typed Dataset `mapPartitions` — the Scala analog
  * of a Pandas-batch UDF: one iterator per partition, so a real
  * decoder could amortize codec/model setup across the batch.
  *
  * The decode step itself is STUBBED (media codecs are not available
  * in this environment): `decodeStub` produces deterministic fake
  * "decoded frames" from the raw bytes. Everything around it — the
  * schema, the binary column, partition batching, and the feature
  * output shape — is real and oracle-checked.
  */
object Multimodal {

  /** An opaque media asset: payload is raw bytes + typed metadata. */
  final case class Asset(asset_id: Long, media_type: String,
                         payload: Array[Byte], declared_len: Long)

  /** Per-asset extracted features (fixed-width, ANN-joinable). */
  final case class AssetFeatures(asset_id: Long, media_type: String,
                                 n_bytes: Long, first_byte: Int,
                                 checksum: Long)

  /** Build an asset table from `documents` — text bytes stand in for
    * media payloads; media_type cycles deterministically.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("n_chars").as("declared_len"))

  /** STUB decoder: a real implementation would hand `bytes` to an
    * image/audio codec here. Deterministic stand-in: the identity
    * "frame" of the payload bytes.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Byte] = bytes

  /** Batched per-partition decode + feature extraction. The rolling
    * checksum is the deterministic stand-in for an embedding model;
    * it is reproduced in the DuckDB oracle so the whole path is
    * correctness-gated.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { batch =>
      // per-partition setup would happen here (codec init, model load)
      batch.map { a =>
        val frame = decodeStub(a.payload)
        val checksum = frame.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        AssetFeatures(
          a.asset_id, a.media_type, frame.length.toLong,
          if (frame.isEmpty) -1 else frame(0) & 0xff,
          checksum)
      }
    }
  }

  /** STUB resize: real impl would decode + scale; stand-in truncates
    * the payload to `targetBytes` (shape-preserving plumbing).
    */
  def resizeStub(spark: SparkSession, assets: DataFrame, targetBytes: Int): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(a =>
      a.copy(payload = a.payload.take(targetBytes), declared_len = math.min(a.declared_len, targetBytes.toLong))))
  }

  /** STUB frame sampler: every `stride`-th byte stands in for every
    * n-th video frame.
    */
  def frameSampleStub(spark: SparkSession, assets: DataFrame, stride: Int): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val sampled = a.payload.zipWithIndex.collect { case (b, i) if i % stride == 0 => b }
      a.copy(payload = sampled, declared_len = sampled.length.toLong)
    })
  }
}
