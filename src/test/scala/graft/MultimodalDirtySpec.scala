package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

/** Dirty-data robustness for the multimodal decode tier: the oracle
  * fixtures are clean by construction, so this spec corrupts REAL
  * container payloads (truncations, hostile declared lengths, empty
  * bodies) and drives them through the same query-level entry points
  * the `mm_*` gate queries use. Contract: corrupt assets NEVER fail
  * the task — they quarantine deterministically as `container="raw"`
  * with null metadata and the payload itself as the frame — and clean
  * assets in the same batch decode exactly as they do alone.
  */
class MultimodalDirtySpec extends SparkSpec {

  private def cleanAssets = Multimodal.assetsFromDocuments(
    Tables.documents(spark, sfDir).limit(60))

  /** Corrupt every payload with a doc-id-keyed deterministic mutation:
    * truncation mid-header, truncation mid-body, a hostile WAV data
    * length, or full wipe. Same shapes a crawler emits — cut-off
    * downloads and lying headers.
    */
  private def corrupted = {
    import spark.implicits._
    cleanAssets.as[Multimodal.Asset].map { a =>
      val p = a.payload
      val mutated = (a.asset_id % 4) match {
        case 0 => p.take(math.min(10, p.length))          // mid-header cut
        case 1 => p.take(math.max(1, p.length / 2))        // mid-body cut
        case 2 =>                                          // hostile length field
          if (p.length >= 44 && p(0) == 'R'.toByte) {
            val c = p.clone()
            // declared data length = Int.MaxValue — must not overflow
            // the 44 + dataLen guard or read past the buffer
            c(40) = -1; c(41) = -1; c(42) = -1; c(43) = 0x7f
            c
          } else p.take(math.min(20, p.length))
        case _ => Array.emptyByteArray                     // zero-byte download
      }
      Multimodal.Asset(a.asset_id, a.media_type, mutated, a.declared_len)
    }.toDF()
  }

  test("corrupt WAV/BMP/PNG payloads quarantine as raw with null metadata — no task failure") {
    val feats = Multimodal.extractFeatures(spark, corrupted).toDF()
    val rows = feats.collect() // completing at all IS the core assertion
    assert(rows.length === corrupted.count())
    // Quarantined rows are self-describing: raw container, no typed
    // metadata, frame == payload (checksum over the raw bytes).
    val raw = feats.where(col("container") === "raw")
    assert(raw.count() > 0, "fixture must actually produce quarantined rows")
    assert(raw.where(col("sample_rate").isNotNull || col("channels").isNotNull ||
      col("width").isNotNull || col("height").isNotNull).count() === 0,
      "raw-quarantined assets must carry NO typed metadata")
    // The hostile-length WAV (case 2) specifically must land in raw:
    // its header is tag-valid but the declared length lies.
    val hostile = corrupted.where(col("asset_id") % 4 === 2 &&
      col("media_type") === "audio").select("asset_id")
    val hostileIds = hostile.collect().map(_.getLong(0)).toSet
    if (hostileIds.nonEmpty) {
      val hostileRows = feats.where(col("asset_id").isin(hostileIds.toSeq: _*))
        .select("container").collect().map(_.getString(0))
      assert(hostileRows.forall(_ == "raw"), hostileRows.mkString(","))
    }
  }

  test("corrupt decode output is deterministic across runs") {
    val a = Multimodal.extractFeatures(spark, corrupted).toDF()
      .orderBy("asset_id").collect().toSeq
    val b = Multimodal.extractFeatures(spark, corrupted).toDF()
      .orderBy("asset_id").collect().toSeq
    assert(a === b)
  }

  test("a corrupt minority does not perturb clean assets in the same batch") {
    val mixed = cleanAssets.where(col("asset_id") % 5 =!= 0)
      .unionByName(corrupted.where(col("asset_id") % 5 === 0))
    val mixedFeats = Multimodal.extractFeatures(spark, mixed).toDF()
      .where(col("asset_id") % 5 =!= 0).orderBy("asset_id").collect().toSeq
    val aloneFeats = Multimodal.extractFeatures(spark,
        cleanAssets.where(col("asset_id") % 5 =!= 0)).toDF()
      .orderBy("asset_id").collect().toSeq
    assert(mixedFeats === aloneFeats)
  }

  test("downstream raster/audio kernels survive quarantined frames") {
    // The resample tier consumes whatever decode produced; corrupt
    // frames must flow through stride/resize without range errors.
    val res = Multimodal.resampleFeatures(spark, corrupted,
      outW = 8, outH = 4, pcmStride = 4, rawStride = 16).toDF()
    assert(res.count() === corrupted.count())
    val audio = Multimodal.pcm16Features(spark, corrupted).toDF()
    assert(audio.count() === corrupted.count())
    val img = Multimodal.bmpChannelStats(spark, corrupted).toDF()
    assert(img.count() === corrupted.count())
  }

  test("truncated PNG bodies quarantine through the imageio path") {
    // Real PNG containers (imageAssetsFromDocuments), cut right after
    // the 8-byte signature: the magic matches so decode() enters the
    // imageio path, which must catch the codec failure and fall back.
    import spark.implicits._
    val pngs = Multimodal.imageAssetsFromDocuments(
      Tables.documents(spark, sfDir).limit(80), "png")
    assert(pngs.count() > 0, "fixture needs image-typed documents")
    val cut = pngs.as[Multimodal.Asset]
      .map(a => Multimodal.Asset(a.asset_id, a.media_type,
        a.payload.take(8), a.declared_len))
      .toDF()
    val feats = Multimodal.extractFeatures(spark, cut).toDF().collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.getString(2) == "raw"),
      feats.map(_.getString(2)).distinct.mkString(","))
  }
}
