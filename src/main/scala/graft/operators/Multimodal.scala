package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; per-asset work
  * (decode → feature-extract → resize / frame-sample) runs batched per
  * partition via the typed Dataset `mapPartitions` — the Scala analog
  * of a Pandas-batch UDF: one iterator per partition, so a real
  * decoder amortizes codec/model setup across the batch.
  *
  * The container DECODE tier is real: [[decode]] parses RIFF/WAVE and
  * BMP headers (pure-JVM — the two classic containers simple enough to
  * parse without codec libraries) into typed media metadata plus the
  * raw frame body. Payload SYNTHESIS wraps document text in genuine
  * WAV/BMP containers with doc-id-derived parameters, so the DuckDB
  * oracle can recompute every decoded field independently — a
  * hash-match proves the parser round-trips the writer bit-for-bit.
  * Only the lossy transforms (resize, frame sampling) remain stand-ins
  * (truncation / byte striding), clearly named `*Stub`.
  */
object Multimodal {

  /** An opaque media asset: payload is raw bytes + typed metadata. */
  final case class Asset(asset_id: Long, media_type: String,
                         payload: Array[Byte], declared_len: Long)

  /** Per-asset decoded features (fixed-width, ANN-joinable). Container
    * metadata is null for containers the decoder doesn't recognize.
    */
  final case class AssetFeatures(asset_id: Long, media_type: String,
                                 container: String,
                                 sample_rate: Option[Long], channels: Option[Long],
                                 width: Option[Long], height: Option[Long],
                                 n_bytes: Long, first_byte: Int,
                                 checksum: Long)

  /** A decoded payload: parsed container metadata + the frame body. */
  final case class Decoded(container: String,
                           sampleRate: Option[Long], channels: Option[Long],
                           width: Option[Long], height: Option[Long],
                           frame: Array[Byte])

  // ---- deterministic synthesis parameters (mirrored in the DuckDB
  // oracles — each decoded field must be recomputable from doc_id) ----
  def mediaTypeOf(id: Long): String =
    Seq("image", "audio", "video")((id % 3).toInt)
  def sampleRateOf(id: Long): Int = 8000 + (id % 4).toInt * 8000
  def channelsOf(id: Long): Int = 1 + (id % 2).toInt
  def widthOf(id: Long): Int = 16 + (id % 32).toInt
  def heightOf(id: Long): Int = 16 + (id % 17).toInt

  /** Canonical 44-byte PCM RIFF/WAVE container around `data`. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               data: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val bb = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + data.length)
      .put("WAVE".getBytes(US_ASCII))
      .put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort((channels * bitsPerSample / 8).toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes(US_ASCII)).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) around `data`. The
    * pixel array is the body verbatim (no row padding — the fixture
    * exercises header parsing, not rasterization).
    */
  def bmpBytes(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val off = 54
    val bb = ByteBuffer.allocate(off + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(off + data.length)
      .putShort(0).putShort(0).putInt(off)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(data.length).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
      .put(data)
    bb.array()
  }

  // ImageIO's default ImageInputStream spools through a disk-backed
  // cache file per call — pure overhead (and tmp-dir churn) on
  // executors processing in-memory byte arrays.
  javax.imageio.ImageIO.setUseCache(false)

  /** Encode a `width`×`hEff` raster (the BMP fixture layout: row-major
    * BGR byte triplets, `body(3p)=B body(3p+1)=G body(3p+2)=R`) as a
    * real PNG or JPEG via `javax.imageio` (pure JDK — no codec
    * dependency). PNG is lossless: decoding recovers the first
    * `width*hEff*3` body bytes exactly, which is what lets the PNG
    * path ride the same byte-exact DuckDB oracles as BMP. JPEG is
    * lossy; its decode is gated by the round-trip invariant harness
    * instead ([[jpegRoundtrip]]). Callers guarantee `hEff >= 1`.
    */
  def imageBytes(format: String, width: Int, hEff: Int, body: Array[Byte]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, hEff, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgbs = new Array[Int](width * hEff)
    var p = 0
    while (p < rgbs.length) {
      val b = body(3 * p) & 0xff
      val g = body(3 * p + 1) & 0xff
      val r = body(3 * p + 2) & 0xff
      rgbs(p) = (r << 16) | (g << 8) | b
      p += 1
    }
    img.setRGB(0, 0, width, hEff, rgbs, 0, width)
    val baos = new java.io.ByteArrayOutputStream()
    if (format == "jpeg" || format == "jpg") {
      // explicit quality (default 0.75 loses ~5 gray levels of channel
      // mean on noise-like rasters; 0.95 is the archival setting a
      // training pipeline would use and keeps the mean within ~2)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.95f)
      val out = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose()
      out.close()
    } else {
      javax.imageio.ImageIO.write(img, format, baos)
    }
    baos.toByteArray
  }

  /** Decode a PNG/JPEG payload via `javax.imageio` into the SAME
    * raster representation the BMP path produces (row-major BGR byte
    * triplets), so every downstream raster kernel
    * ([[bmpChannelStats]], [[resizeNearest]]) consumes real-codec
    * output unchanged. Any decode failure falls back to an opaque raw
    * frame — corrupt assets must not kill the stage.
    */
  private def imageIoDecode(bytes: Array[Byte], container: String): Decoded =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) Decoded("raw", None, None, None, None, bytes)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
        val frame = new Array[Byte](w * h * 3)
        var p = 0
        while (p < rgbs.length) {
          val rgb = rgbs(p)
          frame(3 * p) = (rgb & 0xff).toByte
          frame(3 * p + 1) = ((rgb >> 8) & 0xff).toByte
          frame(3 * p + 2) = ((rgb >> 16) & 0xff).toByte
          p += 1
        }
        Decoded(container, None, None, Some(w.toLong), Some(h.toLong), frame)
      }
    } catch {
      case scala.util.control.NonFatal(_) => Decoded("raw", None, None, None, None, bytes)
    }

  /** Real container parse: RIFF/WAVE, BMP, PNG and JPEG → typed
    * metadata + frame body; anything else passes through as an opaque
    * frame. Malformed headers (truncated, bad lengths) fall back to
    * raw rather than throwing — corrupt assets must not kill the stage.
    */
  private def tagAt(bytes: Array[Byte], at: Int, tag: String): Boolean =
    bytes.length >= at + tag.length &&
      tag.indices.forall(i => bytes(at + i) == tag.charAt(i).toByte)

  def decode(bytes: Array[Byte]): Decoded = {
    def le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // Canonical-layout parse ONLY: the chunk tags are verified at the
    // canonical offsets, so a spec-valid-but-non-canonical container
    // (e.g. a LIST chunk between fmt and data, or a BITMAPCOREHEADER
    // BMP) falls back to raw rather than being misparsed as if its
    // fields sat at the canonical offsets.
    if (bytes.length >= 44 &&
        tagAt(bytes, 0, "RIFF") && tagAt(bytes, 8, "WAVE") &&
        tagAt(bytes, 12, "fmt ") && tagAt(bytes, 36, "data")) {
      val bb = le
      val channels = bb.getShort(22).toLong
      val sampleRate = bb.getInt(24).toLong
      val dataLen = bb.getInt(40)
      if (dataLen < 0 || 44L + dataLen > bytes.length) // long math: a hostile length must not overflow the guard
        Decoded("raw", None, None, None, None, bytes)
      else
        Decoded("wav", Some(sampleRate), Some(channels), None, None,
          java.util.Arrays.copyOfRange(bytes, 44, 44 + dataLen))
    } else if (bytes.length >= 54 && tagAt(bytes, 0, "BM") &&
        le.getInt(14) == 40) { // BITMAPINFOHEADER only
      val bb = le
      val off = bb.getInt(10)
      val width = bb.getInt(18).toLong
      val height = bb.getInt(22).toLong
      if (off < 54 || off > bytes.length)
        Decoded("raw", None, None, None, None, bytes)
      else
        Decoded("bmp", None, None, Some(width), Some(height),
          java.util.Arrays.copyOfRange(bytes, off, bytes.length))
    } else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && tagAt(bytes, 1, "PNG")) {
      imageIoDecode(bytes, "png")
    } else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) {
      imageIoDecode(bytes, "jpeg")
    } else Decoded("raw", None, None, None, None, bytes)
  }

  /** Image-typed documents as REAL PNG or JPEG assets: the text bytes
    * are the raster body (width from [[widthOf]], effective height =
    * complete rows only — a real codec can't carry a partial row, so
    * documents too short for one row are skipped; the oracles mirror
    * the same predicate).
    */
  /** Admissibility quarantine for the documents-as-assets fixture: a
    * body must EXIST (null text would NPE the typed builders) and be
    * single-byte clean (UTF-8 bytes == chars). The byte-level oracles
    * reproduce the raster arithmetic per CHARACTER (`ascii(substring)`),
    * so a multi-byte body would diverge silently — and a real media
    * ingest reads binary columns, not text; text-as-bytes is only the
    * oracle-checkable stand-in. Decode robustness on arbitrary (and
    * corrupt) BYTES is exercised separately in FormatsSpec.
    * SQL twin: [[docsAdmissibleSql]].
    */
  def admissibleDocs(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull &&
      octet_length(col("text")) === length(col("text")))

  /** DuckDB twin of [[admissibleDocs]] (strlen is bytes, length chars). */
  val docsAdmissibleSql: String =
    "text IS NOT NULL AND strlen(text) = length(text)"

  def imageAssetsFromDocuments(docs: DataFrame, format: String): DataFrame = {
    import docs.sparkSession.implicits._
    admissibleDocs(docs).select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.flatMap { case (id, text, nChars) =>
        val w = widthOf(id)
        val body = text.getBytes("UTF-8")
        val hEff = (body.length / 3) / w
        if (mediaTypeOf(id) != "image" || hEff == 0) None
        else Some(Asset(id, "image", imageBytes(format, w, hEff, body), nChars))
      })
      .toDF()
  }

  /** Build an asset table from `documents` — text bytes become the
    * media body, wrapped in a REAL container per media type (WAV for
    * audio, BMP for image; video stays an opaque raw payload — no
    * pure-JVM-parseable container exists for it).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    admissibleDocs(docs).select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        val body = text.getBytes("UTF-8")
        val payload = mediaTypeOf(id) match {
          case "audio" => wavBytes(sampleRateOf(id), channelsOf(id), 16, body)
          case "image" => bmpBytes(widthOf(id), heightOf(id), body)
          case _ => body
        }
        Asset(id, mediaTypeOf(id), payload, nChars)
      })
      .toDF()
  }

  /** Batched per-partition decode + feature extraction. The rolling
    * checksum over the decoded frame is the deterministic stand-in for
    * an embedding model; container metadata comes from the REAL header
    * parse. Both are reproduced in the DuckDB oracle so the whole path
    * is correctness-gated.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { batch =>
      // per-partition setup would happen here (codec init, model load)
      batch.map { a =>
        val d = decode(a.payload)
        val frame = d.frame
        val checksum = frame.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        AssetFeatures(
          a.asset_id, a.media_type, d.container,
          d.sampleRate, d.channels, d.width, d.height,
          frame.length.toLong,
          if (frame.isEmpty) -1 else frame(0) & 0xff,
          checksum)
      }
    }
  }

  final case class AudioFeatures(asset_id: Long, n_samples: Long,
                                 rms: Double, peak: Long)

  /** REAL audio DSP over the decoded WAV frame: little-endian PCM16
    * sample decode (sign-extended high byte — general, even though the
    * ASCII fixture never goes negative), per-asset RMS energy and peak
    * amplitude. Squares of int16 values sum EXACTLY in a double far
    * past any realistic frame length (< 2^53), so the oracle
    * reproduces the value bit-for-bit from the synthesized body —
    * this tier is a correctness-gated decoder, not a stub.
    */
  def pcm16Features(spark: SparkSession, assets: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val frame = decode(a.payload).frame
      val n = frame.length / 2
      var i = 0
      var sumSq = 0.0
      var peak = Int.MinValue
      while (i < n) {
        val s = (frame(2 * i + 1) << 8) | (frame(2 * i) & 0xff)
        sumSq += s.toDouble * s
        if (s > peak) peak = s
        i += 1
      }
      AudioFeatures(a.asset_id, n.toLong,
        if (n == 0) 0.0 else math.sqrt(sumSq / n),
        if (n == 0) 0L else peak.toLong)
    })
  }

  final case class ImageStats(asset_id: Long, n_pixels: Long,
                              mean_b: Double, mean_g: Double, mean_r: Double)

  /** REAL raster statistics over the decoded BMP body: 24bpp pixels
    * are BGR byte triplets; per-channel means are the first moment a
    * vision pipeline computes (normalization constants). Byte sums
    * stay integral in doubles → the oracle is bit-exact. A trailing
    * partial triplet (body not divisible by 3) is ignored, as a
    * rasterizer would ignore padding.
    */
  def bmpChannelStats(spark: SparkSession, assets: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val frame = decode(a.payload).frame
      val n = frame.length / 3
      var i = 0
      var sb = 0.0; var sg = 0.0; var sr = 0.0
      while (i < n) {
        sb += (frame(3 * i) & 0xff)
        sg += (frame(3 * i + 1) & 0xff)
        sr += (frame(3 * i + 2) & 0xff)
        i += 1
      }
      if (n == 0) ImageStats(a.asset_id, 0L, 0.0, 0.0, 0.0)
      else ImageStats(a.asset_id, n.toLong, sb / n, sg / n, sr / n)
    })
  }

  /** REAL nearest-neighbor raster downsample of a 24bpp BGR body to a
    * fixed `outW`×`outH` grid. The body is row-major width-`srcW`
    * pixel triplets; the effective height is `floor(nPixels / srcW)`
    * (a trailing partial row is ignored, as [[bmpChannelStats]]
    * ignores a partial triplet). Output pixel (x', y') samples source
    * pixel (x'·srcW / outW, y'·hEff / outH) — integer floor division,
    * the classic nearest-neighbor kernel, exactly reproducible from
    * the same bytes in the DuckDB oracle. A raster with zero complete
    * rows downsamples to an empty frame.
    */
  def resizeNearest(frame: Array[Byte], srcW: Int, outW: Int, outH: Int): Array[Byte] = {
    val nPix = frame.length / 3
    val hEff = if (srcW <= 0) 0 else nPix / srcW
    if (hEff == 0) Array.emptyByteArray
    else {
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = y * hEff / outH
        var x = 0
        while (x < outW) {
          val sx = x * srcW / outW
          val p = 3 * (sy * srcW + sx)
          val o = 3 * (y * outW + x)
          out(o) = frame(p); out(o + 1) = frame(p + 1); out(o + 2) = frame(p + 2)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL fixed-stride PCM16 frame sampling: keep every `stride`-th
    * 16-bit sample of the decoded WAV body (both bytes, preserving
    * sample alignment — the audio analog of keeping every n-th video
    * frame). A trailing odd byte is ignored.
    */
  def pcmSampleStride(frame: Array[Byte], stride: Int): Array[Byte] = {
    val n = frame.length / 2
    val kept = if (n == 0) 0 else (n + stride - 1) / stride
    val out = new Array[Byte](kept * 2)
    var i = 0
    while (i < kept) {
      out(2 * i) = frame(2 * i * stride)
      out(2 * i + 1) = frame(2 * i * stride + 1)
      i += 1
    }
    out
  }

  /** Opaque-payload fallback sampler: every `stride`-th byte (for
    * containers with no parseable structure, e.g. the video fixture).
    */
  def byteSample(frame: Array[Byte], stride: Int): Array[Byte] = {
    val kept = if (frame.isEmpty) 0 else (frame.length + stride - 1) / stride
    val out = new Array[Byte](kept)
    var i = 0
    while (i < kept) { out(i) = frame(i * stride); i += 1 }
    out
  }

  /** Perceptual average-hash (aHash) over a 24bpp BGR raster: nearest-
    * neighbor downsample to 8×8 (the shared [[resizeNearest]] kernel),
    * per-cell grayscale as the INTEGER channel sum b+g+r (no division,
    * no luma weights — keeps every step exact), bit i set iff
    * `gray(i) * 64 >= sum(gray)` (the integer form of "cell >= mean").
    * Near-duplicate images — recompressions, small edits — differ in a
    * few bits; unrelated images differ in ~32. All arithmetic is
    * integral, so the DuckDB oracle rebuilds the hash bit-for-bit from
    * the synthesized raster. An empty raster (no complete row) hashes
    * to 0.
    */
  def aHash64(frame: Array[Byte], srcW: Int): Long = {
    val thumb = resizeNearest(frame, srcW, 8, 8)
    if (thumb.isEmpty) 0L
    else {
      val gray = new Array[Long](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        gray(i) = (thumb(3 * i) & 0xff).toLong + (thumb(3 * i + 1) & 0xff) +
          (thumb(3 * i + 2) & 0xff)
        sum += gray(i)
        i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) {
        if (gray(i) * 64 >= sum) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  final case class PerceptualHash(asset_id: Long, width: Long, ahash64: Long)

  /** Per-image perceptual hashes over decoded image assets — the
    * signature stage of image dedup (pair generation rides the shared
    * [[graft.operators.Dedup.signatureBandPairs]] band join). Width
    * comes from the REAL container header parse. Zero-shuffle
    * projection; `mapPartitions` justified by the opaque binary
    * payload.
    */
  def imagePerceptualHashes(spark: SparkSession, assets: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val d = decode(a.payload)
      val w = d.width.getOrElse(0L).toInt
      PerceptualHash(a.asset_id, w.toLong, aHash64(d.frame, w))
    })
  }

  final case class JpegRoundtrip(asset_id: Long, width: Long, height: Long,
                                 dims_match: Boolean, mean_within_tol: Boolean)

  /** JPEG encode→decode invariant harness. JPEG is lossy, so its
    * decode can't be byte-compared like PNG/BMP; what the DCT DOES
    * preserve tightly is the per-channel first moment (means live in
    * the DC coefficients). Each image-typed document is encoded as a
    * real JPEG, decoded back through [[decode]], and gated on two
    * invariants the oracle states as constants: exact dimensional
    * round-trip, and per-channel mean error within `tol` gray levels
    * of the pre-encode raster.
    */
  def jpegRoundtrip(docs: DataFrame, tol: Double): Dataset[JpegRoundtrip] = {
    import docs.sparkSession.implicits._
    admissibleDocs(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val w = widthOf(id)
        val body = text.getBytes("UTF-8")
        val hEff = (body.length / 3) / w
        if (mediaTypeOf(id) != "image" || hEff == 0) None
        else {
          val d = decode(imageBytes("jpeg", w, hEff, body))
          val n = w * hEff
          var sb = 0.0; var sg = 0.0; var sr = 0.0
          var p = 0
          while (p < n) {
            sb += (body(3 * p) & 0xff)
            sg += (body(3 * p + 1) & 0xff)
            sr += (body(3 * p + 2) & 0xff)
            p += 1
          }
          val f = d.frame
          val m = f.length / 3
          var db = 0.0; var dg = 0.0; var dr = 0.0
          var q = 0
          while (q < m) {
            db += (f(3 * q) & 0xff)
            dg += (f(3 * q + 1) & 0xff)
            dr += (f(3 * q + 2) & 0xff)
            q += 1
          }
          val dimsOk = d.container == "jpeg" &&
            d.width.contains(w.toLong) && d.height.contains(hEff.toLong)
          val meanOk = m == n &&
            math.abs(db / m - sb / n) <= tol &&
            math.abs(dg / m - sg / n) <= tol &&
            math.abs(dr / m - sr / n) <= tol
          Some(JpegRoundtrip(id, w.toLong, hEff.toLong, dimsOk, meanOk))
        }
      })
  }

  final case class ResampleFeatures(asset_id: Long, media_type: String,
                                    n_bytes: Long, first_byte: Int,
                                    checksum: Long)

  /** Full media resample pipeline, batched per partition: decode the
    * container, apply the media-appropriate REAL transform —
    * nearest-neighbor raster resize for BMP, fixed-stride PCM16 frame
    * sampling for WAV, byte striding for opaque payloads — and emit
    * fixed-width features of the transformed frame. Every output byte
    * is a deterministic function of the input bytes, so the DuckDB
    * twin rebuilds the identical features from the synthesized body —
    * the lossy tier is now correctness-gated end to end, like the
    * decode tier.
    */
  def resampleFeatures(spark: SparkSession, assets: DataFrame,
                       outW: Int, outH: Int,
                       pcmStride: Int, rawStride: Int): Dataset[ResampleFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map { a =>
      val d = decode(a.payload)
      val out = d.container match {
        case "bmp" | "png" | "jpeg" => resizeNearest(d.frame, d.width.get.toInt, outW, outH)
        case "wav" => pcmSampleStride(d.frame, pcmStride)
        case _ => byteSample(d.frame, rawStride)
      }
      val checksum = out.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      ResampleFeatures(a.asset_id, a.media_type, out.length.toLong,
        if (out.isEmpty) -1 else out(0) & 0xff, checksum)
    })
  }
}
