package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Multimodal

class TextFnsSpec extends SparkSpec {

  test("shingles: n=2 over k tokens yields k-1 shingles; short docs yield none") {
    import spark.implicits._
    val df = Seq("a b c d", "a", "").toDF("text")
    val out = df.select(size(TextFns.shingles(TextFns.tokens(col("text")), 2)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out === Seq(3, 0, 0))
  }

  test("jaccard bounds and identity") {
    import spark.implicits._
    val df = Seq(("a b c", "a b c"), ("a b", "c d")).toDF("x", "y")
    val res = df.select(
      TextFns.jaccard(TextFns.tokens(col("x")), TextFns.tokens(col("y"))).as("j"))
      .collect().map(_.getDouble(0)).toSeq
    assert(res(0) === 1.0)
    assert(res(1) === 0.0)
  }

  test("fingerprint is deterministic and order-sensitive") {
    import spark.implicits._
    val df = Seq("spark merge join", "join merge spark").toDF("text")
    val fps = df.select(TextFns.fingerprint(TextFns.tokens(col("text"))).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(fps(0) !== fps(1))
  }

  test("multimodal feature extraction matches a driver-side recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val texts = (0 until 25).map(_ =>
      (0 until 1 + rnd.nextInt(50)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(spark, Multimodal.assetsFromDocuments(docs))
      .collect().map(f => f.asset_id -> f).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bytes = t.getBytes("UTF-8")
      val expect = bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      assert(feats(i.toLong).checksum === expect)
      assert(feats(i.toLong).n_bytes === bytes.length.toLong)
      assert(Set("image", "audio", "video").contains(feats(i.toLong).media_type))
    }
  }

  test("top_ngram_ratio: repetition kernel edge cases") {
    import spark.implicits._
    import graft.expressions.GraftFunctions.topNgramRatio
    val df = Seq(
      (1L, "a a a b"),      // word ratio 3/4; bigrams: aa aa ab → 2/3
      (2L, "x"),            // one word → 1.0; no bigrams → -1.0
      (3L, "a b c d"),      // all distinct → 1/4; bigrams all distinct → 1/3
      (4L, "")              // one empty token → 1.0; no bigrams → -1.0
    ).toDF("id", "t")
    val got = df.select(col("id"),
      topNgramRatio(col("t"), 1).as("w"), topNgramRatio(col("t"), 2).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) === ((0.75, 2.0 / 3)))
    assert(got(2L) === ((1.0, -1.0)))
    assert(got(3L) === ((0.25, 1.0 / 3)))
    assert(got(4L) === ((1.0, -1.0)))
  }

  test("WAV and BMP containers round-trip through the real decoder") {
    val body = "hello-frame".getBytes("UTF-8")
    val wav = Multimodal.decode(Multimodal.wavBytes(16000, 2, 16, body))
    assert(wav.container === "wav")
    assert(wav.sampleRate === Some(16000L) && wav.channels === Some(2L))
    assert(wav.frame.toSeq === body.toSeq)
    val bmp = Multimodal.decode(Multimodal.bmpBytes(33, 21, body))
    assert(bmp.container === "bmp")
    assert(bmp.width === Some(33L) && bmp.height === Some(21L))
    assert(bmp.frame.toSeq === body.toSeq)
    // malformed headers fall back to raw instead of throwing
    val truncated = Multimodal.wavBytes(8000, 1, 16, body).take(20)
    assert(Multimodal.decode(truncated).container === "raw")
    val badLen = Multimodal.wavBytes(8000, 1, 16, body)
    java.nio.ByteBuffer.wrap(badLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue) // data chunk claims more than exists
    assert(Multimodal.decode(badLen).container === "raw")
    // NON-CANONICAL but plausible containers also fall back to raw
    // rather than being misparsed at the canonical offsets: a WAV with
    // a LIST chunk where 'data' is expected, and a BITMAPCOREHEADER
    // BMP (header size 12, fields at different offsets).
    val listChunk = Multimodal.wavBytes(8000, 1, 16, body)
    "LIST".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => listChunk(36 + i) = b }
    assert(Multimodal.decode(listChunk).container === "raw")
    val coreHeader = Multimodal.bmpBytes(10, 10, body)
    java.nio.ByteBuffer.wrap(coreHeader).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(14, 12) // BITMAPCOREHEADER size
    assert(Multimodal.decode(coreHeader).container === "raw")
  }

  test("PNG round-trips byte-exactly; JPEG preserves dims and means; corrupt streams fall back") {
    val body = (0 until 8 * 3 * 3).map(i => ((i * 37 + 11) % 251).toByte).toArray
    // PNG: lossless — decoded frame == raster bytes verbatim
    val png = Multimodal.decode(Multimodal.imageBytes("png", 8, 3, body))
    assert(png.container === "png")
    assert(png.width === Some(8L) && png.height === Some(3L))
    assert(png.frame.toSeq === body.toSeq)
    // JPEG: lossy — dims exact, per-channel mean within the gate's tol
    val jpg = Multimodal.decode(Multimodal.imageBytes("jpeg", 8, 3, body))
    assert(jpg.container === "jpeg")
    assert(jpg.width === Some(8L) && jpg.height === Some(3L))
    assert(jpg.frame.length === body.length)
    (0 until 3).foreach { c =>
      def mean(a: Array[Byte]) =
        (0 until a.length / 3).map(p => a(3 * p + c) & 0xff).sum.toDouble / (a.length / 3)
      assert(math.abs(mean(jpg.frame) - mean(body)) <= 2.5)
    }
    // a PNG magic with garbage after it must fall back to raw, not throw
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    assert(Multimodal.decode(corrupt).container === "raw")
    assert(Multimodal.decode(corrupt).frame.toSeq === corrupt.toSeq)
  }

  test("nearest-neighbor resize picks the exact kernel pixels") {
    // 4×2 source raster (pixel value = 10*y + x encoded in all three
    // channels), downsampled to 2×2: output (x', y') must sample
    // source (x'·4/2, y'·2/2) = (0,0), (2,0), (0,1), (2,1).
    val frame = (for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      yield (10 * y + x + c).toByte).toArray
    val out = Multimodal.resizeNearest(frame, srcW = 4, outW = 2, outH = 2)
    assert(out.length === 2 * 2 * 3)
    def px(sy: Int, sx: Int) = (0 until 3).map(c => (10 * sy + sx + c).toByte)
    assert(out.toSeq === (px(0, 0) ++ px(0, 2) ++ px(1, 0) ++ px(1, 2)))
    // zero complete rows → empty output; partial trailing row ignored
    assert(Multimodal.resizeNearest(Array.fill[Byte](9)(1), 4, 2, 2).isEmpty)
  }

  test("aHash64: integer mean threshold, copy invariance, empty raster") {
    // 8×8 raster whose left half is dark (channel sum 3) and right
    // half bright (channel sum 765): mean is in between, so exactly
    // the 32 bright cells (x >= 4) set their bits.
    val frame = (for (y <- 0 until 8; x <- 0 until 8; _ <- 0 until 3)
      yield (if (x >= 4) 255 else 1).toByte).toArray
    val h = Multimodal.aHash64(frame, srcW = 8)
    val expected = (for (i <- 0 until 64; if i % 8 >= 4) yield 1L << i).sum
    assert(h === expected)
    // an exact pixel copy hashes identically; a one-cell edit flips
    // few bits (near-dup stays within the band-join distance)
    assert(Multimodal.aHash64(frame.clone(), 8) === h)
    val edited = frame.clone()
    edited(0) = 255.toByte; edited(1) = 255.toByte; edited(2) = 255.toByte
    val hd = java.lang.Long.bitCount(Multimodal.aHash64(edited, 8) ^ h)
    assert(hd >= 1 && hd <= 3, s"one-cell edit flipped $hd bits")
    // uniform raster: every cell >= mean → all bits set
    assert(Multimodal.aHash64(Array.fill[Byte](8 * 8 * 3)(7), 8) === -1L)
    // no complete row → empty thumb → hash 0
    assert(Multimodal.aHash64(Array.fill[Byte](9)(1), 8) === 0L)
  }

  test("PCM stride sampling keeps whole aligned samples; byte stride keeps every nth") {
    // samples (le 16-bit): 0x0100, 0x0302, 0x0504, 0x0706, 0x0908 —
    // stride 2 keeps samples 0, 2, 4 with BOTH bytes intact.
    val frame = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.pcmSampleStride(frame, 2).toSeq ===
      Seq[Byte](0, 1, 4, 5, 8, 9))
    // trailing odd byte ignored
    assert(Multimodal.pcmSampleStride(frame :+ 99.toByte, 2).toSeq ===
      Seq[Byte](0, 1, 4, 5, 8, 9))
    assert(Multimodal.byteSample("abcdefghij".getBytes("UTF-8"), 3).toSeq ===
      "adgj".getBytes("UTF-8").toSeq)
  }

  test("resampleFeatures routes each container to its real transform") {
    import spark.implicits._
    // doc_id 0 → image/BMP (W=16: text shorter than 48 chars → empty
    // resample), 1 → audio/WAV, 2 → video/raw
    val docs = Seq(
      (0L, "x" * 40, "en", "src", 40L),
      (1L, "abcdefgh", "en", "src", 8L),
      (2L, "abcdefghij", "en", "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val assets = Multimodal.assetsFromDocuments(docs)
    val got = Multimodal.resampleFeatures(spark, assets,
      outW = 8, outH = 4, pcmStride = 4, rawStride = 3)
      .collect().map(r => r.asset_id -> r).toMap
    assert(got(0L).n_bytes === 0L && got(0L).first_byte === -1)
    // audio: 4 samples, stride 4 keeps sample 0 → bytes "ab"
    assert(got(1L).n_bytes === 2L && got(1L).first_byte === 'a'.toInt)
    // video: every 3rd byte of 10 → 4 bytes, first 'a'
    assert(got(2L).n_bytes === 4L && got(2L).first_byte === 'a'.toInt)
  }
}
