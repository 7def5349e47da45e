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

  test("resize and frame-sample stubs preserve schema and shrink payloads") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij", "en", "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val assets = Multimodal.assetsFromDocuments(docs)
    val resized = Multimodal.resizeStub(spark, assets, 4).collect().head
    assert(resized.payload.length === 4 && resized.declared_len === 4L)
    val sampled = Multimodal.frameSampleStub(spark, assets, 3).collect().head
    assert(sampled.payload.toSeq === "adgj".getBytes("UTF-8").toSeq)
  }
}
