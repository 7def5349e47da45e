package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column extension queries: binary payload → batched
  * per-partition container decode (REAL RIFF/WAVE + BMP header
  * parsing) → fixed-width features. Payloads are synthesized as
  * genuine containers with doc-id-derived parameters, so the DuckDB
  * twin recomputes every decoded field independently — the hash match
  * proves the parser round-trips the writer. The rolling byte checksum
  * over the decoded frame doubles as the oracle-checkable stand-in for
  * a real feature extractor (documents.text is ASCII, so bytes ==
  * chars in the DuckDB twin).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "mm_decode_features" -> ((spark, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
      Multimodal.extractFeatures(spark, assets).toDF()
    }),

    // Full media resample pipeline: decode → REAL media-appropriate
    // transform → feature-extract, all batched per partition.
    // Images: nearest-neighbor raster downsample to a fixed 8×4 grid
    // (the thumbnail/normalization step of a vision pipeline).
    // Audio: every-4th-PCM16-sample frame sampling (sample-aligned).
    // Video/raw: every-16th-byte stride. Every output byte is a
    // deterministic function of the input bytes, so the DuckDB twin
    // rebuilds n_bytes/first_byte/checksum of the TRANSFORMED frame —
    // the lossy tier is hash-gated like the decode tier.
    "mm_resize_sample" -> ((spark, dir) => {
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
      Multimodal.resampleFeatures(spark, assets,
        outW = 8, outH = 4, pcmStride = 4, rawStride = 16).toDF()
    }),

    // Perceptual-hash image dedup: decode → 8×8 nearest-neighbor
    // thumbnail → integer average-hash (all-integral arithmetic, so
    // the 64-bit signature is rebuilt bit-for-bit in DuckDB), then
    // near-dup pair generation through the SAME banded signature join
    // text simhash uses. Planted-copy harness (dedup_minhash pattern):
    // an exact pixel copy of every image hashes identically, so the
    // band join must surface its pair at hamming 0 — the recall floor
    // of the image-dedup pipeline is oracle-checked alongside the
    // exact signature values.
    "mm_phash_dedup" -> ((spark, dir) => {
      import org.apache.spark.sql.functions._
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
        .where(col("media_type") === "image")
      val maxRow = assets.agg(max(col("asset_id"))).head()
      require(!maxRow.isNullAt(0),
        "mm_phash_dedup needs at least one image asset to derive the planted-copy offset")
      val offset = maxRow.getLong(0) + 1L
      val planted = assets.select((col("asset_id") + lit(offset)).as("asset_id"),
        col("media_type"), col("payload"), col("declared_len"))
      val hashes = Multimodal
        .imagePerceptualHashes(spark, assets.unionByName(planted)).toDF()
      val pairs = graft.operators.Dedup.signatureBandPairs(
        hashes, "asset_id", "ahash64", nBands = 4, maxHamming = 3)
      hashes.where(col("asset_id") < offset)
        .join(pairs.where(col("doc_b") === col("doc_a") + lit(offset))
            .select(col("doc_a").as("asset_id"), col("hamming")),
          Seq("asset_id"), "left")
        .select(col("asset_id"), col("width"), col("ahash64"),
          coalesce(col("hamming") === 0L, lit(false)).as("planted_dup_found"))
    }),

    // Image dedup end to end: perceptual hashes → signature-quotient
    // banded pair generation → connected components → canonical
    // selection, the full visual-dedup pipeline (planted exact copies
    // make the clusters non-trivial). Pair work runs over one rep per
    // DISTINCT hash (Dedup.signatureComponents) — templated synthetic
    // rasters cluster heavily, and the clique form paid ~6× the
    // candidate volume at the 10× tier for identical verdicts (the
    // oracle already quotients for the same reason). The hash table is
    // lineage-truncated: the offset probe and both union branches
    // reference it, and without the barrier the BMP decode re-runs per
    // reference. The oracle recomputes pairs by exhaustive hamming and
    // closes them with a recursive CTE — the iterative min-label
    // rounds must land on the same fixpoint.
    "mm_phash_clusters" -> ((spark, dir) => {
      import org.apache.spark.sql.functions._
      import graft.core.GraftSession.LineageOps
      val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, dir))
        .where(col("media_type") === "image")
      val hashes0 = Multimodal.imagePerceptualHashes(spark, assets).toDF()
        .select(col("asset_id"), col("ahash64"))
        .truncateLineage()
      val maxRow = hashes0.agg(max(col("asset_id"))).head()
      require(!maxRow.isNullAt(0),
        "mm_phash_clusters needs at least one image asset to derive the planted-copy offset")
      val offset = maxRow.getLong(0) + 1L
      val uni = hashes0.unionByName(hashes0.select(
        (col("asset_id") + lit(offset)).as("asset_id"), col("ahash64")))
      graft.operators.Dedup.signatureComponents(
        uni, "asset_id", "ahash64", nBands = 4, maxHamming = 3)
    }),

    // REAL raster stats: decode the BMP container, read the body as
    // 24bpp BGR triplets, emit per-image pixel count + channel means —
    // byte sums stay integral in doubles, so the oracle is bit-exact.
    "mm_image_stats" -> ((spark, dir) => {
      import org.apache.spark.sql.functions._
      val assets = Multimodal
        .assetsFromDocuments(Tables.documents(spark, dir))
        .where(col("media_type") === "image")
      Multimodal.bmpChannelStats(spark, assets).toDF()
        .select(col("asset_id"), col("n_pixels"),
          round(col("mean_b"), 4).as("mean_b"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_r"), 4).as("mean_r"))
    }),

    // REAL PNG codec round trip via javax.imageio: image docs encoded
    // as genuine PNGs (complete-rows raster), decoded back through the
    // shared decode() dispatcher. PNG is lossless, so the decoded
    // frame is byte-identical to the truncated body and the oracle
    // recomputes every field — dims, n_bytes, first_byte, rolling
    // checksum — from the text directly. This is the representative-
    // corpora codec path the BMP fixture anchors bit-exactly.
    "mm_png_decode" -> ((spark, dir) => {
      val assets = Multimodal.imageAssetsFromDocuments(
        Tables.documents(spark, dir), "png")
      Multimodal.extractFeatures(spark, assets).toDF()
    }),

    // Nearest-neighbor thumbnail over the PNG-decoded raster — the
    // identical resize kernel and sampled source pixels as the BMP
    // path (every sampled pixel lands inside the complete-rows
    // raster), so the transformed-frame features hash-match the same
    // byte rebuild.
    "mm_png_resize" -> ((spark, dir) => {
      val assets = Multimodal.imageAssetsFromDocuments(
        Tables.documents(spark, dir), "png")
      Multimodal.resampleFeatures(spark, assets,
        outW = 8, outH = 4, pcmStride = 4, rawStride = 16).toDF()
    }),

    // JPEG (lossy) invariant harness: exact dimensional round trip +
    // per-channel mean preserved within 2.5 gray levels (measured
    // worst error 1.33 at quality 0.95 across every sf0.1 image doc).
    "mm_jpeg_roundtrip" -> ((spark, dir) => {
      Multimodal.jpegRoundtrip(Tables.documents(spark, dir), tol = 2.5).toDF()
    }),

    // REAL audio DSP: decode the WAV container, read the frame as
    // little-endian PCM16, emit per-asset RMS energy + peak amplitude.
    // int16 squares sum exactly in doubles (< 2^53), so the oracle
    // rebuilds the identical values from the synthesized body bytes —
    // the decode→DSP tier is hash-gated end to end.
    "mm_audio_features" -> ((spark, dir) => {
      import org.apache.spark.sql.functions._
      val assets = Multimodal
        .assetsFromDocuments(Tables.documents(spark, dir))
        .where(col("media_type") === "audio")
      Multimodal.pcm16Features(spark, assets).toDF()
        .select(col("asset_id"), col("n_samples"),
          round(col("rms"), 4).as("rms"), col("peak"))
    })
  )

  /** media index: doc_id%3 → 0 image (BMP), 1 audio (WAV), 2 video (raw). */
  private val mediaSql =
    "(['image', 'audio', 'video'])[(doc_id % 3) + 1]"

  /** Shared aHash rebuild: per image doc the unsigned 64-bit
    * average-hash in `all_h(doc_id, w, u)` — 8×8 nearest-neighbor
    * sample indices, integer channel-sum grayscale, mean-threshold
    * bits (the exact arithmetic of `Multimodal.aHash64`).
    */
  private val phashCte: String =
    """WITH RECURSIVE a AS (
      |  SELECT doc_id, text,
      |    16 + (doc_id % 32) AS w,
      |    (strlen(text) // 3) // (16 + (doc_id % 32)) AS heff
      |  FROM documents WHERE doc_id % 3 = 0
      |), p AS (
      |  SELECT doc_id, text, w, heff,
      |    list_transform(range(0, 64),
      |      i -> ((i // 8) * heff // 8) * w + ((i % 8) * w // 8)) AS ps
      |  FROM a WHERE heff > 0
      |), g AS (
      |  SELECT doc_id,
      |    list_transform(ps, p ->
      |      ascii(substring(text, CAST(3 * p + 1 AS INT), 1))
      |      + ascii(substring(text, CAST(3 * p + 2 AS INT), 1))
      |      + ascii(substring(text, CAST(3 * p + 3 AS INT), 1))) AS gray
      |  FROM p
      |), h AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(range(0, 64), i ->
      |      CASE WHEN gray[CAST(i + 1 AS INT)] * 64 >= list_sum(gray)
      |           THEN 1::HUGEINT << CAST(i AS INT) ELSE 0::HUGEINT END)) AS u
      |  FROM g
      |), all_h AS (
      |  SELECT a.doc_id, a.w, coalesce(h.u, 0::HUGEINT) AS u
      |  FROM a LEFT JOIN h ON a.doc_id = h.doc_id
      |)""".stripMargin

  /** Every oracle read of `documents` is rewritten through the asset
    * builders' admissibility quarantine ([[graft.operators.Multimodal
    * .admissibleDocs]]): the oracle runs on raw parquet views, so
    * without the mirror a quarantined doc (null text, multi-byte body)
    * would appear on the DuckDB side only. Centralized here so a
    * future mm oracle can't forget it.
    */
  lazy val oracles: Map[String, String] = rawOracles.view.mapValues(sql =>
    sql.replace("FROM documents",
      "FROM (SELECT * FROM documents WHERE " +
        graft.operators.Multimodal.docsAdmissibleSql + ") documents")).toMap

  private val rawOracles: Map[String, String] = Map(
    "mm_decode_features" ->
      s"""SELECT doc_id AS asset_id,
        |  $mediaSql AS media_type,
        |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'raw' END AS container,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 4) * 8000 AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(1 + (doc_id % 2) AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 + (doc_id % 32) AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 + (doc_id % 17) AS BIGINT) END AS height,
        |  strlen(text) AS n_bytes,
        |  -- the engine reports -1 for an EMPTY frame; DuckDB's
        |  -- ascii('') is 0, which would invent a NUL byte
        |  CASE WHEN strlen(text) = 0 THEN -1
        |       ELSE ascii(substring(text, 1, 1)) END AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(range(1, strlen(text) + 1),
        |        i -> ascii(substring(text, i::INTEGER, 1)))),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM documents""".stripMargin,

    "mm_phash_dedup" ->
      s"""$phashCte
        |SELECT doc_id AS asset_id, CAST(w AS BIGINT) AS width,
        |  CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |            THEN u - 18446744073709551616::HUGEINT ELSE u END
        |       AS BIGINT) AS ahash64,
        |  true AS planted_dup_found
        |FROM all_h""".stripMargin,

    "mm_phash_clusters" ->
      s"""$phashCte, sh AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |              THEN u - 18446744073709551616::HUGEINT ELSE u END
        |         AS BIGINT) AS h
        |  FROM all_h
        |), off AS (SELECT max(doc_id) + 1 AS o FROM sh
        |), uni AS MATERIALIZED (
        |  SELECT doc_id AS id, h FROM sh
        |  UNION ALL SELECT doc_id + (SELECT o FROM off), h FROM sh
        |-- QUOTIENT by the hash value before any pair work: equal
        |-- hashes are pairwise hamming-0, so an identical-hash group
        |-- is trivially one cluster — the naive all-pairs + closure
        |-- form turned a 2.6k-member degenerate group (hash 0) into a
        |-- 3.5M-edge clique whose transitive closure never finished at
        |-- the 10x synth scale. One rep (min member id) per distinct
        |-- hash; components close over the rep graph, whose edges come
        |-- from banded candidates: <= 3 differing bits across four
        |-- 16-bit bands leave >= 1 band equal (pigeonhole), so the
        |-- equal-band equi-join is candidate-complete and only
        |-- candidates pay the exact bit_count verify. Bands read the
        |-- UNSIGNED image of h so '>>' can't depend on sign. The
        |-- rep-level min label IS the component's min node id (each
        |-- node's id >= its group rep).
        |), hs AS MATERIALIZED (
        |  SELECT h, min(id) AS rep FROM uni GROUP BY 1
        |), hb AS MATERIALIZED (
        |  SELECT rep, h, t.i,
        |    CAST(((CASE WHEN h < 0
        |                THEN h::HUGEINT + 18446744073709551616::HUGEINT
        |                ELSE h::HUGEINT END) >> CAST(t.i * 16 AS INT))
        |         & 65535::HUGEINT AS BIGINT) AS bk
        |  FROM hs, (SELECT unnest(range(4)) AS i) t
        |), he AS MATERIALIZED (
        |  SELECT a, b FROM (
        |    SELECT DISTINCT l.h AS ha, l.rep AS a, r.h AS hb2, r.rep AS b
        |    FROM hb l JOIN hb r
        |      ON l.i = r.i AND l.bk = r.bk AND l.rep < r.rep
        |  ) WHERE bit_count(xor(ha, hb2)) <= 3
        |), sym AS (
        |  SELECT a, b FROM he UNION SELECT b, a FROM he
        |), reach(a, b) AS (
        |  SELECT rep, rep FROM hs
        |  UNION
        |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        |), lbl0 AS (
        |  SELECT a AS rep, min(b) AS component FROM reach GROUP BY 1
        |)
        |SELECT uni.id AS asset_id,
        |  lbl0.component AS component,
        |  lbl0.component = uni.id AS is_canonical
        |FROM uni JOIN hs USING (h) JOIN lbl0 ON hs.rep = lbl0.rep""".stripMargin,

    "mm_image_stats" ->
      """WITH a AS (
        |  SELECT doc_id, text, strlen(text) // 3 AS n FROM documents
        |  WHERE doc_id % 3 = 0
        |), s AS (
        |  SELECT doc_id, n,
        |    list_transform(range(0, n),
        |      i -> ascii(substring(text, CAST(3 * i + 1 AS INT), 1))) AS bs,
        |    list_transform(range(0, n),
        |      i -> ascii(substring(text, CAST(3 * i + 2 AS INT), 1))) AS gs,
        |    list_transform(range(0, n),
        |      i -> ascii(substring(text, CAST(3 * i + 3 AS INT), 1))) AS rs
        |  FROM a
        |)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_pixels,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE list_sum(bs)::DOUBLE / n END, 4) AS mean_b,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE list_sum(gs)::DOUBLE / n END, 4) AS mean_g,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE list_sum(rs)::DOUBLE / n END, 4) AS mean_r
        |FROM s""".stripMargin,

    "mm_audio_features" ->
      """WITH a AS (
        |  SELECT doc_id, text, strlen(text) // 2 AS n FROM documents
        |  WHERE doc_id % 3 = 1
        |), s AS (
        |  SELECT doc_id, n,
        |    list_transform(range(1, n + 1),
        |      i -> ascii(substring(text, CAST(2 * i - 1 AS INT), 1)) +
        |           256 * ascii(substring(text, CAST(2 * i AS INT), 1))) AS smp
        |  FROM a
        |)
        |SELECT doc_id AS asset_id, CAST(n AS BIGINT) AS n_samples,
        |  round(CASE WHEN n = 0 THEN 0.0
        |    ELSE sqrt(list_sum(list_transform(smp, x -> x::DOUBLE * x)) / n)
        |    END, 4) AS rms,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE list_max(smp) END AS BIGINT) AS peak
        |FROM s""".stripMargin,

    // PNG is lossless: the decoded raster is the first w*h*3 body
    // bytes verbatim, so the oracle rebuilds every decoded field from
    // the text. Docs with zero complete rows are skipped on both sides
    // (a real codec can't carry a partial row).
    "mm_png_decode" ->
      """WITH a AS (
        |  SELECT doc_id, text, 16 + (doc_id % 32) AS w,
        |    (strlen(text) // 3) // (16 + (doc_id % 32)) AS h
        |  FROM documents
        |  WHERE doc_id % 3 = 0
        |    AND (strlen(text) // 3) // (16 + (doc_id % 32)) >= 1
        |)
        |SELECT doc_id AS asset_id, 'image' AS media_type, 'png' AS container,
        |  CAST(NULL AS BIGINT) AS sample_rate, CAST(NULL AS BIGINT) AS channels,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 * w * h AS BIGINT) AS n_bytes,
        |  ascii(substring(text, 1, 1)) AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(range(1, 3 * w * h + 1),
        |        i -> ascii(substring(text, i::INTEGER, 1)))),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM a""".stripMargin,

    // Same sampled-pixel rebuild as the img branch of mm_resize_sample
    // (the nearest-neighbor kernel only ever samples inside complete
    // rows), restricted to docs with at least one complete row.
    "mm_png_resize" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    flatten(list_transform(
        |      list_transform(range(0, 32),
        |        k -> ((k // 8) * ((strlen(text) // 3) // (16 + (doc_id % 32))) // 4)
        |               * (16 + (doc_id % 32)) + ((k % 8) * (16 + (doc_id % 32))) // 8),
        |      p -> [ascii(substring(text, CAST(3 * p + 1 AS INT), 1)),
        |            ascii(substring(text, CAST(3 * p + 2 AS INT), 1)),
        |            ascii(substring(text, CAST(3 * p + 3 AS INT), 1))])) AS bl
        |  FROM documents
        |  WHERE doc_id % 3 = 0
        |    AND (strlen(text) // 3) // (16 + (doc_id % 32)) >= 1
        |)
        |SELECT doc_id AS asset_id, 'image' AS media_type,
        |  CAST(len(bl) AS BIGINT) AS n_bytes,
        |  CAST(bl[1] AS INT) AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT, list_transform(bl, x -> x::BIGINT)),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM img""".stripMargin,

    // Invariant harness (dedup_minhash pattern): the oracle states the
    // contract — dims round-trip exactly, channel means within
    // tolerance — and Spark computes the evidence.
    "mm_jpeg_roundtrip" ->
      """SELECT doc_id AS asset_id,
        |  CAST(16 + (doc_id % 32) AS BIGINT) AS width,
        |  CAST((strlen(text) // 3) // (16 + (doc_id % 32)) AS BIGINT) AS height,
        |  true AS dims_match, true AS mean_within_tol
        |FROM documents
        |WHERE doc_id % 3 = 0
        |  AND (strlen(text) // 3) // (16 + (doc_id % 32)) >= 1""".stripMargin,

    // Rebuild of the REAL per-media transforms from the same bytes:
    // image = nearest-neighbor 8×4 downsample over the effective
    // width-W raster (W = 16 + doc_id%32, effective height
    // (len//3)//W, partial row ignored); audio = every 4th PCM16
    // sample (both bytes); video = every 16th byte. Features
    // (n_bytes / first_byte / rolling checksum) are computed over the
    // TRANSFORMED byte list, so a hash match pins the kernels
    // byte-for-byte.
    "mm_resize_sample" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    CASE WHEN (strlen(text) // 3) // (16 + (doc_id % 32)) = 0
        |      THEN CAST([] AS INT[])
        |    ELSE flatten(list_transform(
        |      list_transform(range(0, 32),
        |        k -> ((k // 8) * ((strlen(text) // 3) // (16 + (doc_id % 32))) // 4)
        |               * (16 + (doc_id % 32)) + ((k % 8) * (16 + (doc_id % 32))) // 8),
        |      p -> [ascii(substring(text, CAST(3 * p + 1 AS INT), 1)),
        |            ascii(substring(text, CAST(3 * p + 2 AS INT), 1)),
        |            ascii(substring(text, CAST(3 * p + 3 AS INT), 1))]))
        |    END AS bl
        |  FROM documents WHERE doc_id % 3 = 0
        |), aud AS (
        |  SELECT doc_id,
        |    flatten(list_transform(range(0, strlen(text) // 2, 4),
        |      i -> [ascii(substring(text, CAST(2 * i + 1 AS INT), 1)),
        |            ascii(substring(text, CAST(2 * i + 2 AS INT), 1))])) AS bl
        |  FROM documents WHERE doc_id % 3 = 1
        |), vid AS (
        |  SELECT doc_id,
        |    list_transform(range(1, strlen(text) + 1, 16),
        |      i -> ascii(substring(text, CAST(i AS INT), 1))) AS bl
        |  FROM documents WHERE doc_id % 3 = 2
        |), u AS (
        |  SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
        |)
        |SELECT doc_id AS asset_id,
        |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS media_type,
        |  CAST(len(bl) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN len(bl) = 0 THEN -1 ELSE bl[1] END AS INT) AS first_byte,
        |  list_reduce(
        |    list_prepend(0::BIGINT, list_transform(bl, x -> x::BIGINT)),
        |    (acc, b) -> (acc * 31 + b) % 1000000007) AS checksum
        |FROM u""".stripMargin
  )
}
