package graft

import org.apache.spark.sql.functions._

/** Dirty-data robustness for the text tier: the oracle fixtures are
  * clean ASCII prose, so this spec runs the QUERY-LEVEL text entries
  * over a pathological documents table — null text, empty text,
  * whitespace runs (empty tokens), single-char docs, multi-byte
  * unicode, a 10k-char single token, control characters — written as
  * a real parquet dir with the production schema, exercising the same
  * `(spark, dir)` path the gate uses. Contract: no query throws (no
  * ANSI division-by-zero, no negative-size arithmetic, no codec
  * crash), every query emits one deterministic row per surviving doc,
  * and null/empty inputs yield nulls or well-defined zeros — never a
  * task failure.
  */
class TextDirtySpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_docs").toString
    val docs = Seq[(Long, String, String, String)](
      (1L, null, "en", "crawl"), // null body
      (2L, "", "en", "crawl"), // empty body
      (3L, "   ", "en", "crawl"), // whitespace-only → empty tokens
      (4L, "a", "en", "crawl"), // single char
      (5L, "the the the the the", "en", "crawl"), // zero diversity
      (6L, "naïve café über straße 東京 таблица", "xx", "crawl"), // multi-byte
      (7L, "x" * 10000, "en", "crawl"), // one huge token
      (8L, "tab\tand\nnewline\rchars", "en", "crawl"), // control chars
      (9L, "a  b   c", "en", "crawl"), // space runs → "" tokens
      (10L, "select from where join the a", "sql", "crawl") // clean control row
    ).map { case (id, t, l, s) =>
      (id, t, l, s, Option(t).map(_.length.toLong).getOrElse(0L))
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // Documents-only text queries a crawler feeds first: scoring,
  // language-ID, fingerprinting, token counting, dedup signatures.
  private val docQueries = Seq("text_quality", "text_langid",
    "text_fingerprint", "text_token_count", "dedup_exact",
    "dedup_simhash", "text_pii_redact")

  test("pathological documents never fail a text query task") {
    for (name <- docQueries) {
      val df = graft.queries.TextQueries.queries(name)
      val rows = df(spark, dirtyDir).collect() // completing IS the assertion
      assert(rows.nonEmpty, s"$name returned no rows on the dirty fixture")
    }
  }

  test("pathological documents produce deterministic output across runs") {
    for (name <- Seq("text_quality", "text_langid")) {
      val q = graft.queries.TextQueries.queries(name)
      val a = q(spark, dirtyDir).orderBy("doc_id").collect().toSeq
      val b = q(spark, dirtyDir).orderBy("doc_id").collect().toSeq
      assert(a === b, name)
    }
  }

  test("null and empty bodies yield null/zero scores, not errors") {
    val q = graft.queries.TextQueries.queries("text_quality")(spark, dirtyDir)
      .orderBy("doc_id").collect()
    val byId = q.map(r => r.getLong(0) -> r).toMap
    // null text → null token metrics (split(null) is null end to end)
    assert(byId(1L).isNullAt(1), "null text must carry null n_words")
    // empty text → split("") = [""] → one empty token, ratios defined
    assert(byId(2L).getLong(1) === 1L)
    assert(!byId(2L).isNullAt(2), "empty text ratios must be defined")
  }

  test("huge single-token and multi-byte docs flow through signatures and BPE") {
    val sim = graft.queries.TextQueries.queries("dedup_simhash")(spark, dirtyDir)
      .where(col("doc_id").isin(6L, 7L)).collect()
    assert(sim.length === 2)
    val bpe = graft.queries.TextQueries.queries("text_token_count")(spark, dirtyDir)
      .where(col("doc_id").isin(6L, 7L)).collect()
    assert(bpe.length === 2)
  }

  // The cross-engine dirty-docs program's crash class, pinned in-repo:
  // pair generators divided 0/0 on no-shingle docs, typed byte kernels
  // NPE'd on null text. Each contract below is ALSO oracle-mirrored
  // (the /tmp dirty-corpus sweep); this spec keeps the guards from
  // regressing without the external harness.

  test("no-shingle docs are excluded from near-dup pair generation, not 0/0") {
    // null text (1), empty (2), single token (4, 7) have no 2-shingles:
    // minhash must report planted_dup_found = false for them and true
    // for every shingleable doc — and never throw DIVIDE_BY_ZERO.
    val rows = graft.queries.TextQueries.queries("dedup_minhash")(spark, dirtyDir)
      .select("doc_id", "planted_dup_found").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // doc 8 is one token too (its whitespace is tabs/newlines, not
    // the space delimiter), doc 3 is four EMPTY tokens — 3 shingles
    for (id <- Seq(1L, 2L, 4L, 7L, 8L))
      assert(!rows(id), s"doc $id has no shingles; planted dup must be unfindable")
    for (id <- Seq(3L, 5L, 6L, 9L, 10L))
      assert(rows(id), s"doc $id is shingleable; planted dup must surface")
    // blocked jaccard: two no-shingle docs share a (lang, source) block
    // — without the guard their Jaccard is 0/0 under ANSI
    val jac = graft.queries.TextQueries.queries("dedup_ngram_jaccard")(spark, dirtyDir)
    assert(jac.where(col("doc_a").isin(1L, 2L, 4L, 7L) ||
      col("doc_b").isin(1L, 2L, 4L, 7L)).count() === 0L)
  }

  test("null signatures drop before the band shuffle") {
    val sigs = graft.queries.TextQueries.queries("dedup_simhash")(spark, dirtyDir)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(sigs(1L).isEmpty, "null text must carry a null simhash")
    assert(sigs(2L).nonEmpty && sigs(2L) === sigs(3L),
      "all-empty-token docs share the FNV-basis signature")
    val pairs = graft.queries.TextQueries.queries("dedup_simhash_pairs")(spark, dirtyDir)
      .select("doc_id", "planted_dup_found").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!pairs(1L), "a signature-less doc cannot surface a planted pair")
    assert(pairs(7L), "every signed doc must surface its planted copy")
  }

  test("byte kernels quarantine inadmissible bodies instead of failing tasks") {
    // deflate: null body has no signal row; everything else emits one
    val z = graft.queries.TextQueries.queries("text_zlib_signal")(spark, dirtyDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!z.contains(1L) && z.contains(2L) && z.contains(7L))
    // asset builders: null text AND multi-byte bodies (doc 6 — the
    // per-char oracle arithmetic can't express UTF-8 bytes) quarantine
    val mm = graft.queries.MultimodalQueries.queries("mm_decode_features")(spark, dirtyDir)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(!mm.contains(1L) && !mm.contains(6L),
      "null-text and multi-byte docs are inadmissible as byte assets")
    assert(mm.contains(7L) && mm.contains(8L),
      "single-byte bodies (incl. control chars) remain admissible")
  }
}
