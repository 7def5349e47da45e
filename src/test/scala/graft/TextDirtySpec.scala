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
}
