package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized dirty-data fuzzing — the generalization of the
  * hand-picked pathological rows in TextDirtySpec / EventsDirtySpec
  * and tools/dirty_corpus.py. Those fixtures choose one pathology per
  * row; a crawl delivers COMBINATIONS (a multi-byte doc that is also
  * one huge token with a null lang; a NaN value on a null-ts event
  * with broken props). A seeded generator mixes pathologies
  * independently per field, so every run covers hundreds of
  * combinations deterministically (fixed seed — reproducible
  * failures, stable CI).
  *
  * Contract (the docs/ROBUSTNESS.md envelope): no query task ever
  * fails — no NPE, no ANSI DIVIDE_BY_ZERO / CAST abort, no negative-
  * size allocation — and output is deterministic across runs. Value-
  * level cross-engine agreement is the dirty-corpus gate's job
  * (tools/check.py over tools/dirty_corpus.py output); this spec is
  * the in-repo combinatorial crash barrier.
  */
class DirtyFuzzSpec extends SparkSpec {

  private val NDocs = 300
  private val NEvents = 600

  private def fuzzText(r: Random): String = r.nextInt(10) match {
    case 0 => null
    case 1 => ""
    case 2 => " " * (1 + r.nextInt(5))
    case 3 => "x" * (100 + r.nextInt(5000)) // one huge token
    case 4 => Seq.fill(1 + r.nextInt(8))("東京 straße ταχύς naïve таблица 🚀🧪 a𝄞b"
      .split(" ")(r.nextInt(7))).mkString(" ") // incl. astral (surrogate pairs)
    case 5 => "tab\tand\nnewline\rchars" + (" " * r.nextInt(3))
    case 6 => Seq.fill(1 + r.nextInt(6))(Seq("a", "", "bb", "", "c")(r.nextInt(5)))
      .mkString(" ") // empty-token runs
    case _ => Seq.fill(1 + r.nextInt(30))(
      Seq("spark", "query", "table", "scan", "the", "fast", "row")(r.nextInt(7)))
      .mkString(" ")
  }

  private def fuzzValue(r: Random): java.lang.Double = r.nextInt(8) match {
    case 0 => null
    case 1 => Double.NaN
    case 2 => Double.PositiveInfinity
    case 3 => Double.NegativeInfinity
    case 4 => -1e12 + r.nextDouble()
    case _ => r.nextDouble() * 200 - 50
  }

  private def fuzzProps(r: Random): String = r.nextInt(6) match {
    case 0 => null
    case 1 => "not json"
    case 2 => s"""{"k": "${fuzzText(r) == null}"}"""
    case 3 => s"""{"k": ${r.nextDouble() * 100}}"""
    case 4 => "{"
    case _ => s"""{"k": ${r.nextInt(100)}}"""
  }

  private lazy val fuzzDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
    val r = new Random(0xD127C0DE)
    val docs = (1L to NDocs).map { id =>
      val t = fuzzText(r)
      (id, t,
        if (r.nextInt(6) == 0) null else Seq("en", "de", "xx")(r.nextInt(3)),
        if (r.nextInt(6) == 0) null else s"src${r.nextInt(5)}",
        Option(t).map(_.length.toLong).getOrElse(0L))
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val events = (1L to NEvents).map { id =>
      val ts = if (r.nextInt(5) == 0) null
        else new Timestamp(1704067200000L + r.nextInt(5000000) * 1000L)
      (id, ts, (r.nextInt(40) + 1).toLong,
        if (r.nextInt(7) == 0) null
        else Seq("view", "click", "purchase", "error")(r.nextInt(4)),
        fuzzValue(r), fuzzProps(r))
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // Documents-family queries: every pathology class flows through
  // scoring, signatures, pair generation, packing, and byte kernels.
  private val docQueries = Seq(
    "text_quality", "text_langid", "text_fingerprint", "text_token_count",
    "text_repetition", "text_zlib_signal", "dedup_exact", "dedup_prefix",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_minhash",
    "dedup_ngram_jaccard", "sample_token_budget", "pack_length_buckets",
    "dataset_card_values")

  private val mmQueries = Seq("mm_decode_features")

  // Events-family queries: time-ordered, finite-measure, and
  // try-parse contracts under random combination pathologies.
  private val evQueries = Seq(
    "w3_lag_changes", "w2_first_ignorenulls", "agg_stats", "agg_percentile",
    "ts_ewma", "events_interval_coalesce", "events_attribution",
    "events_session_funnel", "events_markov_transitions", "f_json_extract",
    "p9_na_fill_drop", "agg_bool_median", "w11_distribution")

  test("fuzzed documents never fail a task across the text/dedup/pack tier") {
    for (name <- docQueries) {
      val df = graft.SparkEntry.queries(name)(spark, fuzzDir)
      val n = df.count() // completing IS the assertion
      assert(n >= 0, name)
    }
  }

  test("fuzzed documents never fail the multimodal byte tier") {
    for (name <- mmQueries) {
      val rows = graft.SparkEntry.queries(name)(spark, fuzzDir).collect()
      assert(rows.nonEmpty, s"$name returned no rows — quarantine ate everything")
    }
  }

  test("fuzzed events never fail a task across the agg/window/json tier") {
    for (name <- evQueries) {
      val df = graft.SparkEntry.queries(name)(spark, fuzzDir)
      assert(df.count() >= 0, name)
    }
  }

  test("fuzzed outputs are deterministic across runs") {
    for (name <- Seq("text_quality", "dedup_simhash", "w3_lag_changes", "ts_ewma")) {
      val q = graft.SparkEntry.queries(name)
      val cols = q(spark, fuzzDir).columns.map(col).toSeq
      val a = q(spark, fuzzDir).sort(cols: _*).collect().toSeq
      val b = q(spark, fuzzDir).sort(cols: _*).collect().toSeq
      assert(a === b, name)
    }
  }
}
