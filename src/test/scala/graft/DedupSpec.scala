package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFns
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("exact groups partition the input") {
    val docs = Tables.documents(spark, sfDir)
    val groups = Dedup.exactGroups(docs, md5(col("text")), col("doc_id"))
    assert(groups.agg(sum("n_copies")).head().getLong(0) === docs.count())
  }

  test("minhash LSH finds the high-jaccard pairs (recall vs exact)") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    // ground truth: exact bigram-shingle jaccard >= 0.8 over all pairs
    val toks = TextFns.tokens(col("text"))
    val base = docs.select(col("doc_id").as("doc"),
      array_distinct(TextFns.shingles(toks, 2)).as("sh"))
    val l = base.select(col("doc").as("doc_a"), col("sh").as("sh_a"))
    val r = base.select(col("doc").as("doc_b"), col("sh").as("sh_b"))
    val truth = l.crossJoin(r).where(col("doc_a") < col("doc_b"))
      .where(TextFns.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      .select("doc_a", "doc_b")
    val found = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, k = 32, rowsPerBand = 4, threshold = 0.8)
      .select("doc_a", "doc_b")
    // at jaccard>=0.8 with 8 bands of 4 rows, collision prob ≈ 1
    assert(truth.exceptAll(found).isEmpty, "LSH missed a high-jaccard pair")
    // and found pairs are verified-exact so precision is 1 by construction
    assert(found.exceptAll(truth).isEmpty)
  }

  test("minhash band geometry that silently loses signal is rejected loudly") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(4)
    // rowsPerBand > k → zero bands → empty pair set read as "no dups"
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 32, rowsPerBand = 33)
    }
    // non-dividing geometry would silently drop remainder signature rows
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 32, rowsPerBand = 5)
    }
  }

  test("simhash of identical token streams is identical, and close docs differ in few bits") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan merge join"),
      (2L, "spark table scan merge join"),
      (3L, "completely different words entirely here")).toDF("id", "text")
    val hs = df.select(col("id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) === hs(2L))
    assert(hs(1L) !== hs(3L))
  }

  test("blocked jaccard pairs respect the threshold") {
    val pairs = Dedup.blockedJaccardPairs(Tables.documents(spark, sfDir),
      "doc_id", "text", Seq("lang", "source"), shingleN = 2, threshold = 0.3)
    assert(pairs.where(col("jaccard") < 0.3).isEmpty)
  }

  test("heavy hitters equals the exact group-by-having result") {
    import spark.implicits._
    val words = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    val total = words.count()
    val exact = words.groupBy("word").agg(count(lit(1)).as("freq"))
      .where(col("freq") > (total * 0.02).toLong)
    val got = graft.operators.HeavyHitters.topItems(words, "word", 0.02, sketchK = 128)
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
    assert(got.count() > 0, "fixture should have frequent words")
  }

  test("Misra-Gries sketch never misses an above-threshold item") {
    import spark.implicits._
    // adversarial: one item at 12%, the rest a long uniform tail
    val items = (Seq.fill(120)("hot") ++ (1 to 880).map(i => s"t$i"))
    val df = scala.util.Random.shuffle(items).toDF("w").repartition(7)
    val cands = df.select(graft.operators.HeavyHitters.misraGries(col("w"), 16).as("c"))
      .head().getSeq[String](0)
    assert(cands.contains("hot"))
    assert(cands.size <= 16)
  }

  test("connected components converges on a long chain in O(log n) rounds") {
    import spark.implicits._
    // path graph 1-2-...-40: diameter 39; pointer jumping must close it
    // well inside 10 rounds (min-label alone would need ~39)
    val chain = (1 until 40).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val got = Dedup.connectedComponents(chain, "a", "b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 40 && got.values.forall(_ === 1L))
  }

  test("connected components fails loudly when maxIter is exceeded") {
    import spark.implicits._
    val chain = (1 until 40).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "a", "b", maxIter = 2)
    }
  }

  test("simhash band pairs: recall 1.0 vs brute force within the pigeonhole bound") {
    // completeness is structural (hamming ≤ nBands−1 ⇒ some band
    // matches exactly), so the banded join must find EVERY pair the
    // all-pairs hamming scan finds — not a sampled approximation
    // doc_id filter, not limit(): an unordered limit can hand the
    // banded and brute-force plans different subsets
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
    val banded = Dedup.simhashBandPairs(docs, "doc_id", "text", nBands = 4, maxHamming = 3)
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val l = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val brute = l.crossJoin(r)
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= 3)
    assert(brute.count() > 0, "fixture needs near-dup signature pairs")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
  }

  test("simhash band pairs rejects parameters that break the pigeonhole guarantee") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    intercept[IllegalArgumentException] {
      Dedup.simhashBandPairs(docs, "doc_id", "text", nBands = 4, maxHamming = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashBandPairs(docs, "doc_id", "text", nBands = 5, maxHamming = 3)
    }
  }

  test("segment dedup keeps exactly one copy of each distinct segment, first occurrence wins") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 5)
    // kept rows == distinct segments; duplicates exist in the fixture
    val nKept = out.where(col("kept")).count()
    val nAll = out.count()
    assert(nKept < nAll, "fixture should contain cross-corpus duplicate segments")
    // rebuild segments independently and count distinct
    val toks = graft.functions.TextFns.tokens(col("text"))
    val nSeg = ceil(size(toks) / lit(5.0)).cast("int")
    val distinctSegs = docs.select(
        explode(transform(sequence(lit(0), nSeg - 1),
          i => concat_ws(" ", slice(toks, i * 5 + 1, lit(5))))).as("seg"))
      .select("seg").distinct().count()
    assert(nKept === distinctSegs)
    // the keeper of any duplicated segment precedes all its drops
    val segs = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(toks, i * 5 + 1, lit(5))))).as(Seq("seg_idx", "seg")))
    val joined = out.join(segs.select(col("doc_id"),
      col("seg_idx").cast("long").as("seg_idx"), col("seg")), Seq("doc_id", "seg_idx"))
    val firstByPos = joined.groupBy("seg")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"),
        min(when(col("kept"), struct(col("doc_id"), col("seg_idx")))).as("keeper"))
    assert(firstByPos.where(col("first") =!= col("keeper")).isEmpty)
  }

  test("boilerplate filter drops every occurrence of a planted high-frequency segment") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // plant the same 3-token footer into 10 documents (ids offset so
    // they never collide with real ids)
    val footer = "zz@@footer zz@@legal zz@@rights"
    // truncate each base text to a multiple of 3 tokens so the footer
    // lands on a segment boundary and forms the same segment everywhere
    val t = TextFns.tokens(col("text"))
    val planted = docs.orderBy(col("doc_id")).limit(10)
      .select((col("doc_id") + lit(5000000L)).as("doc_id"),
        concat(array_join(slice(t, lit(1), (size(t) / 3).cast("int") * 3), " "),
          lit(" " + footer)).as("text"))
    val out = Dedup.boilerplateFilter(docs.union(planted), "doc_id", "text",
      segTokens = 3, minDocFreq = 5)
    // every planted doc lost at least its footer segment, and the
    // footer string never survives into any clean_text
    val plantedOut = out.where(col("doc_id") >= 5000000L)
    assert(plantedOut.count() === 10)
    assert(plantedOut.where(col("n_kept") === col("n_seg")).isEmpty)
    assert(out.where(col("clean_text").contains("zz@@footer")).isEmpty)
    // counts are conserved: n_kept <= n_seg, and clean_text's token
    // count equals the sum of kept segment sizes (all segments are
    // exactly 3 tokens except possibly a doc's last one)
    assert(out.where(col("n_kept") > col("n_seg")).isEmpty)
    val toks = graft.functions.TextFns.tokens(col("text"))
    val nTok = out.where(col("n_kept") === col("n_seg"))
      .join(docs.union(planted), "doc_id")
      .where(size(TextFns.tokens(col("clean_text"))) =!= size(toks))
    assert(nTok.isEmpty, "fully-kept docs must reassemble to the original token count")
  }

  test("dupSpanProfile: planted shared span is measured exactly; unique docs read zero") {
    import spark.implicits._
    // docs 1 and 2 share the 8-token span "p q r s t u v w" (at
    // different offsets), padded with doc-unique filler; doc 3 is
    // fully unique. With 3-grams the shared span contributes exactly
    // 8-3+1 = 6 duplicated gram positions per doc, consecutively.
    val span = "p q r s t u v w"
    val docs = Seq(
      (1L, s"a1 b1 c1 $span d1 e1 f1"),
      (2L, s"a2 $span b2 c2 d2 e2 f2"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 xa xb xc xd xe")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanProfile(docs, "doc_id", "text", nGram = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 14 tokens → 12 3-gram positions per doc
    assert(got(1L) === (12L, 6L, 500L, 6L))
    assert(got(2L) === (12L, 6L, 500L, 6L))
    assert(got(3L) === (12L, 0L, 0L, 0L))
  }

  test("dupSpanProfile: two disjoint shared spans yield two runs; longest is the max") {
    import spark.implicits._
    // docs 1/2 share "s1 s2 s3 s4" (2 dup 3-gram positions) and
    // "t1 t2 t3 t4 t5" (3 dup positions), separated by unique filler
    val docs = Seq(
      (1L, "s1 s2 s3 s4 u1 u2 u3 t1 t2 t3 t4 t5"),
      (2L, "t1 t2 t3 t4 t5 v1 v2 v3 s1 s2 s3 s4")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanProfile(docs, "doc_id", "text", nGram = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got(1L) === (5L, 3L))
    assert(got(2L) === (5L, 3L))
  }

  test("dupSpanRemoval: planted span excised from every occurrence; unique docs untouched") {
    import spark.implicits._
    // docs 1/2 share "p q r s t" (5 tokens = one 3-gram span of 3
    // dup positions covering tokens p..t); doc 3 is unique; doc 4
    // duplicates doc 1 verbatim so EVERYTHING in both is covered.
    val span = "p q r s t"
    val docs = Seq(
      (1L, s"a1 b1 $span c1 d1"),
      (2L, s"$span a2 b2 c2 d2"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanRemoval(docs, "doc_id", "text", nGram = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === (9L, 5L, "a1 b1 c1 d1"))
    assert(got(2L) === (9L, 5L, "a2 b2 c2 d2"))
    assert(got(3L) === (9L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"))
    // verbatim duplicates: every token covered, both docs empty out
    val dup = Seq((1L, "m n o p q r"), (2L, "m n o p q r")).toDF("doc_id", "text")
    val g2 = Dedup.dupSpanRemoval(dup, "doc_id", "text", nGram = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(g2(1L) === (6L, "")); assert(g2(2L) === (6L, ""))
  }

  test("native simhash64 matches the 64-vote declarative rebuild on every fixture doc") {
    // Differential harness (formerly the registered dedup_simhash
    // query; moved here so the BENCH query measures the production
    // projection, not its verification): rebuild the sign-vote/bit
    // logic from Spark built-ins over the shared token-hash kernel —
    // explode tokens, 64 codegen'd sign-vote sums, reassemble the bit
    // vector — and require bit-equality with the native one-pass
    // expression for every document.
    import graft.expressions.GraftFunctions
    val voteCols = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val rebuilt = (0 until 64)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    val docs = Tables.documents(spark, sfDir)
    val mismatches = docs
      .select(col("doc_id"), explode(GraftFunctions.tokenHashes(col("text"))).as("th"))
      .groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), rebuilt.as("rebuilt"))
      .join(docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("native")),
        Seq("doc_id"))
      .where(col("native") =!= col("rebuilt"))
      .count()
    assert(mismatches === 0L)
    // exploded-token docs only: a doc with zero tokens never reaches
    // the rebuild — pin coverage so the assertion is over ALL docs
    assert(docs.where(size(TextFns.tokens(col("text"))) > 0).count() === docs.count())
  }

  test("connected components labels chains, isolated pairs, and cycles") {
    import spark.implicits._
    // components: {1,2,3,4} (chain + cycle back), {10,11}, {20,21,22}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("signatureComponents ≡ clique-form band pairs + components, including " +
      "equal-hash groups, null signatures, and cross-group near-dups") {
    import spark.implicits._
    // groups: {1,2,7} share hash A; {3} hash B = A with 2 flipped bits
    // (links the A-group via a rep-level near-dup edge); {4,5} share
    // hash C far from A/B; {6} hash D far from everything; {8, 9}
    // null signatures (must stay their own singleton components).
    val a = 0x0123456789ABCDEFL
    val b = a ^ 0x0000000000000011L // 2 bit flips from a
    val c = 0x7FFFFFFF00000000L
    val d = -1L
    val sigs = Seq(
      (1L, Some(a)), (2L, Some(a)), (7L, Some(a)), (3L, Some(b)),
      (4L, Some(c)), (5L, Some(c)), (6L, Some(d)),
      (8L, None), (9L, None)).toDF("id", "sig")
    val quotient = Dedup.signatureComponents(sigs, "id", "sig",
        nBands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // the clique form this operator must agree with
    val pairs = Dedup.signatureBandPairs(sigs, "id", "sig",
      nBands = 4, maxHamming = 3)
    val cc = Dedup.connectedComponents(
      pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    val clique = sigs
      .join(cc.select(col("node").as("id"), col("lbl")), Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(1) == r.getLong(0))).toSet
    assert(quotient === clique)
    // and the fixture exercises what it claims: a multi-group
    // component labeled by the min id across groups
    assert(quotient.contains((3L, 1L, false)) &&
      quotient.contains((7L, 1L, false)), quotient.toString)
    assert(quotient.contains((8L, 8L, true)) &&
      quotient.contains((9L, 9L, true)))
  }
}
