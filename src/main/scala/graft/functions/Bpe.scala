package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic greedy byte-pair encoding (the public Sennrich
  * subword algorithm): fit a merge table on corpus word frequencies,
  * then count subword tokens per document. Training-data budgets
  * (packing, shard export) are set in subword tokens, not whitespace
  * words — this is the budget column a loader's tokenizer actually
  * sees.
  *
  * Scale shape: the FIT collects a bounded top-K word-frequency table
  * to the driver (the Lloyd-quantizer-sample pattern — the merge table
  * is a model, fitted on a bounded sample, never on the corpus) and
  * the APPLY is a zero-shuffle native projection with the fitted table
  * attached via `ctx.addReferenceObj` ([[graft.expressions
  * .BpeTokenCount]]). Everything is deterministic: ties in the fit
  * break lexicographically, the word sample is (count desc, word asc),
  * and the apply is the standard leftmost-lowest-rank merge loop.
  */
object Bpe {

  /** Fit up to `nMerges` greedy merges over (word, freq) pairs.
    * Classic algorithm: words start as character-symbol sequences;
    * each round merges the adjacent symbol pair with the highest
    * frequency (ties: lexicographically smallest pair), stopping
    * early when no pair repeats.
    */
  /** Seed symbols of a word: one per CODE POINT (an astral char is a
    * single symbol, not two surrogate halves) — coherent with
    * [[wordTokens]], [[distributedFit]] (Java regex `(.)` matches a
    * full code point), and the DuckDB oracle's per-code-point split.
    */
  private def symbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + cc)
      i += cc
    }
    out.result()
  }

  def fit(wordCounts: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    var words: Vector[(Array[String], Long)] =
      wordCounts.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (symbols(w), c) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** One exhaustive left-to-right merge of `pair` over a symbol array. */
  def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Merge table → rank lookup for the apply kernel (key `a NUL b`). */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + "\u0000" + b, r) }
    m
  }

  /** Token count of one word under the fitted table: start from
    * characters, repeatedly merge the LEFTMOST occurrence of the
    * lowest-rank adjacent pair until none applies — the standard BPE
    * apply. Empty words contribute zero tokens.
    */
  def wordTokens(word: String, ranks: java.util.HashMap[String, Integer]): Int = {
    val n = word.length
    if (n == 0) return 0
    if (n == 1) return 1
    // seed symbols are CODE POINTS (see [[symbols]]): an astral char
    // (one code point, two Java chars) split into surrogate halves
    // would make n_bpe exceed the code-point char count and violate
    // the published n_words <= n_bpe <= n_nonspace_chars bound
    val seed = symbols(word)
    if (seed.length == 1) return 1
    val syms = new java.util.ArrayList[String](seed.length)
    var i = 0
    while (i < seed.length) { syms.add(seed(i)); i += 1 }
    var merging = true
    while (merging && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestI = j }
        j += 1
      }
      if (bestI < 0) merging = false
      else {
        syms.set(bestI, syms.get(bestI) + syms.get(bestI + 1))
        syms.remove(bestI + 1)
      }
    }
    syms.size
  }

  /** Per-document subword token count: sum of [[wordTokens]] over the
    * single-space-separated words (the [[TextFns.tokens]] convention).
    */
  def tokenCount(text: String, ranks: java.util.HashMap[String, Integer]): Long = {
    var total = 0L
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        total += wordTokens(text.substring(start, i), ranks)
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Independent reference apply for the differential spec: the
    * SEQUENTIAL form of the algorithm — each merge in fit order,
    * applied exhaustively left-to-right — rather than the priority
    * loop of [[wordTokens]]. The two are equivalent for any rank
    * table produced by [[fit]]; BpeSpec pins that equivalence on
    * every fixture document.
    */
  def tokenCountReference(text: String, merges: Seq[(String, String)]): Long =
    text.split(" ", -1).foldLeft(0L) { (acc, word) =>
      if (word.isEmpty) acc
      else {
        var syms: Array[String] = symbols(word)
        merges.foreach(p => syms = mergeOnce(syms, p))
        acc + syms.length
      }
    }

  /** Fit on the corpus's top-K most frequent words — a bounded,
    * deterministic driver-side sample (count desc, word asc). One
    * distinct-word aggregation is the only shuffle; K and the merge
    * table are model-sized, not data-sized.
    */
  def fitFromCorpus(docs: DataFrame, textCol: Column,
                    topK: Int = 2000, nMerges: Int = 200): Vector[(String, String)] = {
    val wc = docs
      .select(explode(TextFns.tokens(textCol)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topK)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    fit(wc, nMerges)
  }

  /** Symbol-boundary sentinel for the distributed fit's delimited
    * word form (`\u0001a\u0001b\u0001c\u0001`). Symbols never contain
    * it (words carrying the sentinel are excluded up front), so the
    * pattern `\u0001a\u0001b\u0001` matches EXACTLY the adjacent
    * symbol pair (a,b) and `replace` performs the standard
    * left-to-right non-overlapping BPE merge pass — the same
    * semantics as [[mergeOnce]] and DuckDB's `replace`.
    */
  val FitDelim = "\u0001"

  /** Corpus-EXACT distributed BPE fit — the scale path next to the
    * sampled [[fitFromCorpus]]: merges are chosen from pair counts
    * over the FULL distinct-word table, not a top-K driver sample.
    * Each round is one vocabulary-sized hash aggregation (pair →
    * summed word frequency) plus a single-row argmax pull (count
    * desc, pair asc tie-break); the word table itself stays
    * distributed and is rewritten per round by a literal `replace`
    * projection. At 100 TB the vocabulary is the only state — model
    * rounds never touch the corpus again after the initial word
    * count, and nothing is collected beyond one (pair, count) row
    * per round.
    *
    * Returns (merge_rank, pair "a b", merged "ab", pair_count) —
    * bit-exact against the chained-CTE DuckDB oracle because every
    * step is integer counting and deterministic string surgery.
    * BpeSpec pins equality with the driver-side [[fit]] on the same
    * word counts.
    */
  def distributedFit(docs: DataFrame, textCol: Column, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val D = FitDelim
    var seqs = docs
      .select(explode(TextFns.tokens(textCol)).as("w"))
      .where(length(col("w")) > 0 && !col("w").contains(D))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("c"),
        concat(lit(D), regexp_replace(col("w"), "(.)", "$1" + D)).as("s"))
      .persist()
    seqs.count()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // Materialize the symbol array BEFORE the per-index lambda: HOF
      // lambdas don't CSE their inputs, so an inline split would
      // re-tokenize at every element_at.
      val pairs = seqs
        .select(col("c"), filter(split(col("s"), D), x => x =!= "").as("l"))
        .where(size(col("l")) >= 2)
        .select(col("c"), explode(transform(
          sequence(lit(1), size(col("l")) - 1),
          i => concat(lit(D), element_at(col("l"), i), lit(D),
            element_at(col("l"), i + 1), lit(D)))).as("p"))
        .groupBy("p").agg(sum(col("c")).as("pc"))
      val best = pairs.orderBy(col("pc").desc, col("p").asc).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val p = best(0).getString(0)
        val pc = best(0).getLong(1)
        val sy = p.split(D).filter(_.nonEmpty)
        out += ((r, sy(0) + " " + sy(1), sy(0) + sy(1), pc))
        val next = seqs.select(col("c"),
          replace(col("s"), lit(p), lit(D + sy(0) + sy(1) + D)).as("s")).persist()
        next.count()
        seqs.unpersist()
        seqs = next
        r += 1
      }
    }
    seqs.unpersist()
    import spark.implicits._
    out.result().toDF("merge_rank", "pair", "merged", "pair_count")
  }
}
