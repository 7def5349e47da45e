package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.GraftSession.LineageOps
import graft.functions.TextFns

/** Document deduplication operators for large-scale training-data
  * pipelines: exact (hash group), MinHash+LSH, SimHash, and blocked
  * n-gram Jaccard. All are built from codegen'd expressions; the only
  * shuffles are the final group-bys / bucket joins, keyed so that at
  * 100 TB each bucket is small (LSH bands) or bounded (block keys).
  */
object Dedup {

  /** Exact duplicate groups by a key expression (e.g. md5 of normalized
    * text). Emits one row per key with the keeper (min id) and count.
    * Scale: a single hash aggregation — map-side partial combine makes
    * this linear; no row data is shuffled, only (key, id, count).
    */
  def exactGroups(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(idCol).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k seeded minimums over a hashed-shingle set —
    * native one-pass expression (graft.expressions.MinHashSig); docs
    * with no shingles get Long.MaxValue mins.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.expressions.GraftFunctions.minhashSig(shingleCol, k)

  /** MinHash-LSH near-duplicate pairs.
    *
    * shingle → k-minhash → band hashes (k/rowsPerBand bands) → explode →
    * bucket self-join on (band index, band hash) → candidate pairs →
    * exact-Jaccard verification at `threshold`.
    *
    * Scale: candidates are generated per LSH bucket, so the join blowup
    * is bounded by bucket size (tunable via bands/rows); the verify step
    * recomputes exact Jaccard only for candidates. This is the standard
    * web-scale dedup shape (shingle tables never materialize globally).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 2, k: Int = 32, rowsPerBand: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    // rowsPerBand > k would give bands = 0 → posexplode over an empty
    // array → an EMPTY pair set that reads as "no near-duplicates";
    // a non-dividing rowsPerBand silently discards the remainder
    // signature rows (quietly lower recall). Both must fail loudly.
    require(rowsPerBand >= 1 && k >= rowsPerBand && k % rowsPerBand == 0,
      s"k ($k) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val bands = k / rowsPerBand
    // Shingles are compared as hashed longs, not strings: identical
    // Jaccard modulo 64-bit collisions, and both shingling and the
    // k-min signature are native one-pass codegen'd expressions.
    val withSig = df
      // A document with NO shingles (null text, or fewer than shingleN
      // tokens) has no set to compare: its Jaccard against anything is
      // 0/0. Dropping such docs is also a SCALE guard — their all-
      // identical empty-set signatures would otherwise collide in
      // every band and form one degenerate quadratic bucket (millions
      // of tiny docs at corpus scale). The guard reads the RAW text
      // (tokens >= shingleN ⟺ at least one shingle), never the
      // computed shingle column: a filter on the projected array makes
      // projection collapsing evaluate the shingle kernel TWICE per
      // row (measured 1.8× on the blocked-jaccard path).
      .where(col(textCol).isNotNull &&
        size(split(col(textCol), " ")) >= shingleN)
      .select(col(idCol).as("doc"),
        array_sort(array_distinct(
          graft.expressions.GraftFunctions.hashedShingles(col(textCol), shingleN))).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      // Shuffle barrier instead of persist: projection collapsing would
      // inline the signature expression into every band hash (8× the
      // work); an Exchange stops that, and the two self-join sides
      // collapse into one computation via ReuseExchange — no cached
      // blocks for callers to leak, no cache memory pressure at scale.
      .repartition(col("doc"))
    val banded = withSig.select(
      col("doc"), col("sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((col("sig")(b * rowsPerBand) +: (1 until rowsPerBand)
          .map(r => col("sig")(b * rowsPerBand + r))) :+ lit(b): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val l = banded.select(col("band"), col("band_hash"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(TextFns.jaccardSorted(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens (sign of per-bit vote of
    * token-hash bits) — native one-pass expression
    * (graft.expressions.SimHash64); rows-only checkable (the hash
    * family has no oracle-engine twin). Hamming distance between two
    * simhashes is the built-in bit_count(a ^ b).
    */
  def simhash64(textCol: Column): Column =
    graft.expressions.GraftFunctions.simhash64(textCol)

  /** SimHash-banded near-duplicate pairs — the pair generator that
    * makes the signature an OPERATOR rather than a column: split the
    * 64-bit simhash into `nBands` contiguous bit-bands and bucket-join
    * on (band index, band value), then verify candidates with the
    * exact hamming distance `bit_count(a ^ b)`.
    *
    * Completeness is pigeonhole, not probability (unlike MinHash-LSH):
    * two signatures within hamming distance d ≤ nBands − 1 differ in
    * fewer bits than there are bands, so at least one band matches
    * EXACTLY and the pair surfaces — `maxHamming < nBands` is required
    * and makes recall 1.0 by construction (DedupSpec pins this against
    * brute force).
    *
    * Scale: the join is keyed by 64/nBands-bit band values — bucket
    * sizes bound the blowup exactly as in MinHash-LSH; the signature
    * computes once per doc behind a repartition barrier (ReuseExchange
    * collapses the two join sides). At 4 bands / 16-bit bands the
    * bucket count is 4×65536 per band index — clustered corpora raise
    * bucket occupancy, which is intrinsic to simhash banding (more
    * bands trade verify volume for a higher detectable distance).
    */
  def simhashBandPairs(df: DataFrame, idCol: String, textCol: String,
                       nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0, s"nBands must divide 64, got $nBands")
    require(0 <= maxHamming && maxHamming < nBands,
      s"maxHamming must be < nBands for the pigeonhole guarantee ($maxHamming vs $nBands)")
    signatureBandPairs(
      df.select(col(idCol).as("doc"), simhash64(col(textCol)).as("sig")),
      "doc", "sig", nBands, maxHamming)
  }

  /** Banded near-dup pair generation over ANY precomputed 64-bit
    * signature column (simhash over text, perceptual aHash over image
    * rasters, …): split the signature into `nBands` equal bands,
    * equi-join on (band, value), verify candidates with an exact
    * `bit_count` hamming distance. Pigeonhole-complete for
    * `maxHamming < nBands`: a pair within the distance bound must
    * agree on at least one whole band, so the bucket join misses
    * nothing. Scale: the signature computes once behind an explicit
    * id-keyed repartition barrier (both join sides ride
    * `ReusedExchange`); candidates are confined to shared-band
    * buckets — never all-pairs.
    */
  def signatureBandPairs(sigs: DataFrame, idCol: String, sigCol: String,
                         nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0, s"nBands must divide 64, got $nBands")
    require(0 <= maxHamming && maxHamming < nBands,
      s"maxHamming must be < nBands for the pigeonhole guarantee ($maxHamming vs $nBands)")
    val bandBits = 64 / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val withSig = sigs
      .select(col(idCol).as("doc"), col(sigCol).as("sig"))
      // a null signature (null text / undecodable raster) matches no
      // band value anyway — drop it BEFORE the shuffle, not after
      .where(col("sig").isNotNull)
      .repartition(col("doc"))
    val banded = withSig.select(
      col("doc"), col("sig"),
      posexplode(array((0 until nBands).map { b =>
        shiftrightunsigned(col("sig"), b * bandBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "band_val")))
    val l = banded.select(col("band"), col("band_val"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_val"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over an undirected pair graph — the step
    * that turns near-duplicate PAIRS into dedup CLUSTERS (each cluster
    * keeps one canonical document). Iterative min-label propagation:
    * every node takes the minimum label over its closed neighborhood,
    * combined with pointer jumping (each node also pulls its LABEL's
    * current label), repeated until a fixpoint — O(log diameter)
    * rounds even on path graphs, each round two small joins + a min
    * aggregation: the standard Spark shape for union-find at scale
    * (driver loops over ROUNDS, never over rows; convergence is one
    * scalar per round).
    *
    * Throws IllegalStateException if maxIter rounds don't reach the
    * fixpoint — silently returning split components would corrupt
    * downstream dedup.
    *
    * Component id = min node id in the component (deterministic).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 50): DataFrame = {
    // Materialize the symmetrized edge set once (WITH self-loops, so
    // "min over self and neighbors" is a single join+agg per round,
    // no union branch) — every round joins against it, and without
    // the checkpoint each round would re-run the whole upstream plan.
    val directed = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val sym = directed
      .unionByName(directed.select(col("b").as("a"), col("a").as("b")))
      .unionByName(directed.select(col("a"), col("a").as("b")))
      .unionByName(directed.select(col("b").as("a"), col("b")))
      .distinct()
      .truncateLineage()
    var labels = sym.select(col("a").as("node"), col("a").as("lbl")).distinct()
    // Labels only ever decrease, so the label sum strictly decreases
    // until the fixpoint: sum equality IS the convergence test — one
    // scalar per round instead of a change-detection join. A boolean
    // first-round flag, NOT a sentinel sum: any sentinel value is a
    // legitimate label sum on graphs with negative ids.
    var prevSum = 0L
    var haveSum = false
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node pulls the min label over its closed neighborhood;
      // from round 3 on, ALSO its label's own current label (pointer
      // jumping — labels chase their targets, halving chain depth per
      // round, O(log diameter) total). Dense near-dup graphs converge
      // in the first rounds without paying the extra join+exchange;
      // chain-shaped graphs engage the jump instead of crawling.
      // localCheckpoint truncates the lineage so round N+1 doesn't
      // replan/replay rounds 1..N.
      val viaNeighbors = sym
        .join(labels, col("b") === col("node"))
        .select(col("a").as("node"), col("lbl"))
      val propagated =
        if (iter < 2) viaNeighbors
        else {
          val l2 = labels.select(col("node").as("n2"), col("lbl").as("lbl2"))
          viaNeighbors.unionByName(labels
            .join(l2, col("lbl") === col("n2"))
            .select(col("node"), col("lbl2").as("lbl")))
        }
      val next = propagated
        .groupBy("node")
        .agg(min(col("lbl")).as("lbl"))
        .truncateLineage()
      // sum() over zero rows is null — an empty edge set is already
      // converged (no nodes, no labels)
      val sumRow = next.agg(sum(col("lbl"))).head()
      val newSum = if (sumRow.isNullAt(0)) 0L else sumRow.getLong(0)
      converged = haveSum && newSum == prevSum
      // empty graph: no labels, nothing can ever change
      if (sumRow.isNullAt(0)) converged = true
      prevSum = newSum
      haveSum = true
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "the graph's diameter exceeds maxIter; raise it")
    labels
  }

  /** Dedup components over a 64-bit signature column, QUOTIENTED by
    * the signature value before any pair work: rows sharing a
    * signature are pairwise hamming-0 (one cluster trivially), so the
    * band join, verify, and component closure all run over one
    * representative (the min id) per DISTINCT signature, and members
    * map back through their signature at the end. Same verdicts as
    * [[signatureBandPairs]] + [[connectedComponents]] over the full id
    * space — the rep-level min label IS the component's min node id,
    * because every id is >= its signature group's rep — but the pair
    * volume is quotient-quadratic, not clique-quadratic: a d-member
    * equal-hash group contributes ONE rep, not d·(d−1)/2 edges.
    * Clustered signature corpora (perceptual hashes over templated
    * images, simhash over boilerplate) are exactly where the clique
    * form blows up — the 10× gate's mm_phash oracle needed this same
    * rewrite before its transitive closure finished, and the engine
    * plan earns the identical shape here.
    *
    * Rows with a NULL signature can never pair (a null band value
    * matches nothing in the band join today) — they stay their own
    * singleton components, preserved by the left joins + coalesce.
    *
    * Returns one row per input row: (idCol, component, is_canonical),
    * component = min id of the near-dup cluster.
    */
  def signatureComponents(sigs: DataFrame, idCol: String, sigCol: String,
                          nBands: Int = 4, maxHamming: Int = 3): DataFrame = {
    val base = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"))
    // one rep per distinct signature; referenced by the band join AND
    // the member map-back, so materialize once
    val groups = base.where(col("__sig").isNotNull)
      .groupBy(col("__sig")).agg(min(col("__id")).as("__rep"))
      .truncateLineage()
    val repPairs = signatureBandPairs(
      groups.select(col("__rep"), col("__sig")), "__rep", "__sig",
      nBands, maxHamming)
    val cc = connectedComponents(
      repPairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
    // members → their signature's rep → the rep's component label;
    // unpaired reps are absent from cc (lbl null → rep), null-sig rows
    // are absent from groups (rep null → own id). Plain equi-joins:
    // groups/cc are distinct-signature-sized — the planner broadcasts
    // them while they fit and shuffle-joins beyond.
    val lbl = coalesce(col("lbl"), col("__rep"), col("__id"))
    base
      .join(groups, Seq("__sig"), "left")
      .join(cc.select(col("node").as("__rep"), col("lbl")), Seq("__rep"), "left")
      .select(col("__id").as(idCol), lbl.as("component"),
        (lbl === col("__id")).as("is_canonical"))
  }

  /** Segment-level exact dedup — the paragraph-dedup stage of a web
    * curation pipeline (RefinedWeb/C4 shape: boilerplate repeats
    * ACROSS documents at sub-document granularity, so whole-doc dedup
    * misses it). Documents are cut into fixed `segTokens`-token
    * segments (the fixture corpus carries no structural delimiters; a
    * real corpus would cut on newlines instead — same plan), and the
    * FIRST occurrence of each distinct segment in (doc, position)
    * order is kept. Emits one row per segment with the keep decision,
    * from which a caller reconstructs deduped documents.
    *
    * Scale: segmentation is a zero-shuffle projection (sequence +
    * slice + explode inside codegen); the keep decision is ONE
    * shuffle keyed by segment text, and each window partition is
    * bounded by a segment's duplicate multiplicity — never corpus-
    * sized. The two-shuffle alternative (groupBy min + join back)
    * moves the segment table twice for the same answer.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   segTokens: Int): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    import org.apache.spark.sql.expressions.Window
    val toks = TextFns.tokens(col(textCol))
    // split() never yields an empty array (empty text -> [""]), so
    // nSeg >= 1 and the sequence below is always ascending
    val nSeg = ceil(size(toks) / lit(segTokens.toDouble)).cast("int")
    val segs = docs.select(col(idCol).as("doc_id"),
      posexplode(transform(sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(toks, i * segTokens + 1, lit(segTokens)))))
        .as(Seq("seg_idx", "seg")))
    val w = Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("seg_idx"))
    segs
      .withColumn("kept", row_number().over(w) === 1)
      .select(col("doc_id"), col("seg_idx").cast("long").as("seg_idx"), col("kept"))
  }

  /** Corpus-frequency boilerplate removal — the CCNet/RefinedWeb
    * filtering stage that [[segmentDedup]] does NOT cover: navigation
    * chrome, cookie banners and license footers repeat across MANY
    * documents, and every occurrence (including the first) should be
    * dropped, whereas segment dedup keeps the first. Documents are cut
    * into fixed `segTokens`-token segments (a real corpus cuts on
    * newlines — same plan); a segment is boilerplate when it appears
    * in >= `minDocFreq` DISTINCT documents. Emits one row per doc with
    * segment counts and the reassembled clean text.
    *
    * Scale: segmentation is a zero-shuffle codegen projection. The
    * document-frequency table and the mark join share ONE segment-
    * keyed exchange (explicit repartition barrier, both consumers ride
    * `ReusedExchange` — the dedup_simhash_pairs pattern); the
    * boilerplate side is bounded by totalSegments / minDocFreq and in
    * practice tiny, so AQE converts the mark join to broadcast.
    * Reassembly is one doc-keyed aggregation. Nothing is ever
    * corpus-quadratic and no window spans more than one document.
    */
  def boilerplateFilter(docs: DataFrame, idCol: String, textCol: String,
                        segTokens: Int, minDocFreq: Int): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    // r16 (guide §8 rule: shuffle a lightweight proxy, move the payload
    // once): the segment TEXT never leaves its document row — only
    // (doc_id, seg_idx, 64-bit segment hash) flows through the df
    // aggregation and the keep decision (the oracle groups the segment
    // STRINGS, so the hash match doubles as a collision check — the
    // text_dup_span_profile doctrine). The clean text reassembles in a
    // final projection over the original document row from the kept
    // segment indexes, so document bytes cross an exchange exactly
    // once (the doc-keyed join attaching the narrow keep plan) instead
    // of twice (the former seg-keyed repartition + doc-keyed rebuild,
    // both carrying segment strings). Ids are assumed row-unique (the
    // documents contract — held by every gate corpus): duplicate ids
    // would reassemble per-row here where the former shape pooled
    // their segments.
    val toks = TextFns.tokens(col(textCol))
    // token array materialized BEFORE every per-index lambda (HOF
    // lambdas don't CSE their inputs — an inline split re-tokenizes
    // the document at every segment index)
    def segAt(i: org.apache.spark.sql.Column) =
      concat_ws(" ", slice(col("__toks"), i * segTokens + 1, lit(segTokens)))
    val nSeg = ceil(size(col("__toks")) / lit(segTokens.toDouble)).cast("int")
    val segs = docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nSeg - 1), i => xxhash64(segAt(i))))
          .as(Seq("seg_idx", "h")))
    val boiler = segs.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("h"), lit(true).as("bp"))
    val kept = segs.join(boiler, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col("bp").isNull, col("seg_idx"))))
          .as("kept_idx"))
    // materialize the token array BEFORE the per-index lambda: HOF
    // lambdas don't CSE their inputs, so an inline split would
    // re-tokenize the document at every kept segment (the
    // text_dup_span_profile round-11 lesson)
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("n_seg"), col("n_kept"),
        array_join(transform(col("kept_idx"),
          i => concat_ws(" ",
            slice(col("__toks"), i * segTokens + 1, lit(segTokens)))), " ")
          .as("clean_text"))
  }

  /** Blocked exact n-gram-Jaccard near-dup pairs: all pairs within a
    * blocking key (e.g. lang+source) scored by shingle-set Jaccard.
    * Scale: the quadratic pair generation is confined to blocks; for
    * unblockable corpora use [[minhashLshPairs]] instead.
    */
  def blockedJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String], shingleN: Int,
                          threshold: Double): DataFrame = {
    // Array-intersect form. The alternative (inverted index: explode
    // shingles, shingle-level equi-join, count co-occurrences) was
    // measured 1.7× SLOWER on these fixtures: with dense vocabulary
    // overlap a common shingle generates |block|² join rows. The
    // per-pair hashed-array intersect is bounded by O(|A|+|B|) longs
    // and benefits from the size-ratio prune below; for sparse-overlap
    // corpora the inverted-index shape would win instead.
    // Sorted once per row here so the per-pair intersection is a native
    // merge scan (SortedIntersectCount) instead of a hash-set build.
    val base = df
      // no-shingle docs (null text / < shingleN tokens) have no set to
      // compare — and two of them in one block would divide 0/0. Guard
      // on the raw text, not the projected array (see minhashLshPairs:
      // a computed-column filter doubles the shingle kernel work).
      .where(col(textCol).isNotNull &&
        size(split(col(textCol), " ")) >= shingleN)
      .select(
      (blockCols.map(col) :+ col(idCol).as("doc") :+
        array_sort(array_distinct(
          graft.expressions.GraftFunctions.hashedShingles(col(textCol), shingleN))).as("sh")): _*)
    val l = base.select(blockCols.map(col) :+ col("doc").as("doc_a") :+ col("sh").as("sh_a"): _*)
    val r = base.select(blockCols.map(col) :+ col("doc").as("doc_b") :+ col("sh").as("sh_b"): _*)
    l.join(r, blockCols)
      .where(col("doc_a") < col("doc_b"))
      // size-ratio prune: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
      // whose set sizes differ by more than 1/threshold can never pass —
      // skip their O(|A|+|B|) intersection entirely. Output-equivalent.
      .where(least(size(col("sh_a")), size(col("sh_b"))).cast("double") >=
        greatest(size(col("sh_a")), size(col("sh_b"))) * threshold)
      .withColumn("jaccard", round(TextFns.jaccardSorted(col("sh_a"), col("sh_b")), 4))
      .where(col("jaccard") >= threshold)
      .select((blockCols.map(col) :+ col("doc_a") :+ col("doc_b") :+ col("jaccard")): _*)
  }

  /** Cross-doc duplicated-span PROFILE (the RefinedWeb dup-fraction
    * family): per doc, how many of its sliding n-gram positions are
    * duplicated in ≥ minDocFreq distinct documents, the ‰ share, and
    * the longest consecutive duplicated run — the decision metric a
    * span-dedup threshold reads, where [[segmentDedup]] /
    * [[boilerplateFilter]] transform.
    *
    * Scale: the gram doc-frequency table is corpus-sized, so the
    * membership join is a hash-partitioned equi-join on the gram key
    * (never a broadcast); the longest-run window (gaps-and-islands on
    * gram position) partitions by doc. Grams ride as native-kernel
    * hash keys (the codegen'd HashedShingles expression — ONE
    * tokenization pass per doc; the declarative
    * split-per-element_at form re-splits the text at every gram
    * position, quadratic in doc length) — the oracle joins the
    * shingle STRINGS, so the hash match doubles as a collision check.
    *
    * COVERAGE CONTRACT: the profile has one row per document with at
    * least one n-gram — documents shorter than `nGram` tokens carry
    * no spans to measure and are ABSENT (left-join + coalesce(0) at
    * the call site if a full-corpus frame is needed). The transform
    * twin [[dupSpanRemoval]] returns every document.
    */
  def dupSpanProfile(docs: DataFrame, idCol: String, textCol: String,
                     nGram: Int, minDocFreq: Int = 2): DataFrame = {
    require(nGram >= 2 && minDocFreq >= 2,
      s"need nGram >= 2 and minDocFreq >= 2, got $nGram/$minDocFreq")
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(idCol).as("_dp_id"),
      posexplode(graft.expressions.GraftFunctions.hashedShingles(col(textCol), nGram))
        .as(Seq("pos", "g")))
    val dupSet = grams.groupBy("g")
      .agg(count_distinct(col("_dp_id")).as("df"))
      .where(col("df") >= minDocFreq).select(col("g"), lit(true).as("dup"))
    val flagged = grams.join(dupSet, Seq("g"), "left")
      .select(col("_dp_id"), col("pos"),
        coalesce(col("dup"), lit(false)).as("d"))
    val perDoc = flagged.groupBy("_dp_id").agg(
      count(lit(1)).as("n_grams"),
      sum(when(col("d"), 1L).otherwise(0L)).as("n_dup"))
    val wr = Window.partitionBy("_dp_id").orderBy("pos")
    val runs = flagged.where(col("d"))
      .withColumn("grp", col("pos") - row_number().over(wr))
      .groupBy(col("_dp_id"), col("grp")).agg(count(lit(1)).as("runlen"))
      .groupBy("_dp_id").agg(max(col("runlen")).as("longest_dup_run"))
    perDoc.join(runs, Seq("_dp_id"), "left")
      .select(col("_dp_id").as(idCol), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000 div n_grams").as("dup_permille"),
        coalesce(col("longest_dup_run"), lit(0L)).as("longest_dup_run"))
  }

  /** Cross-doc duplicated-span REMOVAL (the exact-substring dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): every token covered by an n-gram that occurs in >=
    * `minDocFreq` distinct documents is excised — from EVERY
    * occurrence — and the surviving tokens reassemble in order. The
    * transform twin of [[dupSpanProfile]] (which only measures):
    * profile decides the threshold, removal applies it.
    *
    * Scale shape: grams ride the codegen'd HashedShingles kernel (one
    * tokenization pass); the gram doc-frequency table is corpus-sized
    * so membership is a hash-partitioned equi-join on the gram key;
    * coverage expansion is a bounded explode (n rows per dup gram);
    * the rebuild aggregates per doc (collect + sort bounded by doc
    * length). The oracle rebuilds from shingle STRINGS, so the hash
    * match doubles as a collision check.
    *
    * Returns (id, n_tokens, n_removed, cleaned_text) for every doc —
    * untouched docs keep their original token stream verbatim.
    */
  def dupSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
                     nGram: Int, minDocFreq: Int = 2): DataFrame = {
    require(nGram >= 2 && minDocFreq >= 2,
      s"need nGram >= 2 and minDocFreq >= 2, got $nGram/$minDocFreq")
    // r16 (guide §8 rule: shuffle a lightweight proxy, move the payload
    // once): token text never crosses an exchange. The duplicated-gram
    // membership and coverage expansion run over narrow
    // (doc, position, hash) rows exactly as before, but the covered
    // positions then collapse to ONE int array per doc and attach to
    // the original document row, where a codegen'd index filter
    // excises the covered tokens in place. The former shape exploded
    // the full token stream WITH its strings and shuffled it twice
    // (the anti join by (doc, pos), then the rebuild's doc-keyed
    // collect_list). Ids are assumed row-unique (the documents
    // contract — held by every gate corpus).
    val base = docs.select(col(idCol).as("_dr_id"), col(textCol).as("_dr_text"))
    val grams = base.select(col("_dr_id"),
      posexplode(graft.expressions.GraftFunctions.hashedShingles(col("_dr_text"), nGram))
        .as(Seq("pos", "g")))
    val dupSet = grams.groupBy("g")
      .agg(count_distinct(col("_dr_id")).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("g"))
    val covered = grams.join(dupSet, Seq("g"))
      .select(col("_dr_id"),
        explode(sequence(col("pos"), col("pos") + (nGram - 1))).as("tpos"))
      .distinct()
    val covArr = covered.groupBy("_dr_id")
      .agg(sort_array(collect_list(col("tpos"))).as("cov"))
    base.where(col("_dr_text").isNotNull)
      .join(covArr, Seq("_dr_id"), "left")
      // normalize the no-covered-positions case to an EMPTY array
      // before the index filter: array_contains(NULL, i) is NULL and a
      // NULL lambda result drops the token — the exact inversion of
      // "nothing to remove"
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      // materialize the token array BEFORE the index filter: HOF
      // lambdas don't CSE their inputs, so an inline split would
      // re-tokenize the document at every token position
      .withColumn("__toks", split(col("_dr_text"), " "))
      .select(col("_dr_id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_removed"),
        array_join(
          filter(col("__toks"), (_, i) => not(array_contains(col("cov"), i))),
          " ").as("cleaned_text"))
  }
}
