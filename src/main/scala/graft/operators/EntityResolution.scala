package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find near-identical records
  * (vendor lists, user registries, catalog entries) whose keys differ
  * — the structured-data twin of document near-dup detection.
  *
  * Scale: the classic blocked design — the quadratic pair space is
  * confined to blocking-key groups (choose keys so blocks stay
  * bounded; unblockable corpora go through MinHash/LSH exactly like
  * text). Two cheap prunes run before the edit distance: the length
  * difference bound (|len a − len b| > k can never pass) and Spark's
  * THRESHOLDED levenshtein, which abandons a pair once its running
  * distance exceeds k (O(n·k) per pair, not O(n²)).
  *
  * Three forms, by noise model:
  *  - [[blockedEditDistancePairs]] — exact block-quadratic reference.
  *  - [[bandedHammingPairs]] — substitution noise (equal lengths);
  *    candidate-complete for Hamming <= k at ANY k.
  *  - [[passJoinPairs]] — full edit distance (insert/delete/sub);
  *    PassJoin-style shifted-segment candidates, complete at ANY k.
  */
object EntityResolution {

  /** Band keys concatenate kept segments with NO separator: `__len`
    * rides in the join key and every boundary is floor(i*len/nSeg) --
    * a pure function of (len, nSeg) -- so for two names under the
    * same key the segment boundaries coincide and concat equality is
    * EXACTLY segment-wise equality. No separator byte is needed (and
    * none could collide).
    */
  private val Sep = ""

  /** All within-block record pairs with edit distance <= maxDist. */
  def blockedEditDistancePairs(df: DataFrame, idCol: String, nameCol: String,
                               blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCols.nonEmpty, "blocked matching needs at least one blocking key")
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("__id") :+ col(nameCol).as("__nm")): _*)
    val l = base.select(blockCols.map(col) :+
      col("__id").as("id_a") :+ col("__nm").as("nm_a"): _*)
    val r = base.select(blockCols.map(col) :+
      col("__id").as("id_b") :+ col("__nm").as("nm_b"): _*)
    l.join(r, blockCols)
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("nm_a")) - length(col("nm_b"))) <= maxDist)
      .withColumn("__d", levenshtein(col("nm_a"), col("nm_b"), maxDist))
      .where(col("__d") >= 0) // thresholded form returns -1 past maxDist
      .select(col("id_a"), col("id_b"), col("__d").cast("long").as("dist"))
  }

  /** Segment-boundary SQL: the array of `nSeg` even substrings of
    * `nm` under the floor(i·len/nSeg) split used by both banded forms
    * (and mirrored by the probe-side windows in [[passJoinPairs]]).
    */
  private def segmentsExpr(nm: String, len: String, nSeg: Int): Column =
    expr(
      s"""transform(sequence(0, ${nSeg - 1}),
         |  i -> substring($nm, cast(i * $len / $nSeg as int) + 1,
         |    cast((i + 1) * $len / $nSeg as int)
         |      - cast(i * $len / $nSeg as int)))""".stripMargin)

  /** Largest segment count in [k+1, min(4·(k+1), 64)] whose key
    * fan-out C(nSeg, k) stays <= 64 — more segments means each band
    * key keeps more of the string (higher entropy, smaller buckets)
    * at the cost of more keys per row. The search is clamped to 64 so
    * the auto pick can never violate [[bandedHammingPairs]]'s own
    * `segs <= 64` require: the k+1 fallback (the classic
    * one-segment-per-band scheme, fan-out C(k+1, k) = k+1) satisfies
    * both requires for every k the operator's maxDist guard admits.
    */
  private def defaultSegments(k: Int): Int =
    (math.min(4 * (k + 1), 64) to (k + 1) by -1)
      .find(n => binomial(n, k) <= 64).getOrElse(k + 1)

  /** C(n, k) for the fan-out guards, saturating far above the 256
    * bound so no intermediate product can overflow Long (n <= 64
    * enforced by callers; below the cap each stage is an exact
    * integer by the multiplicative identity). Computed over
    * min(k, n−k) by symmetry: the incremental product RISES through
    * the middle coefficients before falling, so without the symmetry
    * a small true value like C(44, 43) = 44 would freeze at the
    * saturated mid-way peak and overestimate by orders of magnitude.
    */
  private def binomial(n: Int, k: Int): Long = {
    val kk = math.min(k, n - k)
    if (kk < 0) 0L
    else (1 to kk).foldLeft(1L)((acc, i) =>
      if (acc > (1L << 40)) acc else acc * (n - i + 1) / i)
  }

  /** The SCALE form of fuzzy matching for substitution-style noise:
    * split each name into `nSeg` segments and emit one band key per
    * way of OMITTING `maxDist` segments (the key is the concatenation
    * of the kept `nSeg − maxDist` segments). A pair within Hamming
    * distance `maxDist` has its mismatches confined to at most
    * `maxDist` segments, so the combination omitting exactly those
    * segments agrees (pigeonhole) — candidates come from a
    * (block, length, combo, key) equi-join instead of a
    * block-quadratic loop, and only DISTINCT candidate pairs pay the
    * exact verify.
    *
    * With nSeg = maxDist + 1 this degenerates to the classic
    * one-segment-per-band scheme; the default (nSeg = 0 → auto) uses
    * MORE segments so each key carries nearly the whole string. That
    * is the dead-prefix mitigation: under the classic scheme a
    * constant shared prefix ("Customer#…") makes the prefix band one
    * block-sized hot bucket and candidate volume degrades to the
    * quadratic form's; an omit-k key still contains the high-entropy
    * tail, so bucket sizes track near-duplicate group sizes, not
    * block sizes (ErSpec pins this on a planted constant prefix).
    *
    * Semantics note: completeness is for HAMMING (equal lengths,
    * substitutions); at maxDist = 1 that coincides exactly with
    * levenshtein <= 1 on equal-length records (a single indel always
    * changes the length). Insert/delete-shifted pairs at maxDist >= 2
    * are OUTSIDE this operator's semantics — use [[passJoinPairs]],
    * which is candidate-complete for full edit distance.
    */
  def bandedHammingPairs(df: DataFrame, idCol: String, nameCol: String,
                         blockCols: Seq[String], maxDist: Int,
                         nSeg: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    // segs > k and segs <= 64 are jointly unsatisfiable past k = 63,
    // so reject the regime up front with the honest message instead
    // of letting the fan-out require fail confusingly downstream
    require(maxDist < 64,
      s"bandedHammingPairs needs nSeg > maxDist and nSeg <= 64; " +
        s"maxDist = $maxDist is outside the operator's envelope")
    val k = maxDist
    val segs = if (nSeg > 0) nSeg else defaultSegments(k)
    require(segs > k, s"need more segments ($segs) than edits ($k)")
    // bound the fan-out BEFORE materializing the combination list — a
    // caller-supplied nSeg like 64 at k=32 is ~10^18 combinations
    require(segs <= 64 && binomial(segs, k) <= 256,
      s"band fan-out C($segs,$k) = ${binomial(segs, k)} > 256; lower nSeg")
    // kept-segment index sets, one band key each; C(segs, k) of them
    val combos: Seq[Seq[Int]] =
      (0 until segs).combinations(segs - k).map(_.toSeq).toSeq
    val base = df.select(
        (blockCols.map(col) :+ col(idCol).as("__id") :+ col(nameCol).as("__nm")): _*)
      .withColumn("__len", length(col("__nm")))
      .withColumn("__segs", segmentsExpr("__nm", "__len", segs))
      .select((blockCols.map(col) :+ col("__id") :+ col("__nm") :+ col("__len") :+
        posexplode(array(combos.map(keep =>
          concat_ws(Sep, keep.map(i => col("__segs").getItem(i)): _*)): _*))
          .as(Seq("__band", "__seg"))): _*)
    val keys = blockCols ++ Seq("__len", "__band", "__seg")
    val l = base.select((keys.map(col) :+
      col("__id").as("id_a") :+ col("__nm").as("nm_a")): _*)
    val r = base.select((keys.map(col) :+
      col("__id").as("id_b") :+ col("__nm").as("nm_b")): _*)
    val hamming = size(filter(
      zip_with(split(col("nm_a"), ""), split(col("nm_b"), ""),
        (a, b) => when(a =!= b, lit(1))),
      x => x.isNotNull))
    l.join(r, keys)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("nm_a"), col("nm_b"))
      .distinct() // dedup candidates BEFORE paying the verify
      .select(col("id_a"), col("id_b"), hamming.cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Full-edit-distance fuzzy matching at scale: PassJoin-style
    * shifted-segment candidates (Li, Deng, Feng — "PassJoin: a
    * partition-based method for similarity joins", VLDB 2011; public
    * algorithm), complete for levenshtein <= maxDist INCLUDING
    * insert/delete noise at any k.
    *
    * Index side: each record's name of length L splits into k+1 even
    * segments (same floor boundaries as [[bandedHammingPairs]]),
    * keyed by (block, L, segIdx, segment). Probe side: each record
    * generates, for every hypothetical partner length
    * L ∈ [len−k, len+k] and segment index i, the substrings of its
    * OWN name with segment i's length at start positions shifted by
    * d ∈ [−k, k] around segment i's boundary. If ed(a, b) <= k, an
    * optimal alignment spends 0 edits on at least one of b's k+1
    * segments (pigeonhole), and the net indel shift before that
    * segment is at most k — so that exact segment occurs in `a`
    * inside the probe window and the equi-join surfaces the pair.
    * Only DISTINCT candidates pay the thresholded-levenshtein verify.
    *
    * Cost per record: k+1 index keys and O(k³) probe keys (bounded,
    * tiny for the k <= 3 regime record linkage runs at) — against the
    * block-quadratic loop this is the same segment-equi-join shape as
    * the Hamming form, shuffle on (block, L, segIdx, segment).
    * Zero-length segments (names shorter than k+1 chars) keep their
    * trivially-matching keys: dropping them would lose tiny-string
    * pairs; their buckets are bounded by the per-block count of such
    * tiny names.
    */
  def passJoinPairs(df: DataFrame, idCol: String, nameCol: String,
                    blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    // Probe fan-out is (2k+1 lengths) x (k+1 segments) x (2k+1
    // shifts) keys per row before the window filter — O(k^3). Make
    // the envelope a stated contract (mirroring the Hamming form's
    // C(nSeg, k) <= 256 guard): k = 5 is ~726 keys/row, already far
    // past the k <= 3 record-linkage regime; k = 10 would be ~4851.
    require(maxDist <= 5,
      s"passJoinPairs probe fan-out is O(maxDist^3) keys/row " +
        s"(~${(2 * maxDist + 1) * (maxDist + 1) * (2 * maxDist + 1)} at " +
        s"maxDist = $maxDist); the operator's envelope is maxDist <= 5 — " +
        "block coarser or switch to MinHash/LSH for looser matching")
    val k = maxDist
    val nSeg = k + 1
    val base = df.select(
        (blockCols.map(col) :+ col(idCol).as("__id") :+ col(nameCol).as("__nm")): _*)
      .withColumn("__len", length(col("__nm")))

    // Index: (block, L = own length, segIdx, exact segment)
    val indexSide = base
      .withColumn("__segs", segmentsExpr("__nm", "__len", nSeg))
      .select((blockCols.map(col) :+ col("__id").as("id_i") :+
        col("__nm").as("nm_i") :+ col("__len").as("__L") :+
        posexplode(col("__segs")).as(Seq("__band", "__seg"))): _*)

    // Probe: for each partner length L in [len−k, len+k], segment i,
    // and shift d in [−k, k], the own-name substring at the shifted
    // boundary with segment i's length under L. struct-distinct kills
    // the duplicate keys different shifts of a repetitive name emit.
    val probeKeys = expr(
      s"""array_distinct(flatten(flatten(
         |  transform(sequence(greatest(__len - $k, 0), __len + $k), L ->
         |    transform(sequence(0, $k), i ->
         |      filter(transform(sequence(-$k, $k), d ->
         |        named_struct(
         |          'L', L, 'band', i,
         |          'st', cast(i * L / $nSeg as int) + d,
         |          'ln', cast((i + 1) * L / $nSeg as int)
         |                  - cast(i * L / $nSeg as int))),
         |        w -> w.st >= 0 AND w.st + w.ln <= __len))))))""".stripMargin)
    val probeSide = base
      .withColumn("__w", explode(probeKeys))
      .select((blockCols.map(col) :+ col("__id").as("id_p") :+
        col("__nm").as("nm_p") :+ col("__w.L").as("__L") :+
        col("__w.band").as("__band") :+
        expr("substring(__nm, __w.st + 1, __w.ln)").as("__seg")): _*)

    val keys = blockCols ++ Seq("__L", "__band", "__seg")
    val cand = indexSide.join(probeSide, keys)
      .where(col("id_i") =!= col("id_p"))
      // normalize orientation so (a,b) found in either direction
      // collapses under one distinct
      .select(
        least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"),
        when(col("id_i") < col("id_p"), col("nm_i")).otherwise(col("nm_p")).as("nm_a"),
        when(col("id_i") < col("id_p"), col("nm_p")).otherwise(col("nm_i")).as("nm_b"))
      .distinct()
    cand
      .withColumn("__d", levenshtein(col("nm_a"), col("nm_b"), maxDist))
      .where(col("__d") >= 0)
      .select(col("id_a"), col("id_b"), col("__d").cast("long").as("dist"))
  }
}
