package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Layout, Packing, Sampling}

/** Deterministic sampling / splitting / packing / layout queries.
  * All use engine-portable arithmetic (multiplicative hash, bit
  * interleave, window prefix sums, IEEE-double rates), so every
  * row-level membership/assignment decision is hash-compared against
  * the DuckDB twin — not just row counts.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val SplitWeights = Seq("train" -> 800, "val" -> 100, "test" -> 100)
  private val StrataPerMille = Map("click" -> 100, "purchase" -> 500, "view" -> 200)
  private val DefaultPerMille = 50
  private val DsirBuckets = 512
  private val TokenBudget = 10000L

  val queries: Map[String, Q] = Map(
    // Train/val/test split: membership is a pure function of the row
    // id — reproducible across runs, partitionings, and engines.
    "sample_hash_split" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_id"),
          Sampling.splitLabel(col("event_id"), SplitWeights).as("split"))
    }),

    // Dedup-aware (leakage-safe) split: membership is a function of
    // the duplicate GROUP's canonical id, not the row id, so copies of
    // a document can never straddle train/test — the classic
    // eval-contamination bug in training-data pipelines. Exact-dup
    // groups (content hash) keep the oracle fully row-checkable; for
    // NEAR-dup safety the same shape composes with the minhash cluster
    // ids from Dedup.connectedComponents (dedup_pipeline) in place of
    // the md5 group key.
    "sample_dedup_aware_split" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val canon = docs.groupBy(md5(col("text")).as("k"))
        .agg(min(col("doc_id")).as("canonical_id"))
      docs.select(col("doc_id"), md5(col("text")).as("k"))
        .join(canon, Seq("k"))
        .select(col("doc_id"), col("canonical_id"),
          Sampling.splitLabel(col("canonical_id"), SplitWeights).as("split"))
    }),

    // DSIR importance weights (target = English docs): hashed-bucket
    // bag-of-words log-likelihood ratio, quantized to fixed point PER
    // BUCKET so each doc's score is an order-free BIGINT sum. The only
    // cross-engine float step is 512 bucket-level log2 calls over
    // identical exact integer counts.
    "sample_dsir_weights" -> ((spark, dir) => {
      graft.operators.Dsir.importanceWeights(
        Tables.documents(spark, dir), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = DsirBuckets)
    }),

    // Quality-ranked selection to a token budget: keep the best docs
    // (type-token-ratio score, id tie-break) until the budget is
    // spent. Implemented as a score-bucket threshold so the only
    // unpartitioned windows are the score-cardinality running sum and
    // the single boundary score's docs — never the corpus; the oracle
    // runs the naive global cumsum and must match exactly.
    "sample_token_budget" -> ((spark, dir) => {
      val toks = split(col("text"), " ")
      // a bodyless doc has no token count: it can neither be selected
      // nor charged against the budget — excluded on BOTH engines
      // (the null score would otherwise vanish implicitly in the
      // bucket join, diverging from the oracle's kept-null row)
      val scored = Tables.documents(spark, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"), size(toks).as("n0"),
          size(array_distinct(toks)).as("u0"))
        .select(col("doc_id"), col("n0").cast("long").as("n_tok"),
          expr("CAST(u0 AS BIGINT) * 1000 div n0").as("score"))
      graft.operators.BudgetSelect.selectToTokenBudget(
        scored, "doc_id", "n_tok", "score", budget = TokenBudget)
    }),

    // Per-stratum deterministic Bernoulli sample with differing
    // allocations (replaces rand()-based sampleBy).
    "sample_stratified" -> ((spark, dir) => {
      Sampling.stratifiedSample(
        Tables.events(spark, dir), col("event_type"), col("event_id"),
        StrataPerMille, DefaultPerMille)
        .select(col("event_id"), col("event_type"))
    }),

    // Per-stratum deterministic reservoir: the k rows with the
    // smallest multiplicative hash per event_type — uniform without
    // replacement, stable across runs/partitionings, and planned by
    // the custom TopKPerKey operator (map-side bounded heaps) via the
    // engine-wide row_number rewrite, so only k rows per key per
    // partition ever move.
    "sample_reservoir_per_key" -> ((spark, dir) => {
      val h = pmod(pmod(col("event_id"), lit(Sampling.KnuthFold))
        * lit(Sampling.KnuthMultiplier), lit(1000000007L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(h.asc, col("event_id").asc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 20)
        .select(col("event_type"), col("rn").cast("long").as("rn"), col("event_id"))
    }),

    // Concat-and-chunk sequence packing at a 512-token budget: every
    // document's tokens land at a global offset (two-level distributed
    // prefix sum — no corpus-wide single-partition window; see
    // operators.Packing), and each (doc × context window) row is
    // hash-checked against the oracle's window-function rebuild,
    // boundary splits included.
    "pack_sequences" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      Packing.packChunks(docs, "doc_id", "n_tok",
        budget = PackBudget, bucketWidth = 1000)
    }),

    // RAG-style sliding token windows (size 32, stride 24) — a pure
    // per-row projection; content anchors (first/last token) make the
    // hash sensitive to the slicing itself.
    "text_chunk_sliding" -> ((spark, dir) => {
      Packing.slidingChunks(
        Tables.documents(spark, dir), "doc_id",
        TextFns.tokens(col("text")), size = ChunkSize, stride = ChunkStride)
    }),

    // Length-bucketed inference batching: width-16 token buckets ×
    // hash shards × size-8 batches; per-doc padding waste against the
    // batch max is the metric the layout exists to minimize. Every
    // assignment and the waste column hash-check against the oracle's
    // identical window arithmetic.
    "pack_length_buckets" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      Packing.lengthBucketBatches(docs, "doc_id", "n_tok",
        bucketWidth = 16, nShards = 4, batchSize = 8)
    }),

    // Dataset card: corpus composition report in ONE grouping-sets
    // pass — per-lang, per-source, per-(lang × source), and the grand
    // total; doc counts, token totals, char means. The report every
    // training-data release ships, at one-shuffle cost. All aggregates
    // are EXACT integer arithmetic — the mean is reported as a
    // fixed-point x1e4 integer derived from sum/count with one
    // integral division, because round(avg(double)) is not stable
    // across engines (summation order + half-up vs float rounding land
    // on different 4th decimals at some grouping cells).
    "dataset_card" -> ((spark, dir) => {
      Tables.documents(spark, dir)
        .select(col("lang"), col("source"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"),
          col("n_chars"))
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("source")),
            Seq(col("lang"), col("source")), Seq()),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .withColumn("avg_chars_x1e4",
          expr("(total_chars * 10000) div n_docs"))
    }),

    // Dataset card v2 companion: per-column NDV + top-k frequent
    // values with counts — the composition table a curation team
    // ships next to the grouping-sets card. Exact by design: the
    // card's columns are categorical, so groupBy(column, value)
    // map-side-combines to a value-cardinality-sized table and the
    // per-column top-k rides the TopKPerKey operator (row_number <= k)
    // over bounded partitions. (For unbounded-NDV columns the
    // HeavyHitters Misra-Gries + exact-verify path is the scale form —
    // text_heavy_hitters; a card never profiles such a column exactly.)
    "dataset_card_values" -> ((spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val long = Tables.documents(spark, dir)
        .select(col("lang"), col("source"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("lang"), col("source")), "column", "value")
      val freqs = long.groupBy("column", "value").agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy("column").orderBy(col("freq").desc, col("value"))
      freqs
        .withColumn("ndv", count(lit(1)).over(Window.partitionBy("column")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("column"), col("ndv").cast("long").as("ndv"),
          col("value"), col("freq"), col("rank").cast("long").as("rank"))
    }),

    // Domain-mix rebalance over the skewed `lang` column (en is ~44%
    // of the fixture): per-language acceptance rates derived from
    // measured cardinalities (uniform target share; over-represented
    // languages downsample, small ones keep everything), membership by
    // deterministic hash — counts agg + broadcast rate table, no
    // corpus shuffle.
    "sample_domain_mix" -> ((spark, dir) => {
      Sampling.domainRebalance(
        Tables.documents(spark, dir), "lang", col("doc_id"))
        .select(col("doc_id"), col("lang"))
    }),

    // Per-domain quality quota: cap each source's contribution at its
    // top-3 docs by quality — the "no domain dominates the mix" cap a
    // curation pipeline applies after dedup. Ranking is pure-integer
    // (distinct-token count desc, doc_id asc) so it is engine-exact;
    // the per-domain top-k rides TopKPerKey (≤ k rows per domain per
    // partition move — a WindowExec would sort every doc).
    "sample_domain_topk" -> ((spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_uniq").desc, col("doc_id").asc)
      Tables.widen(Tables.documents(spark, dir))
        .select(col("source"), col("doc_id"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("source"), col("rn").cast("long").as("rn"),
          col("doc_id"), col("n_uniq"))
    }),

    // Morton (Z-order) clustering key over two dimensions — the value
    // a layout-optimizing writer range-partitions by (Layout
    // .zorderCluster); checked bit-for-bit against DuckDB.
    "layout_zorder" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_id"),
          Layout.zorderKey(
            pmod(col("event_id"), lit(65536L)),
            pmod(col("user_id"), lit(65536L))).as("zkey"))
    }),

    // Hilbert-curve layout key (the Z-order upgrade: consecutive
    // indices are ALWAYS Manhattan-adjacent cells, so clustered files
    // cover compact 2-D blobs with no Z-jumps — tighter min/max
    // pruning on both dimensions). Native codegen'd expression; the
    // oracle replays the same rotate-and-reflect rounds as nested
    // subqueries, bit for bit.
    "layout_hilbert" -> ((spark, dir) => {
      Tables.events(spark, dir)
        .select(col("event_id"),
          graft.expressions.GraftFunctions.hilbertIndex(
            pmod(col("event_id"), lit(65536L)),
            pmod(col("user_id"), lit(65536L)), 16).as("hkey"))
    }),

    // Training-shard export end to end: the corpus written at rest as
    // token-budgeted whole-document shards (dir/shard=N/, one file per
    // shard — one sequential read per loader worker), then the
    // manifest aggregated from the READ-BACK files and hash-checked
    // against the oracle's independent rebuild of the assignment
    // arithmetic — certifying the write path, not just the plan.
    // Write-once via the fingerprint-marker pattern (ann_ivf_bucketed).
    "export_shards" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      val restDir = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_shards_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val fp = docs.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id))")).collect()(0)
      graft.io.Sinks.writeOnce(restDir,
        s"rows=${fp.getLong(0)};ids=${fp.getLong(1)};tps=$ShardTokens") {
        graft.operators.Export.writeShards(docs, "doc_id", "n_tok",
          tokensPerShard = ShardTokens, bucketWidth = 1000, restDir)
      }
      graft.operators.Export.shardManifest(spark, restDir, "doc_id", "n_tok")
    }),

    // Incremental (append-only) shard re-export: the corpus exported
    // in two id-ordered batches — base prefix, then an increment that
    // appends NEW shards after the current max without touching the
    // at-rest prefix (Export.appendShards; PackingSpec pins old files
    // byte-identical). The union manifest is oracle-rebuilt: base
    // shards from the prefix sum over the first half, increment
    // shards from a FRESH prefix sum offset past the base's max shard.
    "export_shards_incremental" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      val restDir = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_shards_incr_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val fp = docs.agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id))"),
        expr("(min(doc_id) + max(doc_id)) div 2")).collect()(0)
      val split = fp.getLong(2)
      graft.io.Sinks.writeOnce(restDir,
        s"rows=${fp.getLong(0)};ids=${fp.getLong(1)};tps=$ShardTokens;split=$split") {
        graft.operators.Export.writeShards(docs.where(col("doc_id") <= split),
          "doc_id", "n_tok", tokensPerShard = ShardTokens, bucketWidth = 1000, restDir)
        graft.operators.Export.appendShards(docs.where(col("doc_id") > split),
          "doc_id", "n_tok", tokensPerShard = ShardTokens, bucketWidth = 1000, restDir)
      }
      graft.operators.Export.shardManifest(spark, restDir, "doc_id", "n_tok")
    }),

    // Zone-map data skipping end to end: events written Z-order-
    // clustered on (user_id, event_id/16) with a persisted per-file
    // min/max manifest, then a 2-D range predicate planned by pruning
    // the FILE LIST from the manifest (manifest-cardinality driver
    // work, the Delta/Iceberg planning shape) before the exact filter
    // runs. Correct regardless of clustering quality — a file is only
    // skipped when its stats PROVE it has no qualifying row; the
    // oracle checks the result against a plain filter, and
    // LayoutSkipSpec pins that files actually get skipped. Write-once,
    // read-many via the ivf-bucketed marker pattern.
    "layout_stats_skipping" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
      val restDir = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_zorder_rest_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      val fp = ev.agg(count(lit(1)), expr("bit_xor(xxhash64(event_id))")).collect()(0)
      graft.io.Sinks.writeOnce(restDir,
        s"rows=${fp.getLong(0)};ids=${fp.getLong(1)}") {
        Layout.writeZoneMapped(ev,
          pmod(col("user_id"), lit(65536L)),
          pmod(floor(col("event_id") / 16).cast("long"), lit(65536L)),
          nFiles = 32, restDir, statsCols = Seq("user_id", "event_id"))
      }
      val (out, _, _) = Layout.statsPrunedRead(spark, restDir,
        Seq(("user_id", 4L, 10L), ("event_id", 100L, 2000L)))
      out.select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"))
    }),

    // Deterministic negative sampling for contrastive training: each
    // anchor doc draws 3 pseudo-random negatives via the avalanche
    // hash of (anchor, slot), rejecting self-collisions by stepping
    // one slot forward — pure integer arithmetic, reproducible across
    // runs/engines, zero shuffle (the negative is an ID, not a row;
    // the caller joins payloads when materializing pairs).
    "sample_negatives" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir).select(col("doc_id"))
      val n = docs.count() // corpus scalar, known pre-plan
      docs.select(col("doc_id"),
          explode(array((0 until 3).map(lit): _*)).as("slot"))
        .withColumn("cand",
          // fold before the multiply (the modBucket envelope rule):
          // raw doc_id·K throws under ANSI past ids ~3.4e9; folded,
          // the product stays ≤ ~5.7e18 for any id, and the fold is
          // the identity below 2^31−1
          pmod(pmod(col("doc_id"), lit(Sampling.KnuthFold)) * lit(Sampling.KnuthMultiplier)
            + col("slot") * lit(2654435769L), lit(n)))
        .withColumn("neg_id",
          when(col("cand") === col("doc_id"), pmod(col("cand") + 1, lit(n)))
            .otherwise(col("cand")))
        .select(col("doc_id"), col("slot").cast("long").as("slot"), col("neg_id"))
    }),

    // Length-weighted (probability ∝ size) sampling: keep rate per doc
    // is n_chars/max(n_chars) in exact ppm integer arithmetic, and
    // membership is the same deterministic hash filter as every other
    // sampler — the doc-level sampler whose EXPECTED output is
    // token-balanced rather than doc-balanced. One scalar aggregate
    // (max) broadcast back; zero-shuffle filter.
    "sample_length_weighted" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val mx = docs.agg(max(col("n_chars")).as("mx"))
      docs.crossJoin(broadcast(mx))
        .withColumn("rate_ppm", expr("(n_chars * 1000000) div mx"))
        .select(col("doc_id"), col("rate_ppm"),
          (Sampling.modBucket(col("doc_id"), 1000000) < col("rate_ppm")).as("kept"))
    }),

    // Token-budgeted mixture plan (the LLaMA/DoReMi recipe as exact
    // integer arithmetic): per-language full-epoch counts + partial-
    // epoch acceptance rates against a 50k-token budget.
    "mix_epoch_plan" -> ((spark, dir) => {
      Sampling.epochMixturePlan(Tables.documents(spark, dir), "lang",
        size(TextFns.tokens(col("text"))).cast("long"),
        MixWeights, MixBudgetTokens)
    }),

    // word2vec-style frequent-word subsampling: per-occurrence keep
    // with p = min(1, sqrt(t/f)), t = 0.1% of corpus tokens; keep
    // probability quantized once per distinct frequency, membership
    // by the Knuth (doc, position) hash — fully oracle-expressible.
    "sample_word_subsample" -> ((spark, dir) => {
      Sampling.subsampleFrequentWords(
        Tables.documents(spark, dir), "doc_id", "text", thrPerMille = 1)
    }),

    // Temperature-flattened (α = 1/2) mixture weights per language:
    // the automatic alternative to mix_epoch_plan's hand-set weights.
    // sqrt is IEEE-correctly-rounded in both engines and quantized
    // once per domain, so the whole result is integer-exact.
    "mix_temperature_weights" -> ((spark, dir) => {
      Sampling.temperatureMixture(Tables.documents(spark, dir), "lang",
        size(TextFns.tokens(col("text"))).cast("long"), MixBudgetTokens)
    }),

    // The corpus that plan describes, materialized: (doc, epoch) rows
    // — deterministic oversampling of up-weighted domains and hash
    // downsampling of the partial epoch, reproduced row-for-row by
    // the oracle.
    "mix_epoch_expand" -> ((spark, dir) => {
      val docs = Tables.documents(spark, dir)
      val plan = Sampling.epochMixturePlan(docs, "lang",
        size(TextFns.tokens(col("text"))).cast("long"),
        MixWeights, MixBudgetTokens)
      Sampling.epochExpand(docs.select(col("doc_id"), col("lang")),
        "lang", col("doc_id"), plan)
        .select(col("doc_id"), col("lang"), col("epoch"))
    })
  )

  private val MixWeights =
    Map("en" -> 400, "de" -> 150, "es" -> 150, "fr" -> 150, "zh" -> 150)
  private val MixBudgetTokens = 50000L

  private val mixPlanSql: String =
    """WITH w(lang, w) AS (
      |  VALUES ('en', 400), ('de', 150), ('es', 150), ('fr', 150), ('zh', 150)
      |), a AS (
      |  SELECT lang, count(*) AS n_docs,
      |    sum(len(string_split(text, ' ')))::BIGINT AS available_tokens
      |  FROM documents GROUP BY 1
      |)
      |SELECT a.lang, a.n_docs, a.available_tokens,
      |  CAST((50000 * coalesce(w.w, 0)) // 1000 AS BIGINT) AS target_tokens,
      |  CAST(((50000 * coalesce(w.w, 0)) // 1000) // a.available_tokens
      |       AS BIGINT) AS full_epochs,
      |  CAST(((50000 * coalesce(w.w, 0)) // 1000) % a.available_tokens
      |       AS BIGINT) AS rem_tokens,
      |  CAST(((((50000 * coalesce(w.w, 0)) // 1000) % a.available_tokens)
      |        * 1000000) // a.available_tokens AS BIGINT) AS accept_ppm
      |FROM a LEFT JOIN w ON a.lang = w.lang""".stripMargin

  private val mixExpandSql: String =
    s"""WITH w(lang, w) AS (
       |  VALUES ('en', 400), ('de', 150), ('es', 150), ('fr', 150), ('zh', 150)
       |), a AS (
       |  SELECT lang, sum(len(string_split(text, ' ')))::BIGINT AS avail
       |  FROM documents GROUP BY 1
       |), p AS (
       |  SELECT a.lang,
       |    ((50000 * coalesce(w.w, 0)) // 1000) // a.avail AS full_epochs,
       |    ((((50000 * coalesce(w.w, 0)) // 1000) % a.avail) * 1000000)
       |      // a.avail AS accept_ppm
       |  FROM a LEFT JOIN w ON a.lang = w.lang
       |), j AS (
       |  SELECT d.doc_id, d.lang,
       |    p.full_epochs + CASE
       |      WHEN ((d.doc_id % ${Sampling.KnuthFold}) * ${Sampling.KnuthMultiplier})
       |           % 1000000
       |           < p.accept_ppm THEN 1 ELSE 0 END AS n_ep
       |  FROM documents d JOIN p ON d.lang = p.lang
       |)
       |SELECT doc_id, lang, CAST(e AS BIGINT) AS epoch
       |FROM j, unnest(range(n_ep)) AS u(e)
       |WHERE n_ep > 0""".stripMargin

  private val PackBudget = 512
  private val ChunkSize = 32
  private val ChunkStride = 24
  // sized so the fixture corpus (≈27k tokens at sf0.01, ≈270k at
  // sf0.1) spans a meaningful shard count at the correctness gate
  private val ShardTokens = 4096L

  private val packSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
       |), p AS (
       |  SELECT doc_id, n_tok,
       |    coalesce(sum(n_tok) OVER (
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_offset
       |  FROM t
       |), e AS (
       |  SELECT doc_id, n_tok, tok_offset,
       |    unnest(range(tok_offset // $PackBudget,
       |                 (tok_offset + n_tok - 1) // $PackBudget + 1)) AS chunk_id
       |  FROM p WHERE n_tok > 0
       |)
       |SELECT doc_id, chunk_id,
       |  least(tok_offset + n_tok, (chunk_id + 1) * $PackBudget) -
       |    greatest(tok_offset, chunk_id * $PackBudget) AS tok_in_chunk,
       |  tok_offset
       |FROM e""".stripMargin

  private val chunkSlidingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n FROM t
       |), e AS (
       |  SELECT doc_id, toks, n,
       |    unnest(range(0, CASE WHEN n <= 0 THEN 0
       |      ELSE 1 + greatest(0,
       |        CAST(ceil((n - $ChunkSize)::DOUBLE / $ChunkStride) AS BIGINT))
       |      END)) AS chunk_idx
       |  FROM n
       |)
       |SELECT doc_id, chunk_idx,
       |  least(n - chunk_idx * $ChunkStride, $ChunkSize) AS n_in_chunk,
       |  toks[CAST(chunk_idx * $ChunkStride + 1 AS INT)] AS first_tok,
       |  toks[CAST(least(n, chunk_idx * $ChunkStride + $ChunkSize) AS INT)] AS last_tok
       |FROM e""".stripMargin

  private val domainMixSql: String = {
    val b = Sampling.modBucketSql("d.doc_id", 1000000)
    s"""WITH c AS (
       |  SELECT lang, count(*) AS cnt FROM documents GROUP BY 1
       |), r AS (
       |  SELECT lang,
       |    least(1.0, (sum(cnt) OVER ())::DOUBLE /
       |      ((count(*) OVER ()) * cnt)) AS rate
       |  FROM c
       |)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN r USING (lang)
       |WHERE $b < rate * 1e6""".stripMargin
  }

  private val splitSql: String = {
    val b = Sampling.modBucketSql("event_id", 1000)
    // Same cut points as SplitWeights, same first-match-wins order.
    s"""SELECT event_id,
       |  CASE WHEN $b < 800 THEN 'train'
       |       WHEN $b < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM events""".stripMargin
  }

  private val stratifiedSql: String = {
    val b = Sampling.modBucketSql("event_id", 1000)
    val alloc = StrataPerMille.foldRight(DefaultPerMille.toString) {
      case ((s, m), rest) => s"CASE WHEN event_type = '$s' THEN $m ELSE $rest END"
    }
    s"SELECT event_id, event_type FROM events WHERE $b < $alloc"
  }

  private val dedupAwareSplitSql: String = {
    val b = Sampling.modBucketSql("canonical_id", 1000)
    s"""WITH canon AS (
       |  SELECT md5(text) AS k, min(doc_id) AS canonical_id
       |  FROM documents GROUP BY 1
       |)
       |SELECT doc_id, canonical_id,
       |  CASE WHEN $b < 800 THEN 'train'
       |       WHEN $b < 900 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents d JOIN canon ON md5(d.text) = canon.k""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sample_hash_split" -> splitSql,
    "sample_dedup_aware_split" -> dedupAwareSplitSql,
    "mix_epoch_plan" -> mixPlanSql,
    // Same per-distinct-frequency ppm quantization, same folded
    // (doc·1009+pos) % 2^31-1 Knuth membership.
    "sample_word_subsample" ->
      """WITH t AS MATERIALIZED (
        |  SELECT doc_id, i - 1 AS tpos, l[i] AS w
        |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, ' ') AS l
        |              FROM documents))
        |  WHERE l[i] <> ''
        |), n AS (
        |  SELECT count(*) AS n FROM t
        |), thr AS (
        |  SELECT greatest(1, n // 1000) AS thr FROM n
        |), f AS (
        |  SELECT w,
        |    CASE WHEN count(*) <= (SELECT thr FROM thr) THEN 1000000
        |         ELSE CAST(floor(1000000.0 *
        |           sqrt(CAST((SELECT thr FROM thr) AS DOUBLE) / count(*)))
        |           AS BIGINT)
        |    END AS keep_ppm
        |  FROM t GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN
        |      (((t.doc_id * 1009 + t.tpos) % 2147483647) * 2654435761)
        |        % 1000000 < f.keep_ppm
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM t JOIN f USING (w)
        |GROUP BY 1""".stripMargin,
    "mix_temperature_weights" ->
      """WITH a AS (
        |  SELECT lang, count(*) AS n_docs,
        |    sum(len(string_split(text, ' ')))::BIGINT AS c_tokens
        |  FROM documents GROUP BY 1
        |), q AS (
        |  SELECT lang, n_docs, c_tokens,
        |    CAST(floor(sqrt(c_tokens) * 10000) AS BIGINT) AS w_x1e4
        |  FROM a
        |)
        |SELECT lang, n_docs, c_tokens, w_x1e4,
        |  CAST((w_x1e4 * 1000000) // (SELECT sum(w_x1e4) FROM q) AS BIGINT)
        |    AS share_ppm,
        |  CAST((c_tokens::HUGEINT * 1000000) // (SELECT sum(c_tokens) FROM q) AS BIGINT)
        |    AS raw_ppm,
        |  CAST((50000 * w_x1e4) // (SELECT sum(w_x1e4) FROM q) AS BIGINT)
        |    AS target_tokens
        |FROM q""".stripMargin,
    "mix_epoch_expand" -> mixExpandSql,
    "sample_negatives" ->
      s"""WITH n AS (SELECT count(*) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, s.slot,
         |    ((doc_id % ${Sampling.KnuthFold}) * ${Sampling.KnuthMultiplier}
         |      + s.slot * 2654435769)
         |      % (SELECT n FROM n) AS cand
         |  FROM documents, (SELECT unnest([0, 1, 2]) AS slot) s
         |)
         |SELECT doc_id, CAST(slot AS BIGINT) AS slot,
         |  CAST(CASE WHEN cand = doc_id
         |    THEN (cand + 1) % (SELECT n FROM n)
         |    ELSE cand END AS BIGINT) AS neg_id
         |FROM c""".stripMargin,

    "sample_length_weighted" ->
      s"""WITH m AS (SELECT max(n_chars) AS mx FROM documents)
         |SELECT doc_id,
         |  CAST((n_chars * 1000000) // mx AS BIGINT) AS rate_ppm,
         |  ${Sampling.modBucketSql("doc_id", 1000000)}
         |    < (n_chars * 1000000) // mx AS kept
         |FROM documents, m""".stripMargin,
    "sample_reservoir_per_key" ->
      s"""SELECT event_type, rn, event_id FROM (
         |  SELECT event_type, event_id, row_number() OVER (
         |    PARTITION BY event_type
         |    ORDER BY ((event_id % ${Sampling.KnuthFold}) * ${Sampling.KnuthMultiplier})
         |      % 1000000007 ASC,
         |      event_id ASC) AS rn
         |  FROM events
         |) WHERE rn <= 20""".stripMargin,
    // Twin of Dsir.importanceWeights: same FNV-1a HUGEINT fold into
    // 512 buckets (the sketch_cms_estimate kernel rebuild), same
    // add-one smoothing over the full bucket domain, same per-bucket
    // floor(log2·1e4) quantization off identical integer counts.
    "sample_dsir_weights" ->
      s"""WITH w AS (
         |  SELECT doc_id, t, u AS w FROM (
         |    SELECT doc_id, lang = 'en' AS t,
         |      unnest(string_split(text, ' ')) AS u FROM documents
         |  ) WHERE u <> ''
         |), wb AS (
         |  SELECT doc_id, t,
         |    CAST(list_reduce(
         |      list_prepend(14695981039346656037::HUGEINT,
         |        [unicode(c)::HUGEINT for c in string_split(w, '')]),
         |      (h, c) -> (xor(h, c) * 1099511628211::HUGEINT)
         |                  % 18446744073709551616::HUGEINT) % $DsirBuckets
         |      AS BIGINT) AS b
         |  FROM w
         |), agg AS (
         |  SELECT b, count(*) AS cr0,
         |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct0
         |  FROM wb GROUP BY 1
         |), tbl AS (
         |  SELECT d.b, coalesce(a.cr0, 0) + 1 AS cr, coalesce(a.ct0, 0) + 1 AS ct
         |  FROM (SELECT unnest(range($DsirBuckets)) AS b) d
         |  LEFT JOIN agg a ON d.b = a.b
         |), tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM tbl
         |), q AS (
         |  SELECT b, CAST(floor(log2(
         |      (ct * (SELECT nr FROM tot))::DOUBLE
         |      / (cr * (SELECT nt FROM tot))) * 10000) AS BIGINT) AS qlog
         |  FROM tbl
         |)
         |SELECT wb.doc_id, wb.t AS is_target,
         |  CAST(count(*) AS BIGINT) AS n_feats,
         |  CAST(sum(q.qlog) AS BIGINT) AS score_fp,
         |  CAST(sum(q.qlog) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_fp
         |FROM wb JOIN q USING (b) GROUP BY 1, 2""".stripMargin,

    // Naive global-cumsum twin of BudgetSelect.selectToTokenBudget.
    "sample_token_budget" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(string_split(text, ' '))) * 1000
         |      // len(string_split(text, ' ')) AS BIGINT) AS score
         |  FROM documents WHERE text IS NOT NULL
         |), c AS (
         |  SELECT doc_id, n_tok, score,
         |    sum(n_tok) OVER (ORDER BY score DESC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d
         |)
         |SELECT doc_id, n_tok, score, cum <= $TokenBudget AS selected FROM c""".stripMargin,

    "sample_stratified" -> stratifiedSql,
    "pack_sequences" -> packSequencesSql,
    "pack_length_buckets" ->
      s"""WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
        |), b AS (
        |  SELECT doc_id, n_tok, n_tok // 16 AS bucket,
        |    ${Sampling.modBucketSql("doc_id", 4)} AS shard
        |  FROM t
        |), r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY bucket, shard ORDER BY doc_id) AS rn
        |  FROM b
        |), a AS (
        |  SELECT *, (rn - 1) // 8 AS batch FROM r
        |)
        |SELECT doc_id, bucket, shard, batch, n_tok,
        |  max(n_tok) OVER (PARTITION BY bucket, shard, batch) - n_tok
        |    AS padding_waste
        |FROM a""".stripMargin,
    "dataset_card" ->
      """SELECT lang, source,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST((sum(n_chars) * 10000) // count(*) AS BIGINT) AS avg_chars_x1e4
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())""".stripMargin,
    "dataset_card_values" ->
      """WITH u AS (
        |  -- UNION ALL, not UNPIVOT: DuckDB's UNPIVOT silently DROPS
        |  -- null-valued rows while Spark's unpivot keeps them — and a
        |  -- composition card must surface the null bucket (an
        |  -- unlabeled lang IS a composition fact a curator wants)
        |  SELECT 'lang' AS "column", lang AS value FROM documents
        |  UNION ALL
        |  SELECT 'source' AS "column", source AS value FROM documents
        |), f AS (
        |  SELECT "column", value, count(*) AS freq FROM u GROUP BY 1, 2
        |), r AS (
        |  SELECT "column", value, freq,
        |    count(*) OVER (PARTITION BY "column") AS ndv,
        |    row_number() OVER (PARTITION BY "column"
        |                       ORDER BY freq DESC, value NULLS FIRST) AS rank
        |  FROM f
        |)
        |SELECT "column", CAST(ndv AS BIGINT) AS ndv, value, freq,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5""".stripMargin,

    "text_chunk_sliding" -> chunkSlidingSql,
    "sample_domain_mix" -> domainMixSql,

    "sample_domain_topk" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_uniq
        |  FROM documents
        |)
        |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, n_uniq
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY source ORDER BY n_uniq DESC, doc_id ASC) AS rn
        |      FROM s)
        |WHERE rn <= 3""".stripMargin,
    "export_shards" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
         |), p AS (
         |  SELECT doc_id, n_tok,
         |    coalesce(sum(n_tok) OVER (
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
         |  FROM t
         |)
         |SELECT off // $ShardTokens AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc
         |FROM p WHERE n_tok > 0
         |GROUP BY 1""".stripMargin,

    // Two-phase rebuild: base shards from the prefix sum over the
    // id-prefix half, increment shards from a FRESH prefix sum offset
    // to start one past the base's max shard (appendShards contract —
    // the increment never tops up the base's partial last shard).
    "export_shards_incremental" ->
      s"""WITH s AS (
         |  SELECT (min(doc_id) + max(doc_id)) // 2 AS split FROM documents
         |), t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
         |), p1 AS (
         |  SELECT doc_id, n_tok,
         |    coalesce(sum(n_tok) OVER (
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
         |  FROM t WHERE doc_id <= (SELECT split FROM s)
         |), a1 AS (
         |  SELECT doc_id, n_tok, off // $ShardTokens AS shard FROM p1 WHERE n_tok > 0
         |), mx AS (
         |  SELECT max(shard) + 1 AS base FROM a1
         |), p2 AS (
         |  SELECT doc_id, n_tok,
         |    coalesce(sum(n_tok) OVER (
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
         |  FROM t WHERE doc_id > (SELECT split FROM s)
         |), a2 AS (
         |  SELECT doc_id, n_tok, (SELECT base FROM mx) + off // $ShardTokens AS shard
         |  FROM p2 WHERE n_tok > 0
         |), u AS (
         |  SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM u GROUP BY 1""".stripMargin,

    "layout_zorder" ->
      s"""SELECT event_id,
         |  ${Layout.zorderKeySql("event_id % 65536", "user_id % 65536")} AS zkey
         |FROM events""".stripMargin,
    "layout_hilbert" -> {
      val inner = """SELECT event_id, event_id % 65536 AS x,
                    |  user_id % 65536 AS y, CAST(0 AS BIGINT) AS d FROM events""".stripMargin
      s"""SELECT event_id, CAST(d AS BIGINT) AS hkey FROM (
         |${Layout.hilbertRoundsSql(inner, "event_id", 16)}
         |)""".stripMargin
    },
    "layout_stats_skipping" ->
      """SELECT event_id, user_id, event_type, round(value, 4) AS value
        |FROM events
        |WHERE user_id BETWEEN 4 AND 10
        |  AND event_id BETWEEN 100 AND 2000""".stripMargin
  )
}
