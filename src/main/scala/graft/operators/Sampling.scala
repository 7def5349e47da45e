package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here is a pure projection or filter over a hash of a
  * stable row id — no rand(), no state, no shuffle. That is the
  * property a 100 TB pipeline needs: re-running a stage (or adding
  * columns, or repartitioning) never changes which rows are sampled,
  * and train/val/test membership is reproducible from the id alone.
  *
  * Two hash families:
  *   - [[modBucket]]: Knuth multiplicative hashing (id × 2654435761
  *     mod buckets). Weaker mixing but expressible in ANY engine's
  *     integer arithmetic — this is the DuckDB-oracle-checkable form.
  *   - [[xxBucket]]: xxhash64-based. The production default (full
  *     avalanche; safe for adversarial/sequential ids).
  *
  * The reference repo has no sampling surface; this is part of the
  * training-data extension mandated by the builder prompt.
  */
object Sampling {

  /** Knuth's 2^32/phi multiplier. The raw product overflows a signed
    * 64-bit long past ids ~3.4e9 (Spark 4's default ANSI mode THROWS,
    * and engines differ on wrap semantics anyway), so [[modBucket]]
    * folds the key into [0, 2^31) FIRST: the folded product tops out
    * at ~5.7e18, safely inside BIGINT on every engine, for ANY long
    * id. The fold is the identity below 2^31−1, so bucket values for
    * existing id domains are unchanged.
    */
  val KnuthMultiplier = 2654435761L

  /** Fold domain: 2^31 − 1 (prime, so sequential and strided ids
    * spread before the multiply).
    */
  val KnuthFold = 2147483647L

  /** Oracle-expressible bucket in [0, buckets):
    * ((id mod 2^31−1)·K) mod buckets.
    */
  def modBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id, lit(KnuthFold)) * lit(KnuthMultiplier), lit(buckets.toLong))

  /** DuckDB twin of [[modBucket]] (positive ids ⇒ % == pmod). */
  def modBucketSql(id: String, buckets: Int): String =
    s"(((($id) % $KnuthFold) * $KnuthMultiplier) % $buckets)"

  /** Production bucket in [0, buckets): full-avalanche xxhash64. */
  def xxBucket(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets.toLong))

  /** Deterministic train/val/test (or any weighted) split label.
    * Weights are per-mille slices of the bucket space, assigned in the
    * given order; they must sum to ≤ 1000 (the remainder falls into
    * the LAST label). Membership depends only on the id.
    */
  def splitLabel(id: Column, weights: Seq[(String, Int)],
                 bucket: (Column, Int) => Column = modBucket): Column = {
    require(weights.nonEmpty && weights.map(_._2).sum <= 1000,
      "split weights are per-mille and must sum to <= 1000")
    val b = bucket(id, 1000)
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    weights.init.zip(cuts.init).foldRight(lit(weights.last._1): Column) {
      case (((label, _), cut), rest) => when(b < cut, label).otherwise(rest)
    }
  }

  /** Per-stratum deterministic Bernoulli sample: keep a row iff its
    * hash bucket falls under the stratum's per-mille allocation.
    * Replaces rand()-based df.stat.sampleBy with a reproducible
    * filter that survives re-runs and repartitioning.
    */
  def stratifiedSample(df: DataFrame, strata: Column, id: Column,
                       perMille: Map[String, Int], defaultPerMille: Int,
                       bucket: (Column, Int) => Column = modBucket): DataFrame = {
    val alloc = perMille.foldRight(lit(defaultPerMille): Column) {
      case ((s, m), rest) => when(strata === s, m).otherwise(rest)
    }
    df.where(bucket(id, 1000) < alloc)
  }

  /** Domain-mix rebalance (DoReMi-style, uniform target): downsample
    * each domain so every domain contributes ~equally, via the same
    * deterministic hash filter as [[stratifiedSample]] — but with the
    * per-domain acceptance RATE derived from measured cardinalities
    * (rate_d = min(1, total / (nDomains · count_d))) instead of a
    * hand-tuned map. Two aggregations over the data (one for counts,
    * one implicit in the filter scan) and a broadcast of the
    * domain-cardinality rate table — no shuffle of the corpus itself.
    * Rates are IEEE doubles computed with one division and one
    * multiply, so any engine reproduces the same keep decisions.
    * Null domains never match the rate equi-join and are DROPPED —
    * coalesce the domain column upstream if nulls must survive.
    */
  def domainRebalance(df: DataFrame, domainCol: String, id: Column,
                      bucket: (Column, Int) => Column = modBucket): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    // counts is domain-cardinality (tiny); the empty-partition window
    // runs over those few rows only.
    val rates = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__rate",
        least(lit(1.0),
          sum(col("__cnt")).over(w).cast("double") /
            (count(lit(1)).over(w) * col("__cnt"))))
      .select(col(domainCol), col("__rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .where(bucket(id, 1000000).cast("double") < col("__rate") * 1e6)
      .drop("__rate")
  }

  /** Deterministic "reservoir": the k rows with the smallest
    * xxhash64(id) — a uniform-without-replacement sample that is
    * stable across runs, partitionings, and (unlike a true reservoir
    * scan) cluster topology. Distributed cost is a per-partition
    * bounded top-k then a k-row driver merge (TakeOrderedAndProject),
    * no full shuffle.
    */
  def consistentSample(df: DataFrame, id: Column, k: Int): DataFrame =
    df.orderBy(xxhash64(id).asc, id.asc).limit(k)

  /** Per-domain epoch plan for a token-budgeted training mixture (the
    * LLaMA/DoReMi recipe written as exact integer arithmetic): given
    * per-mille mixture weights and a total token budget, each domain's
    * target `budget·w/1000` decomposes into `full_epochs` complete
    * passes over the domain plus a hash-sampled partial pass accepting
    * `accept_ppm` parts-per-million of docs (`rem·1e6/available`).
    * Every column is one integral multiply/divide over exact
    * aggregates, so the plan is engine-reproducible bit for bit.
    * Scale: ONE map-side-combinable aggregation over the corpus; the
    * plan table is domain-cardinality.
    */
  def epochMixturePlan(df: DataFrame, domainCol: String, tokCol: Column,
                       weightsPerMille: Map[String, Int],
                       budgetTokens: Long): DataFrame = {
    require(weightsPerMille.values.forall(_ >= 0) &&
      weightsPerMille.values.sum <= 1000,
      "mixture weights are per-mille and must sum to <= 1000")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    val wCol = weightsPerMille.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((d, w), rest) =>
        when(col(domainCol) === d, w).otherwise(rest)
      }
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokCol).cast("long").as("available_tokens"))
      .withColumn("__bw", lit(budgetTokens) * wCol.cast("long"))
      .withColumn("target_tokens", expr("__bw div 1000"))
      .withColumn("full_epochs", expr("target_tokens div available_tokens"))
      .withColumn("rem_tokens", pmod(col("target_tokens"), col("available_tokens")))
      .withColumn("accept_ppm", expr("(rem_tokens * 1000000) div available_tokens"))
      .drop("__bw")
  }

  /** Frequent-word subsampling (the word2vec/Mikolov downsampler):
    * each occurrence of word w with corpus frequency f survives with
    * probability min(1, sqrt(t/f)) where t = `thrPerMille`/1000 of
    * total tokens — stop-word mass collapses, rare-word occurrences
    * all survive. Determinism: the keep probability is quantized
    * ONCE PER DISTINCT FREQUENCY (floor(1e6·sqrt(thr/f)) — IEEE
    * division and sqrt are correctly rounded, so both engines agree;
    * the DSIR per-distinct-input pattern), and membership is the
    * Knuth hash of (doc, position) against that ppm — reproducible
    * under re-runs and any partitioning, oracle-expressible. Scale:
    * the frequency table is vocabulary-sized (broadcast); one
    * corpus pass filters; per-doc rollup is map-side combinable.
    * [[xxBucket]] is the production membership hash once
    * doc·position keys outgrow the Knuth multiplier's domain.
    *
    * Returns (id, n_tokens, n_kept) per document.
    */
  def subsampleFrequentWords(docs: DataFrame, idCol: String, textCol: String,
                             thrPerMille: Int = 1): DataFrame = {
    require(thrPerMille >= 1, s"thrPerMille must be >= 1, got $thrPerMille")
    val toks = docs.select(col(idCol).as("_ss_id"),
        posexplode(split(col(textCol), " ")).as(Seq("tpos", "w")))
      .where(length(col("w")) > 0)
    val nTotal = toks.count() // corpus scalar, known pre-plan
    val thr = math.max(1L, nTotal * thrPerMille / 1000L)
    val freq = toks.groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("keep_ppm",
        when(col("f") <= thr, lit(1000000L))
          .otherwise(floor(lit(1000000.0) * sqrt(lit(thr.toDouble) / col("f")))
            .cast("long")))
    // (doc, position) folded into [0, 2^31) BEFORE the Knuth multiply
    // so the product can't overflow ANSI BIGINT at any corpus size
    val key = pmod(col("_ss_id") * 1009L + col("tpos"), lit(2147483647L))
    toks.join(broadcast(freq), Seq("w"))
      .withColumn("kept", modBucket(key, 1000000) < col("keep_ppm"))
      .groupBy("_ss_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("_ss_id").as(idCol), col("n_tokens"), col("n_kept"))
  }

  /** Temperature-flattened mixture weights (the T5/PaLM α = 1/2
    * heuristic): instead of hand-set per-mille weights, each domain's
    * sampling weight is proportional to c_d^α with α fixed at 1/2 —
    * large domains are damped, small domains boosted, without any
    * manual tuning. α = 1/2 is deliberate: IEEE sqrt is correctly
    * rounded in both engines (general pow is not), so the per-domain
    * quantization floor(sqrt(c_d)·1e4) is bit-deterministic and
    * everything downstream is BIGINT division — the
    * quantize-per-distinct-input pattern (the float risk is D domain
    * boundary-landings, not n rows).
    *
    * Scale: one domain-keyed aggregation; the normalizing sum runs
    * over a domain-cardinality window frame (≪ data). Returns per
    * domain: doc/token counts, the quantized weight, flattened vs raw
    * corpus share (ppm), and the token budget allocation.
    */
  def temperatureMixture(df: DataFrame, domainCol: String, tokCol: Column,
                         budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokCol).cast("long").as("c_tokens"))
      .withColumn("w_x1e4", floor(sqrt(col("c_tokens")) * 1e4).cast("long"))
      .withColumn("__wsum", sum(col("w_x1e4")).over(all))
      .withColumn("__csum", sum(col("c_tokens")).over(all))
      .withColumn("share_ppm", expr("(w_x1e4 * 1000000) div __wsum"))
      // 128-bit products: c_tokens is a PER-DOMAIN corpus token count
      // (·1e6 passes BIGINT at ~9e12 tokens in one domain), and
      // budget·w_x1e4 reaches ~3e23 for a 1e13-token budget — while
      // both quotients are bounded (≤ 1e6 ppm; ≤ the budget). The
      // sqrt-weight share_ppm numerator is ≤ ~3e16 at 1e13 tokens
      // (w_x1e4 = √c·1e4), so it stays in BIGINT.
      .withColumn("raw_ppm",
        expr("(CAST(c_tokens AS DECIMAL(38,0)) * 1000000) div __csum"))
      .withColumn("target_tokens",
        expr(s"(CAST(${budgetTokens} AS DECIMAL(38,0)) * w_x1e4) div __wsum"))
      .drop("__wsum", "__csum")
  }

  /** Materialize the training corpus a mixture plan describes: every
    * doc appears once per full epoch of its domain, plus once more in
    * the final partial epoch iff its hash bucket falls under the
    * domain's acceptance rate — deterministic with-replacement
    * oversampling and without-replacement downsampling in one shape.
    * Scale: the domain-cardinality plan broadcasts; expansion is a
    * zero-shuffle generate (sequence + explode inside codegen) whose
    * output size is exactly the planned token budget's doc count.
    */
  def epochExpand(df: DataFrame, domainCol: String, id: Column,
                  plan: DataFrame): DataFrame = {
    val nEp = col("full_epochs") +
      when(modBucket(id, 1000000) < col("accept_ppm"), 1L).otherwise(0L)
    df.join(broadcast(plan.select(col(domainCol), col("full_epochs"), col("accept_ppm"))),
        Seq(domainCol))
      .withColumn("__n_ep", nEp)
      .where(col("__n_ep") > 0)
      .select(col("*"),
        explode(sequence(lit(0L), col("__n_ep") - 1L)).as("epoch"))
      .drop("full_epochs", "accept_ppm", "__n_ep")
  }
}
