package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (array<float>).
  *
  * Cosine is computed in double precision with strict left-to-right
  * accumulation (aggregate over zip_with), which is bit-identical to
  * DuckDB's list_dot_product over DOUBLE[] — that makes the brute-force
  * path fully oracle-checkable.
  *
  * Scale design: queries are broadcast (they are the small side by
  * construction); scoring is a map-side projection over the corpus with
  * no shuffle; only the per-query top-k reduction shuffles, and the
  * [[TopKAgg]] aggregator bounds what moves to k rows per query per
  * partition (map-side partial top-k), so shuffle volume is
  * O(queries × k × partitions) regardless of corpus size. The LSH
  * variant prunes the scored pairs to matching signature buckets first.
  */
object Similarity {

  /** Strict left-to-right double dot product — native codegen'd
    * expression (graft.expressions.DotProduct), bit-identical to the
    * HOF form aggregate(zip_with(_*_), 0.0, _+_) over array<double>
    * and to DuckDB's list_dot_product over DOUBLE[].
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.GraftFunctions.dotProduct(a, b)

  /** Euclidean norm of an embedding column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Double-precision cosine similarity of two array<float> columns.
    * For pair joins prefer precomputing [[norm]] per SIDE before the
    * join and dividing dot by the norm product — one dot per pair
    * instead of three.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** DuckDB twin of [[cosine]] (embedding lists cast to DOUBLE[]). */
  def cosineSql(a: String, b: String): String =
    s"(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"nullif(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])), 0))"

  final case class Scored(id: Long, score: Double)

  /** Bounded-heap top-k aggregator: the map-side partial top-k that a
    * window row_number plan can't do. Buffer never exceeds k entries,
    * so partial aggregation ships k rows per partition instead of the
    * whole candidate set. Ordering: score desc, id asc (deterministic).
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def top(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = top(b :+ a)
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = top(x ++ y)
    override def finish(b: Seq[Scored]): Seq[Scored] = b
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Brute-force cosine top-k, window form (oracle-checkable baseline).
    * Self-matches excluded; ties broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")))
    val scored = corpus
      .withColumn("c_nrm", norm(col("embedding")))
      .join(q, col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Brute-force cosine top-k via [[TopKAgg]] — same semantics as
    * [[bruteForceTopK]], scale-friendly shuffle profile.
    */
  def aggregatorTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[Scored]())
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")))
    corpus
      .withColumn("c_nrm", norm(col("embedding")))
      .join(q, col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      // a null (zero-norm) score is not rankable: the typed
      // aggregator's primitive Double field would silently coerce it
      // to 0.0, while the window form and the oracle sort nulls last —
      // excluding it keeps all three forms identical
      .where(col("score").isNotNull)
      .groupBy("query_id")
      .agg(topk(col("vec_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.id").as("neighbor_id"), round(col("s.score"), 4).as("score"))
  }

  /** Random-hyperplane LSH signature (nBits sign bits). Hyperplane
    * weights are Rademacher ±1 derived from sin(p*dim + d) — cheap,
    * deterministic, and reproducible in plain SQL if ever needed.
    */
  def lshSignature(emb: Column, dim: Int, nBits: Int): Column = {
    val ed = emb.cast("array<double>")
    val bitCols = (0 until nBits).map { p =>
      // ±1 weights are a LITERAL array (evaluated here with the same
      // java Math.sin the codegen'd form called), dotted natively.
      val weights = array((0 until dim).map(d =>
        lit(if (math.sin(d + p * dim) >= 0) 1.0 else -1.0)): _*)
      when(dot(ed, weights) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into cells; each query exactly-scores only its `nProbe` nearest
    * cells. The classic billion-scale layout: the corpus is assigned
    * ONCE (and would be written bucketed-by-cell at rest), per-query
    * work drops by ~nCells/nProbe, and recall is tunable via nProbe.
    *
    * The codebook is Lloyd-trained on a deterministic hash-ordered
    * SAMPLE of the corpus — how large-scale IVF trains in practice
    * (quantizers fit on samples, not the full corpus; the fit is a
    * driver-side loop over ≤2k points). The dictionary-sized result is
    * folded into LITERAL arrays so cell assignment is a pure
    * broadcast-free projection over native dots, exactly like the
    * nearest-city argmin kernel.
    *
    * Cell ranking uses dot(q, centroid)/|centroid| — equivalent to
    * cosine for ranking because |q| is a common positive factor.
    */
  /** Deterministic hash-ordered sample of corpus vectors — the
    * training set for both quantizers. Bounded driver collect
    * (sampleN rows) regardless of corpus size: quantizers train on
    * samples at scale, then broadcast as literals/reference objects.
    */
  private def collectSample(corpus: DataFrame, sampleN: Int): Array[Array[Double]] = {
    // MEMOIZED per (corpus file paths + canonical plan, sampleN): every
    // quantizer training on the same corpus — the coarse IVF codebook,
    // the PQ subspace codebooks, and both trainings again inside the
    // two-stage rerank — starts from this same hash-ordered sample, so
    // the corpus scan-sort-collect job is paid once per JVM, not once
    // per quantizer (verdict r15 item 1, the Similarity half). The
    // sample is a bounded driver array — session-free — and a
    // deterministic function of the corpus content, so reuse is exact
    // under the nBasketsMemo doctrine (raw input dirs are immutable
    // within a session). Memoization is gated to FILE-BACKED plans,
    // keyed by the scan's root paths (which the canonicalized plan
    // string does NOT carry) plus the canonicalized shape (which
    // distinguishes different filters over the same files); in-memory
    // corpora (LocalRelation canonicalizes identically regardless of
    // data) always sample fresh.
    def fresh(): Array[Array[Double]] =
      corpus
        .select(col("vec_id"), col("embedding"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id"))
        .limit(sampleN)
        .collect()
        .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val leaves = corpus.queryExecution.analyzed.collectLeaves()
    val roots = leaves.map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
        case _ => ""
      }
      case _ => ""
    }
    if (leaves.isEmpty || roots.exists(_.isEmpty)) fresh()
    else {
      val key = roots.mkString(";") + "|" +
        corpus.queryExecution.analyzed.canonicalized.toString + s"|n=$sampleN"
      sampleMemo.computeIfAbsent(key, _ => graft.core.MemoStats.timed(fresh()))
    }
  }
  private val sampleMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Deterministic Lloyd k-means on the driver over a collected
    * sample: init = first k sample points (hash order), argmin-L2
    * assignment, empty clusters keep their previous centroid. A few
    * iterations lift quantizer quality far above raw sampled
    * codebooks (recall floor of IVF/PQ), at zero distributed cost.
    */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int,
                               iters: Int): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    val dim = points(0).length
    var centroids = Array.tabulate(math.min(k, points.length))(i => points(i).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      points.foreach { p =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
      }
      centroids = Array.tabulate(centroids.length)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** Lloyd-trained coarse codebook with precomputed norms. Centroids
    * are rounded to float so [[dot]] sees matching array<float> types.
    */
  private def sampleCodebook(corpus: DataFrame, nCells: Int): Array[(Int, Array[Float], Double)] =
    lloyd(collectSample(corpus, math.max(nCells * 32, 512)), nCells, iters = 5)
      .zipWithIndex
      .map { case (c, i) =>
        val emb = c.map(_.toFloat)
        (i, emb, math.sqrt(emb.map(x => x.toDouble * x).sum))
      }

  private def cellScores(codebook: Array[(Int, Array[Float], Double)])(emb: Column): Column =
    array(codebook.map { case (i, c, n) =>
      struct((dot(emb, typedLit(c)) / lit(n)).as("s"), lit(i).as("cell"))
    }: _*)

  /** Corpus cell assignment — the zero-shuffle projection form of the
    * coarse quantizer, also usable to WRITE the corpus bucketed by
    * cell at rest (partitionBy("cell")) so probes prune partitions.
    * Norms ride along so later exact scoring costs one dot per pair.
    */
  def assignCells(corpus: DataFrame, nCells: Int): DataFrame =
    assignCellsWith(corpus, sampleCodebook(corpus, nCells))

  private def assignCellsWith(corpus: DataFrame,
                              codebook: Array[(Int, Array[Float], Double)]): DataFrame = {
    val scores = cellScores(codebook) _
    corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"),
      array_max(scores(col("embedding"))).getField("cell").as("cell"))
  }

  /** IVF with the corpus BUCKETED AT REST: cell assignments are written
    * `partitionBy("cell")`, and each probe reads back through partition
    * pruning — the billion-scale serving layout, end to end. The probe
    * cell set is collected to literals (bounded by nCells, never by
    * corpus size) so the pruning is static and visible in the scan's
    * `PartitionFilters` (PlanSpec-pinned); scoring and the top-k
    * reduction are identical to [[ivfTopK]].
    */
  def ivfBucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      restDir: String, nCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val codebook = sampleCodebook(corpus, nCells)
    val scores = cellScores(codebook) _
    // Write-once, probe-many: the serving layout is only rewritten when
    // the corpus changed. The marker fingerprints (row count, xor of id
    // hashes, nCells) — an order-independent id-set digest, so content
    // swaps that keep the same cardinality still invalidate (embedding
    // payloads are assumed immutable per id, the content-addressed-
    // corpus contract; xor, not sum: never overflows under ANSI). The
    // codebook needs no fingerprint — it is a deterministic function of
    // the corpus (hash-ordered sample + Lloyd), so equal inputs imply
    // an equal layout.
    val fp = corpus.agg(count(lit(1)), expr("bit_xor(xxhash64(vec_id))")).collect()(0)
    graft.io.Sinks.writeOnce(restDir,
      s"rows=${fp.getLong(0)};ids=${fp.getLong(1)};nCells=$nCells") {
      assignCellsWith(corpus, codebook)
        .write.mode("overwrite").partitionBy("cell").parquet(restDir)
    }

    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"),
        explode(slice(reverse(array_sort(scores(col("embedding")))), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("sc.cell").as("cell"))
    val probeCells: Array[Int] = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted

    val atRest = corpus.sparkSession.read.parquet(restDir)
      .where(col("cell").isin(probeCells.map(Integer.valueOf).toSeq: _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    atRest.join(probed, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val codebook = sampleCodebook(corpus, nCells)
    val scores = cellScores(codebook) _

    // Corpus assignment: argmax cell score — zero-shuffle projection.
    val cells = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"),
      array_max(scores(col("embedding"))).getField("cell").as("cell"))

    // Every query probes its nProbe best cells — also a projection:
    // sort the nCells (score, cell) structs, slice the top, explode.
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"),
        explode(slice(reverse(array_sort(scores(col("embedding")))), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("sc.cell").as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    cells.join(probed, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Product quantization (PQ): split the embedding into `m` subspaces,
    * quantize each sub-vector against a per-subspace codebook of
    * `nCodes` centroids, and store only the m small codes per vector —
    * the classic billion-scale in-RAM layout (m bytes/vector instead of
    * dim×4). Scoring is ADC (asymmetric distance computation): each
    * QUERY precomputes one m×nCodes table of sub-dot-products (a tiny
    * projection), and each candidate costs m table lookups instead of a
    * dim-wide dot — per-pair work drops dim/m-fold.
    *
    * Codebooks are deterministic hash-order samples of the corpus
    * (same rationale as [[ivfTopK]]'s coarse quantizer: quantizers
    * train on samples at scale; the dictionary-sized result folds into
    * literal arrays, so both encode and table-build are zero-shuffle
    * codegen'd projections).
    */
  /** Per-subspace Lloyd-trained codebooks over the shared sample.
    * private[graft] so the randomized PQ differential (SimilaritySpec)
    * can re-derive every encoded code against the SAME books the
    * distributed path trained with.
    */
  private[graft] def pqCodebooks(corpus: DataFrame, m: Int, subDim: Int, nCodes: Int)
      : Array[Array[Array[Double]]] = {
    val sample = collectSample(corpus, math.max(nCodes * 32, 512))
    Array.tabulate(m)(s =>
      lloyd(sample.map(_.slice(s * subDim, (s + 1) * subDim)), nCodes, iters = 5))
  }

  import graft.expressions.{PqAdcScore, PqAdcTables, PqEncode, PqReconNorm}
  private def wrap(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** Encode the corpus: per subspace the argmin-L2 code, plus the
    * reconstructed norm for the cosine denominator. Zero-shuffle
    * projection via ONE native expression per output (the
    * compositional m×nCodes struct-argmin form exceeds janino's
    * method limits and silently de-optimizes the whole stage — see
    * graft.expressions.PqKernels).
    */
  def pqEncode(corpus: DataFrame, dim: Int = 64, m: Int = 16, nCodes: Int = 32): DataFrame = {
    val subDim = dim / m
    val books = pqCodebooks(corpus, m, subDim, nCodes)
    val cwNormSq = books.map(_.map(w => w.map(x => x * x).sum))
    corpus.select(col("vec_id"),
      wrap(PqEncode(exprOf(col("embedding")), books)).as("codes"))
      .withColumn("recon_nrm", wrap(PqReconNorm(exprOf(col("codes")), cwNormSq)))
  }

  /** PQ/ADC approximate top-k (recall-lossy; recall harness-gated).
    * Queries build per-row ADC lookup tables (one native expression)
    * and broadcast; each candidate costs m table lookups instead of a
    * dim-wide dot — all three kernels codegen as single calls.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, m: Int = 16, nCodes: Int = 32): DataFrame = {
    val subDim = dim / m
    val books = pqCodebooks(corpus, m, subDim, nCodes)
    val encoded = pqEncode(corpus, dim, m, nCodes)
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"),
      norm(col("embedding")).as("q_nrm"),
      wrap(PqAdcTables(exprOf(col("embedding")), books)).as("tables")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    encoded.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("score", round(
        // zero-norm contract: a zero query or zero-reconstructing code
        // word makes the cosine 0/0 — null score (ANSI aborts on /0)
        wrap(PqAdcScore(exprOf(col("tables")), exprOf(col("codes")), nCodes)) /
          nullif(col("q_nrm") * col("recon_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** IVF-PQ: the coarse quantizer prunes candidates to the query's
    * nProbe nearest cells, and ADC tables score ONLY those candidates —
    * the composition every billion-scale serving index ships (FAISS
    * IVFPQ): per-query work drops ~nCells/nProbe-fold from the cell
    * prune AND dim/m-fold from the table lookups, multiplicatively.
    * Corpus-side cell assignment and PQ encoding are one zero-shuffle
    * projection; the probe (queries × nProbe cells, with their ADC
    * tables) broadcasts; the only shuffle is the final per-query top-k.
    * Recall-lossy on both axes → recall-harness gated.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                dim: Int = 64, m: Int = 16, nCodes: Int = 32,
                nCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val cScores = cellScores(sampleCodebook(corpus, nCells)) _
    val subDim = dim / m
    val books = pqCodebooks(corpus, m, subDim, nCodes)
    val cwNormSq = books.map(_.map(w => w.map(x => x * x).sum))
    val encoded = corpus.select(col("vec_id"),
        wrap(PqEncode(exprOf(col("embedding")), books)).as("codes"),
        array_max(cScores(col("embedding"))).getField("cell").as("cell"))
      .withColumn("recon_nrm", wrap(PqReconNorm(exprOf(col("codes")), cwNormSq)))
    val probed = queries.select(
        col("vec_id").as("query_id"),
        norm(col("embedding")).as("q_nrm"),
        wrap(PqAdcTables(exprOf(col("embedding")), books)).as("tables"),
        explode(slice(reverse(array_sort(cScores(col("embedding")))), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("q_nrm"), col("tables"),
        col("sc").getField("cell").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    encoded.join(broadcast(probed), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(
        // zero-norm contract: a zero query or zero-reconstructing code
        // word makes the cosine 0/0 — null score (ANSI aborts on /0)
        wrap(PqAdcScore(exprOf(col("tables")), exprOf(col("codes")), nCodes)) /
          nullif(col("q_nrm") * col("recon_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Two-stage retrieval (the production serving shape): IVF-PQ ADC
    * produces a coarse candidate pool of k·`coarseMult` per query,
    * then the pool — and ONLY the pool — is re-scored with exact
    * float cosine and cut to k. At 100 TB the corpus is touched once
    * through the compressed index; exact vectors are fetched for
    * pool·|queries| rows only (an id equi-join against the vector
    * store). Because the rerank order is the SAME rounded-cosine +
    * id order the brute-force ground truth uses, every true top-k
    * member that survives to the pool is KEPT — per-query recall
    * dominates plain ADC ranking provably, which the
    * `rerank_dominates` contract asserts.
    */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      coarseMult: Int = 4): DataFrame = {
    require(coarseMult >= 1, s"coarseMult must be >= 1, got $coarseMult")
    exactRerank(ivfPqTopK(corpus, queries, k * coarseMult), corpus, queries, k)
  }

  /** Exact full-vector rerank of a candidate pool (query_id,
    * neighbor_id): fetch exact vectors for pool rows only (one id
    * equi-join against the vector store), score with the SAME
    * rounded-cosine + id order the brute-force ground truth uses,
    * cut to k. Shared by every two-stage retrieval shape (IVF-PQ,
    * Matryoshka prefix).
    */
  def exactRerank(pool: DataFrame, corpus: DataFrame, queries: DataFrame,
                  k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    pool.select(col("query_id"), col("neighbor_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"), norm(col("embedding")).as("c_nrm")),
        Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("c_emb")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Matryoshka-style prefix-dimension retrieval (MRL serving): the
    * coarse pass scores only the FIRST `prefixDim` coordinates — half
    * the storage bandwidth and FLOPs when embeddings are trained
    * nested — then [[exactRerank]] fixes the cut with full vectors.
    * Recall-lossy in stage 1 → recall-harness gated.
    */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     prefixDim: Int, coarseMult: Int = 4): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    def pref(df: DataFrame) =
      df.withColumn("embedding", slice(col("embedding"), 1, prefixDim))
    exactRerank(bruteForceTopK(pref(corpus), pref(queries), k * coarseMult),
      corpus, queries, k)
  }

  /** Recall/shape harness for an approximate top-k against the exact
    * brute-force result — the form that makes a recall-lossy index
    * oracle-checkable: the oracle asserts the INVARIANT (mean recall
    * over all queries ≥ floor; ranks are 1..n with non-increasing
    * scores), Spark computes the evidence. One row out.
    */
  def recallHarness(approx: DataFrame, brute: DataFrame,
                    minAvgRecall: Double): DataFrame = {
    val perQuery = brute.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("recall"))
    val shape = approx
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n"),
        max(col("rank")).as("max_rank"),
        count_distinct(col("rank")).as("n_ranks"),
        sort_array(collect_list(struct(col("rank"), col("score")))).as("rs"))
      .select(col("query_id"),
        (col("max_rank") === col("n") && col("n_ranks") === col("n") &&
          // single-row guard: sequence(1, 0) is the DESCENDING [1, 0]
          // and rs[1] throws under ANSI — one approx row is trivially
          // non-increasing, so short-circuit it.
          when(size(col("rs")) <= 1, lit(true)).otherwise(
            expr("forall(transform(sequence(1, size(rs) - 1)," +
              " i -> rs[i].score <= rs[i - 1].score), x -> x)"))).as("shape_ok"))
    perQuery.join(shape, Seq("query_id"), "left")
      .agg(
        count(lit(1)).as("n_queries"),
        (avg(col("recall")) >= minAvgRecall).as("recall_ok"),
        coalesce(bool_and(col("shape_ok")), lit(true)).as("ranks_ok"))
  }

  /** EXACT cosine-threshold self-pairs without a cartesian product.
    *
    * Angular banding: for any reference direction u the spherical
    * triangle inequality gives |angle(a,u) − angle(b,u)| ≤ angle(a,b),
    * so a qualifying pair (cos ≥ t ⟺ angle ≤ acos t) always lands in
    * the same or an adjacent band when bands are acos(t)-wide slices
    * of the angle to u. Two reference axes make a 2-D grid; the left
    * side explodes to its 3×3 neighborhood, the right side keeps its
    * home cell, and candidates come from a plain shuffle equi-join on
    * the cell key — partition-parallel, spill-safe, AQE-planned.
    *
    * Unlike LSH banding this is COMPLETE for any data distribution
    * (LSH at the low thresholds near-dup queries use has provably
    * unusable collision gaps — see DedupSpec's recall notes), so the
    * result is bit-identical to the all-pairs form and shares its
    * oracle. Pruning power scales with threshold height and data
    * clusteredness: uniform-random fixtures near the lowest usable
    * threshold degrade toward all-pairs COMPUTE (the qualifying-pair
    * output is itself Θ(ρn²) there — no exact method can beat its own
    * output size), but the PLAN never contains a CartesianProduct or
    * BroadcastNestedLoopJoin, and real near-dup corpora (clustered,
    * high t) prune hard.
    *
    * The band width uses a 1e-3 cos margin so pairs that only qualify
    * after round(cos, 4) still fall inside the guaranteed neighborhood.
    */
  def cosinePairsAbove(points: DataFrame, idCol: String, embCol: String,
                       minCos: Double): DataFrame = {
    require(minCos > -1.0 && minCos < 1.0)
    val theta = math.acos(math.max(-1.0, minCos - 1e-3))
    val nrm = norm(col(embCol))
    def band(axis: Int): Column = floor(acos(
      least(lit(1.0), greatest(lit(-1.0),
        element_at(col(embCol), axis + 1) / nullif(nrm, lit(0.0))))) / theta).cast("long")
    val base = points.select(col(idCol).as("id"), col(embCol).as("emb"),
      nrm.as("nrm"), band(0).as("b0"), band(1).as("b1"))
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val l = base.select(col("id").as("vec_a"), col("emb").as("e_a"), col("nrm").as("n_a"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("b0") + dx).as("b0"), (col("b1") + dy).as("b1"))
      }: _*)).as("cell"))
      .select(col("vec_a"), col("e_a"), col("n_a"),
        col("cell.b0").as("b0"), col("cell.b1").as("b1"))
    val r = base.select(col("b0"), col("b1"),
      col("id").as("vec_b"), col("emb").as("e_b"), col("nrm").as("n_b"))
    // b's single home cell appears exactly once in a's 3×3 neighborhood
    // and vec_a < vec_b kills the mirrored role — no dedup pass needed.
    l.join(r, Seq("b0", "b1"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(
        dot(col("e_a"), col("e_b")) / nullif(col("n_a") * col("n_b"), lit(0.0)), 4))
      .where(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Deterministic random projection to `outDim` dimensions: each
    * output coordinate is a ±1-weighted (Rademacher) combination of
    * the input, scaled by 1/√outDim — the Achlioptas construction of
    * the Johnson–Lindenstrauss transform. Weights derive from sin (the
    * same deterministic family as [[lshSignature]]) and fold into
    * LITERAL arrays, so projection is a zero-shuffle codegen'd
    * projection and any engine can rebuild the identical matrix. The
    * 4× dimension cut is the standard pre-step before brute-force or
    * IVF ANN when the dot product itself dominates.
    */
  def randomProject(emb: Column, dim: Int, outDim: Int): Column = {
    val ed = emb.cast("array<double>")
    val scale = 1.0 / math.sqrt(outDim)
    array((0 until outDim).map { p =>
      val weights = array((0 until dim).map(d =>
        lit(if (math.sin(1 + d + p * dim) >= 0) scale else -scale)): _*)
      dot(ed, weights)
    }: _*)
  }

  /** DuckDB twin of [[randomProject]] (same literal weight arrays). */
  def randomProjectSql(emb: String, dim: Int, outDim: Int): String = {
    val scale = 1.0 / math.sqrt(outDim)
    (0 until outDim).map { p =>
      val w = (0 until dim)
        .map(d => if (math.sin(1 + d + p * dim) >= 0) s"$scale" else s"-$scale")
        .mkString("[", ", ", "]")
      s"list_dot_product($emb::DOUBLE[], $w::DOUBLE[])"
    }.mkString("[", ", ", "]")
  }

  /** Multi-probe LSH ANN: each query probes its own signature bucket
    * PLUS the nBits buckets at hamming distance 1 (flip one
    * hyperplane bit) — the published multi-probe trick that buys
    * recall without more hash tables or a bigger corpus-side build.
    * Probe expansion is a (nBits+1)-way generate on the QUERY side
    * only; probe buckets are pairwise distinct, so the bucket join
    * needs no dedup and the corpus is hashed exactly once, as in
    * single-probe [[lshTopK]].
    */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        dim: Int = 64, nBits: Int = 8): DataFrame = {
    val sig = (df: DataFrame) =>
      df.withColumn("sig", lshSignature(col("embedding"), dim, nBits))
    val q = sig(queries).select(col("sig").as("qsig"),
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        explode(array((lit(0L) +: (0 until nBits).map(b => lit(1L << b))): _*))
          .as("flip"),
        col("qsig"))
      .withColumn("sig", col("qsig").bitwiseXOR(col("flip")))
      .drop("qsig", "flip")
    val c = sig(corpus).withColumn("c_nrm", norm(col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    c.join(q, Seq("sig"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** LSH-bucketed ANN: exact cosine top-k within matching signature
    * buckets only. Trades recall for a bucket-local join — the scale
    * path when queries are too many to broadcast-score the corpus.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, nBits: Int = 8): DataFrame = {
    val sig = (df: DataFrame) => df.withColumn("sig", lshSignature(col("embedding"), dim, nBits))
    val q = sig(queries).select(col("sig"),
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"))
    val c = sig(corpus).withColumn("c_nrm", norm(col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    c.join(q, Seq("sig"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) / nullif(col("q_nrm") * col("c_nrm"), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }
}
