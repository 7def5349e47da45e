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
    dot(a, b) / (norm(a) * norm(b))

  /** DuckDB twin of [[cosine]] (embedding lists cast to DOUBLE[]). */
  def cosineSql(a: String, b: String): String =
    s"(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))))"

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
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6))
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
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6))
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
    * The codebook is a deterministic pseudo-random SAMPLE of the corpus
    * (order by hash of id, take nCells) — how large-scale IVF trains in
    * practice (quantizers fit on samples, not the full corpus), and the
    * dictionary-sized result is folded into LITERAL arrays so cell
    * assignment is a pure broadcast-free projection over native dots,
    * exactly like the nearest-city argmin kernel. A k-means refinement
    * of the sampled codebook would raise recall slightly but costs an
    * iterative fit that dwarfs the search itself at bench scale.
    *
    * Cell ranking uses dot(q, centroid)/|centroid| — equivalent to
    * cosine for ranking because |q| is a common positive factor.
    */
  /** Deterministic sampled codebook: nCells corpus vectors by hash
    * order, with precomputed norms. Dictionary-sized driver collect.
    */
  private def sampleCodebook(corpus: DataFrame, nCells: Int): Array[(Int, Array[Float], Double)] =
    corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        val emb = r.getSeq[Float](1).toArray
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
  def assignCells(corpus: DataFrame, nCells: Int): DataFrame = {
    val scores = cellScores(sampleCodebook(corpus, nCells)) _
    corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"),
      array_max(scores(col("embedding"))).getField("cell").as("cell"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
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
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6))
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
  private def pqCodebooks(corpus: DataFrame, m: Int, subDim: Int, nCodes: Int)
      : Array[Array[Array[Double]]] = {
    val sample = sampleCodebook(corpus, nCodes)
    Array.tabulate(m)(s =>
      sample.map(_._2.slice(s * subDim, (s + 1) * subDim).map(_.toDouble)))
  }

  private def subVec(emb: Column, s: Int, subDim: Int): Column =
    slice(emb, s * subDim + 1, subDim).cast("array<double>")

  /** Encode the corpus: per subspace the argmin-L2 code, plus the
    * reconstructed norm for the cosine denominator. Zero-shuffle
    * projection; the encoded frame is what a PQ index stores at rest.
    * ||x_s − c||² ranks as (|c|² − 2·x_s·c) — |x_s|² is constant per row.
    */
  def pqEncode(corpus: DataFrame, dim: Int = 64, m: Int = 16, nCodes: Int = 16): DataFrame = {
    val subDim = dim / m
    val books = pqCodebooks(corpus, m, subDim, nCodes)
    val cwNormSq = books.map(_.map(w => w.map(x => x * x).sum))
    val codeCols = (0 until m).map { s =>
      array_min(array((0 until nCodes).map { c =>
        struct(
          (lit(cwNormSq(s)(c)) - lit(2.0) * dot(subVec(col("embedding"), s, subDim),
            typedLit(books(s)(c)))).as("d"),
          lit(c).as("code"))
      }: _*)).getField("code").as(s"c$s")
    }
    val reconNormSq = (0 until m).map(s =>
      element_at(typedLit(cwNormSq(s).toSeq), col(s"c$s") + 1))
      .reduce(_ + _)
    corpus.select(col("vec_id") +: codeCols: _*)
      .withColumn("recon_nrm", sqrt(reconNormSq))
  }

  /** PQ/ADC approximate top-k (recall-lossy; recall spec-gated).
    * Queries build literal-codebook lookup tables and broadcast; the
    * encoded corpus is scored by m element_at lookups per pair.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, m: Int = 16, nCodes: Int = 16): DataFrame = {
    val subDim = dim / m
    val books = pqCodebooks(corpus, m, subDim, nCodes)
    val encoded = pqEncode(corpus, dim, m, nCodes)
    val tableCols = (0 until m).map { s =>
      array((0 until nCodes).map(c =>
        dot(subVec(col("embedding"), s, subDim), typedLit(books(s)(c)))): _*).as(s"t$s")
    }
    val q = broadcast(queries.select(
      col("vec_id").as("query_id") +: norm(col("embedding")).as("q_nrm") +: tableCols: _*))
    val approxDot = (0 until m).map(s =>
      element_at(col(s"t$s"), col(s"c$s") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    encoded.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("score", round(approxDot / (col("q_nrm") * col("recon_nrm")), 6))
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
        round(dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), round(col("score"), 4).as("score"))
  }
}
