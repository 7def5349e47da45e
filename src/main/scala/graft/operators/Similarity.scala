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

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into cells; each query exactly-scores only its `nProbe`
    * nearest cells. The classic billion-scale layout: the corpus is
    * clustered ONCE (and would be written bucketed-by-cell at rest),
    * per-query work drops by ~nCells/nProbe, and recall is tunable via
    * nProbe. Deterministic under the fixed seed.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // Random init + few iterations: the coarse quantizer only has to
    // spread the corpus across cells, not converge — k-means|| init
    // alone costs more passes than the whole fit needs here.
    val featured = corpus.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("features").fit(featured)
    val cells = model.transform(featured)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    // Every query probes its nProbe nearest centroids (centroid table
    // is tiny: nCells rows, broadcast as a literal array).
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("q_emb"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("cell").asc)))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    cells.join(probed, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(dot(col("q_emb"), col("embedding")) /
          (norm(col("q_emb")) * norm(col("embedding"))), 6))
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
