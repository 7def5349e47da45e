package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Full-text retrieval scoring over a document corpus — the ranking
  * stage a curation pipeline runs to pull topical subsets out of a
  * crawl (and the textbook relevance baseline: Okapi BM25, Robertson
  * et al., TREC-3).
  *
  * Scale shape: two corpus passes. Document lengths are a zero-shuffle
  * projection, the corpus stats (N, avgdl) one bounded 1-row
  * aggregate; the scoring pass explodes words
  * with the query-term filter directly on the exploded stream, so the
  * tf aggregation shuffles only (doc, query-term) rows — candidate
  * volume, not corpus volume. df is an aggregation over the
  * already-tiny tf table; query terms, df, and stats broadcast. The
  * final top-k per query is the row_number pattern the TopKPerKey
  * physical operator rewrites to bounded heaps (≤ k rows per query
  * per partition move).
  *
  * Engine-exact determinism: per-term score contributions are rounded
  * to fixed-point 1e-6 integers BEFORE the per-document sum, so the
  * total is an order-invariant integer sum and the (score, doc_id)
  * ranking is bit-identical across engines — no float-summation-order
  * hazard (see docs: oracle fixed-point rule).
  */
object Retrieval {

  /** Top-k documents per query by BM25. `queries` is (query_id, term)
    * pairs — multi-term queries repeat the id. Returns
    * (query_id, rn, doc_id, score_x1e6).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // Document length is a PROJECTION (no explode, no shuffle); the
    // corpus statistics (N, avgdl) are a 1-row aggregate broadcast
    // back in-plan — no driver scalar jobs, two corpus passes total
    // (stats + scoring).
    val dl = docs.select(col(idCol).as("doc_id"),
      size(F.filter(split(col(textCol), " "), w => w =!= lit("")))
        .cast("long").as("dl"))
    // Corpus statistics: ONE bounded 1-row collect (the legitimate
    // pattern — at lake scale these come from table statistics), then
    // folded into the scoring expression as literals so the whole
    // contribution stays inside whole-stage codegen. An in-plan 1-row
    // broadcast would plan a BroadcastNestedLoopJoin (any constant
    // equi-key constant-folds away) and break the no-BNLJ invariant.
    val statsRow = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
    val n = statsRow.getLong(0)
    // loud guard, not an NPE: sum over zero rows is null, and n = 0
    // would poison avgdl with a division by zero
    require(n > 0, "bm25TopK over an empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / n

    val terms = queries.map(_._2).distinct
    val q = queries.toDF("query_id", "term")
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .where(col("word").isin(terms: _*))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("word").agg(count(lit(1)).as("df"))

    // Contribution of one term to one doc's score, fixed-point 1e-6.
    // Expression tree mirrors the oracle SQL token-for-token: left-to-
    // right products, (1-b) and (k1+1) folded to literals, avgdl the
    // same division of the same two integer operands in both engines.
    val contrib = F.round(
      log((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
        col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))) *
        lit(1000000.0), 0).cast("long")

    val scored = tf
      .join(broadcast(dfTbl), Seq("word"))
      .join(dl, Seq("doc_id"))
      .join(broadcast(q), col("word") === col("term"))
      .withColumn("c", contrib)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score_x1e6"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_x1e6").desc, col("doc_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id").cast("long").as("query_id"),
        col("rn").cast("long").as("rn"), col("doc_id"), col("score_x1e6"))
  }

  /** DuckDB twin of [[bm25TopK]], generated from the same parameters so
    * the term list, constants, and expression order cannot drift.
    */
  def bm25OracleSql(queries: Seq[(Int, String)], k: Int = 5,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val values = queries.map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val inList = queries.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
       |), wc AS (
       |  SELECT doc_id, word FROM w WHERE word <> ''
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM wc GROUP BY 1
       |), st AS (
       |  SELECT (SELECT count(*) FROM documents) AS n,
       |         (SELECT sum(dl) FROM dl)::DOUBLE /
       |           (SELECT count(*) FROM documents) AS avgdl
       |), q(query_id, term) AS (VALUES $values),
       |tf AS (
       |  SELECT doc_id, word, count(*) AS tf FROM wc
       |  WHERE word IN ($inList) GROUP BY 1, 2
       |), dfp AS (
       |  SELECT word, count(*) AS df FROM tf GROUP BY 1
       |), c AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST(round(ln((st.n - dfp.df + 0.5) / (dfp.df + 0.5) + 1.0) *
       |      tf.tf * ${k1 + 1.0} /
       |      (tf.tf + $k1 * (${1.0 - b} + $b * dl.dl / st.avgdl)) *
       |      1000000.0) AS BIGINT) AS c
       |  FROM tf JOIN dfp USING (word) JOIN dl USING (doc_id)
       |  JOIN q ON q.term = tf.word CROSS JOIN st
       |), s AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_x1e6
       |  FROM c GROUP BY 1, 2
       |)
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rn AS BIGINT) AS rn,
       |  doc_id, score_x1e6
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY query_id
       |        ORDER BY score_x1e6 DESC, doc_id ASC) AS rn
       |      FROM s)
       |WHERE rn <= $k""".stripMargin
  }
}
