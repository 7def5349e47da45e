package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("dm_users_demographic")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++
      JoinQueries.queries ++ AggWindowQueries.queries ++
      ParityQueries.queries ++ TextQueries.queries ++ VectorQueries.queries ++
      MultimodalQueries.queries ++ StreamingQueries.queries ++
      TpchQueries.queries ++ LakehouseQueries.queries ++ SamplingQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every oracle reference to the embeddings table is rewritten to
    * read through the admissibility predicate mirroring the engine's
    * [[graft.core.Tables.embeddings]] quarantine — the oracle runs on
    * raw parquet views, so without the rewrite a quarantined row
    * (null / off-dimension / non-finite vector) would appear on the
    * DuckDB side only. Centralized here so a future vector oracle
    * can't forget the mirror.
    */
  def oracleSql: Map[String, String] =
    (CoreQueries.oracles ++ RelationalQueries.oracles ++
      JoinQueries.oracles ++ AggWindowQueries.oracles ++
      ParityQueries.oracles ++ TextQueries.oracles ++ VectorQueries.oracles ++
      MultimodalQueries.oracles ++ StreamingQueries.oracles ++
      TpchQueries.oracles ++ LakehouseQueries.oracles ++ SamplingQueries.oracles)
      .view.mapValues(mirrorEmbeddingsQuarantine).toMap

  private def mirrorEmbeddingsQuarantine(sql: String): String = {
    val sub = s"(SELECT * FROM embeddings WHERE ${graft.core.Tables.embeddingsAdmissibleSql})"
    // the one aliased read keeps its own alias; bare reads keep the
    // table name as the subquery alias so column references resolve
    sql.replace("FROM embeddings e ", s"FROM $sub e ")
      .replace("FROM embeddings", s"FROM $sub embeddings")
  }
}
