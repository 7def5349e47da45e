package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local-mode sessions are tuned for the test harness (local[32],
  * 128 GiB box) but every conf here is chosen to also make sense on a
  * large cluster: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized to cores (not the 200 default), UTC session
  * time zone (the reference pins per-row timezones explicitly — see
  * reference src/spark/collector.py:361-366).
  */
object GraftSession {

  /** Shared engine confs, applied to any builder (local or cluster). */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no type
      // for; read as long and normalize in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // graft's native Catalyst expressions (token_fingerprint, ...)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // saveAsTable targets (bucketed at-rest layouts) land in tmp, not
      // the working directory; on a cluster the deployment overrides
      // this with the real warehouse root.
      .config("spark.sql.warehouse.dir",
        new java.io.File(sys.props("java.io.tmpdir"), "graft_warehouse").toString)
      .config("spark.ui.enabled", "false")

  /** Cluster session: no master set here — spark-submit / the cluster
    * manager provides it (YARN, k8s, standalone). Shuffle partitions
    * default to a cluster-appropriate width; AQE coalesces down at
    * runtime, so oversizing is the safe direction. All other engine
    * confs are identical to local mode — the plans the tests pin are
    * the plans a cluster runs.
    */
  def cluster(appName: String, shufflePartitions: Int = 512): SparkSession =
    tuned(SparkSession.builder().appName(appName), shufflePartitions)
      .getOrCreate()

  /** Local session for tests / bench. One JVM, `cores` task threads. */
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = tuned(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(
      math.max(2, Runtime.getRuntime.availableProcessors()))

  /** Lineage truncation for iterative operators (PageRank rounds,
    * component pointer-jumping, k-core peeling, …).
    *
    * `localCheckpoint` stores blocks on EXECUTOR-LOCAL storage: fast,
    * zero-config, but under executor loss or dynamic allocation the
    * job fails unrecoverably instead of recomputing. On a long cluster
    * run, set a checkpoint dir (`sc.setCheckpointDir(...)`) and every
    * operator here upgrades to a RELIABLE checkpoint automatically —
    * same truncation semantics, blocks in fault-tolerant storage.
    * Results are identical either way; only failure behavior changes.
    */
  def truncate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** `df.truncateLineage()` sugar for [[truncate]]. */
  implicit class LineageOps(private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
    def truncateLineage(): org.apache.spark.sql.DataFrame = truncate(df)
  }
}
