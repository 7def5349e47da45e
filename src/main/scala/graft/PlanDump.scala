package graft
import org.apache.spark.sql.SparkSession

/** Maintenance utility: print the AQE-final physical plan of named
  * SparkEntry queries (docs/PLANS.md is generated from this output).
  * Usage: runMain graft.PlanDump <sfDir> <name> [name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan.execute().count() // finalize AQE on THIS instance
      println(s"\n===== $name =====")
      println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
