package graft

/** Maintenance utility: print the AQE-final physical plan of named
  * SparkEntry queries (docs/PLANS.md is generated from this output).
  * Uses the same GraftSession confs as tests and Bench so the dumped
  * plans are the plans the engine actually runs (join thresholds
  * included). Usage: runMain graft.PlanDump <sfDir> <name> [name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.local("graft-plandump",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
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
