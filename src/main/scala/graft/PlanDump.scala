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
    // SPARK_GRAFT_PLAN_OUT=<dir>[:<suffix>]: additionally write each
    // query's explain("formatted") output to <dir>/<name><suffix>.txt
    // (the plans/r{N}/ optimization-round evidence files). The AQE
    // final plan is captured by explaining AFTER execution.
    val outSpec = sys.env.get("SPARK_GRAFT_PLAN_OUT").map { s =>
      s.split(":") match {
        case Array(d, suf) => (d, suf)
        case Array(d)      => (d, "")
      }
    }
    outSpec.foreach { case (d, _) =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)) }
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan.execute().count() // finalize AQE on THIS instance
      println(s"\n===== $name =====")
      println(qe.executedPlan.toString)
      outSpec.foreach { case (dir, suffix) =>
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"$name$suffix.txt"), formatted)
      }
    }
    spark.stop()
  }
}
