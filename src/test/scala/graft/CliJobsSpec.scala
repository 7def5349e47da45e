package graft

import java.nio.file.Files

import graft.cli.Main
import graft.io.Sinks

/** End-to-end: every CLI-registered datamart job runs and lands a
  * readable parquet datamart (the graft.cli.Main path minus the
  * process-level session lifecycle, which IoSpec's sink tests plus the
  * driver's own runs cover).
  */
class CliJobsSpec extends SparkSpec {

  test("all registered jobs write non-empty readable datamarts") {
    val out = Files.createTempDirectory("graft-cli").toString
    Main.jobs.foreach { case (name, job) =>
      val path = s"$out/$name"
      val overwrote = Sinks.writeDatamart(job(spark, sfDir), path)
      assert(!overwrote, s"$name: fresh path must not trigger fallback")
      val back = spark.read.parquet(path)
      assert(back.count() > 0, s"$name produced no rows")
      assert(back.columns.nonEmpty)
    }
  }
}
