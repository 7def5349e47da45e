package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Plan-shape regression manifest over the ENTIRE query inventory.
  *
  * PlanSpec pins ~30 load-bearing plans by hand; this spec fingerprints
  * every registered query's physical plan (exchange counts, join
  * strategy counts, cartesian/BNLJ counts, parquet scan count) and
  * diffs against the committed `docs/PLAN_MANIFEST.tsv` — so ANY
  * future plan regression (a lost broadcast, a new shuffle, a join
  * degenerating to nested-loop) fails a test instead of surfacing as
  * a bench anomaly three rounds later.
  *
  * Fingerprints read the STATIC plan (`executedPlan.toString` before
  * any action — under AQE that is the initial plan, which is exactly
  * the shape planning-time regressions land in; AQE can only improve
  * it at runtime). Query CONSTRUCTION may run its usual bounded
  * actions (codebook fits, stream drains), the same ones Verify runs
  * at this scale factor.
  *
  * Regenerate after an INTENTIONAL plan change:
  *   SPARK_GRAFT_REGEN_PLAN_MANIFEST=1 sbt "testOnly graft.PlanManifestSpec"
  * then review the manifest diff like any other code change.
  */
class PlanManifestSpec extends SparkSpec {

  private val manifestPath = "docs/PLAN_MANIFEST.tsv"

  private val fields: Seq[(String, String)] = Seq(
    "xh" -> "Exchange hashpartitioning",
    "xr" -> "Exchange rangepartitioning",
    "xs" -> "Exchange SinglePartition",
    "bhj" -> "BroadcastHashJoin",
    "smj" -> "SortMergeJoin",
    "shj" -> "ShuffledHashJoin",
    "bnlj" -> "BroadcastNestedLoopJoin",
    "cart" -> "CartesianProduct",
    "scan" -> "Scan parquet")

  private def fingerprint(plan: String): Seq[Int] =
    fields.map { case (_, tok) => tok.r.findAllIn(plan).size }

  private def render(name: String, fp: Seq[Int]): String =
    (name +: fp.map(_.toString)).mkString("\t")

  test("physical plan shapes match the committed manifest for every query") {
    val regen = sys.env.get("SPARK_GRAFT_REGEN_PLAN_MANIFEST").contains("1")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try name -> fingerprint(
          fn(spark, sfDir).queryExecution.executedPlan.toString)
        catch { case e: Throwable =>
          throw new RuntimeException(s"building $name: ${e.getMessage}", e)
        }
      }
    }
    val got: Map[String, Seq[Int]] =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).toMap
      finally pool.shutdown() // a failed build must not strand threads

    if (regen) {
      val header = Seq(
        "# Physical-plan fingerprints per registered query at sf0.001.",
        "# Columns: query\t" + fields.map(_._1).mkString("\t"),
        "# Regenerate: SPARK_GRAFT_REGEN_PLAN_MANIFEST=1 sbt \"testOnly graft.PlanManifestSpec\"")
      val body = got.toSeq.sortBy(_._1).map { case (n, fp) => render(n, fp) }
      Files.write(Paths.get(manifestPath), (header ++ body).asJava)
      info(s"wrote ${got.size} fingerprints to $manifestPath")
    } else {
      assert(Files.exists(Paths.get(manifestPath)),
        s"$manifestPath missing — regenerate (see scaladoc)")
      val want: Map[String, Seq[Int]] = Files.readAllLines(Paths.get(manifestPath))
        .asScala.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
        .map { l =>
          val parts = l.split("\t")
          parts.head -> parts.tail.map(_.toInt).toSeq
        }.toMap
      val missing = got.keySet -- want.keySet
      val stale = want.keySet -- got.keySet
      val drifted = (got.keySet & want.keySet).toSeq.sorted.flatMap { n =>
        if (got(n) == want(n)) None
        else Some {
          val diffs = fields.map(_._1).zip(want(n).zip(got(n)))
            .collect { case (f, (w, g)) if w != g => s"$f $w->$g" }
          s"$n: ${diffs.mkString(", ")}"
        }
      }
      val problems =
        missing.toSeq.sorted.map(n => s"$n: not in manifest (new query)") ++
          stale.toSeq.sorted.map(n => s"$n: in manifest but not registered") ++
          drifted
      assert(problems.isEmpty,
        s"""plan manifest drift (${problems.size} queries) — if intentional,
           |regenerate with SPARK_GRAFT_REGEN_PLAN_MANIFEST=1 and review the diff:
           |${problems.mkString("\n")}""".stripMargin)
    }
  }
}
