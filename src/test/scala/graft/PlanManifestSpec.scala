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

  import org.apache.spark.sql.execution._
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
  import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

  /** Whole-tree traversal that descends through the AQE wrapper
    * (AdaptiveSparkPlanExec is a LEAF node; its initial plan hangs off
    * a field, not `children`).
    */
  private def descend(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case other => other.children
    }
    p +: kids.flatMap(descend)
  }

  /** A BNLJ build side is BOUNDED when its subtree carries a
    * cardinality witness: a literal in-memory relation
    * (LocalTableScan — banding dims, probe vectors), an explicit
    * limit/top-k, a literal range, or an aggregation (output bounded
    * by its distinct grouping keys — every shipping case is a bounded
    * codebook/entity aggregate behind a measured-cardinality gate,
    * e.g. PairStrategy's 200k-entity probe). A build side that is a
    * RAW SCAN with none of these is the accidental unbounded nested
    * loop this assertion exists to catch (verdict r13 task 4) — the
    * manifest's bnlj COUNT can't tell the two apart, so this checks
    * the actual subtree, not the fingerprint.
    *
    * Known limitation, documented deliberately: a grouped aggregate
    * over a corpus-scale key (e.g. doc_id) would pass the witness.
    * The witness is structural, not cardinality-proving; the per-query
    * plan comments + PlanSpec's hand pins carry the cardinality
    * arguments.
    */
  private def boundedBuildSide(sub: SparkPlan): Boolean =
    descend(sub).exists {
      case _: LocalTableScanExec => true
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _: RangeExec => true
      case _: BaseAggregateExec => true
      case _ => false
    }

  /** Queries whose BNLJ build side is the ANN QUERY BATCH — the
    * fixture derives it as `vec_id % QueryMod = 0` (a Filter over the
    * embeddings scan, no structural bound), but the production
    * equivalent is a bounded probe batch arriving from serving, and
    * the scale argument lives in docs/SCALE.md's ANN sections. Listed
    * HERE, by name, so adding a new unbounded BNLJ requires editing
    * this spec in a reviewed diff — a regenerated manifest cannot
    * bless it.
    */
  private val broadcastProbeBatch: Set[String] = Set(
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_ivf_bucketed",
    "ann_ivfpq_topk", "ann_ivfpq_rerank", "ann_pq_topk",
    "ann_matryoshka_topk", "ann_maxsim_topk", "ann_aggregator_topk")

  private def bnljViolations(p: SparkPlan): Seq[String] =
    descend(p).collect {
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        build
    }.filterNot(boundedBuildSide)
      .map(b => b.getClass.getSimpleName + ": " +
        b.toString.linesIterator.take(3).mkString(" | ").take(200))

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
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          (name, fingerprint(plan.toString), bnljViolations(plan))
        } catch { case e: Throwable =>
          throw new RuntimeException(s"building $name: ${e.getMessage}", e)
        }
      }
    }
    val results =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown() // a failed build must not strand threads
    val got: Map[String, Seq[Int]] =
      results.map { case (n, fp, _) => n -> fp }.toMap

    // structural, regen-proof: EVERY BNLJ build side must carry a
    // boundedness witness — a regenerated manifest can bless a new
    // bnlj COUNT, but it cannot bless an unbounded nested loop
    val unbounded = results.collect {
      case (n, _, v) if v.nonEmpty && !broadcastProbeBatch.contains(n) =>
        s"$n: ${v.mkString("; ")}"
    }
    assert(unbounded.isEmpty,
      s"""BNLJ with no bounded build-side witness (accidental nested loop?):
         |${unbounded.mkString("\n")}""".stripMargin)

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
