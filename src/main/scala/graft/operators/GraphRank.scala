package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-arithmetic PageRank — link-quality weighting for corpus
  * curation (rank citation/hyperlink graphs to prioritize or weight
  * sources), the iterative-analytics twin of
  * [[Dedup.connectedComponents]].
  *
  * All rank mass is carried as a fixed-point BIGINT (`scale` = 1.0):
  * per-edge contribution is `rank div out_degree`, the damped update
  * is `(15·r0) div 100 + (85·Σcontrib) div 100` — every step integral,
  * so any engine that mirrors the iteration structure reproduces the
  * ranks BIT FOR BIT (the DuckDB oracle unrolls the same k rounds as
  * chained CTEs). Truncation loses ≤1 unit of 1e-12 mass per edge per
  * round — noise for ranking, determinism for the gate.
  *
  * Scale: the classic Pregel-lite shape — k rounds × (edge⋈rank join
  * + dst-keyed sum). The edge+degree table materializes once
  * (localCheckpoint) and every round joins against it; ranks stay
  * node-cardinality. Driver loops over ROUNDS, never rows. Dangling
  * nodes keep the base term only (their mass is not redistributed —
  * the variant is mirrored exactly in the oracle).
  */
object GraphRank {

  val Scale = 1000000000000L // 1.0 in fixed point

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be 1..50, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // pre-partition both loop-invariant sides by their join keys ONCE:
    // every round's src-join then moves only the (node-cardinality)
    // rank table, and the final node-join reuses the agg's own
    // node-partitioning — the edge table never re-shuffles.
    val eDeg = e.join(deg, "src").repartition(col("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("rank"))
    var iter = 0
    while (iter < iters) {
      val contribs = eDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      // checkpoint PERIODICALLY, not per round: the per-round plan is
      // shallow (one join + one agg), so a few stacked rounds replan
      // cheaply, while an eager materialization every round costs more
      // than it saves. Deep iteration counts still truncate lineage.
      if ((iter + 1) % 4 == 0 && iter + 1 < iters)
        ranks = ranks.localCheckpoint(true)
      iter += 1
    }
    ranks
  }
}
