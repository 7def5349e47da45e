package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphRank

class GraphRankSpec extends SparkSpec {

  test("symmetric ring: all nodes converge to equal rank") {
    import spark.implicits._
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val edges = ring.unionByName(ring.select(col("b").as("a"), col("a").as("b")))
    val ranks = GraphRank.pageRank(edges, "a", "b", iters = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(ranks.size === 3)
    assert(ranks.distinct.size === 1, s"ring ranks must be equal, got $ranks")
  }

  test("star graph: the hub outranks every leaf; mass is conserved up to div truncation") {
    import spark.implicits._
    val spokes = (1L to 10L).map(i => (0L, i)).toDF("a", "b")
    val edges = spokes.unionByName(spokes.select(col("b").as("a"), col("a").as("b")))
    val ranks = GraphRank.pageRank(edges, "a", "b", iters = 5)
    val hub = ranks.where(col("node") === 0L).head().getLong(1)
    val maxLeaf = ranks.where(col("node") =!= 0L)
      .agg(max(col("rank"))).head().getLong(0)
    assert(hub > maxLeaf)
    // no dangling nodes in a symmetrized graph: total mass stays
    // within integer-truncation distance of 1.0
    val total = ranks.agg(sum(col("rank"))).head().getLong(0)
    assert(total <= GraphRank.Scale)
    assert(total >= GraphRank.Scale - 10000000L,
      s"lost more than truncation can explain: $total")
  }

  test("guards: iteration bounds and empty graph rejected") {
    import spark.implicits._
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(e, "a", "b", iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(e.where(lit(false)), "a", "b", iters = 3)
    }
  }
}
