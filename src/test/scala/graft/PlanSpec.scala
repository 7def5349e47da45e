package graft

import org.apache.spark.sql.DataFrame
import graft.queries.{JoinQueries, RelationalQueries}

/** Physical-plan shape assertions: the scale-design claims (pushdown,
  * shuffle counts, broadcast strategy) are load-bearing, so they are
  * pinned by tests, not just documented.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def count(p: String, needle: String): Int = needle.r.findAllIn(p).size

  test("filter-pushed scan: predicates reach the parquet reader") {
    val p = plan(RelationalQueries.queries("s1_pruned_scan")(spark, sfDir))
    assert(p.contains("PushedFilters: ["), p.take(800))
    assert(p.contains("In(event_type"), p.take(800))
  }

  test("projection pruning: q1 scan reads only the needed columns") {
    val df = graft.queries.CoreQueries.queries("q1_agg")(spark, sfDir)
    val p = plan(df)
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"), read)
    assert(!read.contains("l_shipdate") && !read.contains("l_orderkey"), read)
  }

  test("geo argmin scale form is a pure projection — zero shuffles") {
    val p = plan(JoinQueries.queries("geo_nearest_city_minby")(spark, sfDir))
    assert(count(p, "Exchange hashpartitioning") === 0, p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("users-demographic datamart shuffles events exactly once") {
    val p = plan(graft.jobs.UsersDemographicJob.run(spark, sfDir))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1200))
    assert(count(p, "Scan parquet") === 1)
  }

  test("round-11 batch plans: equi-join only — walks, link prediction, dup-span removal, index, baskets") {
    // wedge/adjacency/gram/basket joins must all hash on keys; any
    // nested-loop here degenerates quadratic at corpus scale
    for (name <- Seq("graph_random_walks", "graph_link_prediction",
        "basket_association_rules")) {
      val p = plan(JoinQueries.queries(name)(spark, sfDir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: ${p.take(1200)}")
    }
    for (name <- Seq("text_dup_span_removal", "text_inverted_index")) {
      val p = plan(graft.queries.TextQueries.queries(name)(spark, sfDir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: ${p.take(1200)}")
    }
  }

  test("graph triangle/k-core queries stay equi-join only — no cartesian, no nested loop") {
    // the wedge-closing join and every peel-round semi-join must hash
    // on keys; a nested-loop anywhere here is quadratic death at scale
    for (name <- Seq("graph_triangles", "graph_kcore")) {
      val p = plan(JoinQueries.queries(name)(spark, sfDir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: ${p.take(1200)}")
    }
  }

  test("dimension joins broadcast instead of shuffling") {
    val p = plan(JoinQueries.queries("j2_left_join")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("j5 pair generation shuffles only the per-user aggregation, never the pairs") {
    val p = plan(JoinQueries.queries("j5_self_join_pairs")(spark, sfDir))
    // one exchange per side's type-set agg; the quadratic pair stream
    // itself flows through the broadcast theta join with no shuffle.
    assert(count(p, "Exchange hashpartitioning") <= 2, p.take(1200))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"))
  }

  test("cosine pair generation is a banded equi-join — no cartesian product") {
    val p = plan(graft.queries.VectorQueries.queries("dedup_embedding_cosine")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    val px = plan(graft.queries.VectorQueries.queries("xmodal_dup_agreement")(spark, sfDir))
    assert(!px.contains("CartesianProduct") && !px.contains("BroadcastNestedLoopJoin"),
      px.take(1500))
  }

  test("friend-recs candidate generation is geo-blocked — no theta join") {
    val p = plan(graft.jobs.FriendRecsJob.run(spark, sfDir))
    // pair generation must be the grid-cell equi-join, never an
    // unbounded broadcast theta join or cartesian
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(count(p, "Exchange hashpartitioning") <= 6, p.take(1500))
  }

  test("IVF cell assignment and probing are projections — only the top-k shuffles") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val p = plan(graft.operators.Similarity.ivfTopK(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") % 200 === 0), 5))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1200))
  }

  test("ivf bucketed-at-rest probe scan prunes partitions") {
    val df = graft.queries.VectorQueries.queries("ann_ivf_bucketed")(spark, sfDir)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize AQE on THIS instance
    val p = qe.executedPlan.toString
    // the at-rest read must carry the probe cells as PARTITION filters
    // (directory pruning), not data filters
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(p)
    assert(pf.isDefined, p.take(1500))
    assert(pf.get.contains("IN") || pf.get.contains("isnotnull"), pf.get)
  }

  test("sampling, splitting, and z-order keys are zero-shuffle projections") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sfDir)
    val split = plan(ev.select(col("event_id"),
      graft.operators.Sampling.splitLabel(col("event_id"),
        Seq("train" -> 800, "val" -> 200))))
    assert(!split.contains("Exchange"), split.take(800))
    val z = plan(ev.select(col("event_id"),
      graft.operators.Layout.zorderKey(
        pmod(col("event_id"), lit(65536L)), pmod(col("user_id"), lit(65536L)))))
    assert(!z.contains("Exchange"), z.take(800))
  }

  test("q21 window rewrite shuffles the fact exactly once, dims broadcast") {
    val p = plan(graft.queries.TpchQueries.queries("tpch_q21_window")(spark, sfDir))
    // one FULL-DATA hash exchange (the per-order window) plus one
    // output-cardinality exchange (per-supplier count); supplier
    // broadcast; no fact self-join (the EXISTS form plans two extra)
    assert(count(p, "Exchange hashpartitioning") === 2, p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("PQ encode and ADC scoring stay inside whole-stage codegen") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val df = graft.operators.Similarity.pqEncode(emb)
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val p = qe.executedPlan.toString
    // the native-kernel form codegens (the old compositional form blew
    // janino's limits and fell back to interpreted evaluation)
    assert(p.contains("*(1)"), p.take(800))
    assert(!p.contains("Exchange"), p.take(800))
  }

  test("contamination check broadcasts bench digests — corpus grams never shuffle") {
    val p = plan(graft.queries.TextQueries.queries("text_contamination")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    // the only hash exchange is the matched-pair aggregation; gram
    // volume reaches the join via broadcast + the widen round-robin
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1500))
  }

  test("IVF-PQ composition: probe broadcasts, only the top-k shuffles") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val p = plan(graft.operators.Similarity.ivfPqTopK(
      emb, emb.where(org.apache.spark.sql.functions.col("vec_id") % 200 === 0), 5))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("simhash band pairs plan is a bucket equi-join — no cartesian, no BNLJ") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val p = plan(graft.operators.Dedup.simhashBandPairs(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("CMS probe broadcasts all four sketch rows — no shuffle join, no cartesian") {
    val df = graft.SparkEntry.queries("sketch_cms_estimate")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(count(p, "BroadcastHashJoin") >= 4, p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("pageRank rounds stay equi-join shaped — no cartesian, no BNLJ") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val edges = ring.unionByName(ring.select(col("b").as("a"), col("a").as("b")))
    val df = graft.operators.GraphRank.pageRank(edges, "a", "b", iters = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("boilerplate filter reuses one segment-keyed exchange for freq and mark") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.Dedup.boilerplateFilter(docs, "doc_id", "text",
      segTokens = 3, minDocFreq = 5)
    df.collect() // finalize under AQE before reading the plan
    val p = df.queryExecution.executedPlan.toString
    // the doc-frequency aggregation and the mark join both consume the
    // single explicit segment-keyed repartition; a second corpus-sized
    // exchange would double the largest shuffle in the operator
    assert(p.contains("ReusedExchange") || p.contains("BroadcastHashJoin"),
      p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("shard assignment funnels only the bucket-total table through one partition") {
    import org.apache.spark.sql.functions.{col, size}
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val p = plan(graft.operators.Export.shardAssignments(docs, "doc_id", "n_tok", 4096, 100))
    // the two-level prefix sum's ONLY single-partition stage is the
    // ~N/bucketWidth bucket-offset table; the corpus-cardinality
    // window partitions by bucket (a naive global running sum would
    // add a second SinglePartition exchange over the full input)
    assert(count(p, "Exchange SinglePartition") === 1, p.take(1500))
  }

  test("card values top-k plans through TopKPerKey with partial combine") {
    val p = plan(graft.queries.SamplingQueries.queries("dataset_card_values")(spark, sfDir))
    // frequencies come from a partial+final hash aggregate, and the
    // per-column top-5 is the custom bounded-heap operator, never a
    // sort-everything WindowExec over row_number
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("canonical-quality selection joins labels and windows by component — no cartesian") {
    val p = plan(graft.queries.TextQueries.queries("dedup_canonical_quality")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    // the argmax window partitions by component (bounded groups) —
    // an unpartitioned window would funnel the corpus into one task
    assert(!p.contains("windowspecdefinition()"), p.take(1500))
  }

  test("BM25 top-k rides TopKPerKey; query/df sides broadcast — no cartesian") {
    val p = plan(graft.queries.TextQueries.queries("text_bm25_topk")(spark, sfDir))
    // the per-query top-5 is the bounded-heap operator, not a global
    // WindowExec sort; df and the query-term table broadcast; the only
    // corpus-wide work is the word explode + map-side-combined aggs
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("BPE token counting applies as a zero-shuffle projection") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = graft.core.Tables.documents(spark, sfDir)
    val ranks = graft.functions.Bpe.ranksOf(Seq(("a", "b"), ("c", "d")))
    val p = plan(docs.select(col("doc_id"),
      ColumnBridge.column(graft.expressions.BpeTokenCount(
        ColumnBridge.expression(col("text")), ranks)).as("n")))
    // the fitted table rides the expression (addReferenceObj); the
    // apply itself moves no data
    assert(count(p, "Exchange") === 0, p.take(1200))
    assert(p.contains("bpe_token_count"), p.take(1200))
  }

  test("bucketed co-located join reads bucket files with no exchange below the join") {
    val df = JoinQueries.queries("bucketed_join_colocated")(spark, sfDir)
    df.collect() // finalize the AQE plan before reading it
    // keep only the Final Plan section: the Initial Plan dump repeats
    // the tree and its aggregate exchange would trip the assertion
    val p = plan(df).split("== Initial Plan ==")(0)
    val joinSection = p.substring(p.indexOf("SortMergeJoin"))
    assert(p.contains("SortMergeJoin"), p.take(1000))
    assert(!joinSection.contains("Exchange hashpartitioning"), joinSection.take(1500))
    assert(p.contains("Bucketed: true"), p.take(1500))
  }

  test("change-data-feed is one full-outer shuffle join plus a generate") {
    val df = graft.queries.LakehouseQueries.queries("merge_cdf")(spark, sfDir)
    df.collect()
    val p = plan(df)
    assert(p.contains("FullOuter"), p.take(1200))
    assert(p.contains("Generate explode"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("kmeans / k-center assignment is a zero-shuffle map — centroids ride as literals") {
    val km = plan(graft.queries.VectorQueries.queries("cluster_kmeans")(spark, sfDir))
    // the RETURNED final assignment: scan → project, no exchange, no join
    assert(!km.contains("Exchange"), km.take(800))
    assert(!km.contains("Join"), km.take(800))
    val kc = plan(graft.queries.VectorQueries.queries("select_kcenter")(spark, sfDir))
    assert(!kc.contains("Exchange"), kc.take(800))
    assert(!kc.contains("Join"), kc.take(800))
  }

  test("semantic dedup pair generation is a cluster-id equi-join — no cartesian") {
    val df = graft.queries.VectorQueries.queries("dedup_semantic")(spark, sfDir)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1500))
  }

  test("dup-span profile: native gram kernel, doc-partitioned islands window") {
    // assert on the BUILD plan (the memoized query entry returns the
    // shared checkpointed artifact — a Scan ExistingRDD that hides the
    // kernel it was built with)
    val df = graft.operators.Dedup.dupSpanProfile(
      graft.core.Tables.documents(spark, sfDir), "doc_id", "text",
      nGram = 5, minDocFreq = 2)
    df.collect()
    val p = plan(df)
    // the native HashedShingles kernel (one tokenization pass), not the
    // lambda form that re-splits text per element_at
    assert(p.contains("hashed_shingles"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("wave-6 batch plans stay equi-join shaped — funnel, coalesce, KN LM, HLL intersection") {
    // sessionization/funnel: the session-id joins hash on
    // (user_id, sid); interval coalesce is window + agg over the same
    // user partitioning; the Kneser-Ney continuation/discount joins
    // hash on gram keys; HLL intersection unions bounded register
    // tables. A nested-loop in any of these degenerates quadratic at
    // corpus scale.
    for (name <- Seq("events_session_funnel", "events_interval_coalesce",
        "sketch_hll_intersection")) {
      val df = graft.queries.AggWindowQueries.queries(name)(spark, sfDir)
      df.collect()
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: ${p.take(1500)}")
    }
    val kn = graft.queries.TextQueries.queries("text_kn_bigram_lm")(spark, sfDir)
    kn.collect()
    val pk = plan(kn)
    assert(!pk.contains("CartesianProduct") && !pk.contains("BroadcastNestedLoopJoin"),
      pk.take(1500))
    // funnel sessionization must partition its windows by user only —
    // a global (empty-key) window would funnel the corpus through one
    // task. Every window spec in the executed plan must carry the
    // user_id key, and the only single-partition exchange allowed is
    // the final one-row funnel rollup.
    val fdf = graft.queries.AggWindowQueries.queries("events_session_funnel")(spark, sfDir)
    fdf.collect()
    val pf = plan(fdf).split("== Initial Plan ==").head
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(pf).toList
    assert(specs.nonEmpty, pf.take(1500))
    assert(specs.forall(_.contains("user_id")), specs.mkString("\n"))
    assert(count(pf, "Exchange SinglePartition") <= 1, pf.take(1500))
  }

  test("power-iteration round is projection + one dim-keyed exchange — no join, decimal agg") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val q = emb.select(graft.operators.Clustering.quantize(
      org.apache.spark.sql.functions.col("embedding")).as("_pi_q"))
    val df = graft.operators.Clustering.powerIterationRoundPlan(
      q, Array.fill(64)(1L))
    df.collect()
    // AQE renders "== Final Plan ==" followed by the initial plan —
    // count operators in the final section only.
    val p = plan(df).split("== Initial Plan ==").head
    // the row-count-growing reduction must be pure map + hash-agg:
    // any join or second exchange here multiplies per-round cost at
    // corpus scale; the partial agg bounds the exchange to dim rows
    // per partition.
    assert(!p.contains("Join"), p.take(1200))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("whole-stage codegen covers the scan-to-aggregate hot path") {
    val df = graft.queries.CoreQueries.queries("q1_agg")(spark, sfDir)
    // AQE renders codegen spans only once THIS plan instance has run —
    // drive its own RDD (a writer would clone the plan).
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val p = qe.executedPlan.toString
    // codegen'd operators render with the "*(n)" star prefix
    assert(p.contains("*(1)"), p.take(800))
    assert("\\*\\(1\\) HashAggregate".r.findFirstIn(p).isDefined ||
      "\\*\\(2\\) HashAggregate".r.findFirstIn(p).isDefined, p.take(800))
  }

  test("span-removal/boilerplate shuffles move a narrow proxy; text crosses at most one exchange") {
    // r16 rewrite claim (guide §8): the df/keep decision flows as
    // (doc, position, hash) rows; document text attaches ONCE via the
    // doc-keyed join. Pin it structurally: count shuffle exchanges
    // whose output carries any string payload (plain or array) — the
    // single payload-attach exchange is the only one allowed.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def stringShuffles(name: String): Int = {
      val df = graft.queries.TextQueries.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      df.queryExecution.executedPlan.collectWithSubqueries {
        case e: ShuffleExchangeExec if e.output.exists(a => a.dataType match {
          case StringType => true
          case ArrayType(StringType, _) => true
          case _ => false
        }) => e
      }.size
    }
    assert(stringShuffles("text_boilerplate") <= 1)
    assert(stringShuffles("text_dup_span_removal") <= 1)
  }
}
