package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Packing, Sampling}

class PackingSpec extends SparkSpec {

  private def tokDocs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))

  test("two-level prefix sum equals the single-window reference") {
    val got = Packing.prefixSum(tokDocs, "doc_id", "n_tok", "off", bucketWidth = 7)
    val ref = tokDocs.withColumn("off",
      coalesce(sum(col("n_tok")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("prefix sum has no corpus-wide unpartitioned window in the plan") {
    val plan = Packing.prefixSum(tokDocs, "doc_id", "n_tok", "off", 1000)
      .queryExecution.optimizedPlan
    // The only empty-partitionSpec Window must sit on the bucket
    // AGGREGATE (rows = N/bucketWidth), never on the raw rows.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val globalWindows = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.nonEmpty)
    globalWindows.foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.nonEmpty,
        "global window must run over the bucket aggregate, not raw rows")
    }
  }

  test("packing conserves tokens and never overfills a window") {
    val budget = 128L
    val chunks = Packing.packChunks(tokDocs, "doc_id", "n_tok", budget, 50)
    val totalToks = tokDocs.agg(sum("n_tok")).head.getLong(0)
    assert(chunks.agg(sum("tok_in_chunk")).head.getLong(0) === totalToks)
    val perChunk = chunks.groupBy("chunk_id").agg(sum("tok_in_chunk").as("t"))
    assert(perChunk.where(col("t") > budget).isEmpty)
    // every window except the last is filled exactly to the budget
    val lastChunk = (totalToks - 1) / budget
    assert(perChunk.where(col("t") < budget && col("chunk_id") < lastChunk).isEmpty)
    // a document never lands twice in the same window
    assert(chunks.groupBy("doc_id", "chunk_id").count().where(col("count") > 1).isEmpty)
  }

  test("sliding chunks cover every token with the configured overlap") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val out = Packing.slidingChunks(docs, "doc_id",
      TextFns.tokens(col("text")), size = 32, stride = 24)
    val nToks = docs.select(col("doc_id"),
      size(TextFns.tokens(col("text"))).cast("long").as("n"))
    // last chunk per doc ends at the last token; first starts at token 1
    val last = out.groupBy("doc_id").agg(
      max(col("chunk_idx")).as("mx"), count(lit(1)).as("cnt"))
      .join(nToks, Seq("doc_id"))
    assert(last.where(col("cnt") =!= col("mx") + 1).isEmpty)
    // chunk counts match ceil arithmetic
    assert(last.where(col("cnt") =!=
      when(col("n") <= 32, lit(1L))
        .otherwise(lit(1L) + ceil((col("n") - 32).cast("double") / 24).cast("long"))).isEmpty)
    // short chunks only at the tail
    assert(out.join(nToks, Seq("doc_id"))
      .where(col("n_in_chunk") < 32 &&
        col("chunk_idx") * 24 + col("n_in_chunk") =!= col("n")).isEmpty)
  }

  test("length-bucket batches are bounded, homogeneous, and deterministic") {
    val out = Packing.lengthBucketBatches(tokDocs, "doc_id", "n_tok",
      bucketWidth = 16, nShards = 4, batchSize = 8)
    // no batch exceeds batchSize members
    assert(out.groupBy("bucket", "shard", "batch").count()
      .where(col("count") > 8).isEmpty)
    // all members of a batch share a length bucket → waste < bucketWidth
    assert(out.where(col("padding_waste") >= 16 || col("padding_waste") < 0).isEmpty)
    // assignment is a pure function of the data, not the partitioning
    val again = Packing.lengthBucketBatches(
      tokDocs.repartition(13), "doc_id", "n_tok", 16, 4, 8)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("shard export: whole docs, contiguous budgeted shards, byte-stable at rest") {
    import graft.operators.Export
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val budget = 8192L
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_spec").toString + "/s"
    val nShards = Export.writeShards(docs, "doc_id", "n_tok", budget, 100, dir)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        col("shard").cast("long").as("shard"))

    // every nonzero-token doc lands in exactly one shard
    val expectedDocs = docs.where(col("n_tok") > 0)
    assert(back.count() === expectedDocs.count())
    assert(back.select("doc_id").distinct().count() === back.count())

    // assignment matches the window-function rebuild exactly
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rebuilt = docs
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .where(col("n_tok") > 0)
      .withColumn("shard", expr(s"tok_offset DIV $budget"))
      .select(col("doc_id"), col("n_tok"), col("tok_offset"), col("shard"))
    assert(back.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(back).isEmpty)

    // shards are contiguous 0..n-1 and each holds one file (one
    // sequential read per loader worker)
    val shardIds = back.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(shardIds === (0L until nShards))
    assert(spark.read.parquet(dir).inputFiles.length === nShards.toInt)

    // whole-doc packing: a shard overshoots the budget by at most its
    // last document (docs never split)
    val overshoot = back.groupBy("shard")
      .agg((sum(col("n_tok")) - lit(budget)).as("over"), max(col("n_tok")).as("mx"))
      .where(col("over") > col("mx"))
    assert(overshoot.isEmpty)
  }

  test("incremental shard export: appends new shards, old files byte-identical") {
    import graft.operators.Export
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val budget = 8192L
    val split = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2")).head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_incr_spec").toString + "/s"
    val nBase = Export.writeShards(docs.where(col("doc_id") <= split),
      "doc_id", "n_tok", budget, 100, dir)

    def fileBytes(): Map[String, Seq[Byte]] = {
      val root = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
    val before = fileBytes()

    val nAll = Export.appendShards(docs.where(col("doc_id") > split),
      "doc_id", "n_tok", budget, 100, dir)
    assert(nAll > nBase)

    // the base layout is byte-for-byte untouched by the append
    val after = fileBytes()
    before.foreach { case (path, bytes) =>
      assert(after.contains(path), s"base file $path disappeared")
      assert(after(path) === bytes, s"base file $path was rewritten")
    }

    // increment shards start at a fresh boundary one past the base max
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("shard").cast("long").as("shard"))
    val shardIds = back.select("shard").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(shardIds === (0L until nAll))
    assert(back.where(col("doc_id") > split)
      .agg(min(col("shard"))).head().getLong(0) === nBase)
    // one file per shard still holds across the union
    assert(spark.read.parquet(dir).inputFiles.length === nAll.toInt)

    // appending ids that do not exceed the exported prefix fails loudly
    val ex = intercept[Exception] {
      Export.appendShards(docs.where(col("doc_id") <= split),
        "doc_id", "n_tok", budget, 100, dir)
    }
    assert(ex.getMessage != null)
  }

  test("domain rebalance caps over-represented domains deterministically") {
    val docs = Tables.documents(spark, sfDir)
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.domainRebalance(docs, "lang", col("doc_id"))
    val after = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = before.values.sum.toDouble / before.size
    after.foreach { case (lang, c) =>
      if (before(lang) <= target) // small domains keep every row
        assert(c === before(lang))
      else // big domains sample down to ~the uniform target count
        assert(math.abs(c - target) / target < 0.15, s"$lang: $c vs $target")
    }
    // re-running over a different partitioning selects identical rows
    val again = Sampling.domainRebalance(docs.repartition(11), "lang", col("doc_id"))
      .select(col("doc_id"), col("lang"))
    val first = out.select(col("doc_id"), col("lang"))
    assert(first.exceptAll(again).isEmpty && again.exceptAll(first).isEmpty)
  }

  test("epoch mixture: every doc gets full_epochs or full_epochs+1 contiguous epochs") {
    import graft.operators.Sampling
    val docs = graft.core.Tables.documents(spark, sfDir)
    val nTok = size(graft.functions.TextFns.tokens(col("text"))).cast("long")
    val weights = Map("en" -> 400, "de" -> 150, "es" -> 150, "fr" -> 150, "zh" -> 150)
    val plan = Sampling.epochMixturePlan(docs, "lang", nTok, weights, budgetTokens = 50000L)
    // plan identities: target decomposes exactly into epochs + remainder
    val bad = plan.where(
      col("full_epochs") * col("available_tokens") + col("rem_tokens")
        =!= col("target_tokens"))
    assert(bad.isEmpty)
    assert(plan.where(col("accept_ppm") < 0 || col("accept_ppm") >= 1000000).isEmpty)
    val out = Sampling.epochExpand(docs.select(col("doc_id"), col("lang")),
      "lang", col("doc_id"), plan)
    // per-doc: epochs are contiguous 0..n-1 with n in {full, full+1}
    val perDoc = out.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("lo"), max(col("epoch")).as("hi"))
      .join(plan.select(col("lang"), col("full_epochs")), Seq("lang"))
    assert(perDoc.where(col("lo") =!= 0 || col("hi") =!= col("n") - 1).isEmpty)
    assert(perDoc.where(
      col("n") =!= col("full_epochs") && col("n") =!= col("full_epochs") + 1).isEmpty)
    // per-domain doc-row total = full_epochs * n_docs + accepted count,
    // where acceptance re-derives from the same hash rule
    val accepted = docs
      .join(plan.select(col("lang"), col("accept_ppm")), Seq("lang"))
      .where(Sampling.modBucket(col("doc_id"), 1000000) < col("accept_ppm"))
      .groupBy("lang").agg(count(lit(1)).as("n_acc"))
    val perDomain = out.groupBy("lang").agg(count(lit(1)).as("rows"))
      .join(plan.select(col("lang"), col("full_epochs"), col("n_docs")), Seq("lang"))
      .join(accepted, Seq("lang"), "left").na.fill(0L, Seq("n_acc"))
    assert(perDomain.where(
      col("rows") =!= col("full_epochs") * col("n_docs") + col("n_acc")).isEmpty)
  }
}
