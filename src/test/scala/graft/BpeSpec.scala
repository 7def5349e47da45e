package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Bpe, TextFns}

class BpeSpec extends SparkSpec {

  test("fit is deterministic and merges the most frequent pair first") {
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val m1 = Bpe.fit(wc, 10)
    val m2 = Bpe.fit(wc.reverse, 10)
    assert(m1 === m2) // input order can't leak into the table
    // 'es' (newest 6 + widest 3 = 9) and 'st' tie at 9; es < st lexicographically;
    // after merging 'es', (es,t) appears 9 times and beats everything
    assert(m1.take(2) === Vector(("e", "s"), ("es", "t")))
  }

  test("distributed fit equals the driver-side fit on the corpus word counts") {
    val docs = Tables.documents(spark, sfDir)
    // Same word-count input the distributed fit aggregates internally.
    val wc = docs.select(explode(TextFns.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = Bpe.fit(wc, 4)
    val got = Bpe.distributedFit(docs, col("text"), nMerges = 4)
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.length === 4)
    assert(got.toVector === expected.map { case (a, b) => (a + " " + b, a + b) })
  }

  test("priority apply equals the sequential reference apply on every fixture doc") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.fitFromCorpus(docs, col("text"))
    assert(merges.nonEmpty)
    val ranks = Bpe.ranksOf(merges)
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      assert(Bpe.tokenCount(t, ranks) === Bpe.tokenCountReference(t, merges),
        s"apply paths diverge on doc $id")
    }
  }

  test("zero merges counts characters; more merges never increase the count") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.fitFromCorpus(docs, col("text"))
    val texts = docs.select(col("text")).limit(50).collect().map(_.getString(0))
    val empty = Bpe.ranksOf(Vector.empty)
    texts.foreach { t =>
      val nChars = t.count(_ != ' ').toLong
      assert(Bpe.tokenCount(t, empty) === nChars)
      var prev = nChars
      Seq(10, 50, merges.length).foreach { k =>
        val n = Bpe.tokenCount(t, Bpe.ranksOf(merges.take(k)))
        assert(n <= prev, s"count grew from $prev to $n at $k merges")
        prev = n
      }
    }
    // the fitted table genuinely compresses the corpus it was fit on
    val full = Bpe.ranksOf(merges)
    val total = texts.map(Bpe.tokenCount(_, full)).sum
    val chars = texts.map(_.count(_ != ' ').toLong).sum
    assert(total < chars * 3 / 4, s"only $chars -> $total")
  }

  test("native expression matches the kernel through codegen") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = Tables.documents(spark, sfDir)
    val ranks = Bpe.ranksOf(Bpe.fitFromCorpus(docs, col("text")))
    val viaExpr = docs.select(col("doc_id"),
        ColumnBridge.column(graft.expressions.BpeTokenCount(
          ColumnBridge.expression(col("text")), ranks)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      assert(viaExpr(r.getLong(0)) === Bpe.tokenCount(r.getString(1), ranks))
    }
  }

  test("packing budgets in BPE tokens conserve tokens and never overfill") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs0 = Tables.documents(spark, sfDir)
    val ranks = Bpe.ranksOf(Bpe.fitFromCorpus(docs0, col("text")))
    val docs = docs0.select(col("doc_id"),
      ColumnBridge.column(graft.expressions.BpeTokenCount(
        ColumnBridge.expression(col("text")), ranks)).as("n_tok"))
    val budget = 512L
    val out = graft.operators.Packing.packChunks(docs, "doc_id", "n_tok",
      budget = budget, bucketWidth = 1000)
    // every BPE token of every doc lands in exactly one window chunk
    val placed = out.agg(sum(col("tok_in_chunk"))).head().getLong(0)
    val total = docs.agg(sum(col("n_tok"))).head().getLong(0)
    assert(placed === total)
    // no chunk holds more than the budget
    val over = out.groupBy("chunk_id")
      .agg(sum(col("tok_in_chunk")).as("w"))
      .where(col("w") > budget)
    assert(over.isEmpty)
  }

  test("shard export budgeted in BPE tokens: whole docs, budget overshoot bounded") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs0 = Tables.documents(spark, sfDir)
    val ranks = Bpe.ranksOf(Bpe.fitFromCorpus(docs0, col("text")))
    val docs = docs0.select(col("doc_id"),
      ColumnBridge.column(graft.expressions.BpeTokenCount(
        ColumnBridge.expression(col("text")), ranks)).as("n_tok"))
    val budget = 4096L
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_shards").toString + "/s"
    val n = graft.operators.Export.writeShards(docs, "doc_id", "n_tok", budget, 100, dir)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("n_tok"), col("shard").cast("long").as("shard"))
    // loader-accurate budgets: every shard's BPE-token total overshoots
    // the budget by at most its last whole document
    val over = back.groupBy("shard")
      .agg((sum(col("n_tok")) - lit(budget)).as("over"), max(col("n_tok")).as("mx"))
      .where(col("over") > col("mx"))
    assert(over.isEmpty)
    assert(back.count() === docs.where(col("n_tok") > 0).count())
    assert(spark.read.parquet(dir).inputFiles.length === n.toInt)
  }
}
