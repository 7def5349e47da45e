package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expressions.BloomKernels
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (1L to 5000L).map(_ * 7919L)
    val dim = keys.toDF("k")
    val model = BloomJoin.buildBloom(dim, "k", expectedItems = 5000)
    val misses = keys.count(!model.mightContain(_))
    assert(misses === 0, s"bloom filters must never miss inserted keys")
  }

  test("fpp is in the right ballpark for non-members") {
    import spark.implicits._
    val dim = (1L to 5000L).toDF("k")
    val model = BloomJoin.buildBloom(dim, "k", expectedItems = 5000, fpp = 0.01)
    val probes = (1_000_001L to 1_020_000L)
    val falsePos = probes.count(model.mightContain(_))
    // 20k non-member probes at nominal 1%: allow generous slack (<5%)
    assert(falsePos < 1000, s"fpp way off nominal: $falsePos/20000")
  }

  test("pruned join ≡ plain join on the fixtures") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir).where(col("s_suppkey") % 10 === 0)
    val pruned = BloomJoin.prunedEquiJoin(
        fact, "l_suppkey", dim, "s_suppkey", expectedItems = 4096)
      .groupBy("s_name").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pruned === plain)
    assert(pruned.nonEmpty)
  }

  test("the prune actually prunes: selective dim drops most fact rows") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir).where(col("s_suppkey") % 10 === 0)
    val model = BloomJoin.buildBloom(dim, "s_suppkey", expectedItems = 4096)
    val total = fact.count()
    val kept = BloomJoin.pruneFact(fact, "l_suppkey", model).count()
    val dimFrac = dim.count().toDouble /
      Tables.supplier(spark, sfDir).count().toDouble
    // kept fraction ≈ dim key fraction + fpp; require a real cut
    assert(kept < total, "selective dim must drop fact rows")
    assert(kept.toDouble / total < dimFrac + 0.05,
      s"kept $kept of $total but dim covers only ${dimFrac * 100}% of keys")
  }

  test("empty dim yields the all-zeros filter that prunes everything") {
    import spark.implicits._
    // an empty build side must not crash (RDD.reduce has no zero) —
    // the correct filter rejects every probe
    val dim = Seq.empty[Long].toDF("k").where(col("k") > 0)
    val model = BloomJoin.buildBloom(dim, "k", expectedItems = 100)
    assert(!model.mightContain(42L))
    val fact = Seq(1L, 2L, 3L).toDF("fk")
    assert(BloomJoin.pruneFact(fact, "fk", model).count() === 0L)
  }

  test("probe positions address the full 64-bit bit domain") {
    // the Guava/Spark Int-domain variant can only ever touch the
    // first 2^31 bits; our Long-domain combine must set bits past
    // that boundary on a large filter. Simulate with a direct kernel
    // call on an oversized bitset (no need to build a 256 MiB model).
    val words = 1 << 26 // 2^32 bits, 512 MiB — allocate once, locally
    val bits = new Array[Long](words)
    (1L to 2000L).foreach(BloomKernels.add(bits, 7, _))
    val hi = bits.indices.drop(words / 2).exists(bits(_) != 0L)
    assert(hi, "no probe landed in the upper half of a 2^32-bit filter")
  }

  test("sizing helpers match the standard formulas") {
    // n=1e6, p=0.01 → m ≈ 9.59e6 bits, k ≈ 7
    val m = BloomKernels.optimalNumBits(1000000L, 0.01)
    assert(m >= 9500000 && m <= 9700000, s"m=$m")
    assert(m % 64 === 0)
    assert(BloomKernels.optimalNumHashes(1000000L, m) === 7)
  }

  test("probe stays codegen'd next to the scan, before the exchange") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir).where(col("s_suppkey") % 10 === 0)
    val model = BloomJoin.buildBloom(dim, "s_suppkey", expectedItems = 4096)
    val q = BloomJoin.pruneFact(fact, "l_suppkey", model)
      .join(dim.hint("shuffle_hash"), col("l_suppkey") === col("s_suppkey"))
    val plan = q.queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain")
    assert(probeAt >= 0, s"probe missing from plan:\n$plan")
    // pre-shuffle placement: the tree prints parent-before-child, so
    // the probe filter's own subtree follows it immediately — it must
    // reach the parquet scan BEFORE any further Exchange appears
    // (i.e. nothing shuffles between the scan and the probe)
    val below = plan.substring(probeAt)
    val scanAt = below.indexOf("Scan parquet")
    val exchangeAt = below.indexOf("Exchange")
    assert(scanAt >= 0, s"no scan under the probe filter:\n$plan")
    assert(exchangeAt === -1 || scanAt < exchangeAt,
      s"an exchange sits between the probe and the scan — prune is not pre-shuffle:\n$plan")
  }
}
