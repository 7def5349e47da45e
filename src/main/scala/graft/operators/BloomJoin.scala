package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.{BloomKernels, BloomMightContain}

/** Runtime bloom-filter join pruning (semi-join pushdown).
  *
  * Scale shape: a fact⋈dim equi-join where dim is too big to broadcast
  * forces a full shuffle of the fact side — at 100 TB the exchange IS
  * the cost, and rows that will not match pay it anyway. This operator
  * runs a cheap pre-pass over the dim keys to build a bloom filter
  * (bits sized for the key count at the requested fpp — ~1.2 MB per
  * 10^6 keys at 1%, trivially task-shippable), then filters the fact
  * side with a codegen'd [[BloomMightContain]] probe AT THE SCAN, so
  * the exchange carries only matches + fpp·non-matches. Bloom filters
  * have no false negatives, so `pruneFact(...) join dim ≡ fact join
  * dim` — the join re-verifies every surviving row and the result is
  * exact. This is the same design as Spark's own runtime row-level
  * filtering and the sideways-information-passing literature; it is
  * re-implemented natively here so the probe stays inside
  * WholeStageCodegen and the filter placement is explicit and testable.
  *
  * The build pass aggregates per-partition bitsets and ORs them on the
  * driver — the driver holds one small bitset, never keys; dim
  * cardinality only sizes the array.
  *
  * Relationship to Spark's own runtime row-level filtering (pinned in
  * `RuntimeFilterSpec`): Catalyst injects the same idea automatically,
  * but only when its size heuristics fire (10 GB application-side scan
  * floor by default) and only into shapes the optimizer can see through.
  * This explicit operator is the deterministic, composable form — it
  * applies when the dim key set is already materialized (incremental
  * dedup against a lake), when the prune must happen upstream of an
  * operator the optimizer won't push through (iterative graph rounds,
  * mapPartitions codecs), or when the pipeline author wants the prune
  * guaranteed rather than heuristic.
  */
object BloomJoin {

  /** An immutable built filter: bitset + probe count. */
  final case class BloomModel(bits: Array[Long], numHashes: Int) {
    def numBits: Long = bits.length.toLong * 64L

    /** Codegen'd membership probe of a bigint key column. */
    def mightContain(key: Column): Column =
      ColumnBridge.column(
        BloomMightContain(ColumnBridge.expression(key), bits, numHashes))

    def mightContain(key: Long): Boolean =
      BloomKernels.mightContain(bits, numHashes, key)
  }

  /** Build a bloom filter over the distinct values of a bigint key
    * column. One narrow pass: each partition fills a local bitset,
    * partials are OR-merged. `expectedItems` sizes the filter — pass
    * the dim-side key cardinality estimate (an overestimate only
    * wastes bits, an underestimate only raises fpp; correctness is
    * unaffected either way).
    */
  def buildBloom(dim: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double = 0.01): BloomModel = {
    val numBits = BloomKernels.optimalNumBits(math.max(1L, expectedItems), fpp)
    val numHashes = BloomKernels.optimalNumHashes(math.max(1L, expectedItems), numBits)
    val spark = dim.sparkSession
    import spark.implicits._
    val keys = dim.select(col(keyCol).cast("long")).na.drop().as[Long]
    // fold, not reduce: an EMPTY dim (zero partitions after optimizer
    // folding) must yield the all-zeros filter that prunes every fact
    // row — reduce throws "empty collection" there
    val zero = new Array[Long]((numBits / 64L).toInt) // ≤ 2^27 words by optimalNumBits' cap
    val bits = keys.mapPartitions { it =>
      val local = new Array[Long]((numBits / 64L).toInt)
      while (it.hasNext) BloomKernels.add(local, numHashes, it.next())
      Iterator.single(local)
    }.rdd.fold(zero) { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    BloomModel(bits, numHashes)
  }

  /** Fact side filtered to bloom-possible keys — the scan-time prune.
    * Null keys are dropped (they cannot match an equi-join anyway, so
    * inner/semi-join semantics are preserved exactly).
    */
  def pruneFact(fact: DataFrame, factKey: String, model: BloomModel): DataFrame =
    fact.where(model.mightContain(col(factKey).cast("long")))

  /** End-to-end bloom-pruned inner equi-join: build on dim, prune
    * fact, join. Exactly equivalent to `fact.join(dim, fact(factKey)
    * === dim(dimKey))` for non-null keys; the join after the prune
    * discards the bloom's false positives.
    */
  def prunedEquiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val model = buildBloom(dim, dimKey, expectedItems, fpp)
    pruneFact(fact, factKey, model)
      .join(dim, col(factKey) === col(dimKey))
  }
}
