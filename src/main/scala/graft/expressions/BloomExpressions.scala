package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom-filter kernels for runtime join pruning.
  *
  * The fleet-scale join problem (reference joins e.g.
  * `src/spark/collector.py:1000-1008` run at fact cardinality): when the
  * build side is too big to broadcast, EVERY fact row pays the shuffle
  * before the join can drop it. A bloom filter over the build-side keys
  * is small enough to ship to every task and drops non-matching fact
  * rows at scan time — before the exchange — so the shuffle carries only
  * (matches + false positives). With fpp 1% that is a ~99% shuffle-byte
  * cut on selective joins, and the join itself restores exactness: a
  * bloom filter has NO false negatives, so pre-filter + join ≡ join.
  *
  * Hashing is the standard Kirsch-Mitzenmacher double-hashing scheme
  * (two 32-bit halves of one well-mixed 64-bit hash; probe i uses
  * h1 + i*h2) — the construction Spark's own BloomFilterImpl and
  * Guava use, except the combination runs in the 64-bit domain so
  * filters past 2^31 bits stay fully addressable (see [[add]]) —
  * k probes from ONE hash evaluation per row.
  */
object BloomKernels {

  /** Bits (rounded up to a whole number of longs) for n items at fpp p.
    * Long arithmetic throughout: n ≈ 225M items at fpp 0.01 already
    * needs 2.1e9 bits, past Int — an Int here would wrap to a negative
    * allocation (crash) or, worse, a tiny positive size whose filter
    * admits everything and silently neuters the prune. Capped at 1 GiB
    * of bitset (2^33 bits ≈ 900M keys at fpp 0.01): beyond that the
    * broadcast itself is the problem and the caller should raise fpp
    * or partition the build, so fail loudly with that guidance.
    */
  def optimalNumBits(n: Long, p: Double): Long = {
    val m = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2)))
    val words = math.max(1L, math.ceil(m / 64.0).toLong)
    require(words <= (1L << 27),
      f"bloom filter for $n%d keys at fpp $p%.4f needs ${words * 64}%d bits " +
        "(> 1 GiB broadcast) — raise fpp, lower expectedItems, or partition the build")
    words * 64L
  }

  /** Probe count minimizing fpp for m bits over n items. */
  def optimalNumHashes(n: Long, m: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  /** One well-mixed 64-bit hash of the key (Murmur3 fmix64 + salt). */
  @inline def hash64(key: Long): Long =
    TextHash.fmix64(key ^ 0x5851f42d4c957f2dL)

  /** Set the k probe bits for key in bits (build side).
    *
    * Probe positions are computed in the 64-BIT domain (unsigned
    * 32-bit halves combined in Long): the classic Guava/Spark variant
    * keeps `h1 + i·h2` in Int, which can only ever address the first
    * 2^31 bits — on a filter sized past 256 MiB the upper bits would
    * never be set or probed and the realized fpp silently collapses
    * while results stay "correct" (no false negatives, no symptom).
    */
  def add(bits: Array[Long], numHashes: Int, key: Long): Unit = {
    val numBits = bits.length.toLong * 64L
    val h = hash64(key)
    val h1 = h & 0xffffffffL
    val h2 = h >>> 32
    var i = 1
    while (i <= numHashes) {
      val pos = (h1 + i.toLong * h2) % numBits // both operands ≥ 0: no sign fix-up needed
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  /** Probe the k bits for key (scan side). False ⇒ definitely absent. */
  def mightContain(bits: Array[Long], numHashes: Int, key: Long): Boolean = {
    val numBits = bits.length.toLong * 64L
    val h = hash64(key)
    val h1 = h & 0xffffffffL
    val h2 = h >>> 32
    var i = 1
    while (i <= numHashes) {
      val pos = (h1 + i.toLong * h2) % numBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** boolean bloom-membership probe of a long key against a fixed bitset.
  *
  * The bitset rides into generated code as a referenced object (same
  * mechanism as the PQ codebooks in [[PqEncode]]), so the probe stays
  * inside WholeStageCodegen right next to the parquet scan — the filter
  * runs before any exchange, which is the entire point.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint key, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(bits, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BloomKernels.mightContain($ref, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
