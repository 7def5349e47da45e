package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16)
  * with a DETERMINISTIC compactor — the quantile member of the sketch
  * family next to CMS / HLL / Misra-Gries, and the piece Spark's
  * builtin `percentile_approx` lacks: a sketch you can STORE per
  * shard/day and union later (the `hll_sketch_agg`/`hll_union_agg`
  * shape, for quantiles). At 100 TB that at-rest mergeability is the
  * whole point — profile each ingest increment once, keep the k·log n
  * summary, answer corpus-wide quantiles without re-reading data.
  *
  * Levels hold items of weight 2^l. A full level sorts and promotes
  * the even-indexed half (odd sizes leave their max behind — weight is
  * conserved exactly, so `n` always equals the true item count, which
  * the oracle cross-checks exactly). Instead of KLL's random coin the
  * compactor always keeps even indices: the estimate loses
  * unbiasedness but gains run-determinism, and the sketch carries its
  * OWN worst-case rank-error bound — `err` grows by the compaction
  * weight 2^l each time a level compacts, so every query is
  * self-certifying under ANY partial-merge order: the returned value
  * is a stored data value, and its rank INTERVAL
  * [count(< v) + 1, count(≤ v)] sits within err + 1 of the target
  * rank φ·n. The interval form matters on tied data — a single-rank
  * check would misread a tie run's whole mass as sketch error. The
  * registered query asserts exactly that bound against exact ranks
  * (the a8/recall invariant-harness pattern for values no two engines
  * would reproduce bit-identically).
  */
object QuantileSketch {

  /** levels(l) holds unordered items of weight 2^l. */
  final case class Kll(k: Int, n: Long, err: Long, levels: Seq[Seq[Double]])

  def empty(k: Int): Kll = {
    require(k >= 8 && k <= 65536, s"k must be 8..65536, got $k")
    Kll(k, 0L, 0L, Seq(Vector.empty))
  }

  def insert(s: Kll, v: Double): Kll =
    compactAll(s.copy(n = s.n + 1,
      levels = s.levels.updated(0, s.levels.head :+ v)))

  def merge(a: Kll, b: Kll): Kll = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val depth = math.max(a.levels.size, b.levels.size)
    def lvl(s: Kll, l: Int): Seq[Double] =
      if (l < s.levels.size) s.levels(l) else Vector.empty
    compactAll(Kll(a.k, a.n + b.n, a.err + b.err,
      (0 until depth).map(l => lvl(a, l) ++ lvl(b, l))))
  }

  private def compactAll(s0: Kll): Kll = {
    var s = s0
    var l = 0
    while (l < s.levels.size) {
      if (s.levels(l).size >= s.k) s = compactLevel(s, l)
      else l += 1
    }
    s
  }

  /** Sort level l; an odd count leaves the max behind at level l; the
    * even-indexed half of the rest promotes to level l+1 (weight
    * doubles, total weight conserved). Worst-case rank error grows by
    * the compaction weight 2^l.
    */
  private def compactLevel(s: Kll, l: Int): Kll = {
    val sorted = s.levels(l).sorted
    val (body, leftover) =
      if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
      else (sorted.dropRight(1), Vector(sorted.last))
    val promoted = body.indices.collect { case i if i % 2 == 0 => body(i) }
    val base = if (l + 1 < s.levels.size) s.levels else s.levels :+ Vector.empty[Double]
    Kll(s.k, s.n, s.err + (1L << l),
      base.updated(l, leftover).updated(l + 1, base(l + 1) ++ promoted))
  }

  /** Smallest stored value whose cumulative weight reaches
    * max(1, ceil(phi·n)). Requires a non-empty sketch.
    */
  def query(s: Kll, phi: Double): Double = {
    require(s.n > 0, "query on an empty sketch")
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    val target = math.max(1L, math.ceil(phi * s.n).toLong)
    val weighted = s.levels.zipWithIndex.flatMap { case (items, l) =>
      items.map(v => (v, 1L << l))
    }.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < weighted.size) {
      cum += weighted(i)._2
      if (cum >= target) return weighted(i)._1
      i += 1
    }
    weighted.last._1
  }

  private def kllEncoder: Encoder[Kll] = Encoders.product[Kll]

  /** values → sketch (the per-shard/per-window partial builder). */
  class KllAgg(k: Int) extends Aggregator[Double, Kll, Kll] {
    override def zero: Kll = empty(k)
    override def reduce(b: Kll, a: Double): Kll = insert(b, a)
    override def merge(x: Kll, y: Kll): Kll = QuantileSketch.merge(x, y)
    override def finish(b: Kll): Kll = b
    override def bufferEncoder: Encoder[Kll] = kllEncoder
    override def outputEncoder: Encoder[Kll] = kllEncoder
  }

  /** sketches → sketch (the at-rest rollup). */
  class KllUnionAgg(k: Int) extends Aggregator[Kll, Kll, Kll] {
    override def zero: Kll = empty(k)
    override def reduce(b: Kll, a: Kll): Kll = QuantileSketch.merge(b, a)
    override def merge(x: Kll, y: Kll): Kll = QuantileSketch.merge(x, y)
    override def finish(b: Kll): Kll = b
    override def bufferEncoder: Encoder[Kll] = kllEncoder
    override def outputEncoder: Encoder[Kll] = kllEncoder
  }
}
