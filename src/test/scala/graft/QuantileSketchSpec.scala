package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.Kll

class QuantileSketchSpec extends SparkSpec {

  private def build(xs: Seq[Double], k: Int): Kll =
    xs.foldLeft(QuantileSketch.empty(k))(QuantileSketch.insert)

  private def weight(s: Kll): Long =
    s.levels.zipWithIndex.map { case (items, l) => items.size.toLong << l }.sum

  private def exactRank(xs: Seq[Double], v: Double): Long = xs.count(_ <= v).toLong

  test("below capacity the sketch is exact: err stays 0 and quantiles are true") {
    val xs = (1 to 100).map(_.toDouble)
    val s = build(scala.util.Random.shuffle(xs), k = 256)
    assert(s.err === 0L)
    assert(QuantileSketch.query(s, 0.5) === 50.0)
    assert(QuantileSketch.query(s, 0.01) === 1.0)
    assert(QuantileSketch.query(s, 1.0) === 100.0)
  }

  test("compacted regime: every estimate's exact rank lands within the carried bound") {
    val xs = (1 to 20000).map(_.toDouble)
    val s = build(xs, k = 64)
    assert(s.err > 0L)
    assert(s.err < 5000L, s"bound too loose to be useful: ${s.err}")
    for (phi <- Seq(0.1, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = QuantileSketch.query(s, phi)
      val target = math.ceil(phi * xs.size).toLong
      assert(math.abs(exactRank(xs, est) - target) <= s.err + 1,
        s"phi=$phi est=$est rank=${exactRank(xs, est)} target=$target err=${s.err}")
    }
  }

  test("weight is conserved exactly through inserts and merges (mass == n)") {
    val rnd = new scala.util.Random(3)
    val chunks = Seq.fill(7)(Seq.fill(500)(rnd.nextDouble() * 1000))
    val parts = chunks.map(c => build(c, k = 32))
    parts.foreach(p => assert(weight(p) === p.n))
    val leftFold = parts.reduceLeft(QuantileSketch.merge)
    val rightFold = parts.reduceRight(QuantileSketch.merge)
    for (m <- Seq(leftFold, rightFold)) {
      assert(m.n === 3500L)
      assert(weight(m) === 3500L)
      val all = chunks.flatten
      for (phi <- Seq(0.25, 0.5, 0.9)) {
        val est = QuantileSketch.query(m, phi)
        val target = math.ceil(phi * 3500).toLong
        assert(math.abs(exactRank(all, est) - target) <= m.err + 1)
      }
    }
  }

  test("merge with an empty sketch is identity") {
    val s = build((1 to 50).map(_.toDouble), k = 32)
    val e = QuantileSketch.empty(32)
    assert(QuantileSketch.merge(s, e) === s)
    assert(QuantileSketch.merge(e, s) === s)
  }

  test("Spark two-level rollup conserves mass and honors the bound") {
    import spark.implicits._
    val kllAgg = udaf(new QuantileSketch.KllAgg(64))
    val kllUnion = udaf(new QuantileSketch.KllUnionAgg(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Kll]())
    val df = (1 to 5000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    val partials = df.groupBy("g").agg(kllAgg(col("v")).as("sk"))
    val rolled = partials.agg(kllUnion(col("sk.k"), col("sk.n"), col("sk.err"),
      col("sk.levels")).as("sk"))
    val sk = rolled.as[Tuple1[Kll]].head()._1
    assert(sk.n === 5000L)
    assert(weight(sk) === 5000L)
    val est = QuantileSketch.query(sk, 0.5)
    val rank = (1 to 5000).count(_.toDouble <= est).toLong
    assert(math.abs(rank - 2500L) <= sk.err + 1)
  }
}
