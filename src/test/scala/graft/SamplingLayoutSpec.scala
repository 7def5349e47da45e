package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Layout, Sampling}

class SamplingLayoutSpec extends SparkSpec {

  test("split labels partition the table and roughly match the weights") {
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    val byLabel = ev
      .select(Sampling.splitLabel(col("event_id"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100)).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum === n)
    assert(byLabel.keySet === Set("train", "val", "test"))
    // multiplicative hash over a dense id range is near-uniform
    assert(math.abs(byLabel("train").toDouble / n - 0.8) < 0.05)
  }

  test("split membership is invariant under repartitioning and re-runs") {
    val ev = Tables.events(spark, sfDir)
    val a = ev.select(col("event_id"),
      Sampling.splitLabel(col("event_id"), Seq("a" -> 500, "b" -> 500)).as("s"))
    val b = ev.repartition(13).select(col("event_id"),
      Sampling.splitLabel(col("event_id"), Seq("a" -> 500, "b" -> 500)).as("s"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratified sample respects per-stratum allocations") {
    val ev = Tables.events(spark, sfDir)
    val totals = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(ev, col("event_type"),
      col("event_id"), Map("click" -> 100, "purchase" -> 500), 50)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(t: String) = sampled.getOrElse(t, 0L).toDouble / totals(t)
    assert(math.abs(rate("click") - 0.1) < 0.05)
    assert(math.abs(rate("purchase") - 0.5) < 0.07)
    assert(rate("view") < 0.12) // default 5%
  }

  test("consistentSample is a stable k-subset") {
    val ev = Tables.events(spark, sfDir)
    val s1 = Sampling.consistentSample(ev, col("event_id"), 100)
      .select("event_id")
    val s2 = Sampling.consistentSample(ev.repartition(7), col("event_id"), 100)
      .select("event_id")
    assert(s1.count() === 100)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("temperature mixture flattens shares toward uniform without reordering domains") {
    import spark.implicits._
    import graft.operators.Sampling
    // heavily skewed domain sizes: 1 token-ish docs, counts 900/90/10
    val rows = Seq.fill(900)("big") ++ Seq.fill(90)("mid") ++ Seq.fill(10)("small")
    val df = rows.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "dom")
    val m = Sampling.temperatureMixture(df, "dom", lit(1L), budgetTokens = 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (cB, sB, rB, tB) = m("big"); val (cS, sS, rS, tS) = m("small")
    assert(cB === 900L && cS === 10L)
    // order preserved, but the flattened ratio is ~sqrt of the raw ratio
    assert(sB > m("mid")._2 && m("mid")._2 > sS)
    assert(sB.toDouble / sS < rB.toDouble / rS,
      s"temperature must compress the share ratio: $sB/$sS vs $rB/$rS")
    assert(math.abs(sB.toDouble / sS - math.sqrt(90.0)) < 1.0)
    // shares and budget allocations are near-complete (floor slack only)
    val shares = m.values.map(_._2).sum
    assert(shares <= 1000000L && shares > 999990L)
    assert(m.values.map(_._4).sum <= 10000L && tB + tS > 0)
  }

  test("zorderKey interleaves bits (known vectors) and is monotone on axes") {
    val df = spark.range(1).select(
      Layout.zorderKey(lit(0L), lit(0L)).as("z00"),
      Layout.zorderKey(lit(1L), lit(0L)).as("z10"),
      Layout.zorderKey(lit(0L), lit(1L)).as("z01"),
      Layout.zorderKey(lit(3L), lit(5L)).as("z35"),
      Layout.zorderKey(lit(65535L), lit(65535L)).as("zmax"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 1L) // x → even bits
    assert(r.getLong(2) === 2L) // y → odd bits
    // x=3 (0b011) spreads to 0b000101=5; y=5 (0b101) to 0b010001<<1=34 → 39
    assert(r.getLong(3) === 39L)
    assert(r.getLong(4) === 0xFFFFFFFFL)
  }

  test("zorderKey is bit-exact against a loop-interleave reference on a value grid") {
    import spark.implicits._
    // plain-JVM reference: interleave bit by bit
    def morton(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
    val grid = Seq(0L, 1L, 2L, 3L, 7L, 8L, 255L, 256L, 4095L, 4096L, 21845L, 43690L, 65535L)
    val pairs = for { x <- grid; y <- grid } yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y), s"mismatch at ($x,$y)")
    }
  }

  test("zorderCluster tightens per-file min/max bounds on both dimensions") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), pmod(col("event_id"), lit(65536L)).as("x"),
        pmod(col("user_id"), lit(65536L)).as("y"))
    val clustered = Layout.zorderCluster(ev, col("x"), col("y"), 8)
    // Per output partition, both dimensions should be far narrower than
    // the global range — that's what file-stat pruning feeds on.
    import spark.implicits._
    val spans = clustered.select(col("x"), col("y"))
      .mapPartitions { it =>
        val rows = it.toSeq
        if (rows.isEmpty) Iterator.empty
        else {
          val xs = rows.map(_.getLong(0)); val ys = rows.map(_.getLong(1))
          Iterator((xs.max - xs.min, ys.max - ys.min, rows.size))
        }
      }.collect()
    val bounds = ev.agg(min(col("x")), max(col("x"))).collect()(0)
    val globalX = (bounds.getLong(1) - bounds.getLong(0)).toDouble
    // average partition x-span must be well under the global span
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    assert(avgX < globalX * 0.7, s"avg x-span $avgX vs global $globalX not tightened")
  }
}
