package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("id", "text", "t")
  }

  test("target-vocabulary docs outscore off-domain docs") {
    // target docs speak 'alpha beta gamma'; raw-only docs speak
    // 'delta epsilon zeta'. A fresh raw doc in target vocabulary must
    // get a higher avg log-ratio than one in off-domain vocabulary.
    val rows: Seq[(Long, String, Boolean)] =
      (0L until 20L).map(i => (i, "alpha beta gamma alpha beta", true)) ++
        (20L until 40L).map(i => (i, "delta epsilon zeta delta", false)) ++
        Seq((100L, "alpha beta gamma", false), (101L, "delta epsilon zeta", false))
    val got = Dsir.importanceWeights(corpus(rows), "id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got(100L) > got(101L),
      s"in-domain doc must outscore off-domain: ${got(100L)} vs ${got(101L)}")
    // and the in-domain doc scores above zero (more likely under
    // target than raw), the off-domain one below
    assert(got(100L) > 0L)
    assert(got(101L) < 0L)
  }

  test("every doc with tokens gets one verdict; avg is the truncating mean") {
    val rows: Seq[(Long, String, Boolean)] = Seq(
      (1L, "a b c", true), (2L, "c d", false), (3L, "e", false))
    val out = Dsir.importanceWeights(corpus(rows), "id", "text", col("t")).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (n, s, a) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a === s / n, s"avg_fp must be score_fp div n_feats for id ${r.getLong(0)}")
    }
  }

  test("unseen vocabulary stays finite via add-one smoothing") {
    // doc 9's words appear nowhere else (so their buckets carry only
    // the smoothing mass on the target side) — score must be finite
    // and negative-ish, never an overflow/NaN artifact.
    val rows: Seq[(Long, String, Boolean)] = Seq(
      (1L, "common words here", true), (2L, "common words here", false),
      (9L, "qqqxyzzy wwwplugh", false))
    val got = Dsir.importanceWeights(corpus(rows), "id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.contains(9L))
    assert(math.abs(got(9L)) < 1000000L, s"smoothed score out of range: ${got(9L)}")
  }

  test("deterministic across reruns") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("the", "cat", "sat", "mat", "dog", "ran", "far", "sun")
    val rows: Seq[(Long, String, Boolean)] = (0L until 50L).map { i =>
      (i, Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" "), i % 3 == 0)
    }
    val df = corpus(rows)
    val a = Dsir.importanceWeights(df, "id", "text", col("t")).collect().map(_.toSeq).toSet
    val b = Dsir.importanceWeights(df, "id", "text", col("t")).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
