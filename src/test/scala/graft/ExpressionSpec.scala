package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expressions.GraftFunctions
import graft.functions.TextFns

class ExpressionSpec extends SparkSpec {

  test("native token_fingerprint equals the HOF reference semantic on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val both = docs.select(
      GraftFunctions.tokenFingerprint(col("text")).as("native"),
      TextFns.fingerprint(TextFns.tokens(col("text"))).as("hof"))
    assert(both.where(col("native") =!= col("hof")).isEmpty)
  }

  test("token_fingerprint edge cases: empty, single space, multi space") {
    import spark.implicits._
    val df = Seq("", " ", "a", "a b", "a  b").toDF("text")
    val both = df.select(
      GraftFunctions.tokenFingerprint(col("text")).as("native"),
      TextFns.fingerprint(TextFns.tokens(col("text"))).as("hof"))
    assert(both.where(col("native") =!= col("hof")).isEmpty)
  }

  test("native hashed_shingles is set-equivalent to string shingles on real docs") {
    import graft.expressions.GraftFunctions
    val docs = Tables.documents(spark, sfDir)
    // same distinct-set size per doc ⇒ same Jaccard for any pair
    val sizes = docs.select(
      size(array_distinct(GraftFunctions.hashedShingles(col("text"), 2))).as("native_sz"),
      size(array_distinct(TextFns.shingles(TextFns.tokens(col("text")), 2))).as("string_sz"))
    assert(sizes.where(col("native_sz") =!= col("string_sz")).isEmpty)
  }

  test("native simhash64 and minhash_sig basic properties") {
    import spark.implicits._
    import graft.expressions.GraftFunctions
    val df = Seq("spark table scan", "spark table scan", "other words here").toDF("text")
    val hs = df.select(GraftFunctions.simhash64(col("text")).as("h")).collect().map(_.getLong(0))
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
    val sig = df.select(GraftFunctions.minhashSig(
      GraftFunctions.hashedShingles(col("text"), 2), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sig(0) === sig(1))
    assert(sig(0).length === 16)
    assert(sig(0) !== sig(2))
  }

  test("token_fingerprint is registered as a SQL function via extensions") {
    val r = spark.sql("SELECT token_fingerprint('spark merge join') AS fp").head().getLong(0)
    val expected = graft.expressions.TokenFingerprint.compute("spark merge join")
    assert(r === expected)
  }
}
