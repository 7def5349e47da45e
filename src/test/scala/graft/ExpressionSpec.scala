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

  test("token_fingerprint is registered as a SQL function via extensions") {
    val r = spark.sql("SELECT token_fingerprint('spark merge join') AS fp").head().getLong(0)
    val expected = graft.expressions.TokenFingerprint.compute("spark merge join")
    assert(r === expected)
  }
}
