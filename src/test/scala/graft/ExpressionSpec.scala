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

  test("explode_shingles generator streams the same rows as posexplode of the array") {
    import org.apache.spark.sql.functions._
    graft.core.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_gen")
    val viaGen = spark.sql(
      """SELECT doc_id, s.pos, s.shingle_hash
        |FROM docs_gen LATERAL VIEW explode_shingles(text, 2) s""".stripMargin)
    val viaArray = spark.sql(
      """SELECT doc_id, posexplode(hashed_shingles(text, 2)) AS (pos, shingle_hash)
        |FROM docs_gen""".stripMargin)
    assert(viaGen.count() === viaArray.count())
    assert(viaGen.exceptAll(viaArray).isEmpty && viaArray.exceptAll(viaGen).isEmpty)
    // generator also works in a plain select through the Column API
    val sel = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("explode_shingles(text, 2)"))
    assert(sel.columns.toSeq === Seq("doc_id", "pos", "shingle_hash"))
    assert(sel.count() === viaGen.count())
  }

  test("token_fingerprint is registered as a SQL function via extensions") {
    val r = spark.sql("SELECT token_fingerprint('spark merge join') AS fp").head().getLong(0)
    val expected = graft.expressions.TokenFingerprint.compute("spark merge join")
    assert(r === expected)
  }

  test("native dot_product is bit-identical to the HOF aggregate/zip_with form") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
        (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val both = emb.select(
      GraftFunctions.dotProduct(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    // exact equality, not approx: same left-to-right double accumulation
    assert(both.where(col("native") =!= col("hof")).isEmpty)
  }

  test("dot_product handles double arrays and nulls") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0)))
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.dotProduct(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).getDouble(0) === 32.0)
    assert(out(1).isNullAt(0))
  }

  test("dot_product nulls out mismatched lengths and null elements, like zip_with") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)), // truncated embedding
      (Array(1.0, 2.0), Array(1.0, 2.0))
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.dotProduct(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0)) // must NOT score a partial product
    assert(out(1).getDouble(0) === 5.0)

    val withNullElem = spark.sql(
      "SELECT dot_product(array(1.0D, NULL), array(1.0D, 2.0D)) AS d")
    assert(withNullElem.head().isNullAt(0))
  }

  test("varint codec: known LEB128 vectors, random roundtrip through codegen, negative rejected") {
    import spark.implicits._
    // known vectors (the LEB128 spec examples)
    val enc = graft.expressions.VarintCodec.encode(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(0L, 127L, 128L, 300L, 16384L)))
    assert(enc.map(_ & 0xff).toSeq === Seq(
      0x00, 0x7f, 0x80, 0x01, 0xac, 0x02, 0x80, 0x80, 0x01))
    // byteLen matches the oracle's CASE ladder at the boundaries
    for ((v, n) <- Seq(0L -> 1, 127L -> 1, 128L -> 2, 16383L -> 2, 16384L -> 3,
        ((1L << 56) - 1) -> 8, (1L << 56) -> 9, Long.MaxValue -> 9))
      assert(graft.expressions.VarintCodec.byteLen(v) === n, s"byteLen($v)")
    // roundtrip through the SQL expressions (whole-stage codegen path)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong().abs % (1L << 40)))
    val df = rows.toDF("arr")
      .select(col("arr"),
        GraftFunctions.varintDecode(GraftFunctions.varintEncode(col("arr"))).as("rt"))
    assert(df.where(not(col("arr") === col("rt"))).isEmpty)
    // negatives refuse to encode rather than mis-encode
    intercept[Exception] {
      Seq(Seq(-1L)).toDF("arr")
        .select(GraftFunctions.varintEncode(col("arr"))).collect()
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    val docs = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"),
        array_sort(array_distinct(GraftFunctions.hashedShingles(col("text"), 2))).as("sh"))
    val l = docs.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val r = docs.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    val pairs = l.crossJoin(r).where(col("a") < col("b")).limit(500)
    val both = pairs.select(
      GraftFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")).as("native"),
      size(array_intersect(col("sh_a"), col("sh_b"))).as("builtin"))
    assert(both.where(col("native") =!= col("builtin")).isEmpty)
  }
}
