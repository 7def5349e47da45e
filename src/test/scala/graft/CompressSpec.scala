package graft

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Compressibility

class CompressSpec extends SparkSpec {

  private def size(s: String): Long = {
    val d = new Deflater(6)
    try Compressibility.deflateSize(s.getBytes("UTF-8"), d)
    finally d.end()
  }

  test("deflate kernel: deterministic, bounded, repetition-sensitive") {
    // determinism
    val s = "value table part a row fast merge batch part value"
    assert(size(s) === size(s))
    // stored-block bound holds at edges
    for (t <- Seq("", "x", "ab " * 10000))
      assert(size(t) <= Compressibility.storedBound(t.getBytes("UTF-8").length.toLong))
    // a repetitive string compresses strictly better than a
    // same-length high-diversity string
    val rep = "tokn " * 64
    val div = (0 until 64).map(i => f"w$i%03d").mkString(" ") + " "
    assert(rep.length === div.length)
    assert(size(rep) < size(div))
  }

  test("signals over the fixture: ratios positive, contracts hold on every doc") {
    val out = Compressibility.signals(spark,
      Tables.documents(spark, sfDir), "doc_id", "text").toDF()
    assert(out.where(col("n_deflate") <= 0 || col("ratio_x1e4") <= 0).isEmpty)
    val bad = out.where(
      col("n_deflate") > expr("n_raw + 5 * greatest((n_raw + 16382) div 16383, 1) + 6") ||
        col("n_deflate_doubled") >= col("n_deflate") * 2)
    assert(bad.isEmpty)
    // ratio matches a driver-side recompute on one known doc
    val row = out.orderBy(col("doc_id")).limit(1)
      .join(Tables.documents(spark, sfDir), "doc_id")
      .select(col("n_deflate"), col("text")).head()
    assert(row.getLong(0) === size(row.getString(1)))
  }
}
