package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key") {
    // events.event_type is a 5-value key — exactly the skew shape.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("user_id"))
    val dim = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("type_total"))

    val plain = ev.join(dim, Seq("event_type"))
      .select("event_id", "event_type", "type_total")
    val salted = Skew.saltedJoin(ev, dim, Seq("event_type"), "event_id", 8)
      .select("event_id", "event_type", "type_total")

    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt is deterministic and spans the full range") {
    val ev = Tables.events(spark, sfDir)
    val salts = ev.select(Skew.salt(col("event_id"), 8).as("s"))
    val distinct = salts.distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(distinct === (0 until 8))
    // stable across evaluations
    val again = ev.select(Skew.salt(col("event_id"), 8).as("s"))
    assert(salts.exceptAll(again).isEmpty)
  }
}
