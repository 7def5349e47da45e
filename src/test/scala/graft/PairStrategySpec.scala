package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.PairStrategy

class PairStrategySpec extends SparkSpec {

  private def ue = Tables.events(spark, sfDir)
    .select(col("user_id"), col("event_type")).distinct()

  test("both strategies produce the identical pair relation") {
    val theta = PairStrategy.sharedKeyPairs(ue, "user_id", "event_type",
      maxBroadcastEntities = Long.MaxValue)
    val equi = PairStrategy.sharedKeyPairs(ue, "user_id", "event_type",
      maxBroadcastEntities = 0)
    assert(theta.count() > 0)
    assert(theta.exceptAll(equi).isEmpty && equi.exceptAll(theta).isEmpty)
  }

  test("a null key is no key — in BOTH regimes") {
    // without the up-front exclusion the regimes DISAGREE: the theta
    // regime hashes a null key into a real set element (xxhash64 of
    // an all-null input is the seed hash) while the equi regime's
    // join drops it — fuzz-corpus finding, pinned here
    import spark.implicits._
    val withNulls = Seq(
      (1L, "a"), (2L, "a"), // a real shared key
      (1L, null), (3L, null), (4L, null) // null "keys" must NOT pair
    ).toDF("user_id", "event_type")
    for (bound <- Seq(Long.MaxValue, 0L)) {
      val pairs = PairStrategy.sharedKeyPairs(
        withNulls, "user_id", "event_type", maxBroadcastEntities = bound)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.toSeq === Seq((1L, 2L, 1L)), s"bound=$bound")
    }
  }

  test("past the DEFAULT bound a skewed distribution rides the equi regime exactly") {
    import spark.implicits._
    // 200,100 entities — past DefaultMaxBroadcastEntities (200k) on
    // the MEASURED cardinality, no override. Key distribution is the
    // skew shape: one hot key shared by 300 entities, every entity
    // also holding a unique never-shared key. The theta plan would
    // broadcast 200k entity rows and evaluate 2×10^10 pair predicates;
    // the chooser must flip to the per-key equi join, whose
    // intermediate is Σ|k|² = 300² + 199,800·1².
    val hot = 300
    val n = graft.operators.PairStrategy.DefaultMaxBroadcastEntities + 100
    val entities = spark.range(n).select(col("id").as("e"))
    val ek = entities
      .select(col("e"), concat(lit("u"), col("e")).as("k"))
      .union(entities.where(col("e") < hot).select(col("e"), lit("hot").as("k")))
    val pairs = PairStrategy.sharedKeyPairs(ek, "e", "k")
    val rows = pairs.collect()
    assert(rows.length === hot * (hot - 1) / 2)
    assert(rows.forall(_.getLong(2) === 1L)) // each pair shares ONLY the hot key
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"equi regime did not engage at n=$n:\n${plan.take(900)}")
  }

  test("inside the equi regime, saltedJoin spreads the hot key without changing the result") {
    import spark.implicits._
    // The per-key self-join's hot key lands on one shuffle partition;
    // Skew.saltedJoin is the mitigation when AQE splitting isn't
    // enough. Pin that the salted plan joins on (key, salt) — the hot
    // key fans out across saltFactor partitions — and produces the
    // byte-identical relation.
    val hot = 200
    val ek = spark.range(5000)
      .select(col("id").as("e"),
        when(col("id") < hot, "hot")
          .otherwise(concat(lit("u"), col("id"))).as("k"))
    val l = ek.select(col("e").as("left"), col("k"))
    val r = ek.select(col("e").as("right"), col("k"))
    val plain = l.join(r, Seq("k"))
      .where(col("left") < col("right"))
      .groupBy("left", "right").agg(count(lit(1)).as("shared"))
    val salted = graft.operators.Skew.saltedJoin(l, r, Seq("k"), "left", 8)
      .where(col("left") < col("right"))
      .groupBy("left", "right").agg(count(lit(1)).as("shared"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(plain.count() === hot.toLong * (hot - 1) / 2)
    // join condition actually includes the salt column
    assert(salted.queryExecution.analyzed.toString.contains("__salt"))
  }

  test("the chooser flips at the broadcast bound and the plans differ accordingly") {
    assert(PairStrategy.choose(100, 1000) === PairStrategy.SetIntersectTheta)
    assert(PairStrategy.choose(1001, 1000) === PairStrategy.PerKeyEquiJoin)
    val theta = PairStrategy.sharedKeyPairs(ue, "user_id", "event_type",
      maxBroadcastEntities = Long.MaxValue)
    assert(theta.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // past the bound: a plain shuffle join — nothing broadcast-nested,
    // nothing cartesian, so the plan survives any entity count
    val equi = PairStrategy.sharedKeyPairs(ue, "user_id", "event_type",
      maxBroadcastEntities = 0)
    val p = equi.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(900))
  }
}
