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
