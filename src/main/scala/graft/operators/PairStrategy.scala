package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cardinality-driven strategy selection for shared-key pair
  * generation (entities sharing a channel / event type / tag).
  *
  * Two correct plans exist with opposite scaling:
  *
  *  - '''SetIntersectTheta''': aggregate one sorted key-set per
  *    entity, broadcast the per-entity table, theta-join on id order,
  *    count shared keys with the native merge-intersect expression.
  *    O(n²) pair predicate evaluations but ZERO post-aggregation
  *    shuffle — wins while entities are few and keys are dense
  *    (nearly every pair shares something anyway, so the quadratic
  *    output is intrinsic).
  *  - '''PerKeyEquiJoin''': self equi-join the distinct (entity, key)
  *    relation on key, then aggregate pair counts. The intermediate
  *    is Σ_k |k|² — near-linear when keys are many and selective —
  *    and no broadcast is required, so this is the only shape that
  *    survives entity counts past the broadcast threshold. Hot keys
  *    inside it are [[Skew.saltedJoin]] territory.
  *
  * The reference hardcodes the per-channel equi-join
  * (reference src/spark/collector.py:1000-1008). Here the trade-off
  * is CODE, not a comment: [[sharedKeyPairs]] measures the entity
  * cardinality and picks, so growing past the broadcast bound flips
  * the plan instead of failing the broadcast.
  */
object PairStrategy {

  sealed trait Choice
  case object SetIntersectTheta extends Choice
  case object PerKeyEquiJoin extends Choice

  /** Max entity rows the theta plan may broadcast. Two ceilings bind:
    * the broadcast itself (200k rows × ~50 B id+key-set ≈ 10 MB, well
    * under the session's 64 MB threshold) and theta COMPUTE — n²/2
    * merge-intersects at 200k entities is 2×10^10 cheap kernel calls,
    * around the point where the per-key equi-join's Σ|k|² intermediate
    * wins even for fairly dense keys. Past this, the equi-join is the
    * only shape that finishes.
    */
  val DefaultMaxBroadcastEntities: Long = 200L * 1000

  def choose(nEntities: Long,
             maxBroadcastEntities: Long = DefaultMaxBroadcastEntities): Choice =
    if (nEntities <= maxBroadcastEntities) SetIntersectTheta else PerKeyEquiJoin

  /** Pairs of entities sharing ≥ 1 key, with the shared-key count:
    * (left, right, shared), left < right, one row per unordered pair.
    * Both strategies produce the identical relation (spec-pinned);
    * `entityKeys` must be distinct (entity, key) rows. The
    * cardinality probe is one count-distinct pass — at 100 TB that
    * statistic would come from table metadata, but measuring is what
    * keeps the decision honest when no catalog stats exist.
    */
  def sharedKeyPairs(entityKeys: DataFrame, entityCol: String, keyCol: String,
                     maxBroadcastEntities: Long = DefaultMaxBroadcastEntities): DataFrame = {
    // A null key is NO key: the equi-join regime drops it naturally,
    // but the set-intersect regime would hash it into a REAL set
    // element (xxhash64 of an all-null input returns the seed hash) —
    // the two regimes must produce the identical relation, so nulls
    // are excluded up front on both paths.
    val cleanKeys = entityKeys
      .where(col(entityCol).isNotNull && col(keyCol).isNotNull)
    val nEntities =
      cleanKeys.agg(count_distinct(col(entityCol))).collect()(0).getLong(0)
    choose(nEntities, maxBroadcastEntities) match {
      case SetIntersectTheta =>
        val perEntity = cleanKeys
          .groupBy(col(entityCol))
          .agg(array_sort(collect_set(xxhash64(col(keyCol)))).as("keys"))
        val l = perEntity.select(col(entityCol).as("left"), col("keys").as("k_l"))
        val r = perEntity.select(col(entityCol).as("right"), col("keys").as("k_r"))
        l.join(broadcast(r), col("left") < col("right"))
          .withColumn("shared", graft.expressions.GraftFunctions
            .sortedIntersectCount(col("k_l"), col("k_r")).cast("long"))
          .where(col("shared") >= 1)
          .select("left", "right", "shared")
      case PerKeyEquiJoin =>
        val l = cleanKeys.select(col(entityCol).as("left"), col(keyCol).as("k"))
        val r = cleanKeys.select(col(entityCol).as("right"), col(keyCol).as("k"))
        l.join(r, Seq("k"))
          .where(col("left") < col("right"))
          .groupBy("left", "right")
          .agg(count(lit(1)).as("shared"))
    }
  }
}
