package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Corpus-scale, integer-exact k-means over an embedding column — the
  * clustering stage of a semantic-curation pipeline (SemDeDup-style
  * cluster-then-dedup, topic bucketing, per-cluster sampling quotas).
  *
  * Complementary to [[Similarity.lloyd]]: that routine trains a
  * codebook on a DRIVER-collected bounded sample (fine for IVF/PQ,
  * where only the codebook must be deterministic); this one assigns
  * EVERY corpus vector distributively, and its full assignment table
  * is the operator's output, so the whole iteration has to be
  * cross-engine deterministic.
  *
  * Determinism: coordinates are quantized once to fixed point
  * (`floor(x * 10000)` in double — float→double widening is exact and
  * both engines' IEEE multiply/floor agree bit for bit), after which
  * every step is BIGINT arithmetic: squared-L2 distances are integer
  * sums, the argmin tie-breaks on the smaller cluster id, and centroid
  * updates are truncating integer division (`div` here, `//` in the
  * DuckDB oracle — both truncate toward zero). k seeds are the k
  * lowest-id vectors (published data-dependent inits like kmeans++
  * need a seeded RNG; an id-ordered seed keeps the contract
  * engine-free). The oracle unrolls the SAME R rounds as chained
  * MATERIALIZED CTEs and matches bit for bit.
  *
  * Scale shape: assignment is a ZERO-SHUFFLE map — the k·dim centroid
  * table rides the closure as literal arrays (k ≤ 64 enforced), so
  * each round's only exchange is the centroid-update aggregation,
  * whose map-side combine collapses every partition to ≤ k vector
  * sums ([[LongVecSum]] — elementwise, no per-dimension explode). The
  * k-row update collects to the driver (the bounded-centroid-pull
  * pattern of [[Similarity]]). The quantized (id, vector) projection
  * is lineage-truncated ONCE before the loop, so every Lloyd round
  * re-scans the compact materialized projection — not the parquet
  * source — and round cost is independent of how wide the source
  * table is. (With a reliable checkpoint dir set the blocks live in
  * fault-tolerant storage; see [[graft.core.GraftSession.truncate]].)
  */
object Clustering {

  /** Fixed-point scale for embedding coordinates: floor(x·1e4). */
  val QuantScale = 10000L

  /** Elementwise BIGINT vector sum — the map-side-combinable centroid
    * accumulator. Integer addition commutes, so partial-merge order
    * cannot perturb the result. Additions are OVERFLOW-CHECKED
    * (`Math.addExact`): the DuckDB oracle sums into HUGEINT, so a
    * silent Long wraparound here would diverge from the oracle with no
    * symptom — instead the job fails loudly with ArithmeticException
    * and the caller knows the integer envelope was exceeded.
    */
  class LongVecSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    private def add(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (b.isEmpty) a.toArray
      else {
        var i = 0
        while (i < b.length) { b(i) = Math.addExact(b(i), a(i)); i += 1 }
        b
      }
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = add(b, a)
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = add(x, y)
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** floor(x·QuantScale) as BIGINT, computed in double. */
  def quantize(emb: Column): Column =
    transform(emb.cast("array<double>"), x => floor(x * QuantScale.toDouble).cast("long"))

  /** R rounds of (assign, update), then a final assignment against the
    * converged centroids. Returns one row per input vector:
    * (idCol, cluster BIGINT, qdist BIGINT) where qdist is the exact
    * quantized squared L2 distance to the winning centroid.
    */
  /** Zero-shuffle argmin assignment against driver-held labeled
    * centroids: winner = lexicographic min over (dist, label) — exact
    * integer distances, total tie-break. Input must carry (idC, qC);
    * output appends (cluster, qdist).
    *
    * The whole argmin is ONE native expression
    * ([[graft.expressions.KmeansArgmin]]) holding the centroid matrix
    * as a constant. Two separate costs forced that design, both
    * measured on the 10× tier at k = 64 (the scale-relative-k SemDeDup
    * regime): (1) the unrolled k-branch expression tree is O(k·dim)
    * nodes and Catalyst RE-ANALYZES it every Lloyd round (fresh
    * centroid literals each round) — ~2.5 s of driver planning per
    * round; (2) the higher-order form (transform/zip_with/aggregate)
    * evaluates an interpreted lambda per element — ~100 µs/row, i.e.
    * a lambda-bound scan. The native kernel is a fused codegen'd loop:
    * O(1) plan nodes, ~1 µs/row, same integer ops and tie-break, so
    * the DuckDB kmeans-CTE twins stay bit-identical.
    */
  private def argminAssign(q: DataFrame, idC: String, qC: String,
                           cents: Seq[(Long, Array[Long])]): DataFrame = {
    val w = graft.expressions.GraftFunctions.kmeansArgmin(
      col(qC), cents.map(_._2.toSeq), cents.map(_._1))
    q.select(col(idC), col(qC), w.as("_w"))
      .select(col(idC), col(qC), col("_w.cluster").as("cluster"),
        col("_w.qdist").as("qdist"))
  }

  /** The Lloyd loop alone: returns the trained centroids, label →
    * quantized vector. Train ONCE on a corpus snapshot, then assign
    * any later increment with [[assignToCentroids]] — the daily-
    * curation shape (clusters stay comparable across increments
    * because the codebook is frozen).
    */
  def kmeansCentroids(points: DataFrame, idCol: String, embCol: String,
                      k: Int, rounds: Int): Seq[(Long, Array[Long])] = {
    require(k >= 2 && k <= 64, s"k must be 2..64 (centroids ride the plan as literals), got $k")
    require(rounds >= 1 && rounds <= 20, s"rounds must be 1..20, got $rounds")
    import graft.core.GraftSession.LineageOps
    // Materialize the quantized projection once: R Lloyd rounds then
    // re-scan this compact (id, BIGINT vector) frame instead of
    // launching R full parquet scans + per-round re-quantization.
    // WIDENED first (Tables.widen — no-op when the scan already has
    // shuffle-width partitions, i.e. at lake scale): every round's
    // k·dim distance work runs map-side against this frame's
    // partitioning and nothing downstream ever re-spreads it — a
    // single-row-group parquet source would pin ALL rounds to 1-2
    // cores (measured 3× end-to-end on the 10× tier at k=64). The
    // repartition is paid once, behind the checkpoint barrier, so the
    // returned assignment plan stays a zero-shuffle projection.
    val q = graft.core.Tables.widen(
        points.select(col(idCol).as("_km_id"), quantize(col(embCol)).as("_km_q")))
      .truncateLineage()
    lloydLoop(q, "_km_id", "_km_q", k, rounds)
  }

  /** The bare Lloyd iteration over an ALREADY-quantized, materialized
    * (idC, qC) frame — shared by the flat and two-level fits so both
    * run the identical seed/assign/update arithmetic. Callers own the
    * k/rounds envelope checks and the projection's materialization.
    */
  private def lloydLoop(q: DataFrame, idC: String, qC: String,
                        k: Int, rounds: Int): Seq[(Long, Array[Long])] = {
    val seeds = q.orderBy(idC).limit(k).collect()
    require(seeds.length == k, s"need at least $k vectors to seed, got ${seeds.length}")
    var cents: Array[Array[Long]] = seeds.map(_.getSeq[Long](1).toArray)

    val vecSum = udaf(new LongVecSum)
    var r = 0
    while (r < rounds) {
      // assignment keeps qC so the centroid update aggregates
      // directly off it (no n-row re-join per round)
      val upd = argminAssign(q, idC, qC,
          cents.zipWithIndex.map { case (c, j) => (j.toLong, c) }.toSeq)
        .groupBy("cluster")
        .agg(vecSum(col(qC)).as("s"), count(lit(1)).as("cnt"))
        .select(col("cluster"), expr("transform(s, x -> x div cnt)").as("c"))
        .collect()
      // empty clusters keep their previous centroid (mirrored in the
      // oracle's LEFT JOIN + coalesce)
      val next = cents.map(_.clone())
      upd.foreach { row =>
        // a null cluster key means the argmin kernel nulled — a corrupt
        // vector (null element / dimension mismatch) survived upstream
        // admissibility; fail as loudly as the overflow path, not with
        // an opaque NPE at getLong
        require(!row.isNullAt(0),
          "k-means update saw a null cluster: corrupt vector (null element " +
            "or dimension mismatch) in the training input")
        next(row.getLong(0).toInt) = row.getSeq[Long](1).toArray
      }
      cents = next
      r += 1
    }
    cents.zipWithIndex.map { case (c, j) => (j.toLong, c) }.toSeq
  }

  /** Zero-shuffle assignment of arbitrary points to FIXED labeled
    * centroids (from [[kmeansCentroids]] or any frozen codebook).
    */
  def assignToCentroids(points: DataFrame, idCol: String, embCol: String,
                        cents: Seq[(Long, Array[Long])]): DataFrame = {
    require(cents.nonEmpty && cents.size <= 64,
      s"need 1..64 centroids, got ${cents.size}")
    val q = points.select(col(idCol).as("_ka_id"), quantize(col(embCol)).as("_ka_q"))
    argminAssign(q, "_ka_id", "_ka_q", cents)
      .select(col("_ka_id").as(idCol), col("cluster"), col("qdist"))
  }

  def kmeansFixedPoint(points: DataFrame, idCol: String, embCol: String,
                       k: Int, rounds: Int): DataFrame =
    assignToCentroids(points, idCol, embCol,
      kmeansCentroids(points, idCol, embCol, k, rounds))

  /** Two-level (coarse → fine) k-means: a flat kc-cluster Lloyd fit
    * partitions the corpus into cells, then an INDEPENDENT kf-cluster
    * Lloyd fit runs inside every cell simultaneously — one distributed
    * job per round fits ALL kc fine sub-problems at once (the
    * assignment is the cell-indexed [[graft.expressions.KmeansArgmin2L]]
    * kernel; the update is a single (cell, fine) group-by whose
    * map-side combine collapses each partition to ≤ kc·kf vector
    * sums). This raises the effective cluster count to kc·kf — up to
    * 64·64 = 4096 — past [[kmeansFixedPoint]]'s k ≤ 64 literal-
    * centroid envelope, which is what SemDeDup-style curation needs at
    * corpus scale: the paper runs k in the tens of thousands, and
    * cluster sizes (hence the within-cluster quadratic pair join) only
    * stay flat if k tracks n. Per-row assignment cost is two fused
    * scans of ≤ 64 centroids (O(kc + kf), not O(kc·kf)); driver state
    * is ≤ kc·kf centroid vectors (~2 MB at 4096×64 dims) riding the
    * closure as one constant.
    *
    * Fine seeds are the kf lowest-id vectors of each cell (row_number
    * over the cell partition — the id-ordered flat-seed contract,
    * per cell); cells with fewer than kf rows seed that many fine
    * centroids (ragged cells are first-class in the kernel). Empty
    * fine clusters keep their previous centroid, exactly like the
    * flat update. Every step is the same BIGINT arithmetic as
    * [[kmeansCentroids]], so the DuckDB twin (coarse chain → per-cell
    * seed → unrolled fine rounds) matches bit for bit.
    *
    * Returns one row per input vector:
    * (idCol, cell, fine, cluster = cell·kf + fine, qdist) with qdist
    * the exact quantized squared-L2 distance to the winning FINE
    * centroid.
    */
  /** A trained two-level codebook: labeled coarse centroids plus the
    * per-cell fine centroid table (ragged — a cell seeds at most kf
    * fine centroids, fewer when it holds fewer training rows).
    */
  case class TwoLevelCodebook(coarse: Seq[(Long, Array[Long])],
                              fine: Array[Array[Array[Long]]], kf: Int)

  /** The two-level Lloyd fit alone — train ONCE on a corpus snapshot,
    * then assign any later increment with [[assignToTwoLevel]] (the
    * [[kmeansCentroids]]/[[assignToCentroids]] daily-curation shape,
    * lifted to the hierarchy: clusters stay comparable across
    * increments because BOTH levels of the codebook are frozen).
    */
  def kmeansTwoLevelCodebook(points: DataFrame, idCol: String, embCol: String,
                             kc: Int, kf: Int, rounds: Int): TwoLevelCodebook = {
    require(kc >= 1 && kc <= 64, s"kc must be 1..64, got $kc")
    require(kf >= 2 && kf <= 64, s"kf must be 2..64, got $kf")
    require(rounds >= 1 && rounds <= 20, s"rounds must be 1..20, got $rounds")
    import graft.core.GraftSession.LineageOps
    val q = graft.core.Tables.widen(
        points.select(col(idCol).as("_k2_id"), quantize(col(embCol)).as("_k2_q")))
      .truncateLineage()
    val coarse = lloydLoop(q, "_k2_id", "_k2_q", kc, rounds)
    // cell assignment materialized once — the fine loop re-scans it
    // every round, and the coarse argmin must not re-run per round
    val withCell = argminAssign(q, "_k2_id", "_k2_q", coarse)
      .select(col("_k2_id"), col("_k2_q"), col("cluster").as("_k2_cell"))
      .truncateLineage()
    // kf lowest-id seeds per cell — a bounded pull (≤ kc·kf rows); the
    // row_number ≤ k filter rides the TopKPerKey physical operator
    val seedW = org.apache.spark.sql.expressions.Window
      .partitionBy("_k2_cell").orderBy("_k2_id")
    val seedRows = withCell
      .withColumn("_rn", row_number().over(seedW)).where(col("_rn") <= kf)
      .select(col("_k2_cell"), (col("_rn") - 1).cast("long").as("_fid"), col("_k2_q"))
      .collect()
    // ragged per-cell tables: cells the coarse fit left empty stay
    // empty (no rows can land there, the kernel nulls defensively)
    val fine: Array[Array[Array[Long]]] = Array.fill(kc)(Array.empty)
    seedRows.groupBy(_.getLong(0)).foreach { case (cell, rs) =>
      fine(cell.toInt) = rs.sortBy(_.getLong(1)).map(_.getSeq[Long](2).toArray).toArray
    }
    def assign2l(): DataFrame =
      fineAssign(withCell, "_k2_id", "_k2_q", "_k2_cell", fine)
    val vecSum = udaf(new LongVecSum)
    var r = 0
    while (r < rounds) {
      // ALL cells' fine updates in one aggregation — ≤ kc·kf result
      // rows collect to the driver (the bounded-centroid-pull pattern)
      val upd = assign2l()
        .groupBy("_k2_cell", "_fid")
        .agg(vecSum(col("_k2_q")).as("s"), count(lit(1)).as("cnt"))
        .select(col("_k2_cell"), col("_fid"),
          expr("transform(s, x -> x div cnt)").as("c"))
        .collect()
      upd.foreach { row =>
        // same loud-failure doctrine as the flat update loop: a null
        // (cell, fid) key is a corrupt training vector, not a state
        require(!row.isNullAt(0) && !row.isNullAt(1),
          "two-level k-means update saw a null (cell, fine) key: corrupt " +
            "vector (null element or dimension mismatch) in the training input")
        fine(row.getLong(0).toInt)(row.getLong(1).toInt) =
          row.getSeq[Long](2).toArray
      }
      r += 1
    }
    TwoLevelCodebook(coarse, fine, kf)
  }

  /** The fine-level argmin projection over a frame carrying
    * (idC, qC, cellC) — appends (_fid, qdist) via the cell-indexed
    * kernel; shared by the fit loop and the frozen-codebook path.
    */
  private def fineAssign(frame: DataFrame, idC: String, qC: String,
                         cellC: String,
                         fine: Array[Array[Array[Long]]]): DataFrame = {
    val w = graft.expressions.GraftFunctions.kmeansArgmin2l(
      col(cellC), col(qC),
      fine.map(_.map(_.toSeq).toSeq).toSeq,
      fine.map(cs => cs.indices.map(_.toLong).toSeq).toSeq)
    frame.select(col(idC), col(qC), col(cellC), w.as("_w"))
      .select(col(idC), col(qC), col(cellC),
        col("_w.cluster").as("_fid"), col("_w.qdist").as("qdist"))
  }

  /** Zero-shuffle assignment of arbitrary points against a FROZEN
    * two-level codebook: one fused projection evaluates the coarse
    * argmin (cell) and the cell's fine argmin per row — no join, no
    * exchange, O(kc + kf) centroid comparisons. Output matches
    * [[kmeansTwoLevel]]'s shape:
    * (idCol, cell, fine, cluster = cell·kf + fine, qdist).
    *
    * TRAINED-EMPTY cells are never assignment targets: a coarse cell
    * the training corpus left empty has no fine centroids, so an
    * increment vector whose unrestricted coarse argmin landed there
    * (empty cells keep a stale centroid that CAN strictly win for
    * out-of-snapshot points) would get a null fine assignment —
    * breaking the one-row-per-input-vector contract downstream (the
    * oracle twin's cell join would drop the row; semanticDedupFrom
    * would keep a null-cluster singleton silently). Contract: the
    * coarse argmin considers only NON-EMPTY cells, i.e. every point is
    * assigned to the nearest cell that actually has a codebook.
    * Training points are unaffected — their argmin cell is non-empty
    * by definition (it contains them) — so the full-training path
    * ([[kmeansTwoLevel]]) is bit-identical with or without the filter.
    */
  def assignToTwoLevel(points: DataFrame, idCol: String, embCol: String,
                       cb: TwoLevelCodebook): DataFrame = {
    val nonEmpty = cb.coarse.filter { case (cid, _) => cb.fine(cid.toInt).nonEmpty }
    require(nonEmpty.nonEmpty, "two-level codebook has no trained (non-empty) cells")
    val q = points.select(col(idCol).as("_a2_id"), quantize(col(embCol)).as("_a2_q"))
    val withCell = argminAssign(q, "_a2_id", "_a2_q", nonEmpty)
      .select(col("_a2_id"), col("_a2_q"), col("cluster").as("_a2_cell"))
    fineAssign(withCell, "_a2_id", "_a2_q", "_a2_cell", cb.fine)
      .select(col("_a2_id").as(idCol), col("_a2_cell").as("cell"),
        col("_fid").as("fine"),
        (col("_a2_cell") * cb.kf + col("_fid")).as("cluster"), col("qdist"))
  }

  def kmeansTwoLevel(points: DataFrame, idCol: String, embCol: String,
                     kc: Int, kf: Int, rounds: Int): DataFrame =
    assignToTwoLevel(points, idCol, embCol,
      kmeansTwoLevelCodebook(points, idCol, embCol, kc, kf, rounds))

  /** Greedy k-center selection (Gonzalez 1985 farthest-first
    * traversal) — diversity-driven coreset/data-pruning: pick the k
    * corpus vectors that 2-approximate the minimal covering radius,
    * then assign every vector to its nearest pick. The selection a
    * "maximally diverse subset" curation stage wants, complementing
    * [[kmeansFixedPoint]] (which balances mass, not coverage).
    *
    * Deterministic: the seed is the lowest id, each round adds the
    * point with the MAX min-distance to the chosen set (ties → lowest
    * id), and distances are the same quantized BIGINT squared-L2 as
    * k-means — so the DuckDB oracle unrolls the same k−1 farthest-
    * first rounds as chained CTEs and the full assignment matches bit
    * for bit.
    *
    * Scale shape: each round is ONE zero-shuffle map (min-distance to
    * the ≤ k driver-held center literals) plus ONE scalar max-struct
    * aggregation (map-side combined to one row per partition; the new
    * center's vector rides inside the struct, so there is no second
    * lookup job). k rounds total; the final assignment is the same
    * zero-shuffle argmin as k-means. Labels are the CENTER vector ids.
    */
  def kCenterSelect(points: DataFrame, idCol: String, embCol: String,
                    k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be 2..64 (centers ride the plan as literals), got $k")
    import graft.core.GraftSession.LineageOps
    // k farthest-first rounds + the final assignment each scan the
    // quantized projection — materialize it once (the kmeans pattern),
    // widened so the k per-round distance scans parallelize even off
    // a single-row-group source (see kmeansCentroids).
    val q = graft.core.Tables.widen(
        points.select(col(idCol).as("_kc_id"), quantize(col(embCol)).as("_kc_q")))
      .truncateLineage()
    // fewer rows than k would make the farthest-first argmax re-pick
    // an existing center once every point is chosen (max min-distance
    // 0) — duplicate centers, silently fewer than k distinct picks;
    // fail loudly like kmeansCentroids' seed guard
    val n = q.count()
    require(n >= k, s"kCenterSelect needs at least k=$k points, got $n")
    val seedRow = q.orderBy("_kc_id").limit(1).collect()
    require(seedRow.nonEmpty, "kCenterSelect on an empty input")
    var cents: Vector[(Long, Array[Long])] =
      Vector((seedRow(0).getLong(0), seedRow(0).getSeq[Long](1).toArray))
    var r = 1
    while (r < k) {
      // min distance over the centers picked so far — the argminAssign
      // native kernel's qdist field, so round r's plan tree stays O(1)
      // in r (k driver rounds re-analyze this expression k times) and
      // the distance scan is a fused loop, not r interpreted lambdas
      val md = graft.expressions.GraftFunctions.kmeansArgmin(
        col("_kc_q"), cents.map(_._2.toSeq), cents.map(_._1))
        .getField("qdist")
      // farthest-first pick: max over (minDist, -id, vector) — the
      // vector never participates in the comparison (ids are unique)
      // but rides along so one aggregation yields the next center.
      val top = q
        .select(struct(md.as("md"), (-col("_kc_id")).as("nid"),
          col("_kc_q").as("v")).as("s"))
        .agg(max(col("s"))).head().getStruct(0)
      cents :+= ((-top.getLong(1), top.getSeq[Long](2).toArray))
      r += 1
    }
    argminAssign(q, "_kc_id", "_kc_q", cents)
      .select(col("_kc_id").as(idCol), col("cluster").as("center"), col("qdist"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * cluster the corpus with [[kmeansFixedPoint]], find cosine-≥-τ
    * pairs WITHIN each cluster only, close them into dup groups with
    * [[Dedup.connectedComponents]], and keep the lowest id per group.
    *
    * The whole point of the clustering stage is the scale shape: the
    * quadratic pair join is an equi-join on the cluster id, so the
    * all-pairs work is Σ(cluster size²) instead of n² — with k sized
    * so clusters fit comfortably per task (the paper runs k in the
    * tens of thousands at corpus scale; raise k, not τ, when clusters
    * grow). Pairs never cross clusters, so components stay
    * cluster-local by construction — same contract as the paper.
    *
    * Determinism: the cluster assignment is integer-exact, and the
    * pair predicate thresholds the ROUNDED cosine (4 dp, strict
    * left-to-right double dot on both engines) — the
    * `dedup_embedding_cosine` convention.
    *
    * Returns one verdict row per vector:
    * (idCol, cluster, canon, keep) — `canon` the dup-group
    * representative (own id when unpaired), `keep` = id == canon.
    */
  def semanticDedup(points: DataFrame, idCol: String, embCol: String,
                    k: Int, rounds: Int, tau: Double): DataFrame =
    semanticDedupFrom(
      kmeansFixedPoint(points, idCol, embCol, k, rounds),
      points, idCol, embCol, tau)

  /** SemDeDup over the TWO-LEVEL clustering — the corpus-scale form:
    * effective cluster count kc·kf (up to 4096) keeps within-cluster
    * pair work Σ size² flat long past the flat fit's k ≤ 64 envelope.
    * Same pair predicate, closure, and verdict contract as
    * [[semanticDedup]]; only the partition the quadratic join is
    * confined to changes.
    */
  def semanticDedupTwoLevel(points: DataFrame, idCol: String, embCol: String,
                            kc: Int, kf: Int, rounds: Int, tau: Double): DataFrame =
    semanticDedupFrom(
      kmeansTwoLevel(points, idCol, embCol, kc, kf, rounds),
      points, idCol, embCol, tau)

  /** The dedup stage alone, over ANY assignment table carrying
    * (idCol, cluster) — flat k-means, two-level, or an external
    * codebook's assignment. Factored so the quadratic-confinement
    * machinery is written once.
    */
  def semanticDedupFrom(asnRaw: DataFrame, points: DataFrame, idCol: String,
                        embCol: String, tau: Double): DataFrame = {
    import graft.core.GraftSession.LineageOps
    val asn = asnRaw.select(col(idCol).as("_sd_id"), col("cluster"))
    // referenced THREE times downstream (both pair-join sides + the
    // final verdict decoration) — materialize once or the assignment
    // re-plans and re-executes per reference
    val withE = asn.join(
      points.select(col(idCol).as("_sd_id"),
        col(embCol).cast("array<double>").as("_sd_e")),
      "_sd_id")
      .truncateLineage()
    val lhs = withE.select(col("cluster"), col("_sd_id").as("id_a"), col("_sd_e").as("ea"))
    val rhs = withE.select(col("cluster"), col("_sd_id").as("id_b"), col("_sd_e").as("eb"))
    val pairs = lhs.join(rhs, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .where(round(Similarity.cosine(col("ea"), col("eb")), 4) >= tau)
      .select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    withE.select(col("_sd_id"), col("cluster"))
      .join(cc.select(col("node").as("_sd_id"), col("lbl")), Seq("_sd_id"), "left")
      .select(col("_sd_id").as(idCol), col("cluster"),
        coalesce(col("lbl"), col("_sd_id")).as("canon"),
        (coalesce(col("lbl"), col("_sd_id")) === col("_sd_id")).as("keep"))
  }

  /** Distributed power iteration for the TOP PRINCIPAL DIRECTION of
    * the (uncentered) embedding Gram matrix — the first step of PCA /
    * spectral methods, covariance-free: each round computes
    * w = Σ_rows x·(xᵀv) — one zero-shuffle projection (per-row dot
    * with the BROADCAST direction literal) plus one map-side-combined
    * decimal hash-agg ([[powerIterationRoundPlan]]); the d-long
    * direction is the only
    * driver state (the kmeans centroid-pull pattern). ENTIRELY in
    * integer arithmetic: coordinates quantized once; each round ends
    * with an integer rescale w div max(1, max|w| div 1e6), keeping
    * DIRECTION coordinates ≤ ~1e6 so each PER-ROW product x·(xᵀv)
    * stays well under BIGINT (≈ dim·Q²·1e6 per element). The
    * AGGREGATED sum Σ_rows x·(xᵀv) grows linearly with row count and
    * would overflow BIGINT near n·dim ≈ 9e18/(Q²·1e6) ≈ 1e5 row·dims,
    * so the per-round reduction is an EXACT 128-bit sum: per-element
    * contributions cast to DECIMAL(38,0) and hash-aggregated by
    * dimension index (native codegen'd sum — envelope 1e38, beyond
    * any corpus), matching the DuckDB oracle's HUGEINT sum digit for
    * digit. Only the RESCALED direction must fit BIGINT, and the
    * ≤ ~1e6 rescale guarantees that at any n. Deterministic where a
    * float normalize would drift per round; the oracle unrolls the
    * SAME rounds as chained CTEs, bit for bit.
    *
    * Returns (dim_idx, v) — the unnormalized fixed-point direction
    * after `rounds` iterations (direction, not unit vector: callers
    * normalize in float for reporting only).
    */
  /** One power-iteration round's reduction, exposed as a DataFrame so
    * its plan shape is pinnable: zero-shuffle projection (per-row dot
    * with the broadcast direction literal — per-element contributions
    * are Long-safe at ≤ dim·Q²·1e6), posexplode by dimension index,
    * then a native DECIMAL(38,0) hash-agg. The partial agg collapses
    * each partition to dim rows, so the single exchange moves
    * dim·partitions rows regardless of corpus size, and the 128-bit
    * sum never overflows (envelope 1e38). Input must carry `_pi_q`.
    */
  private[graft] def powerIterationRoundPlan(q: DataFrame, v: Array[Long]): DataFrame = {
    val vLit = array(v.map(lit(_)): _*)
    q.withColumn("_s", aggregate(
        zip_with(col("_pi_q"), vLit, (a, b) => a * b),
        lit(0L), (acc, y) => acc + y))
      .select(posexplode(transform(col("_pi_q"), c => c * col("_s"))).as(Seq("j", "_c")))
      .groupBy("j")
      .agg(sum(col("_c").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("w"))
  }

  def powerIteration(points: DataFrame, embCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be 1..20, got $rounds")
    import graft.core.GraftSession.LineageOps
    val spark = points.sparkSession
    val q = points.select(quantize(col(embCol)).as("_pi_q"))
      .where(size(col("_pi_q")) > 0)
      .truncateLineage()
    val first = q.take(1)
    require(first.nonEmpty,
      "powerIteration requires at least one non-empty embedding")
    val dim = first(0).getSeq[Long](0).size
    var v: Array[Long] = Array.fill(dim)(1L)
    var r = 0
    while (r < rounds) {
      val rows = powerIterationRoundPlan(q, v).collect()
      val w = new Array[BigInt](dim)
      rows.foreach(rr => w(rr.getInt(0)) = BigInt(rr.getDecimal(1).toBigInteger))
      val dRaw = w.map(_.abs).max / BigInt(1000000L)
      val d = if (dRaw < 1) BigInt(1) else dRaw
      // BigInt `/`, Long `/` and DuckDB `//` all truncate toward zero,
      // and |w/d| ≤ ~2e6, so the narrowing is exact and safe.
      v = w.map(x => (x / d).toLong)
      r += 1
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, j) => (j.toLong, x) }.toSeq
      .toDF("dim_idx", "v")
  }
}
