package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-key top-k without a per-partition
  * sort.
  *
  * Spark plans `df.withColumn(rn, row_number over (partition by K
  * order by O)).where(rn <= k)` as WindowExec: shuffle by K, SORT the
  * entire partition, number every row, then throw away all but k per
  * key — O(n log n) per partition plus full materialization. The
  * equivalent bounded-heap plan is O(n log k) with O(keys·k) memory
  * and, crucially, a map-side partial pass so only ≤ k rows per key
  * per input partition ever shuffle (the same partial/final shape as
  * hash aggregation; a window cannot do this).
  *
  * Pieces (the (c) tier of SURVEY §7.3's custom-operator ladder):
  *   - [[TopKPerKeyNode]]   logical operator
  *   - [[TopKWindowRewrite]] optimizer Rule: Filter(rn <= k, Window(
  *     row_number)) ⇒ TopKPerKeyNode (disable with
  *     spark.graft.topk.enabled=false)
  *   - [[TopKStrategy]]     planner Strategy emitting partial + final
  *     [[TopKPerKeyExec]]; EnsureRequirements inserts the key shuffle
  *     between them
  *
  * Semantics match row_number exactly when the per-key order is total
  * (ties in the order are resolved arbitrarily, as with row_number).
  */
final case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], rankAttr: Attribute,
                                child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Rewrites only k ≤ MaxK: final-stage memory is O(keys·k). */
  val MaxK = 1024

  private def enabled: Boolean =
    // case-insensitive like Spark's own boolean confs: "True"/"TRUE"
    // from a YAML/Python config layer must not silently disable the
    // rewrite (falling back to the full-sort WindowExec with no
    // error is the worst kind of perf regression)
    conf.getConfString("spark.graft.topk.enabled", "true").trim.equalsIgnoreCase("true")

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(n: Int, _)) if a.semanticEquals(rank) => Some(n)
    case LessThan(a: Attribute, Literal(n: Int, _)) if a.semanticEquals(rank) => Some(n - 1)
    case GreaterThanOrEqual(Literal(n: Int, _), a: Attribute) if a.semanticEquals(rank) => Some(n)
    case GreaterThan(Literal(n: Int, _), a: Attribute) if a.semanticEquals(rank) => Some(n - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rank) => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  /** The filter's conjuncts must ALL concern the rank attribute: the
    * limit itself, plus any inferred IsNotNull(rank). Exactly one
    * limit conjunct is required; anything else leaves the plan alone.
    */
  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (nullChecks, rest) = conjuncts.partition {
      case IsNotNull(a: Attribute) => a.semanticEquals(rank)
      case _ => false
    }
    val _ = nullChecks // row_number is never null; checks are vacuous
    rest match {
      case Seq(one) => limitOf(one, rank)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transformUp {
    case Filter(cond,
      Window(Seq(al @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, child, _))
      if parts.nonEmpty && order.nonEmpty &&
        rankLimit(cond, al.toAttribute).exists(k => k >= 1 && k <= MaxK) =>
      TopKPerKeyNode(rankLimit(cond, al.toAttribute).get, parts, order,
        al.toAttribute, child)

    // Decorrelated LATERAL ... ORDER BY ... LIMIT k shape: the subquery
    // rewrite emits a GLOBAL Sort below an order-less row_number window
    // (ranking rides on the sort), usually with a Project in between.
    // Rank by the Sort's order directly and drop the global sort — the
    // most expensive node in that plan — keeping any projection ABOVE
    // the top-k (plus the rank attr) so its pruning still applies.
    case Filter(cond,
      Window(Seq(al @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, Seq(),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, SortBelowProjection(projList, sortOrder, sortChild), _))
      if parts.nonEmpty && sortOrder.nonEmpty &&
        AttributeSet(parts.flatMap(_.references))
          .subsetOf(sortChild.outputSet) &&
        rankLimit(cond, al.toAttribute).exists(k => k >= 1 && k <= MaxK) =>
      val topk = TopKPerKeyNode(rankLimit(cond, al.toAttribute).get, parts,
        sortOrder, al.toAttribute, sortChild)
      projList match {
        case Some(pl) => Project(pl :+ al.toAttribute, topk)
        case None => topk
      }
  }

  /** Matches a global Sort, optionally under a row-preserving Project
    * whose inputs (and the sort's own references) all come from the
    * sort's child — so the top-k can rank on the child directly.
    */
  private object SortBelowProjection {
    def unapply(p: LogicalPlan): Option[(Option[Seq[NamedExpression]], Seq[SortOrder], LogicalPlan)] =
      p match {
        case Sort(so, true, c, _) => Some((None, so, c))
        case Project(pl, Sort(so, true, c, _))
          if pl.forall(_.deterministic) &&
            AttributeSet(pl.flatMap(_.references) ++ so.flatMap(_.references))
              .subsetOf(c.outputSet) =>
          // determinism guard: hoisting a projection above the top-k
          // changes how many rows it evaluates on — only safe when the
          // expressions are pure
          Some((Some(pl), so, c))
        case _ => None
      }
  }
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, rankAttr, child) =>
      val partial = TopKPerKeyExec(k, keys, order, None, planLater(child))
      TopKPerKeyExec(k, keys, order, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. `rankAttr.isEmpty` = the map-side
  * partial stage (no distribution requirement, emits unranked rows);
  * defined = the final stage (requires clustering by keys, emits rows
  * ranked 1..k in sort order).
  */
final case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder],
                                rankAttr: Option[Attribute],
                                child: SparkPlan) extends UnaryExecNode {

  private def isPartial: Boolean = rankAttr.isEmpty

  override def nodeName: String =
    if (isPartial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (isPartial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val inputAttrs = child.output
    val partialLocal = isPartial
    val outputAttrs = output
    // Memory bound for the partial (map-side) stage: once this many
    // distinct keys are buffered, rows for NEW keys pass straight
    // through to the shuffle — always correct (partial top-k must only
    // emit a superset of each key's top k), it just stops saving
    // shuffle volume for the long tail. The final stage is bounded by
    // the OUTPUT size (≤ k rows per key survive the shuffle).
    // small seed capacity, grown on demand: PriorityQueue eagerly
    // allocates its backing array, and with large k over a long-tail
    // key distribution (most keys holding 1-2 rows) a (k+1)-slot
    // preallocation per key costs gigabytes of empty pointer arrays —
    // the OOM path where the WindowExec this operator replaces would
    // merely have spilled
    def newHeap(k: Int, ord: Ordering[InternalRow]) =
      new java.util.PriorityQueue[InternalRow](math.min(k, 16) + 1, ord.reverse)
    val maxPartialKeys =
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.partialMaxKeys", "262144").toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, inputAttrs)
      val ordering = RowOrdering.create(orderLocal, inputAttrs)
      // heap head = the WORST retained row (reverse order) so a better
      // incoming row evicts it in O(log k)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      if (partialLocal) {
        val buffered = iter.filter { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null && heaps.size() < maxPartialKeys) {
            heap = newHeap(kLocal, ordering)
            heaps.put(key.copy(), heap)
          }
          if (heap == null) true // over budget: pass through unbuffered
          else {
            if (heap.size < kLocal) heap.add(row.copy())
            else if (ordering.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
            false
          }
        }
        import scala.jdk.CollectionConverters._
        // pass-through rows stream first; buffered winners follow once
        // the input is exhausted
        buffered ++ heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
      } else {
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = newHeap(kLocal, ordering)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        val toUnsafe = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.values.asScala.iterator.flatMap { heap =>
          val rows = heap.iterator.asScala.toArray.sorted(ordering)
          rows.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            toUnsafe(joined(row, rankRow)).copy(): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
