package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic events table.
  *
  * The engine-capability demonstration for SURVEY §2.1 beyond file
  * formats: a full `TableProvider` whose ScanBuilder implements BOTH
  * pushdown surfaces —
  *   - [[SupportsPushDownFilters]]: event_id range predicates narrow
  *     the generated id interval at the SOURCE (the row is never
  *     produced), the way a real connector turns predicates into
  *     index/range reads; non-range filters stay with Spark as
  *     residuals.
  *   - [[SupportsPushDownRequiredColumns]]: the reader materializes
  *     only requested columns.
  *
  * Parallelism: the id interval splits into `partitions` equal input
  * partitions, each an independent [[PartitionReader]] — the unit a
  * 1000-executor cluster schedules.
  *
  * Usage: spark.read.format("graft.sources.EventGenSource")
  *   .option("rows", n).option("partitions", p).load()
  */
class EventGenSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EventGenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object EventGenSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val EventTypes: Array[String] =
    Array("click", "view", "purchase", "signup", "error")

  /** Deterministic row content for id — shared by reader and specs. */
  def userOf(id: Long): Long = (id * 2654435761L) % 150
  def typeOf(id: Long): String = EventTypes((id % EventTypes.length).toInt)
  def valueOf(id: Long): Double = (id % 1000) / 10.0
}

class EventGenTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"event_gen($rows)"
  override def schema(): StructType = EventGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventGenScanBuilder(rows, partitions)
}

class EventGenScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L            // inclusive
  private var hi = rows          // exclusive
  private var pushed = Array.empty[Filter]
  private var required = EventGenSource.schema

  // Literals arrive however the planner boxed them (Long, Integer,
  // Short…) — accept any INTEGRAL boxing. Fractional values must stay
  // residual: longValue() would truncate them and an accepted filter is
  // never re-checked by Spark, so `< 599.5` pushed as `< 599` would
  // silently drop a qualifying row.
  private object IntegralValue {
    def unapply(v: Any): Option[Long] = v match {
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        Some(n.asInstanceOf[java.lang.Number].longValue())
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("event_id", IntegralValue(v)) =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("event_id", IntegralValue(v)) =>
        lo = math.max(lo, v); true
      case LessThan("event_id", IntegralValue(v)) =>
        hi = math.min(hi, v); true
      case LessThanOrEqual("event_id", IntegralValue(v)) =>
        hi = math.min(hi, v + 1); true
      case EqualTo("event_id", IntegralValue(v)) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new EventGenScan(lo, hi, partitions, required)
}

case class EventGenRange(lo: Long, hi: Long) extends InputPartition

class EventGenScan(lo: Long, hi: Long, partitions: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"EventGenScan range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (lo until hi by per).map(s =>
      EventGenRange(s, math.min(hi, s + per))).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventGenReaderFactory(required)
}

class EventGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[EventGenRange]
    new EventGenReader(r.lo, r.hi, required)
  }
}

class EventGenReader(lo: Long, hi: Long, required: StructType)
    extends PartitionReader[InternalRow] {

  private var id = lo - 1
  // one getter per REQUIRED column, bound once — pruned columns are
  // never materialized
  private val getters: Array[Long => Any] = required.fieldNames.map {
    case "event_id" => (i: Long) => i
    case "user_id" => (i: Long) => EventGenSource.userOf(i)
    case "event_type" => (i: Long) => UTF8String.fromString(EventGenSource.typeOf(i))
    case "value" => (i: Long) => EventGenSource.valueOf(i)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def next(): Boolean = { id += 1; id < hi }
  override def get(): InternalRow = InternalRow.fromSeq(getters.map(_(id)).toSeq)
  override def close(): Unit = ()
}
