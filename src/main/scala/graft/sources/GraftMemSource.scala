package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, IsNull, LessThan}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSource V2 in-memory table — the idiomatic Spark
  * re-expression of the reference's `TableSource` seam
  * (`datasource/mod.rs:20-28`: `schema(); scan(projection);
  * source_name()`) and its `MemTable`, the reference's ONLY source that
  * honours the projection argument (`memory.rs:31-41`; the CSV source
  * ignores it, `csv.rs:94-96`). Here BOTH pushdowns are first-class
  * Catalyst contracts instead of a hand-rolled scan parameter:
  *
  *   - column pruning via [[SupportsPushDownRequiredColumns]] — the
  *     scan materializes only the pruned schema, exactly the
  *     `scan(projection)` semantics;
  *   - predicate pushdown via [[SupportsPushDownFilters]] — EqualTo /
  *     GreaterThan / LessThan are evaluated INSIDE the partition
  *     reader; everything else is returned as residual for Spark to
  *     evaluate above the scan (the correct partial-pushdown
  *     contract — a source must never silently drop a filter it
  *     cannot run).
  *
  * Rows live in a driver-side registry keyed by table name (the
  * reference's `Catalog`, `catalog.rs:20-23`) and are split into up to
  * [[GraftMemTable.MaxSplits]] input partitions so even the memory
  * source exercises the multi-partition read path. local[*] shares one
  * JVM so the registry is reachable from "executors"; on a real
  * cluster a memory table this small would be a broadcast dimension —
  * for anything larger the same three classes would read an external
  * store, which is the point of the seam. The registry also records
  * the LAST pruned schema and pushed/residual filters per table so
  * specs can pin the pushdown contract itself, not just results.
  */
class GraftMemSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMemRegistry.schemaOf(options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftMemTable(properties.get("table"))

  override def supportsExternalMetadata(): Boolean = false
}

/** Driver-side table registry + pushdown telemetry (spec seam). */
object GraftMemRegistry {
  private val tables =
    new ConcurrentHashMap[String, (StructType, Seq[Row])]()
  private val prunedSchemas = new ConcurrentHashMap[String, StructType]()
  private val pushedFilters =
    new ConcurrentHashMap[String, Seq[Filter]]()
  private val residualFilters =
    new ConcurrentHashMap[String, Seq[Filter]]()

  def register(name: String, schema: StructType, rows: Seq[Row]): Unit =
    tables.put(name, (schema, rows))

  /** Registered table names (catalog listTables/tableExists). */
  def tableNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet().asScala.toSeq.sorted
  }

  def schemaOf(name: String): StructType = {
    val t = tables.get(name)
    require(t != null, s"graft-mem table not registered: $name")
    t._1
  }

  def rowsOf(name: String): Seq[Row] = {
    val t = tables.get(name)
    require(t != null, s"graft-mem table not registered: $name")
    t._2
  }

  private[sources] def recordPruned(name: String, s: StructType): Unit =
    prunedSchemas.put(name, s)
  private[sources] def recordFilters(name: String, pushed: Seq[Filter],
      residual: Seq[Filter]): Unit = {
    pushedFilters.put(name, pushed)
    residualFilters.put(name, residual)
  }

  /** Last pruned read schema the scan builder saw (spec assertion). */
  def lastPrunedSchema(name: String): Option[StructType] =
    Option(prunedSchemas.get(name))

  /** Last (pushed, residual) filter split (spec assertion). */
  def lastFilters(name: String): (Seq[Filter], Seq[Filter]) =
    (pushedFilters.getOrDefault(name, Nil),
      residualFilters.getOrDefault(name, Nil))

  private val pushedAggs = new ConcurrentHashMap[String, String]()
  private[sources] def recordAgg(name: String, a: String): Unit =
    pushedAggs.put(name, a)

  /** Last pushed aggregation description (spec assertion). */
  def lastAgg(name: String): Option[String] = Option(pushedAggs.get(name))

  /** Driver-side atomic install of a committed batch write: overwrite
    * swaps the whole entry; append concatenates onto the existing rows
    * (compute() gives per-key atomicity vs concurrent committers). */
  private[sources] def commitWrite(name: String, schema: StructType,
      rows: Seq[Row], overwrite: Boolean): Unit =
    tables.compute(name, (_, prev) =>
      if (overwrite || prev == null) (schema, rows)
      else (prev._1, prev._2 ++ rows))

  private val abortCounts = new ConcurrentHashMap[String, Integer]()
  private[sources] def recordAbort(name: String): Unit =
    abortCounts.merge(name, Integer.valueOf(1), (a, b) =>
      Integer.valueOf(a.intValue() + b.intValue()))

  /** How many batch writes aborted for this table (spec assertion). */
  def abortCount(name: String): Int =
    abortCounts.getOrDefault(name, Integer.valueOf(0)).intValue()
}

/** Row-level evaluation shared by the plain scan's readers and the
  * aggregate scan: pushed-filter predicates and external→catalyst
  * value conversion. */
private[sources] object GraftMemEval {
  def cmp(r: Row, idx: Int, v: Any): Int = (r.get(idx), v) match {
    case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue())
    case (a: Int, b: Number) =>
      java.lang.Long.compare(a.toLong, b.longValue())
    case (a: Double, b: Number) =>
      java.lang.Double.compare(a, b.doubleValue())
    case (a: String, b: String) => a.compareTo(b)
    case (x, _) => throw new IllegalArgumentException(
      s"graft-mem filter on unsupported type: $x vs $v")
  }

  def passes(r: Row, fieldIdx: Map[String, Int],
      filters: Array[Filter]): Boolean = filters.forall {
    case EqualTo(a, v) => r.get(fieldIdx(a)) != null &&
      cmp(r, fieldIdx(a), v) == 0
    case GreaterThan(a, v) => r.get(fieldIdx(a)) != null &&
      cmp(r, fieldIdx(a), v) > 0
    case LessThan(a, v) => r.get(fieldIdx(a)) != null &&
      cmp(r, fieldIdx(a), v) < 0
    case IsNull(a) => r.get(fieldIdx(a)) == null
    case IsNotNull(a) => r.get(fieldIdx(a)) != null
    case _ => true // unreachable: only the accepted kinds arrive here
  }

  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (x: Int, LongType) => x.toLong
    case (x, LongType) => x.asInstanceOf[Long]
    case (x, IntegerType) => x.asInstanceOf[Int]
    case (x, DoubleType) => x.asInstanceOf[Double]
    case (x, _) => x
  }
}

class GraftMemTable(name: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-mem:$name"
  override def schema(): StructType = GraftMemRegistry.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMemScanBuilder(name, schema(),
      options.getBoolean("pushAgg", false),
      Option(options.get("partitionKey")))

  /** WRITE path — the V2 two-phase commit protocol: executors buffer
    * rows per task and return them as [[WriterCommitMessage]]s on task
    * commit; NOTHING reaches the registry until the driver's
    * [[BatchWrite.commit]] installs all partitions in one atomic swap.
    * A failed task (or job) routes to abort() and the table is
    * untouched — the all-or-nothing contract a real sink implements
    * with staged files + a manifest swap; here the "manifest" is the
    * registry entry. `.mode(Overwrite)` negotiates [[SupportsTruncate]].
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(name, info)
}

object GraftMemTable { val MaxSplits = 4 }

class GraftMemScanBuilder(name: String, full: StructType,
    enableAgg: Boolean, partitionKey: Option[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    GraftMemRegistry.recordPruned(name, requiredSchema)
  }

  /** Accept the comparisons the reader can run; the rest is residual —
    * Spark keeps a Filter node above the scan for those. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case _: EqualTo | _: GreaterThan | _: LessThan => true
      case _: IsNull | _: IsNotNull => true
      case _ => false
    }
    pushed = ok
    GraftMemRegistry.recordFilters(name, ok.toSeq, residual.toSeq)
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (opt-in via the pushAgg read option): GROUP BY
    * plain columns with count(*)/min/max is computed INSIDE the source
    * and, because supportCompletePushDown is true for those shapes,
    * Catalyst plans NO Aggregate node at all — the scan's output IS
    * the final aggregate (readSchema = group columns ++ agg columns,
    * positional contract). Everything else returns false and Spark
    * aggregates above the scan as usual. */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    enableAgg && supportedAgg(a)

  override def pushAggregation(a: Aggregation): Boolean = {
    val ok = enableAgg && supportedAgg(a)
    if (ok) {
      agg = Some(a)
      GraftMemRegistry.recordAgg(name, a.toString)
    }
    ok
  }

  private def supportedAgg(a: Aggregation): Boolean =
    a.groupByExpressions.forall(_.isInstanceOf[NamedReference]) &&
      a.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => m.column.isInstanceOf[NamedReference]
        case m: Max => m.column.isInstanceOf[NamedReference]
        case _ => false
      }

  override def build(): Scan = agg match {
    case Some(a) => new GraftMemAggScan(name, full, pushed, a)
    case None =>
      new GraftMemScan(name, full, required, pushed, partitionKey)
  }
}

class GraftMemScan(name: String, full: StructType, required: StructType,
    filters: Array[Filter], partitionKey: Option[String] = None)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMemScan(table=$name, columns=${required.fieldNames.mkString(",")}," +
      s" pushed=${filters.mkString(",")}" +
      partitionKey.map(k => s", keyedBy=$k").getOrElse("") + ")"

  /** Distinct key values in sorted order — one input partition each, so
    * two tables registered with the same partitionKey report matching
    * KeyGroupedPartitioning partition values and join WITHOUT a
    * shuffle (storage-partitioned join). */
  private lazy val keyValues: Seq[Any] = partitionKey.map { k =>
    val i = full.fieldNames.indexOf(k)
    // stable order only (partition ids must be deterministic); Spark
    // matches the two sides by key VALUE, not by partition order
    GraftMemRegistry.rowsOf(name).map(_.get(i)).distinct
      .sortBy(String.valueOf(_))
  }.getOrElse(Nil)

  /** The connector-side partitioning report: with a partitionKey, the
    * data IS clustered by identity(key) across exactly one partition
    * per key value — the contract spark.sql.sources.v2.bucketing reads
    * to elide the join Exchange. */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    partitionKey match {
      case Some(k) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(org.apache.spark.sql.connector.expressions.Expressions
              .identity(k)), keyValues.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(GraftMemTable.MaxSplits)
    }

  override def planInputPartitions(): Array[InputPartition] =
    partitionKey match {
      case Some(k) =>
        val dt = full(full.fieldNames.indexOf(k)).dataType
        keyValues.map(v => GraftMemKeyedPartition(k, v,
          GraftMemEval.toCatalyst(v, dt)): InputPartition).toArray
      case None =>
        val n = GraftMemRegistry.rowsOf(name).size
        val splits = math.min(GraftMemTable.MaxSplits, math.max(1, n))
        (0 until splits)
          .map(i => GraftMemPartition(i, splits): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMemReaderFactory(name, full, required, filters)
}

case class GraftMemPartition(idx: Int, of: Int) extends InputPartition

/** One partition per key value; partitionKey() is what EnsureRequirements
  * compares across the two join sides to certify co-partitioning. */
case class GraftMemKeyedPartition(keyCol: String, keyValue: Any,
    catalystKey: Any) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array(catalystKey))
}

/** Complete aggregate pushdown: the scan's output rows ARE the final
  * grouped aggregate (group columns ++ agg values, positional).
  * Computed over the registry rows after pushed filters — for a memory
  * table the "source-side aggregation" runs here; a storage-backed
  * source would run the same contract against its native engine. One
  * partition: the aggregated frame is group-cardinality-sized. */
class GraftMemAggScan(name: String, full: StructType,
    filters: Array[Filter], agg: Aggregation) extends Scan with Batch {

  private val fieldIdx = full.fieldNames.zipWithIndex.toMap
  private def refName(e: Any): String = e match {
    case n: NamedReference => n.fieldNames.mkString(".")
  }
  private val groupCols: Seq[String] =
    agg.groupByExpressions.toSeq.map(refName)

  override def readSchema(): StructType = {
    val groupFields = groupCols.map(c => full(fieldIdx(c)))
    val aggFields = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => StructField("count(*)", LongType, false)
      case m: Min =>
        val c = refName(m.column); StructField(s"min($c)",
          full(fieldIdx(c)).dataType, full(fieldIdx(c)).nullable)
      case m: Max =>
        val c = refName(m.column); StructField(s"max($c)",
          full(fieldIdx(c)).dataType, full(fieldIdx(c)).nullable)
    }
    StructType(groupFields ++ aggFields)
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"GraftMemAggScan(table=$name, groupBy=${groupCols.mkString(",")}," +
      s" aggs=${agg.aggregateExpressions.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftMemPartition(0, 1))

  override def createReaderFactory(): PartitionReaderFactory = {
    val schema = readSchema()
    val rows = GraftMemRegistry.rowsOf(name)
      .filter(GraftMemEval.passes(_, fieldIdx, filters))
    val grouped = rows.groupBy(r => groupCols.map(c => r.get(fieldIdx(c))))
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Long, y: Long) => x < y
      case (x: Int, y: Int) => x < y
      case (x: Double, y: Double) => x < y
      case (x: String, y: String) => x < y
      case _ => throw new IllegalArgumentException(s"min/max on $a")
    }
    val out: Seq[Seq[Any]] = grouped.toSeq.map { case (key, rs) =>
      key ++ agg.aggregateExpressions.toSeq.map {
        case _: CountStar => rs.size.toLong
        case m: Min =>
          val i = fieldIdx(refName(m.column))
          rs.map(_.get(i)).filter(_ != null)
            .reduceOption((a, b) => if (lt(a, b)) a else b).orNull
        case m: Max =>
          val i = fieldIdx(refName(m.column))
          rs.map(_.get(i)).filter(_ != null)
            .reduceOption((a, b) => if (lt(a, b)) b else a).orNull
      }
    }
    new GraftMemMaterializedFactory(out, schema)
  }
}

/** Emits pre-computed external rows as InternalRows (agg scan path). */
class GraftMemMaterializedFactory(rows: Seq[Seq[Any]], schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val it = rows.iterator.map { vs =>
      new GenericInternalRow(schema.fields.zip(vs).map { case (f, v) =>
        GraftMemEval.toCatalyst(v, f.dataType)
      }: Array[Any])
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

class GraftMemReaderFactory(name: String, full: StructType,
    required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val fieldIdx = full.fieldNames.zipWithIndex.toMap
    val all = GraftMemRegistry.rowsOf(name)
    val mine = partition match {
      // round-robin split: partition i takes rows where idx % of == i
      case GraftMemPartition(idx, of) =>
        all.zipWithIndex.collect { case (r, j) if j % of == idx => r }
      // keyed split: exactly this key value's rows (SPJ partition)
      case GraftMemKeyedPartition(keyCol, v, _) =>
        val ki = fieldIdx(keyCol)
        all.filter(r => r.get(ki) == v)
    }

    val it = mine.filter(GraftMemEval.passes(_, fieldIdx, filters))
      .iterator.map { r =>
        new GenericInternalRow(required.fields.map(f =>
          GraftMemEval.toCatalyst(r.get(fieldIdx(f.name)), f.dataType))
          : Array[Any])
      }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** Negotiates the write: plain append by default; `.mode(Overwrite)`
  * reaches [[SupportsTruncate.truncate]] and flips the commit to a
  * whole-table swap. The `failPartition` option injects a task failure
  * for the abort-path spec. */
class GraftMemWriteBuilder(name: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftMemBatchWrite(
      name, info.schema(), overwrite,
      info.options().getInt("failPartition", -1))
  }
}

/** Driver-side coordinator of the two-phase commit: task-buffered rows
  * arrive as [[GraftMemCommit]] messages; commit() installs them in
  * partition order (deterministic row order regardless of task finish
  * order), abort() records the discard and leaves the table untouched. */
class GraftMemBatchWrite(name: String, schema: StructType,
    overwrite: Boolean, failPartition: Int) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftMemWriterFactory(schema, failPartition)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case m: GraftMemCommit => m }
      .sortBy(_.partitionId).toSeq.flatMap(_.rows)
    GraftMemRegistry.commitWrite(name, schema, rows, overwrite)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftMemRegistry.recordAbort(name)
}

case class GraftMemCommit(partitionId: Int, rows: Seq[Row])
    extends WriterCommitMessage

/** Executor-side writer: buffers external-typed Rows per task. The
  * conversion is the exact inverse of [[GraftMemEval.toCatalyst]] so a
  * committed write reads back bit-identically through the scan path. */
class GraftMemWriterFactory(schema: StructType, failPartition: Int)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]

      override def write(r: InternalRow): Unit = {
        if (partitionId == failPartition)
          throw new RuntimeException(
            s"graft-mem injected write failure (partition $partitionId)")
        buf += Row.fromSeq(schema.fields.zipWithIndex.map {
          case (f, i) =>
            if (r.isNullAt(i)) null
            else f.dataType match {
              case LongType => r.getLong(i)
              case IntegerType => r.getInt(i)
              case DoubleType => r.getDouble(i)
              case StringType => r.getUTF8String(i).toString
              case org.apache.spark.sql.types.BooleanType => r.getBoolean(i)
              case dt => throw new IllegalArgumentException(
                s"graft-mem write: unsupported type $dt")
            }
        }.toIndexedSeq)
      }

      override def commit(): WriterCommitMessage =
        GraftMemCommit(partitionId, buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
