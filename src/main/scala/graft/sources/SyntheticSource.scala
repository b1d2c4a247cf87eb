package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic table
  * (`id, bucket = id % 16, fp = md5(id)`), the engine's template for
  * wrapping ANY external system as a first-class Spark source. The
  * connector demonstrates the three contracts that make a custom
  * source scale-correct rather than a driver-side crutch:
  *
  *  - SPLITS: the row range is planned as `slices` independent
  *    [[InputPartition]]s, so a 1000-executor cluster reads in
  *    parallel with no driver materialization;
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): a query
  *    touching only `bucket` never computes/transfers `fp` — the
  *    reader emits exactly the pruned schema;
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): range predicates
  *    on `id` narrow the generated span BEFORE rows exist. Handled
  *    filters are consumed exactly (not re-evaluated by Spark);
  *    anything else is left for the engine.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticSource")
  * .option("rows", n).option("slices", k).load()`.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.tableSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable
}

object SyntheticSource {
  val tableSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("fp", StringType, nullable = false)))

  private[sources] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}

private[sources] class SyntheticTable extends Table with SupportsRead {
  override def name(): String = "graft_synthetic"
  override def schema(): StructType = SyntheticSource.tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      options.getLong("rows", 1024L),
      options.getInt("slices", 8))
}

private[sources] class SyntheticScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = SyntheticSource.tableSchema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int  => Some(i.toLong)
    case l: Long => Some(l)
    case _       => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val remaining = filters.filter {
      case EqualTo("id", v) => asLong(v) match {
        case Some(x) => lo = math.max(lo, x); hi = math.min(hi, x + 1); false
        case None => true
      }
      case GreaterThan("id", v) => asLong(v) match {
        case Some(x) => lo = math.max(lo, x + 1); false
        case None => true
      }
      case GreaterThanOrEqual("id", v) => asLong(v) match {
        case Some(x) => lo = math.max(lo, x); false
        case None => true
      }
      case LessThan("id", v) => asLong(v) match {
        case Some(x) => hi = math.min(hi, x); false
        case None => true
      }
      case LessThanOrEqual("id", v) => asLong(v) match {
        case Some(x) => hi = math.min(hi, x + 1); false
        case None => true
      }
      case _ => true
    }
    pushed = filters.diff(remaining)
    remaining
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SyntheticScan(lo, math.max(lo, hi), slices, required)
}

private[sources] class SyntheticScan(lo: Long, hi: Long, slices: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic range=[$lo, $hi) slices=$slices " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val span = hi - lo
    (0 until n).iterator.map { i =>
      SyntheticRange(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames)
}

private[sources] case class SyntheticRange(start: Long, end: Long)
    extends InputPartition

private[sources] class SyntheticReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map[Any] {
          case "id"     => id
          case "bucket" => (id % 16).toInt
          case "fp"     => UTF8String.fromString(
            SyntheticSource.md5Hex(id.toString))
        })
      override def close(): Unit = ()
    }
  }
}
