package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic table
  * (`id, bucket = id % 16, fp = md5(id)`), the engine's template for
  * wrapping ANY external system as a first-class Spark source. The
  * connector demonstrates the four contracts that make a custom
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
  *  - AGGREGATE PUSHDOWN ([[SupportsPushDownAggregates]]):
  *    COUNT/SUM/MIN/MAX (± GROUP BY bucket) answered in closed form —
  *    16 pre-aggregated rows instead of row generation, composing
  *    with the pushed id range (see [[SyntheticAggScan]]).
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
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = SyntheticSource.tableSchema
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var aggSpec: Option[Seq[String]] = None
  private var aggGrouped: Boolean = false

  /** AGGREGATE PUSHDOWN ([[SupportsPushDownAggregates]]): COUNT(*) /
    * MIN(id) / MAX(id) / SUM(id), optionally grouped by `bucket`, are
    * answered in CLOSED FORM from the generator's arithmetic — the
    * reader emits 1 row (or 16 group rows) per scan without ever
    * materializing the underlying rows, the way a real warehouse
    * source answers aggregates from zone-map/footer metadata. Complete
    * pushdown: Spark consumes the scan output as the final result (no
    * aggregation operator left in the plan). */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some((funcs, grouped)) =>
        aggSpec = Some(funcs); aggGrouped = grouped; true
      case None => false
    }

  /** Returns (aggregate tags in order, groupedByBucket) when every
    * piece is expressible in closed form, else None. */
  private def translate(agg: Aggregation)
      : Option[(Seq[String], Boolean)] = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        Some(f.fieldNames()(0))
      case _ => None
    }
    val grouped = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(g) if fieldOf(g).contains("bucket") => Some(true)
      case _ => None
    }
    val funcs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some("count")
      case m: Min => fieldOf(m.column).filter(_ == "id").map(_ => "min")
      case m: Max => fieldOf(m.column).filter(_ == "id").map(_ => "max")
      case s: Sum if !s.isDistinct =>
        fieldOf(s.column).filter(_ == "id").map(_ => "sum")
      case _ => None
    }
    for (g <- grouped; fs <- sequence(funcs)) yield (fs, g)
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

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

  override def build(): Scan = aggSpec match {
    case Some(funcs) =>
      new SyntheticAggScan(lo, math.max(lo, hi), funcs, aggGrouped)
    case None => new SyntheticScan(lo, math.max(lo, hi), slices, required)
  }
}

/** Closed-form aggregate scan: one partition, one pass over at most 16
  * residue classes. For bucket r in [lo, hi): first = smallest id ≥ lo
  * with id ≡ r (mod 16), n = residue-class size, and min/max/sum follow
  * from the arithmetic progression — no row generation at any `rows`. */
private[sources] class SyntheticAggScan(lo: Long, hi: Long,
    funcs: Seq[String], grouped: Boolean) extends Scan with Batch {

  override def readSchema(): StructType = {
    val aggFields = funcs.zipWithIndex.map {
      case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i)       => StructField(s"agg_$i", LongType, nullable = true)
    }
    val groupFields =
      if (grouped) Seq(StructField("bucket", IntegerType, nullable = false))
      else Nil
    StructType(groupFields ++ aggFields)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic range=[$lo, $hi) " +
      s"PushedAggregates=[${funcs.mkString(", ")}]" +
      (if (grouped) " GroupedBy=[bucket]" else "")

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticRange(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val fs = funcs
    val g = grouped
    (p: InputPartition) => {
      val r = p.asInstanceOf[SyntheticRange]
      val groups: Seq[(Int, Long, Long, Long)] = // (bucket, n, first, last)
        (0 until 16).flatMap { b =>
          val first = r.start + ((b - r.start % 16 + 16) % 16)
          if (first >= r.end) None
          else {
            val n = (r.end - 1 - first) / 16 + 1
            Some((b, n, first, first + 16 * (n - 1)))
          }
        }.filter(_._2 > 0)
      val out: Seq[Seq[(Int, Long, Long, Long)]] =
        if (g) groups.map(Seq(_)) else Seq(groups)
      val rows = out.filter(_.nonEmpty).map { gs =>
        val n = gs.map(_._2).sum
        val mn = gs.map(_._3).min
        val mx = gs.map(_._4).max
        val sm = gs.map { case (_, k, f, l) => k * (f + l) / 2 }.sum
        val aggVals = fs.map[Any] {
          case "count" => n
          case "min"   => mn
          case "max"   => mx
          case "sum"   => sm
        }
        val all = if (g) gs.head._1 +: aggVals else aggVals
        new GenericInternalRow(all.toArray)
      }
      new PartitionReader[InternalRow] {
        private val it = rows.iterator
        private var cur: InternalRow = _
        override def next(): Boolean = {
          if (it.hasNext) { cur = it.next(); true } else false
        }
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }
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
