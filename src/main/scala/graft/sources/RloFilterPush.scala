package graft.sources

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate, Operators}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._

/** PARQUET ROW-GROUP FILTER PUSHDOWN for PLAIN reads of the DSv2
  * catalog — the within-segment half of scan pruning. Segment stats
  * route whole segments (RloStatsPruning); this pushes the same
  * predicates into the parquet reader so row-group zone maps and
  * dictionary pages skip I/O INSIDE the segments that survive — the
  * row-group discipline Spark's native parquet source applies via
  * ParquetFilters, re-expressed for the connector's reader.
  *
  * Soundness rules:
  *  - NEVER on a row-level-operation scan: copy-on-write must see
  *    every row of a touched group (the group-scan contract), so
  *    operation scans keep all filters as pure residuals.
  *  - Spark re-applies every filter above the scan (they stay
  *    residuals), so the pushdown only needs to never DROP a row the
  *    SQL semantics would keep. Every translated shape drops at most
  *    the rows the SQL filter drops (nulls fall out of eq/compare
  *    exactly as in SQL; untranslatable shapes push nothing).
  *  - Only columns of the INITIAL schema generation translate:
  *    append-only evolution guarantees every segment file carries
  *    them, so the predicate never references a column missing from
  *    a file's footer.
  *  - Decimal translates via exact unscaled-long rescale; a value
  *    that cannot rescale exactly refuses (sound: no pushdown).
  */
object RloFilterPush {

  /** AND of every translatable filter over gen-0 columns; None if
    * nothing translates. */
  def forFilters(filters: Seq[sources.Filter],
      gen0: StructType): Option[FilterPredicate] =
    filters.flatMap(translate(_, gen0)).reduceOption(FilterApi.and)

  private def typeOf(gen0: StructType, c: String): Option[DataType] =
    gen0.fields.find(_.name == c).map(_.dataType)

  private def daysOf(v: Any): Option[Int] = v match {
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case _ => None
  }

  private def microsOf(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  private def unscaledOf(d: DecimalType, v: Any): Option[Long] =
    v match {
      case b: java.math.BigDecimal =>
        try Some(b.setScale(d.scale).unscaledValue().longValueExact())
        catch { case _: ArithmeticException => None }
      case _ => None
    }

  /** The three comparison shapes per physical type, so each SQL
    * shape below is one table lookup. */
  private case class Ops(
      eq: Any => Option[FilterPredicate],
      lt: Any => Option[FilterPredicate],
      gt: Any => Option[FilterPredicate],
      ltEq: Any => Option[FilterPredicate],
      gtEq: Any => Option[FilterPredicate],
      isNull: () => FilterPredicate)

  private def opsFor(dt: DataType, name: String): Option[Ops] = {
    def intOps(conv: Any => Option[Int]): Ops = {
      val c = FilterApi.intColumn(name)
      Ops(v => conv(v).map(x => FilterApi.eq(c, Integer.valueOf(x))),
        v => conv(v).map(x => FilterApi.lt(c, Integer.valueOf(x))),
        v => conv(v).map(x => FilterApi.gt(c, Integer.valueOf(x))),
        v => conv(v).map(x => FilterApi.ltEq(c, Integer.valueOf(x))),
        v => conv(v).map(x => FilterApi.gtEq(c, Integer.valueOf(x))),
        () => FilterApi.eq(c, null.asInstanceOf[Integer]))
    }
    def longOps(conv: Any => Option[Long]): Ops = {
      val c = FilterApi.longColumn(name)
      Ops(v => conv(v).map(x => FilterApi.eq(c, java.lang.Long.valueOf(x))),
        v => conv(v).map(x => FilterApi.lt(c, java.lang.Long.valueOf(x))),
        v => conv(v).map(x => FilterApi.gt(c, java.lang.Long.valueOf(x))),
        v => conv(v).map(x => FilterApi.ltEq(c, java.lang.Long.valueOf(x))),
        v => conv(v).map(x => FilterApi.gtEq(c, java.lang.Long.valueOf(x))),
        () => FilterApi.eq(c, null.asInstanceOf[java.lang.Long]))
    }
    dt match {
      case IntegerType => Some(intOps {
        case i: java.lang.Integer => Some(i.intValue); case _ => None })
      case DateType => Some(intOps(daysOf))
      case LongType => Some(longOps {
        case l: java.lang.Long => Some(l.longValue)
        case i: java.lang.Integer => Some(i.longValue); case _ => None })
      case TimestampType => Some(longOps(microsOf))
      case d: DecimalType if d.precision <= 18 =>
        Some(longOps(unscaledOf(d, _)))
      case DoubleType =>
        val c = FilterApi.doubleColumn(name)
        def conv(v: Any): Option[java.lang.Double] = v match {
          case d: java.lang.Double => Some(d); case _ => None }
        Some(Ops(v => conv(v).map(FilterApi.eq(c, _)),
          v => conv(v).map(FilterApi.lt(c, _)),
          v => conv(v).map(FilterApi.gt(c, _)),
          v => conv(v).map(FilterApi.ltEq(c, _)),
          v => conv(v).map(FilterApi.gtEq(c, _)),
          () => FilterApi.eq(c, null.asInstanceOf[java.lang.Double])))
      case StringType =>
        val c = FilterApi.binaryColumn(name)
        def conv(v: Any): Option[Binary] = v match {
          case s: String => Some(Binary.fromString(s)); case _ => None }
        Some(Ops(v => conv(v).map(FilterApi.eq(c, _)),
          v => conv(v).map(FilterApi.lt(c, _)),
          v => conv(v).map(FilterApi.gt(c, _)),
          v => conv(v).map(FilterApi.ltEq(c, _)),
          v => conv(v).map(FilterApi.gtEq(c, _)),
          () => FilterApi.eq(c, null.asInstanceOf[Binary])))
      case _ => None
    }
  }

  private def translate(f: sources.Filter,
      gen0: StructType): Option[FilterPredicate] = {
    def ops(c: String): Option[Ops] =
      typeOf(gen0, c).flatMap(opsFor(_, c))
    f match {
      case sources.EqualTo(c, v) => ops(c).flatMap(_.eq(v))
      case sources.LessThan(c, v) => ops(c).flatMap(_.lt(v))
      case sources.LessThanOrEqual(c, v) => ops(c).flatMap(_.ltEq(v))
      case sources.GreaterThan(c, v) => ops(c).flatMap(_.gt(v))
      case sources.GreaterThanOrEqual(c, v) => ops(c).flatMap(_.gtEq(v))
      case sources.IsNull(c) => ops(c).map(_.isNull())
      case sources.In(c, vs) if vs.nonEmpty =>
        ops(c).flatMap { o =>
          val preds = vs.toSeq.map(o.eq)
          if (preds.forall(_.isDefined)) // partial OR would drop rows
            preds.flatten.reduceOption(FilterApi.or)
          else None
        }
      case sources.And(l, r) =>
        // AND may push either side alone (a conjunct subset is sound)
        (translate(l, gen0), translate(r, gen0)) match {
          case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
          case (a, b) => a.orElse(b)
        }
      case sources.Or(l, r) =>
        // OR must push both sides or nothing
        for (a <- translate(l, gen0); b <- translate(r, gen0))
          yield FilterApi.or(a, b)
      case _ => None
    }
  }
}
