package graft.sql

import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Translates the scan's residual source filters into a parquet
  * `FilterPredicate` for ONE data file, remapping current column names to
  * the names stored in that file (column-ID schema evolution) and keeping
  * only predicates whose stored type translates exactly.
  *
  * This is what makes manifest-level pruning carry INSIDE files: parquet-mr
  * evaluates the predicate against row-group statistics (and dictionaries /
  * bloom filters where present), so a range query over a `compact(sortBy)`
  * or Z-ordered file reads only the row groups whose stats overlap — without
  * it, clustering only ever pruned at whole-file granularity.
  *
  * Conservative by construction — dropping a predicate costs I/O, never
  * rows, because the scan never absorbs filters (`pushedFilters()` is empty
  * and Spark re-applies them post-scan):
  *  - widened columns (stored INT, queried BIGINT) are skipped: the stored
  *    value space differs from the predicate's;
  *  - columns absent from the file are skipped (parquet throws on unknown
  *    predicate columns; absence means "all null", which stats can't prune);
  *  - `Or`/`Not` translate only when every leaf does (a partial `Or` or
  *    `Not` would be unsound); a partial `And` keeps its translatable side.
  */
object GraftParquetFilters {

  // build() runs on the driver once PER FILE during partition planning, but
  // files share a handful of schemaIds — memoize the DataType JSON parse or
  // a several-thousand-file scan pays tens of thousands of redundant json4s
  // parses in planning latency (bounded: distinct type-json strings)
  private val typeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()
  private[sql] def typeOf(json: String): DataType =
    typeCache.computeIfAbsent(json, DataType.fromJson(_))

  def build(filters: Seq[Filter], cols: Seq[ColSpec]): Option[FilterPredicate] = {
    val byName = cols.filter(c =>
      c.storedName != null && c.storedTypeJson == c.outTypeJson)
      .map(c => c.outName -> c).toMap
    filters.flatMap(translate(_, byName)).reduceOption(FilterApi.and)
  }

  /** `exact = true` forbids the partial-And relaxation: under a Not, a
    * SUPERSET child predicate would negate into a SUBSET — which prunes row
    * groups that contain matching rows. Everywhere else supersets are safe
    * (they only weaken pruning) and propagate soundly through And and Or. */
  private def translate(f: Filter, byName: Map[String, ColSpec],
      exact: Boolean = false): Option[FilterPredicate] = f match {
    case EqualTo(a, v) if v != null => leaf(a, byName)("eq", v)
    case EqualNullSafe(a, v) if v != null => leaf(a, byName)("eq", v)
    case GreaterThan(a, v) if v != null => leaf(a, byName)("gt", v)
    case GreaterThanOrEqual(a, v) if v != null => leaf(a, byName)("gtEq", v)
    case LessThan(a, v) if v != null => leaf(a, byName)("lt", v)
    case LessThanOrEqual(a, v) if v != null => leaf(a, byName)("ltEq", v)
    case IsNull(a) => leaf(a, byName)("isNull", null)
    case IsNotNull(a) => leaf(a, byName)("isNotNull", null)
    case In(a, vs) if vs.nonEmpty && vs.length <= 20 && !vs.contains(null) =>
      val eqs = vs.toSeq.map(v => leaf(a, byName)("eq", v))
      if (eqs.forall(_.isDefined)) eqs.flatten.reduceOption(FilterApi.or) else None
    case And(l, r) => // partial And is sound (superset) — unless exactness is required
      (translate(l, byName, exact), translate(r, byName, exact)) match {
        case (Some(a), Some(b)) => Some(FilterApi.and(a, b))
        case _ if exact => None
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) => // partial Or is NOT sound — both sides or nothing
      for (a <- translate(l, byName, exact); b <- translate(r, byName, exact))
        yield FilterApi.or(a, b)
    case Not(c) => // negation flips super/subset — child must translate exactly
      translate(c, byName, exact = true).map(FilterApi.not)
    case _ => None
  }

  /** One comparison on the file's STORED column name/type. `isNull` /
    * `isNotNull` ride parquet's `eq(col, null)` / `notEq(col, null)`. */
  private def leaf(attr: String, byName: Map[String, ColSpec])(
      op: String, v: Any): Option[FilterPredicate] = {
    val spec = byName.get(attr).getOrElse(return None)
    val name = spec.storedName
    def nullOk[T <: AnyRef](x: => T): T = if (v == null) null.asInstanceOf[T] else x
    (GraftParquetFilters.typeOf(spec.storedTypeJson), v) match {
      case (LongType, _) =>
        val c = FilterApi.longColumn(name)
        val x = nullOk(java.lang.Long.valueOf(v match {
          case l: Long => l
          case i: Int => i.toLong
          case _ => return None
        }))
        Some(op match {
          case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
          case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
          case "ltEq" => FilterApi.ltEq(c, x)
          case "isNull" => FilterApi.eq(c, null.asInstanceOf[java.lang.Long])
          case "isNotNull" => FilterApi.notEq(c, null.asInstanceOf[java.lang.Long])
        })
      case (IntegerType | ShortType | ByteType, _) =>
        val c = FilterApi.intColumn(name)
        val x = nullOk(java.lang.Integer.valueOf(v match {
          case i: Int => i; case s: Short => s.toInt; case b: Byte => b.toInt
          case _ => return None
        }))
        Some(op match {
          case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
          case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
          case "ltEq" => FilterApi.ltEq(c, x)
          case "isNull" => FilterApi.eq(c, null.asInstanceOf[java.lang.Integer])
          case "isNotNull" => FilterApi.notEq(c, null.asInstanceOf[java.lang.Integer])
        })
      case (DoubleType, _) =>
        val c = FilterApi.doubleColumn(name)
        val x = nullOk(java.lang.Double.valueOf(v match {
          case d: Double => d; case _ => return None
        }))
        Some(op match {
          case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
          case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
          case "ltEq" => FilterApi.ltEq(c, x)
          case "isNull" => FilterApi.eq(c, null.asInstanceOf[java.lang.Double])
          case "isNotNull" => FilterApi.notEq(c, null.asInstanceOf[java.lang.Double])
        })
      case (FloatType, _) =>
        val c = FilterApi.floatColumn(name)
        val x = nullOk(java.lang.Float.valueOf(v match {
          case f: Float => f; case _ => return None
        }))
        Some(op match {
          case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
          case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
          case "ltEq" => FilterApi.ltEq(c, x)
          case "isNull" => FilterApi.eq(c, null.asInstanceOf[java.lang.Float])
          case "isNotNull" => FilterApi.notEq(c, null.asInstanceOf[java.lang.Float])
        })
      case (BooleanType, _) =>
        val c = FilterApi.booleanColumn(name)
        val x = nullOk(java.lang.Boolean.valueOf(v match {
          case b: Boolean => b; case _ => return None
        }))
        op match { // booleans: only (not-)equality exists
          case "eq" => Some(FilterApi.eq(c, x))
          case "isNull" => Some(FilterApi.eq(c, null.asInstanceOf[java.lang.Boolean]))
          case "isNotNull" => Some(FilterApi.notEq(c, null.asInstanceOf[java.lang.Boolean]))
          case _ => None
        }
      case (StringType, _) =>
        val c = FilterApi.binaryColumn(name)
        val x = nullOk(v match {
          case s: String => Binary.fromString(s)
          case u: org.apache.spark.unsafe.types.UTF8String => Binary.fromString(u.toString)
          case _ => return None
        })
        Some(op match {
          case "eq" => FilterApi.eq(c, x); case "gt" => FilterApi.gt(c, x)
          case "gtEq" => FilterApi.gtEq(c, x); case "lt" => FilterApi.lt(c, x)
          case "ltEq" => FilterApi.ltEq(c, x)
          case "isNull" => FilterApi.eq(c, null.asInstanceOf[Binary])
          case "isNotNull" => FilterApi.notEq(c, null.asInstanceOf[Binary])
        })
      case _ => None // binary/complex/widened: stats pruning not attempted
    }
  }
}
