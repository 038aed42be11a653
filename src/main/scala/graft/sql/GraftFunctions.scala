package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The engine's physical bucket layout, exposed as a DSv2 catalog function so
  * Spark can PLAN with it: every lake table stores row `r` in bucket
  * `pmod(murmur3(key(r), seed 42), numBuckets)` (`LakeTable.bucketExpr`), and
  * [[GraftScan]] reports that layout as a `KeyGroupedPartitioning` over
  * `bucket(numBuckets, key...)`. When Spark resolves the transform it loads
  * THIS function from the table's catalog — giving storage-partitioned joins:
  * two co-bucketed lake tables joined on their keys (the fact/dim and
  * fact/fact joins a 100 TB warehouse lives on) exchange ZERO rows; each task
  * joins bucket i of both sides in place. The same clustering satisfies
  * `GROUP BY key...`, so keyed aggregation over one table is shuffle-free too.
  *
  * Reference analogue: Postgres co-located joins on the shared PK index
  * (`queries/fact_studies.py:63-83` joins synced tables on `study_uid`);
  * Spark-side the pattern is Iceberg/Delta bucket-transform SPJ.
  *
  * `produceResult` must agree EXACTLY with `LakeTable.bucketExpr` — it is the
  * contract that lets Spark shuffle a non-bucketed side INTO the layout
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) and still co-locate:
  * both reproduce `hash(k1, ..., kn)` = Murmur3 folded left over the key
  * columns from seed 42, then a positive modulus.
  */
object GraftBucketFunction extends UnboundFunction {
  val Name = "bucket"

  /** The layout hash: identical fold to Spark's `hash(cols...)` =
    * `Murmur3Hash(children, 42)`, which is what `LakeTable.bucketExpr`
    * evaluates per row. `offset` skips leading non-key arguments. */
  private[sql] def bucketOf(input: InternalRow, offset: Int,
      keyTypes: Array[DataType], n: Int): Int = {
    var h = 42
    var i = 0
    while (i < keyTypes.length) {
      h = Murmur3HashFunction.hash(
        input.get(i + offset, keyTypes(i)), keyTypes(i), h).toInt
      i += 1
    }
    ((h % n) + n) % n
  }

  override def name(): String = Name
  override def description(): String =
    "bucket(numBuckets, key...) — pmod(murmur3(key..., seed 42), numBuckets), the lake-table layout"

  /** Spark binds bucket transforms as (numBuckets literal, key columns...) —
    * the same shape Iceberg's bucket function accepts. */
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket needs (numBuckets, key...), got ${inputType.simpleString}")
    require(inputType.head.dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got ${inputType.head.dataType.simpleString}")
    GraftBoundBucket(inputType.fields.drop(1).map(_.dataType))
  }
}

case class GraftBoundBucket(keyTypes: Array[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = GraftBucketFunction.Name
  /** Join compatibility: Spark treats two sides as co-partitioned iff their
    * bound functions share a canonical name (and the transforms agree on
    * numBuckets) — type-qualified so an int-keyed and a long-keyed layout
    * never falsely co-locate. */
  override def canonicalName(): String =
    s"graft.bucket(${keyTypes.map(_.catalogString).mkString(",")})"

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    Integer.valueOf(GraftBucketFunction.bucketOf(input, 1, keyTypes, n))
  }
}
