package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Maintained aggregate views (reference: query-side rollup views kept
  * next to the fact tables and refreshed by the sync cron —
  * `migrations/20230207_01_53Bud.sql:4-24`, `20230606_01_cY4nG.sql:4-17`).
  *
  * Each view is a named transform of the base table's live state, persisted
  * as a lake table of its own (state = table, ST7) and refreshed per commit
  * epoch with full-refresh `replace` semantics — rollups are winners-only
  * aggregates, orders of magnitude smaller than the change log, so a
  * recompute per refresh is the scale-correct trade (incremental view
  * maintenance would save little and complicate invalidation). Refresh is
  * exactly-once per epoch via the view table's own epoch ledger: a replayed
  * micro-batch cannot double-refresh. */
case class ViewDef(name: String, transform: DataFrame => DataFrame)

class ViewMaintainer(base: LakeTable, viewsRoot: String, defs: Seq[ViewDef]) {
  private val spark = base.spark

  /** View tables are created lazily on first refresh (schema = transform
    * output; keyed on all columns — replace never reconciles keys). */
  private def viewTable(d: ViewDef, schema: StructType): LakeTable = {
    val path = s"$viewsRoot/${d.name}"
    if (LakeTable.exists(path)) LakeTable.forPath(spark, path)
    else LakeTable.create(spark, path, schema, Seq(schema.fieldNames.head),
      numBuckets = 1) // rollups are small; one bucket, one file per refresh
  }

  def table(name: String): LakeTable =
    LakeTable.forPath(spark, s"$viewsRoot/$name")

  /** Recompute every view from the base table's current state. Idempotent
    * per epochId. */
  def refreshAll(epochId: Long = -1L): Unit = {
    val state = base.currentState()
    defs.foreach { d =>
      val out = d.transform(state)
      viewTable(d, out.schema).replace(out, epochId)
    }
  }
}
