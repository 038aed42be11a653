package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** Reconciliation / verification pass (reference: the nightly
  * `SyncValidator` anti-join re-sync, `sync/sync_validator.py:24-62`,
  * `celery_config.py:25-28`).
  *
  * In the reference this repairs rows the watermark poll missed; with a
  * deterministic LSN log and idempotent MERGE, misses are impossible, so
  * here it doubles as the correctness invariant: after any replay,
  * `missing` and `stale` must both be empty.
  *
  * At scale both sides are distributed left-anti joins (the reference's
  * driver-materialized `NOT IN (id list)` is replaced wholesale — SURVEY.md
  * §2.2 P7). */
object Reconciler {

  /** Expected final state derived from the raw log via the *window-function*
    * spec (independent code path from the Aggregator + MERGE pipeline).
    * Applies the same validity contract as ingest: malformed envelopes
    * (null key/lsn, unknown op) AND rows violating the table's declared
    * constraints (`constraints`, from [[LakeTable.applicableConstraints]])
    * are dead-lettered by the pipeline, so the expected state must exclude
    * both too — otherwise every quarantined event would read as a (false)
    * miss forever, and repair() would crash re-merging rows the table's own
    * constraint enforcement rejects. */
  def expectedFromLog(log: DataFrame, keyCols: Seq[String],
      constraints: Seq[(Column, String)] = Seq.empty): DataFrame = {
    val reason = constraints.foldLeft(CdcPipeline.quarantineReason(keyCols)) {
      // same op-exemption as ingest: tombstone payloads are not rows
      case (r, (cond, name)) => r.when(col("op") =!= "D" && cond, s"constraint:$name")
    }
    val valid = log.filter(reason.isNull)
    Dedup.lwwWindowSpec(valid, keyCols, "lsn", "op").filter(col("op") =!= "D")
  }

  /** The ingest validity contract for `table` applied to a log with these
    * columns — what [[expectedFromLog]] must mirror. */
  private def contractOf(log: DataFrame, table: LakeTable): Seq[(Column, String)] =
    table.applicableConstraints(log.columns.toSeq)

  /** Keys present in the log's expected state but absent from the table. */
  def missing(log: DataFrame, table: LakeTable): DataFrame = {
    val keyCols = table.meta.keyCols
    expectedFromLog(log, keyCols, contractOf(log, table)).select(keyCols.map(col): _*)
      .join(table.currentState().select(keyCols.map(col): _*), keyCols, "left_anti")
  }

  /** Rows whose table state disagrees with the expected winner. The whole
    * payload is compared — every non-key data column of the table's current
    * schema present on BOTH sides, hashed per row via sha-256 over a
    * length-prefixed render (the per-row invariant from BASELINE.json;
    * length prefixes keep ("ab","c") ≠ ("a","bc")). Generic over routed
    * tables of any schema — nothing is hard-coded to `content` — and a
    * stale value in ANY replicated column is caught. */
  def stale(log: DataFrame, table: LakeTable): DataFrame = {
    val keyCols = table.meta.keyCols
    val payloadCols = table.meta.currentSchema.columns.map(_.name)
      .filterNot(keyCols.contains).filter(log.columns.contains).sorted
    def rowHash: Column =
      if (payloadCols.isEmpty) sha2(lit(""), 256) // key-only table: presence IS the state
      else sha2(concat(payloadCols.map { c =>
        val s = col(c).cast("string")
        concat(coalesce(length(s), lit(-1)).cast("string"), lit(":"),
          coalesce(s, lit("")))
      }: _*), 256)
    val exp = expectedFromLog(log, keyCols, contractOf(log, table))
      .select((keyCols.map(col) :+ rowHash.as("h")): _*)
    val got = table.currentState()
      .select((keyCols.map(col) :+ rowHash.as("h")): _*)
    exp.join(got, keyCols, "full_outer")
      .filter(not(exp("h") <=> got("h")))
  }

  /** Bounded-window repair: re-emit expected rows missing from the table
    * within [lsnLo, lsnHi] back through the merge path (the reference's
    * 2-day window, `sync/sync_validator.py:26-29`). Returns rows repaired. */
  def repair(log: DataFrame, table: LakeTable, lsnLo: Long, lsnHi: Long): Long = {
    val keyCols = table.meta.keyCols
    val windowed = log.filter(col("lsn").between(lsnLo, lsnHi))
    val exp = expectedFromLog(windowed, keyCols, contractOf(windowed, table))
    val miss = exp.join(table.currentState().select(keyCols.map(col): _*), keyCols, "left_anti")
    val n = miss.count()
    if (n > 0) table.merge(CdcPipeline.toMergeInput(miss, table))
    n
  }

  /** Id-targeted re-sync (reference `sync/studies.py:47-78`: re-ingest an
    * explicit pending-id list). Re-derives the expected state for exactly
    * the given keys and pushes it back through the idempotent merge —
    * re-syncing an already-correct key is a no-op by LWW. `ids` carries the
    * table's key columns (pending lists are small → broadcast semi-join,
    * never a driver-side NOT IN). Returns rows re-synced. */
  def repairIds(log: DataFrame, table: LakeTable, ids: DataFrame): Long = {
    val keyCols = table.meta.keyCols
    val exp = expectedFromLog(log, keyCols, contractOf(log, table))
      .join(broadcast(ids.select(keyCols.map(col): _*).distinct()), keyCols, "left_semi")
    val n = exp.count()
    if (n > 0) table.merge(CdcPipeline.toMergeInput(exp, table))
    n
  }
}
