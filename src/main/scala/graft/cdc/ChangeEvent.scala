package graft.cdc

import java.sql.Timestamp

/** Debezium/WAL-style change envelope over source-code repository rows.
  *
  * Reference analogue: the timestamp-watermark extraction rows of
  * eva-tech/vlm-eden-dataset-etl (`queries/fact_studies.py:29-31`) plus the
  * soft-delete flag (`queries/fact_studies.py:23,73`). Here the "stream" is a
  * real LSN-ordered change feed rather than a polled timestamp diff.
  *
  * Primary key of the target table: (repo, path, commit).
  * Last-writer-wins order: lsn (strictly monotone at the source; duplicated
  * lsns only ever carry byte-identical payloads — the at-least-once
  * redelivery window, reference `sync/sync_base.py:55-56`).
  *
  * Schema-evolution columns (`branch`, `sizeBytes`) are nullable and only
  * populated from the schema_version that introduces them (reference
  * analogue: yoyo migrations `migrations/20241029_01_JnkId.sql:4-17`).
  */
case class ChangeEvent(
    lsn: Long,
    txnTs: Timestamp,
    op: String, // "I" | "U" | "D"
    schemaVersion: Int,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String, // null for D
    branch: String, // null before schema v2
    sizeBytes: java.lang.Long // null before schema v3; int-valued until v4 widens
)

object ChangeEvent {
  val keyCols: Seq[String] = Seq("repo", "path", "commit")
  /** op priority for deterministic tiebreak when lsns collide (redelivery
    * produces identical rows, so this only matters defensively): D > U > I. */
  def opPriority(op: String): Int = op match {
    case "D" => 2; case "U" => 1; case _ => 0
  }
}

/** Per-partition lineage record emitted each micro-batch (reference
  * analogue: `sync_records`, `migrations/20230104_01_r9HiK.sql:4-11`). */
case class PartitionLineage(
    epochId: Long,
    bucket: Int,
    lsnMin: Long,
    lsnMax: Long,
    rowsApplied: Long,
    snapshotId: Long
)
