package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.cdc.ChangeEvent

/** Streaming-analytics operators over the change feed itself (distinct from
  * the ingest path, which deliberately holds NO stream state — its state is
  * the lake table, SURVEY.md ST7). These cover the Structured Streaming
  * surface: event-time windowed aggregation under a watermark, and custom
  * keyed state via mapGroupsWithState. */
object StreamOps {

  /** Event-time windowed change stats: per-window event COUNTS per op-kind
    * (raw counts, not a rate — divide by the window length for ops/sec),
    * late data bounded by `watermark`. Append-output-compatible (closes a
    * window only once the watermark passes it). */
  def windowedChangeStats(envelope: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    envelope
      .withWatermark("txn_ts", watermark)
      .groupBy(window(col("txn_ts"), windowLen), col("op"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("repo")).as("approx_repos"),
        max(col("lsn")).as("max_lsn"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("op"), col("n_events"), col("approx_repos"), col("max_lsn"))

  /** Event-time SESSION windows over the change feed: per repo, bursts of
    * activity separated by at least `gap` of silence (session extends while
    * each event lands within `gap` of the previous one — Spark merges
    * overlapping per-event windows in the state store). Append-mode
    * compatible: a session is emitted only once the watermark passes its
    * close. Batch twin (with a DuckDB oracle): q43_sessionize. */
  def sessionizedRepoActivity(envelope: DataFrame, gap: String,
      watermark: String): DataFrame =
    envelope
      .withWatermark("txn_ts", watermark)
      .groupBy(col("repo"), session_window(col("txn_ts"), gap))
      .agg(count(lit(1)).as("n_changes"), max(col("lsn")).as("max_lsn"))
      .select(col("repo"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_changes"), col("max_lsn"))

  /** Running per-repo change totals with explicit keyed state
    * (mapGroupsWithState): emits (repo, totalChanges, lastLsn) each trigger.
    * The ingest path never needs this — it exists as the engine's custom-
    * state streaming surface (e.g. per-tenant rate limiting / alerting). */
  case class RepoState(total: Long, lastLsn: Long)
  case class RepoStat(repo: String, total: Long, lastLsn: Long)

  def runningRepoTotals(events: Dataset[ChangeEvent]): Dataset[RepoStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.repo)
      .mapGroupsWithState[RepoState, RepoStat](GroupStateTimeout.NoTimeout) {
        (repo, it, state: GroupState[RepoState]) =>
          val prev = state.getOption.getOrElse(RepoState(0L, -1L))
          var total = prev.total
          var lastLsn = prev.lastLsn
          it.foreach { e => total += 1; if (e.lsn > lastLsn) lastLsn = e.lsn }
          state.update(RepoState(total, lastLsn))
          RepoStat(repo, total, lastLsn)
      }
  }
}
