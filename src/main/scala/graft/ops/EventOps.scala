package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** CDC-shaped operators over the driver's `events` table (the 1:1 stand-in
  * for the change feed: event_id→lsn, user_id→key, event_type→op, ts→txn_ts;
  * FIXTURES.md §4). These are the batch-expressible faces of the streaming
  * engine's hot path. */
object EventOps {

  val all: Seq[OpQuery] = Seq(

    // A1/W1 — last-writer-wins per key over the event stream (the engine's
    // flagship dedup; reference: DISTINCT ON, queries/fact_studies.py:4,34).
    OpQuery("q09_lww_last_event_per_user",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"), col("value").as("last_value"))
      },
      Some("""SELECT user_id, event_id AS last_event_id,
             |  event_type AS last_event_type, value AS last_value
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |      FROM events) WHERE rn = 1""".stripMargin)),

    // P3/S2 — watermark-incremental extraction (reference: created_at > wm OR
    // updated_at > wm, queries/fact_studies.py:30-31). The timestamp filter is
    // pushed into the Parquet scan (row-group min/max pruning on `ts`).
    OpQuery("q10_watermark_incremental",
      (s, d) => t(s, d, "events")
        .filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          max(col("event_id")).as("max_lsn")),
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  max(event_id) AS max_lsn
             |FROM events WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
             |GROUP BY event_type""".stripMargin)),

    // A2/A5/F8 — per-day rollup with the yyyymmdd int key (reference:
    // studies_uploaded_by_date view, migrations/20230207_01_53Bud.sql:4-8).
    OpQuery("q11_daily_rollup",
      (s, d) => t(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyyMMdd").cast("int").as("date_dim_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sum_value")),
      Some("""SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS date_dim_id,
             |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // F-group — regex field extraction from a JSON-ish payload (the change
    // envelope's schema-change payload surface; SURVEY.md §2.7 note).
    OpQuery("q15_props_extraction",
      (s, d) => t(s, d, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n")),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // SO1 — set difference on keys (reference: source ∖ destination
    // reconciliation, sync/sync_validator.py:40-62).
    OpQuery("q17_except_user_days",
      (s, d) => {
        val e = t(s, d, "events")
        def userDays(et: String) = e.filter(col("event_type") === et)
          .select(col("user_id"), date_format(col("ts"), "yyyyMMdd").cast("int").as("day"))
          .distinct()
        userDays("click").except(userDays("purchase"))
      },
      Some("""SELECT DISTINCT user_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day
             |FROM events WHERE event_type = 'click'
             |EXCEPT
             |SELECT DISTINCT user_id, CAST(strftime(ts, '%Y%m%d') AS INT) AS day
             |FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // F7 — timezone shift + date trunc (reference: `(ts AT TIME ZONE tz)::
    // date` with facility timezones, queries/fact_studies.py:101-106). The
    // calendar key becomes a pure expression of the shifted timestamp — the
    // reference's per-row dim_calendar lookup (J8) disappears entirely.
    OpQuery("q33_tz_local_rollup",
      (s, d) => t(s, d, "events")
        .select(date_format(from_utc_timestamp(col("ts"), "America/New_York"),
          "yyyyMMdd").cast("int").as("local_date_id"))
        .groupBy(col("local_date_id"))
        .agg(count(lit(1)).as("n_events")),
      Some("""SELECT CAST(strftime(CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS TIMESTAMP), '%Y%m%d') AS INT) AS local_date_id,
             |  count(*) AS n_events
             |FROM events GROUP BY 1""".stripMargin)),

    // A6/S6 — lineage-shaped rollup: per key-range bucket, applied-row counts
    // and lsn bounds (reference: sync_records, queries/sync_records.py:7-19).
    OpQuery("q19_lineage_rollup",
      (s, d) => t(s, d, "events")
        .groupBy(pmod(col("user_id"), lit(16)).as("bucket"))
        .agg(count(lit(1)).as("rows_applied"),
          min(col("event_id")).as("lsn_min"),
          max(col("event_id")).as("lsn_max")),
      Some("""SELECT user_id % 16 AS bucket, count(*) AS rows_applied,
             |  min(event_id) AS lsn_min, max(event_id) AS lsn_max
             |FROM events GROUP BY 1""".stripMargin)),

    // Sketch rollup — approx distinct users per event type via DataSketches
    // HLL (the mergeable-sketch primitive behind the incrementally
    // maintained DistinctSketchView, lake/ViewMaintainer.scala). Sketches
    // partial-aggregate map-side and union associatively, so at 100 TB the
    // exchange carries one ~2 KB sketch per (partition, group) instead of
    // every distinct value — this is THE scalable distinct-count plan. At
    // testdata cardinality (≲1.5k distinct/group) the DataSketches estimate
    // is still in its exact coupon regime, so the rounded estimate equals
    // DuckDB's exact COUNT(DISTINCT) and the oracle hash-matches.
    OpQuery("q42_distinct_sketch_rollup",
      (s, d) => t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(round(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
          .cast("long").as("distinct_users")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS distinct_users
             |FROM events GROUP BY 1""".stripMargin)),

    // Session windows — per-user activity sessions split by ≥30 min of
    // silence (Spark `session_window`; the streaming twin under a watermark
    // is StreamOps.sessionizedRepoActivity). Semantics note for the oracle:
    // a Spark session spans [first_ts, last_ts + gap), so an event exactly
    // `gap` after its predecessor starts a NEW session — the lag-based
    // oracle therefore flags `diff >= gap`, not `>`. Session identity is
    // surfaced as the session's first event timestamp (formatted), which is
    // engine-neutral; window.end (ts+gap) would be Spark-specific.
    OpQuery("q43_sessionize",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          col("n_events"), col("n_types")),
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sess AS (
             |  SELECT user_id, ts, event_type,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flagged
             |)
             |SELECT user_id,
             |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  count(*) AS n_events,
             |  count(DISTINCT event_type) AS n_types
             |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // Window frames beyond top-1: per-user previous value (lag) and a
    // 3-row moving sum (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). Both
    // specs share one (partition, order) pair, so Spark plans a SINGLE
    // exchange + partition-local sort serving both frames — the order
    // includes event_id so frames are total-ordered (replay-deterministic)
    // even when timestamps tie. Sum goes through DECIMAL for engine-exact
    // float parity (frame addition order is otherwise engine-defined).
    OpQuery("q54_window_frames",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, d, "events").select(col("user_id"), col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          sum(col("value").cast("decimal(18,6)"))
            .over(w.rowsBetween(-2, 0)).cast("double").as("mov_sum"))
      },
      Some("""SELECT user_id, event_id,
             |  lag(value, 1) OVER w AS prev_value,
             |  CAST(sum(CAST(value AS DECIMAL(18,6)))
             |       OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)))
}
