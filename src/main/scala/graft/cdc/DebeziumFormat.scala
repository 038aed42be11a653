package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope interop: decode (and, for tests/export, encode) the
  * standard Debezium JSON change-event shape into this engine's flat
  * envelope — all through Catalyst `from_json`/`to_json` (codegen'd, no
  * UDF, no driver-side parsing), so a Kafka-connect topic dump or a
  * Debezium Postgres connector's file sink feeds the SAME pipeline as the
  * native parquet log. North-star surface: "tail a Postgres WAL /
  * Debezium-style change feed ... driven from Catalyst-parsed change
  * envelopes"; reference analogue: the psycopg row reads of
  * `database.py:10-41` (which poll the same logical content Debezium would
  * stream).
  *
  * Shape (Debezium 2.x `ExtractNewRecordState` NOT applied — the full
  * envelope): `{"payload": {"before": {...}|null, "after": {...}|null,
  * "source": {"lsn": ..., "ts_us": ..., "schema_version": ...}, "op":
  * "c"|"u"|"d"|"r", "ts_ms": ...}}`. Op mapping: c/r → I (snapshot reads
  * upsert like inserts), u → U, d → D (row image from `before`, per the
  * Debezium delete convention). `source.ts_us` carries microsecond
  * transaction time (the Postgres connector's field); `source.
  * schema_version` is this engine's envelope-version tag riding in the
  * source block exactly where Debezium puts connector-specific fields.
  *
  * Scale shape: decode is a per-row projection — the JSON lines scan
  * splits like any text source, and everything downstream (stats probe,
  * salting, LWW merge) is unchanged. Malformed lines parse to null
  * lsn/keys and land in [[CdcPipeline.processBatch]]'s quarantine instead
  * of failing the stream.
  */
object DebeziumFormat {

  /** Row-image struct: the envelope's data columns (no lsn/op/ts — those
    * live in the outer envelope blocks). */
  private val rowFields: Seq[StructField] =
    CdcPipeline.envelopeSchema.fields.toSeq
      .filterNot(f => Seq("lsn", "txn_ts", "op", "schema_version").contains(f.name))
      .map(_.copy(nullable = true))

  val payloadSchema: StructType = StructType(Seq(
    StructField("before", StructType(rowFields), nullable = true),
    StructField("after", StructType(rowFields), nullable = true),
    StructField("source", StructType(Seq(
      StructField("lsn", LongType, nullable = true),
      StructField("ts_us", LongType, nullable = true),
      StructField("schema_version", IntegerType, nullable = true))),
      nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("ts_ms", LongType, nullable = true)))

  val jsonSchema: StructType =
    StructType(Seq(StructField("payload", payloadSchema, nullable = true)))

  /** Engine envelope → Debezium JSON lines (one `value` string column).
    * Deletes carry the row image in `before` with `after` null; upserts the
    * inverse. `to_json` drops null fields (Debezium omits absent columns the
    * same way), which `from_json` reads back as null — lossless for the
    * envelope. */
  def encode(envelopes: DataFrame): DataFrame = {
    val rowImage = struct(rowFields.map(f => col(f.name)): _*)
    val op = col("op")
    val payload = struct(
      when(op === "D", rowImage).otherwise(lit(null).cast(StructType(rowFields)))
        .as("before"),
      when(op =!= "D", rowImage).otherwise(lit(null).cast(StructType(rowFields)))
        .as("after"),
      struct(col("lsn").as("lsn"), unix_micros(col("txn_ts")).as("ts_us"),
        col("schema_version").as("schema_version")).as("source"),
      // mirror decode's strictness: anything that is not a known op encodes
      // as NO op field (to_json drops nulls) and decodes back to null op —
      // quarantine-class rows must round-trip to quarantine, never default
      // to 'd' (a well-formed DELETE fabricated from a corrupt event)
      when(op === "I", lit("c")).when(op === "U", lit("u"))
        .when(op === "D", lit("d"))
        .otherwise(lit(null).cast(StringType)).as("op"),
      unix_millis(col("txn_ts")).as("ts_ms"))
    envelopes.select(to_json(struct(payload.as("payload"))).as("value"))
  }

  /** CDC OUT: a [[graft.lake.LakeTable.changes]] feed (data columns +
    * `_change_type` ∈ insert/update/delete + `_lsn`) rendered as Debezium
    * JSON — the engine as change PRODUCER, so a downstream consumer (or a
    * second lake, see DebeziumSpec's round-trip replication test) tails
    * this table the same way this engine tails a Postgres WAL. Feed rows
    * carry no transaction timestamp (the lake keeps wall clock off the
    * data path), so ts_us/ts_ms are omitted and decode back to null
    * txn_ts — which the ingest contract does not require. Envelope
    * columns the feed lacks (pre-evolution tables) export as null. */
  def encodeFeed(feed: DataFrame, schemaVersion: Int = 1): DataFrame = {
    val present = feed.columns.toSet
    val dataCols = rowFields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    encode(feed.select(Seq(
      col("_lsn").as("lsn"),
      lit(null).cast(TimestampType).as("txn_ts"),
      // same strictness as encode: only the three feed change types map to
      // ops; anything else (corrupt feed, a foreign CDF's update_preimage)
      // encodes op-less and round-trips to quarantine instead of being
      // fabricated into a well-formed update
      when(col("_change_type") === "delete", "D")
        .when(col("_change_type") === "insert", "I")
        .when(col("_change_type") === "update", "U")
        .otherwise(lit(null).cast(StringType)).as("op"),
      lit(schemaVersion).as("schema_version")) ++ dataCols: _*))
  }

  /** Debezium JSON lines → engine envelope (exact [[CdcPipeline.
    * envelopeSchema]] column set). Unparseable lines yield null lsn/keys —
    * the pipeline's quarantine reason, never a silent merge. */
  def decode(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    // parse ONCE per row into a struct column, THEN project fields — the
    // two-step select pins a single JsonToStructs in the optimized plan
    // (CollapseProject refuses to inline a non-cheap alias into many
    // consumers, so the parse cannot fan out per projected column). The
    // orthogonal multi-PASS cost — the pipeline re-reading the batch for
    // stats/merge re-runs the whole parse — is what startFrom's
    // cacheBatches exists for.
    val parsed = raw.select(
      from_json(col(valueCol), jsonSchema).getField("payload").as("p"))
    val p = col("p")
    val img = when(p.getField("op") === "d", p.getField("before"))
      .otherwise(p.getField("after"))
    val withImg = parsed.select(p.as("p"), img.as("img"))
    val dataCols = rowFields.map(f => col("img").getField(f.name).as(f.name))
    withImg.select(Seq(
      p.getField("source").getField("lsn").as("lsn"),
      coalesce(
        timestamp_micros(p.getField("source").getField("ts_us")),
        timestamp_millis(p.getField("ts_ms"))).as("txn_ts"),
      when(p.getField("op").isin("c", "r"), "I")
        .when(p.getField("op") === "u", "U")
        .when(p.getField("op") === "d", "D")
        .otherwise(lit(null).cast(StringType)).as("op"),
      coalesce(p.getField("source").getField("schema_version"), lit(1))
        .as("schema_version")) ++ dataCols: _*)
  }
}

/** Debezium JSON-lines change-log directory as a [[ChangeSource]], plus the
  * streaming tail — the drop-in sibling of [[FileChangeSource]] for a feed
  * that arrives as connector JSON instead of native parquet. */
class DebeziumFileSource(spark: SparkSession, logDir: String) extends ChangeSource {

  private def decoded(df: DataFrame): DataFrame = DebeziumFormat.decode(df)

  /** Malformed lines decode to null lsn and CANNOT be positioned in the lsn
    * window — they are included in EVERY batch so the pipeline dead-letters
    * them (idempotently per epoch) instead of the window filter silently
    * dropping them. A garbage line in the feed therefore stays visible in
    * the quarantine until the feed is repaired, which is the honest signal. */
  override def batch(fromLsn: Long, toLsn: Long): DataFrame =
    decoded(spark.read.text(logDir))
      .filter(col("lsn").isNull ||
        (col("lsn") > fromLsn && col("lsn") <= toLsn))

  override def maxLsn(): Long = {
    val r = decoded(spark.read.text(logDir)).agg(max(col("lsn"))).head()
    if (r.isNullAt(0)) -1L else r.getLong(0)
  }

  /** Streaming tail for [[CdcPipeline.startFrom]]. */
  def stream: DataFrame = decoded(spark.readStream.text(logDir))
}
