package graft.cdc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.LakeTable

/** JDBC warehouse sink — the reference's DESTINATION surface: batched keyed
  * upserts into a relational store (`sync/studies.py:35-41` pages rows and
  * upserts with execute_values; `database.py:24-41` manages the connection),
  * with the sync watermark persisted in the target database
  * (`queries/sync_records.py:7-19`).
  *
  * Spark-first shape: the DataFrame is hash-repartitioned on the key columns
  * so each key lives in exactly one task (two tasks racing an
  * insert-if-absent on the same key would violate the PK), then each
  * partition drives ONE connection with BATCHED statements — the portable
  * two-phase upsert (UPDATE batch, then INSERT batch for the misses), which
  * works against any ANSI JDBC database without dialect-specific ON
  * CONFLICT/MERGE syntax. Batch size bounds round trips exactly like the
  * reference's execute_values page size.
  */
class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
    properties: java.util.Properties = new java.util.Properties,
    batchSize: Int = 500) extends Serializable {

  private def q(c: String) = "\"" + c + "\""

  /** Overridable for tests (e.g. wrapping the connection in a proxy that
    * simulates driver batch-count quirks like SUCCESS_NO_INFO). */
  protected def connect(): java.sql.Connection = {
    val c = java.sql.DriverManager.getConnection(url, properties)
    c.setAutoCommit(false)
    c
  }

  /** Derby refuses to close a connection with an open transaction — even a
    * metadata/SELECT read opens one under autoCommit=false. */
  private def commitAndClose(c: java.sql.Connection): Unit = {
    try c.commit() catch { case _: java.sql.SQLException => }
    c.close()
  }

  /** Create the target table (with a primary key on the key columns) if it
    * does not exist. Column types come from Spark's per-database JDBC
    * dialect, so the same code emits CLOB on Derby and TEXT on Postgres. */
  def ensureTable(schema: StructType): Unit = {
    require(keyCols.forall(schema.fieldNames.contains), "key cols must be in schema")
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    def sqlType(f: StructField): String =
      dialect.getJDBCType(f.dataType)
        .orElse(org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:")
          .getJDBCType(f.dataType)) match {
        case Some(t) => t.databaseTypeDefinition
        case None => f.dataType match {
          case StringType => "VARCHAR(32672)"
          case LongType => "BIGINT"
          case IntegerType => "INTEGER"
          case DoubleType => "DOUBLE"
          case FloatType => "REAL"
          case BooleanType => "BOOLEAN"
          case other => sys.error(s"unsupported JDBC sink type $other")
        }
      }
    val cols = schema.fields.map { f =>
      // key columns must be indexable: dialects map StringType to CLOB/TEXT,
      // which Derby (and most stores) refuse inside a PRIMARY KEY
      val t = if (keyCols.contains(f.name) && f.dataType == StringType) "VARCHAR(512)"
        else sqlType(f)
      val notNull = if (keyCols.contains(f.name)) " NOT NULL" else ""
      s"${q(f.name)} $t$notNull"
    }
    val ddl = s"CREATE TABLE $table (${cols.mkString(", ")}, " +
      s"PRIMARY KEY (${keyCols.map(q).mkString(", ")}))"
    val c = connect()
    try {
      if (!tableExists(c)) { val st = c.createStatement(); st.execute(ddl); st.close() }
      c.commit()
    } finally commitAndClose(c)
  }

  private def tableExists(c: java.sql.Connection): Boolean = {
    val rs = c.getMetaData.getTables(null, null, null, Array("TABLE"))
    try {
      var found = false
      while (!found && rs.next()) found = rs.getString(3).equalsIgnoreCase(table)
      found
    } finally rs.close()
  }

  /** Keyed batched upsert of every row. Returns rows written. */
  def upsert(df: DataFrame): Long = {
    val schema = df.schema
    val cols = schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"upsert input needs key cols $keyCols")
    val nonKey = cols.filterNot(keyCols.contains)
    val updateSql =
      if (nonKey.isEmpty) null // pure-key table: nothing to update, insert-if-absent
      else s"UPDATE $table SET ${nonKey.map(c => s"${q(c)} = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val sqlTypes = schema.fields.map(f => jdbcType(f.dataType))
    val idx = cols.zipWithIndex.toMap
    val written = df.sparkSession.sparkContext.longAccumulator("jdbc_upserted")
    val (bs, tbl) = (batchSize, table) // avoid closing over `this` fields lazily
    df.repartition(keyCols.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val c = connect()
        try {
          val upd = if (updateSql == null) null else c.prepareStatement(updateSql)
          val ins = c.prepareStatement(insertSql)
          rows.grouped(bs).foreach { page =>
            // phase 1: batched UPDATE (no-op for new keys) ...
            val misses =
              if (upd == null) page
              else {
                def bind(r: Row): Unit = {
                  var i = 1
                  nonKey.foreach { cn => set(upd, i, r, idx(cn), sqlTypes(idx(cn))); i += 1 }
                  keyCols.foreach { kn => set(upd, i, r, idx(kn), sqlTypes(idx(kn))); i += 1 }
                }
                page.foreach { r => bind(r); upd.addBatch() }
                var counts = upd.executeBatch()
                // drivers may report SUCCESS_NO_INFO (-2) for batched rows
                // (MySQL rewriteBatchedStatements, some Postgres modes):
                // "executed, count unknown". Treating that as "updated" would
                // silently skip phase 2 and drop every new key — re-run the
                // page row-by-row (idempotent UPDATE) to learn real counts.
                if (counts.exists(_ == java.sql.Statement.SUCCESS_NO_INFO))
                  counts = page.map { r => bind(r); upd.executeUpdate() }.toArray
                // ... phase 2: batched INSERT for the keys UPDATE missed
                page.zip(counts).collect { case (r, 0) => r }
              }
            // duplicate keys inside one page would double-INSERT the same
            // PK; keep the LAST occurrence (last-writer-in-batch wins, the
            // same tiebreak a second page's UPDATE would apply)
            val lastPerKey = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Row]
            misses.foreach(r => lastPerKey(keyCols.map(kn => r.get(idx(kn)))) = r)
            lastPerKey.values.foreach { r =>
              cols.indices.foreach(i => set(ins, i + 1, r, i, sqlTypes(i)))
              ins.addBatch()
            }
            if (lastPerKey.nonEmpty) ins.executeBatch()
            c.commit()
            written.add(page.size)
          }
          if (upd != null) upd.close()
          ins.close()
        } finally commitAndClose(c)
      }
    }
    written.value
  }

  /** Batched DELETE by key. Returns rows the database reported deleted. */
  def deleteKeys(keys: DataFrame): Long = {
    val cols = keys.schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"delete input needs key cols $keyCols")
    val sql = s"DELETE FROM $table WHERE ${keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")}"
    val sqlTypes = keys.schema.fields.map(f => jdbcType(f.dataType))
    val idx = cols.zipWithIndex.toMap
    val deleted = keys.sparkSession.sparkContext.longAccumulator("jdbc_deleted")
    val bs = batchSize
    keys.repartition(keyCols.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val c = connect()
        try {
          val del = c.prepareStatement(sql)
          rows.grouped(bs).foreach { page =>
            page.foreach { r =>
              keyCols.zipWithIndex.foreach { case (kn, i) =>
                set(del, i + 1, r, idx(kn), sqlTypes(idx(kn))) }
              del.addBatch()
            }
            // SUCCESS_NO_INFO (-2) = executed, count unknown — a PK delete
            // hit at most one row; counting it keeps the return value an
            // upper bound instead of silently reporting 0 on such drivers
            deleted.add(del.executeBatch()
              .count(c => c > 0 || c == java.sql.Statement.SUCCESS_NO_INFO))
            c.commit()
          }
          del.close()
        } finally commitAndClose(c)
      }
    }
    deleted.value
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case BooleanType => java.sql.Types.BOOLEAN
    case other => sys.error(s"unsupported JDBC sink type $other")
  }

  private def set(ps: java.sql.PreparedStatement, pos: Int, r: Row,
      field: Int, sqlType: Int): Unit =
    if (r.isNullAt(field)) ps.setNull(pos, sqlType)
    else ps.setObject(pos, r.get(field))

  /** Key tuples currently in the target table — drives the full-resync
    * anti-diff (delete target keys the lake no longer has live). */
  def targetKeys(spark: SparkSession): DataFrame =
    spark.read.jdbc(url, table, properties).select(keyCols.map(col): _*)

  // ------------------------------------------------------- watermark state

  private val stateTable = s"${table}_sync_state"

  /** Last lake lsn this sink has applied (−1 = never synced). Persisted in
    * the TARGET database (reference: the `sync_records` watermark table) so
    * the destination carries its own recovery point. */
  def watermark(): Long = {
    val c = connect()
    try {
      ensureState(c)
      val rs = c.createStatement().executeQuery(
        s"""SELECT "wm" FROM $stateTable WHERE "id" = 0""")
      try { if (rs.next()) rs.getLong(1) else -1L } finally rs.close()
    } finally commitAndClose(c)
  }

  private def ensureState(c: java.sql.Connection): Unit = {
    val rs = c.getMetaData.getTables(null, null, null, Array("TABLE"))
    val exists = try {
      var found = false
      while (!found && rs.next()) found = rs.getString(3).equalsIgnoreCase(stateTable)
      found
    } finally rs.close()
    if (!exists) {
      val st = c.createStatement()
      st.execute(s"""CREATE TABLE $stateTable ("id" INTEGER PRIMARY KEY, "wm" BIGINT)""")
      // 0 = lsn watermark, 1 = legacy gap-lsn slot (unused), 2 = reconciled
      // rollback count
      st.execute(s"""INSERT INTO $stateTable VALUES (0, -1)""")
      st.execute(s"""INSERT INTO $stateTable VALUES (1, -1)""")
      st.execute(s"""INSERT INTO $stateTable VALUES (2, -1)""")
      st.close()
      c.commit()
    } else {
      // rows 1 and 2 were added after row 0: backfill on old sinks
      val probe = c.createStatement()
      Seq(1, 2).foreach { id =>
        val r = probe.executeQuery(
          s"""SELECT count(*) FROM $stateTable WHERE "id" = $id""")
        val has = try { r.next(); r.getLong(1) > 0 } finally r.close()
        if (!has) probe.execute(s"""INSERT INTO $stateTable VALUES ($id, -1)""")
      }
      probe.close()
    }
  }

  private def setState(id: Int, v: Long): Unit = {
    val c = connect()
    try {
      ensureState(c)
      val st = c.prepareStatement(s"""UPDATE $stateTable SET "wm" = ? WHERE "id" = ?""")
      st.setLong(1, v); st.setInt(2, id); st.executeUpdate(); st.close()
      c.commit()
    } finally commitAndClose(c)
  }

  def setWatermark(wm: Long): Unit = setState(0, wm)

  /** The lake's [[graft.lake.TableMeta.rollbackCount]] as of this sink's
    * last rollback-gap full resync — the guard in
    * [[JdbcWarehouseSync.syncOnce]] fires only when the count advances
    * past it, so one rollback costs one resync, not a resync loop. A
    * COUNT, not an lsn high-water: rolling back to the same snapshot twice
    * produces identical exclusion spans, and an lsn marker would silently
    * skip the second (required) resync. */
  def reconciledRollbacks(): Long = {
    val c = connect()
    try {
      ensureState(c)
      val rs = c.createStatement().executeQuery(
        s"""SELECT "wm" FROM $stateTable WHERE "id" = 2""")
      try { if (rs.next()) rs.getLong(1) else -1L } finally rs.close()
    } finally commitAndClose(c)
  }

  def setReconciledRollbacks(v: Long): Unit = setState(2, v)
}

/** Scheduled lake→warehouse sync beat (reference lifecycle: Celery beat →
  * read since watermark → batched upserts → record watermark). One beat
  * pushes every key whose current winner changed since the sink's
  * watermark: manifest lsn stats prune untouched bucket files, tombstoned
  * keys become DELETEs, live winners become upserts. Re-running a crashed
  * beat is idempotent (upsert/delete converge to the same target state), so
  * the watermark update landing last gives exactly-once EFFECT. */
object JdbcWarehouseSync {

  def syncOnce(lake: LakeTable, sink: JdbcUpsertSink): Long = {
    val wm = sink.watermark()
    val m = lake.meta
    val snap = m.currentSnapshot.getOrElse(return 0L)
    val newWm = snap.files.map(_.lsnMax).foldLeft(-1L)(math.max)
    // vacuum gap: tombstones with lsn <= vacuumLsn may be physically gone,
    // so a sink that has not consumed past them can never learn those
    // deletes incrementally — the lsn-watermark path would silently strand
    // the deleted rows in the warehouse forever. Full resync instead:
    // upsert every live row and anti-diff the target's keys for deletes.
    if (wm >= 0 && wm < m.vacuumLsn) return fullResync(lake, sink, newWm)
    // rollback gap: the current snapshot's lineage EXCLUDES lsn spans under
    // this sink's watermark — the sink may have replicated writes that no
    // longer exist (or be missing resurrected ones), and the lsn path can
    // never emit the correction. Push the full corrected image, then record
    // the table's ROLLBACK COUNT so the same rollback never re-fires — but
    // a NEW rollback (even one producing identical spans, e.g. rolling
    // back to the same snapshot a second time after a roll-forward) always
    // does: span contents cannot distinguish instances, the count can.
    // Historical spans with no new rollback stay quiet (count unchanged);
    // a roll-forward clears the spans and is equally quiet.
    val gapSpans = snap.excludedLsns.exists(_.afterLsn < wm)
    if (wm >= 0 && m.rollbackCount > sink.reconciledRollbacks()) {
      if (gapSpans) {
        val n = fullResync(lake, sink, newWm)
        sink.setReconciledRollbacks(m.rollbackCount)
        return n
      }
      // no excluded span under this sink's watermark: the rollback reverted
      // only lsns the sink never consumed — nothing to correct, record the
      // count so the span doesn't trigger a stale resync once wm grows past
      // its start
      sink.setReconciledRollbacks(m.rollbackCount)
    }
    if (newWm <= wm) return 0L
    // manifest pruning: only bucket files that can contain post-watermark
    // rows are read (a rewritten bucket file keeps its full lsn span, so
    // re-pushing its old winners is an idempotent no-op at the target)
    val touched = snap.files.filter(_.lsnMax > wm)
    val rows = lake.readFileSubset(touched, m.currentSchemaId)
      .filter(col(LakeTable.LsnCol) > wm)
    val dataCols = m.currentSchema.columns.map(_.name)
    val changed = rows.persist()
    try {
      val upserts = changed.filter(!col(LakeTable.DeletedCol))
        .select(dataCols.map(col): _*)
      val deletes = changed.filter(col(LakeTable.DeletedCol))
        .select(m.keyCols.map(col): _*) // the beat's own snapshot, no reload
      val n = sink.upsert(upserts) + sink.deleteKeys(deletes)
      sink.setWatermark(newWm) // last: a crash before this replays the beat
      n
    } finally changed.unpersist()
  }

  /** Recovery path for a sink whose watermark fell behind a vacuum: push the
    * complete live state and delete every target key the lake no longer has
    * live. Idempotent like the incremental beat; the watermark update landing
    * last makes a crashed resync re-run safely. */
  private def fullResync(lake: LakeTable, sink: JdbcUpsertSink, newWm: Long): Long = {
    val m = lake.meta
    val live = lake.currentState().persist()
    try {
      val keyCols = m.keyCols
      val stale = sink.targetKeys(lake.spark)
        .join(live.select(keyCols.map(col): _*), keyCols, "left_anti")
      val n = sink.upsert(live) + sink.deleteKeys(stale)
      sink.setWatermark(newWm)
      n
    } finally live.unpersist()
  }
}
