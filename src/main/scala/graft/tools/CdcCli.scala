package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.lake._

/** spark-submit entry point for the CDC engine (also runnable via
  * `sbt "runMain graft.tools.CdcCli ..."` in local mode).
  *
  * Subcommands:
  *   gen <logDir> <numEvents> [numRepos] [files] [multi] — write a synthetic change log
  *   stream <logDir> <tableDir> <checkpointDir>    — tail the log into the table (AvailableNow)
  *   gen-json / stream-json                         — same, over a Debezium JSON-lines feed
  *   route <logDir> <outDir> <ckpt> <t1,t2,..>     — multi-table feed → one lake table per name
  *   show <tableDir>                               — table state summary
  *   reconcile <logDir> <tableDir>                 — anti-join verification (must be 0/0)
  *   vacuum <tableDir> [upToLsn]                   — drop old tombstones
  *   compact <tableDir> [targetMB] [minFiles] [sortCols] — bin-pack (and cluster) small data files
  *   rebucket <tableDir> <n>                       — re-hash into n buckets
  *   changes <tableDir> <fromSnap> [toSnap]        — row-level change feed between snapshots
  *   mirror <srcTableDir> <destTableDir> [beatSec] — lake-to-lake replication beat(s)
  *   tag <tableDir> <name> [snapshotId]            — retention-pinned named snapshot ref
  *   sql <warehouseDir> <query>                    — ad hoc SQL against the graftsql catalog
  */
object CdcCli {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cores]"))
      .appName("graft-cdc")
      // native expressions (cosine_similarity, lww_max_by, top_k_by, …)
      // available to the ad-hoc `sql` subcommand, same as a user session
      .withExtensions(new graft.GraftExtensions)
      // 2× reduce tasks per core: smooths the last wave without paying
      // per-task overhead; AQE coalesces when volume is small
      .config("spark.sql.shuffle.partitions", cores.toInt * 2)
      // let the split planner size scan partitions to totalBytes/cores (its
      // own formula) instead of fixed 128m slivers: bigger scan partitions =
      // better map-side combine in the LWW partial agg = less shuffle
      .config("spark.sql.files.maxPartitionBytes", "1g")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_STAGE_LOG")) addStageListener(spark)
    try run(spark, args.toList) finally spark.stop()
  }

  /** One shared per-stage metrics listener (graft.BenchJobs.StageLog) for
    * CLI and bench alike — two drifting [stage] printers was a review
    * finding; a metrics fix must land once. */
  def addStageListener(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(new graft.BenchJobs.StageLog)

  /** Open an existing lake table or create the base-schema one — the table
    * bootstrap every ingest subcommand shares (one place to change schema,
    * keys, or bucket defaults). */
  private def openOrCreate(spark: SparkSession, dir: String, buckets: Int): LakeTable =
    if (LakeTable.exists(dir)) LakeTable.forPath(spark, dir)
    else LakeTable.create(spark, dir, CdcPipeline.baseTableSchema,
      ChangeEvent.keyCols, numBuckets = buckets)

  /** Rows currently in a table's dead-letter sink (0 if none yet). */
  private def quarantineCount(spark: SparkSession, tableDir: String): Long =
    if (new java.io.File(s"$tableDir/_quarantine").exists())
      spark.read.parquet(s"$tableDir/_quarantine").count() else 0L

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "gen" :: logDir :: n :: rest =>
      // `multi` is a flag, not a positional: `gen <dir> <n> multi` must not
      // try to parse "multi" as numRepos
      val pos = rest.filterNot(_ == "multi")
      val cfg = GenConfig(numEvents = n.toLong,
        numRepos = pos.headOption.map(_.toInt).getOrElse(200))
      val files = pos.drop(1).headOption.map(_.toInt).getOrElse(8)
      val base = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
      // optional trailing `multi`: stamp a table discriminator (Debezium-
      // style multi-table feed) for the `route` subcommand
      val log = if (rest.contains("multi"))
        base.withColumn("table",
          when(pmod(xxhash64(col("repo")), lit(2)) === 0, lit("code"))
            .otherwise(lit("docs")))
      else base
      log.repartitionByRange(files, col("lsn")) // file order ~ lsn order, like a real log
        .write.mode("overwrite").parquet(logDir)
      println(s"[gen] wrote ${n} events to $logDir in $files files" +
        (if (rest.contains("multi")) " (multi-table)" else ""))

    case "gen-json" :: logDir :: n :: rest =>
      // same deterministic log, rendered as Debezium connector JSON lines —
      // the wire shape a real WAL tail delivers
      val cfg = GenConfig(numEvents = n.toLong,
        numRepos = rest.headOption.map(_.toInt).getOrElse(200))
      val files = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
      val env = CdcPipeline.envelopeDf(ChangeLogGen.generate(spark, cfg))
        .repartitionByRange(files, col("lsn"))
      DebeziumFormat.encode(env).write.mode("overwrite").text(logDir)
      println(s"[gen-json] wrote $n Debezium JSON events to $logDir in $files files")

    case "stream-json" :: logDir :: tableDir :: ckpt :: rest =>
      // tail a Debezium JSON-lines feed into the table (AvailableNow):
      // decode is a Catalyst from_json projection feeding the SAME
      // foreachBatch pipeline as the native parquet tail
      val table = openOrCreate(spark, tableDir,
        rest.headOption.map(_.toInt).getOrElse(64))
      val nqBefore = quarantineCount(spark, tableDir)
      val t0 = System.nanoTime()
      CdcPipeline.startFrom(new DebeziumFileSource(spark, logDir).stream,
        table, ckpt, lineageDir = Some(s"$tableDir/_lineage"),
        quarantineDir = Some(s"$tableDir/_quarantine"),
        // each pipeline pass over the batch would re-run the JSON parse
        cacheBatches = true)
        .awaitTermination()
      val m = table.meta
      val nq = quarantineCount(spark, tableDir) - nqBefore
      println(f"[stream-json] done in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
        s"snapshots=${m.snapshots.size} epochs=${m.committedEpochCount}" +
        (if (nq > 0) s" quarantined=$nq" else ""))

    case "route" :: logDir :: outDir :: ckpt :: namesCsv :: Nil =>
      // multi-table ingest: one checkpointed feed fans out to one lake table
      // per routed name under <outDir>/<name>; unrouted/malformed events
      // dead-letter under <outDir>/_quarantine
      val routes = namesCsv.split(",").map { nm =>
        val dir = s"$outDir/$nm"
        nm -> CdcRouter.RouteTarget(openOrCreate(spark, dir, buckets = 16),
          evolution = CdcPipeline.defaultEvolution)
      }.toMap
      val schema = org.apache.spark.sql.types.StructType(
        CdcPipeline.envelopeSchema :+ org.apache.spark.sql.types.StructField(
          "table", org.apache.spark.sql.types.StringType, nullable = true))
      CdcRouter.run(spark, logDir, schema, routes, ckpt,
        quarantineDir = Some(s"$outDir/_quarantine"))
      routes.toSeq.sortBy(_._1).foreach { case (nm, rt) =>
        println(s"[route] $nm liveRows=${rt.table.currentState().count()} " +
          s"snapshots=${rt.table.meta.snapshots.size}")
      }

    case "stream" :: logDir :: tableDir :: ckpt :: rest =>
      val table = openOrCreate(spark, tableDir,
        rest.headOption.map(_.toInt).getOrElse(64))
      // optional 3rd arg: beat seconds — scheduled-trigger mode (reference's
      // 600 s Celery beat): keeps tailing the growing log until killed.
      // 0 = AvailableNow (lets the later positionals be used in replay mode)
      val beat = rest.drop(2).headOption.map(_.toInt).filter(_ > 0)
      val trigger = beat match {
        case Some(sec) => org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(sec.toLong * 1000)
        case None => org.apache.spark.sql.streaming.Trigger.AvailableNow()
      }
      if (beat.isDefined) println(s"[stream] scheduled mode: beat=${beat.get}s (ctrl-c to stop)")
      // quarantine rows present BEFORE this run (epoch subdirs persist
      // across checkpointed runs) — the completion line reports the DELTA
      val nqBefore = quarantineCount(spark, tableDir)
      val t0 = System.nanoTime()
      // declared maintained views (CALL <cat>.system.create_view / the Scala
      // API) refresh on every ingest commit — the reference runs its rollup
      // refresh on the same cron beat as the sync. Materializations land as
      // sibling lake tables of the target (= the namespace dir under a SQL
      // warehouse).
      val declaredViews = Option(table.meta.maintainedViews).filter(_.nonEmpty)
        .map { defs =>
          println(s"[stream] maintaining ${defs.size} declared view(s): " +
            defs.map(_.name).mkString(", "))
          graft.lake.ViewMaintainer.forTable(table,
            java.nio.file.Paths.get(tableDir).toAbsolutePath.getParent.toString)
        }
      // optional 5th arg: foldEvery — merge-on-read mode (the trickle-beat
      // write path): every beat commits as a delta layer (write ∝ batch)
      // and every Nth epoch folds the layers back to base files
      val foldEvery = rest.drop(4).headOption.map(_.toInt).getOrElse(0)
      if (foldEvery > 0)
        println(s"[stream] merge-on-read mode: delta commits, fold every $foldEvery epochs")
      CdcPipeline.run(spark, logDir, table, ckpt,
        lineageDir = Some(s"$tableDir/_lineage"),
        maxFilesPerTrigger = rest.drop(1).headOption.map(_.toInt),
        trigger = trigger,
        views = declaredViews,
        compactEvery = rest.drop(3).headOption.map(_.toInt).getOrElse(0),
        // dead-letter sink: malformed envelopes land here with a reason
        // instead of failing the stream (a real feed always has a few)
        quarantineDir = Some(s"$tableDir/_quarantine"),
        delta = foldEvery > 0, foldEvery = foldEvery)
      val sec = (System.nanoTime() - t0) / 1e9
      val m = table.meta
      val nq = quarantineCount(spark, tableDir) - nqBefore
      println(f"[stream] done in $sec%.1f s; snapshots=${m.snapshots.size} " +
        f"currentSnapshot=${m.currentSnapshotId} epochs=${m.committedEpochCount}" +
        (if (nq > 0) s" quarantined=$nq" else ""))

    case "show" :: tableDir :: Nil =>
      val table = LakeTable.forPath(spark, tableDir)
      val m = table.meta
      println(s"[show] schemaId=${m.currentSchemaId} cols=${m.currentSchema.columns.map(c => s"${c.name}:${c.dataType.simpleString}").mkString(",")}")
      println(s"[show] snapshots=${m.snapshots.map(s => s"${s.snapshotId}:${s.operation}(epoch=${s.epochId},files=${s.files.size})").mkString(" ")}")
      val st = table.currentState()
      val n = st.count()
      val h = st.agg(sum(crc32(coalesce(col("content"), lit("")))).as("chk")).head().getLong(0)
      println(s"[show] liveRows=$n contentChecksum=$h")

    case "reconcile" :: logDir :: tableDir :: rest if rest.isEmpty || rest == List("json") =>
      val table = LakeTable.forPath(spark, tableDir)
      // `json` = the log is a Debezium JSON-lines feed (gen-json/stream-json)
      val log = if (rest == List("json"))
        new DebeziumFileSource(spark, logDir).batch(-1L)
      else spark.read.schema(CdcPipeline.envelopeSchema).parquet(logDir)
      val miss = Reconciler.missing(log, table).count()
      val stale = Reconciler.stale(log, table).count()
      println(s"[reconcile] missing=$miss stale=$stale " +
        (if (miss == 0 && stale == 0) "OK" else "MISMATCH"))
      if (miss != 0 || stale != 0) sys.exit(2)

    case "vacuum" :: tableDir :: rest =>
      val table = LakeTable.forPath(spark, tableDir)
      val removed = table.vacuum(rest.headOption.map(_.toLong).getOrElse(Long.MaxValue))
      println(s"[vacuum] removed=$removed tombstones")

    case "compact" :: tableDir :: rest =>
      val table = LakeTable.forPath(spark, tableDir)
      val before = table.meta.currentSnapshot.map(_.files.size).getOrElse(0)
      val target = rest.headOption.map(_.toLong * (1L << 20)).getOrElse(128L << 20)
      val sortBy = rest.drop(2).headOption // e.g. "lsn" or "lang,repo"
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val saved = table.compact(target,
        rest.drop(1).headOption.map(_.toInt).getOrElse(2), sortBy)
      println(s"[compact] files $before -> ${before - saved} (target=${target >> 20}MB" +
        (if (sortBy.nonEmpty) s", clustered by ${sortBy.mkString(",")})" else ")"))

    case "rebucket" :: tableDir :: n :: Nil =>
      val table = LakeTable.forPath(spark, tableDir)
      val before = table.meta.numBuckets
      table.rebucket(n.toInt)
      println(s"[rebucket] buckets $before -> ${table.meta.numBuckets}")

    case "fold" :: tableDir :: Nil =>
      // collapse merge-on-read delta layers back into base files
      val table = LakeTable.forPath(spark, tableDir)
      val folded = table.foldDeltas()
      println(s"[fold] folded=$folded delta buckets")

    case "changes" :: tableDir :: fromSnap :: rest =>
      val table = LakeTable.forPath(spark, tableDir)
      val feed = table.changes(fromSnap.toLong, rest.headOption.map(_.toLong))
      val counts = feed.groupBy(col("_change_type")).count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
      println(s"[changes] ${if (counts.isEmpty) "none" else counts}")
      feed.orderBy(col(LakeTable.LsnCol)).show(20, truncate = 40)

    case "changes-json" :: tableDir :: outDir :: fromSnap :: rest =>
      // CDC OUT: export the row-level change feed between two snapshots as
      // Debezium JSON lines — downstream systems tail THIS table the same
      // way this engine tails a WAL
      val table = LakeTable.forPath(spark, tableDir)
      // snapshot ids and schema versions are both small integers, so the
      // full-mode extras are NAMED (asof=<snap> version=<v>) — a bare
      // number after `full` would silently time-travel the export when the
      // operator meant to stamp a version
      val named = rest.filter(_.contains("="))
        .map { t => val Array(k, v) = t.split("=", 2); k -> v }.toMap
      val positional = rest.filterNot(_.contains("="))
      // fromSnap `full` = bootstrap export: the whole live state as inserts
      // (Debezium's snapshot phase) — tables have no pre-history snapshot
      // to diff against, so a consumer starts from `full` and then tails
      // incremental windows
      val feed = if (fromSnap == "full") {
        require(positional.isEmpty, "changes-json <table> <out> full takes " +
          s"named extras only: asof=<snapshotId> version=<schemaVersion>; " +
          s"got bare: ${positional.mkString(" ")}")
        table.read(named.get("asof").map(_.toLong))
          .filter(!col(LakeTable.DeletedCol))
          .withColumn("_change_type", lit("insert"))
          .drop(LakeTable.DeletedCol)
      } else table.changes(fromSnap.toLong,
        named.get("to").map(_.toLong)
          .orElse(positional.headOption.map(_.toLong)))
      // schema_version stamp: a lagging consumer evolves itself up to it
      // before applying. Default = the LEADER's applied envelope version
      // (from the migration ledger), so an evolved table's extra columns
      // survive the wire by default instead of being silently dropped by
      // an unevolved follower
      val version = named.get("version").map(_.toInt)
        .orElse(positional.drop(1).headOption.map(_.toInt))
        .getOrElse(new TableVersions().get(table.root,
          CdcPipeline.defaultEvolution))
      DebeziumFormat.encodeFeed(feed, version)
        .write.mode("overwrite").text(outDir)
      val n = spark.read.text(outDir).count()
      println(s"[changes-json] exported $n change events to $outDir")

    case "expire" :: tableDir :: rest =>
      val table = LakeTable.forPath(spark, tableDir)
      val removed = table.expireSnapshots(
        rest.headOption.map(_.toInt).getOrElse(1),
        rest.drop(1).headOption.map(_.toLong))
      println(s"[expire] removed=$removed unreferenced data files; " +
        s"snapshots=${table.meta.snapshots.size}")

    case "mirror" :: srcDir :: destDir :: rest =>
      // replication beats: dest := src live state, reading only the buckets
      // that changed since the last beat (see lake.TableMirror). Optional
      // beatSec loops on a schedule (the reference's 10-minute sync cadence,
      // celery_config.py:24) until killed; default is one beat.
      val beat = rest.headOption.map(_.toInt).filter(_ > 0)
      if (beat.isDefined) println(s"[mirror] scheduled mode: beat=${beat.get}s (ctrl-c to stop)")
      var go = true
      while (go) {
        val r = graft.lake.TableMirror.syncOnce(LakeTable.forPath(spark, srcDir), destDir)
        println(s"[mirror] mode=${r.mode} from=${r.fromSnapshot} " +
          s"to=${r.toSnapshot} rows=${r.rowsApplied}")
        beat match {
          case Some(sec) => Thread.sleep(sec * 1000L)
          case None => go = false
        }
      }

    case "tag" :: tableDir :: name :: rest =>
      val table = LakeTable.forPath(spark, tableDir)
      val id = table.createTag(name, rest.headOption.map(_.toLong))
      println(s"[tag] $name -> snapshot $id (retention-pinned)")

    case "sql" :: warehouse :: query :: Nil =>
      // ad hoc SQL (incl. CALL graftsql.system.<proc>) against a warehouse:
      //   sql <warehouseDir> "SELECT ... FROM graftsql.ns.t"
      spark.conf.set("spark.sql.catalog.graftsql",
        classOf[graft.sql.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftsql.warehouse", warehouse)
      val res = spark.sql(query)
      println(s"[sql] ${res.schema.fieldNames.mkString(", ")}")
      res.show(100, truncate = 60)

    case "explain" :: logDir :: Nil =>
      val log = spark.read.schema(CdcPipeline.envelopeSchema).parquet(logDir)
      println("== dedup (lwwDf) plan ==")
      Dedup.lwwDf(log, ChangeEvent.keyCols).explain("formatted")

    case "bench" :: logDir :: rest =>
      import org.apache.spark.sql.functions.{col => c}
      addStageListener(spark)
      def timed[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[bench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val log = spark.read.schema(CdcPipeline.envelopeSchema).parquet(logDir)
      timed("scan_count")(log.count())
      timed("scan_agg")(log.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(c("content")))).head())
      timed("dedup_count")(Dedup.lwwDf(log, ChangeEvent.keyCols).count())
      // table lives next to the log so bench I/O stays on the same device
      val dir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(logDir).toAbsolutePath.getParent, "benchtbl").toString
      val table = LakeTable.create(spark, s"$dir/t", CdcPipeline.baseTableSchema,
        ChangeEvent.keyCols, numBuckets = rest.headOption.map(_.toInt).getOrElse(64))
      timed("full_merge")(CdcPipeline.replayBatch(spark, log, table, Map.empty))
      LakeTable.deleteRecursively(java.nio.file.Paths.get(dir))

    case other =>
      System.err.println(s"unknown args: $other\n" +
        "usage: gen <logDir> <n> [repos] [files] [multi] | gen-json <logDir> <n> [repos] [files] | stream-json <logDir> <tableDir> <ckpt> [buckets] | route <logDir> <outDir> <ckpt> <t1,t2,..> | stream <logDir> <tableDir> <ckpt> [buckets] [maxFilesPerTrigger] [beatSec] [compactEvery] [foldEvery] | show <tableDir> | reconcile <logDir> <tableDir> [json] | vacuum <tableDir> [upToLsn] | rebucket <tableDir> <n> | compact <tableDir> [targetMB] [minFiles] | fold <tableDir> | changes <tableDir> <fromSnap> [toSnap] | changes-json <tableDir> <outDir> <fromSnap|full> [toSnap] [schemaVersion] [to=N] [asof=N] [version=N] | expire <tableDir> [keepLast] [olderThanMs] | mirror <srcTableDir> <destTableDir> [beatSec] | tag <tableDir> <name> [snapshotId] | sql <warehouseDir> <query> | explain <logDir> | bench <logDir> [buckets]")
      sys.exit(1)
  }
}
