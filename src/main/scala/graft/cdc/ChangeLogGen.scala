package graft.cdc

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic distributed synthetic change-log generator.
  *
  * Scales with `spark.range(numEvents)` — every event is a pure function of
  * (seed, logical index), so any partitioning of the range yields the same
  * multiset of events, and the generator itself parallelizes to any cluster
  * size (no driver-side materialization; 10^10 events is just a bigger
  * range).
  *
  * Modeled log properties (reference analogues in parentheses):
  *  - strictly monotone LSN at the source, with bounded local out-of-order
  *    arrival (block-permuted) — polled extraction reorders rows;
  *  - ~dupRate duplicated deliveries with identical (lsn, payload) — the 5 s
  *    watermark overlap re-read (`sync/sync_base.py:55-56`);
  *  - Zipf-skewed repo distribution — hot tenants (`cron_tasks.py:84-86`
  *    fans out per organization; org sizes are wildly skewed in practice);
  *  - op mix I/U/D defaulting 1:8:1 (`fact_studies.deleted` soft-delete,
  *    `migrations/20221214_01_9Jm6L.sql:158`);
  *  - schema_version bumps at fixed LSN fractions (yoyo migration sequence,
  *    `migrations/20230510_01_V14Kk.sql`).
  */
final case class GenConfig(
    seed: Long = 42L,
    numEvents: Long = 100000L,
    numRepos: Int = 200,
    pathsPerRepo: Int = 50,
    /** distinct commits per (repo,path) — the key cardinality knob */
    commitsPerFile: Int = 8,
    zipfAlpha: Double = 2.2,
    deleteRate: Double = 0.10,
    insertRate: Double = 0.10, // remainder are U; I and U both upsert
    dupRate: Double = 0.01,
    /** arrival-order jitter block (power of two) */
    jitterBlock: Int = 1024,
    minContent: Int = 64,
    maxContent: Int = 2048,
    /** lsn fractions at which schema_version bumps to 2, 3, 4 */
    schemaBumps: Seq[Double] = Seq(0.25, 0.5, 0.75)
)

object ChangeLogGen {
  private val langs = Array("scala", "py", "sql", "java", "go", "rs", "ts",
    "js", "rb", "cpp", "c", "sh")
  private val words = Array("def", "val", "return", "class", "object",
    "match", "case", "import", "package", "if", "else", "for", "while",
    "select", "from", "where", "group", "join", "order", "fn", "let", "mut",
    "async", "await", "struct", "impl", "trait", "pub", "extends", "override")

  /** Event as a pure function of its logical (source) index. */
  def eventAt(cfg: GenConfig, srcIdx: Long): ChangeEvent = {
    val s = cfg.seed
    // redelivery: with prob dupRate this arrival is a byte-identical replay
    // of a recent earlier event (bounded look-back)
    val isDup = Det.u01(s, 1, srcIdx) < cfg.dupRate && srcIdx > 64
    val i = if (isDup) srcIdx - 1 - (Det.mix(s, 2, srcIdx) >>> 58) else srcIdx // look back <64

    val repoIdx = Det.skewedIndex(s, 3, i, cfg.numRepos, cfg.zipfAlpha)
    val pathIdx = ((Det.mix(s, 4, i) >>> 33) % cfg.pathsPerRepo).toInt
    val commitIdx = (Det.mix(s, 5, i) >>> 33).toInt % cfg.commitsPerFile
    val repo = f"org-${repoIdx % 40}%03d/repo-$repoIdx%04d"
    val lang = langs((Det.mix(s, 6, repoIdx.toLong * cfg.pathsPerRepo + pathIdx) >>> 33).toInt % langs.length)
    val path = f"src/dir${pathIdx % 7}/file$pathIdx%04d.$lang"
    val commit = Det.hex40(s, 7, repoIdx.toLong * 1000003L + pathIdx * 131L + commitIdx)

    val uOp = Det.u01(s, 8, i)
    val op = if (uOp < cfg.deleteRate) "D"
      else if (uOp < cfg.deleteRate + cfg.insertRate) "I" else "U"

    val lsn = i
    val txnTs = new Timestamp(1700000000000L + lsn * 37L) // event time from lsn
    val frac = lsn.toDouble / cfg.numEvents
    val schemaVersion = 1 + cfg.schemaBumps.count(frac >= _)

    val content = if (op == "D") null else genContent(cfg, i)
    val branch = if (schemaVersion >= 2 && op != "D")
      (if ((Det.mix(s, 9, i) & 3) == 0) "main" else s"feature/${(Det.mix(s, 9, i) >>> 33) % 97}")
    else null
    val sizeBytes: java.lang.Long =
      if (schemaVersion >= 3 && op != "D") {
        val base = if (content == null) 0L else content.length.toLong
        // v4 widens int→long: values overflow int32 only from v4 on
        if (schemaVersion >= 4) base + 4000000000L else base
      } else null

    ChangeEvent(lsn, txnTs, op, schemaVersion, repo, path, commit, lang,
      content, branch, sizeBytes)
  }

  /** Seeded pseudo-source text, log-skewed length in [minContent, maxContent]. */
  def genContent(cfg: GenConfig, i: Long): String = {
    val s = cfg.seed
    val u = Det.u01(s, 10, i)
    val len = cfg.minContent + ((cfg.maxContent - cfg.minContent) * u * u * u).toInt
    val sb = new java.lang.StringBuilder(len + 32)
    var h = Det.mix(s, 11, i)
    while (sb.length < len) {
      h = Det.splitmix64(h)
      sb.append(words(((h >>> 33) % words.length).toInt))
      sb.append(if ((h & 7) == 0) "\n" else " ")
      if ((h & 15) == 1) { sb.append(java.lang.Long.toHexString(h)); sb.append(' ') }
    }
    sb.setLength(len)
    sb.toString
  }

  /** Arrival-order permutation: bijective within jitterBlock-sized blocks,
    * so the log is locally out of order but lsn remains globally bounded-
    * jittered (models interleaved commit vs. publish order). */
  def arrivalToSource(cfg: GenConfig, arrival: Long): Long = {
    val b = cfg.jitterBlock
    val base = (arrival / b) * b
    val rows = math.min(b.toLong, cfg.numEvents - base).toInt // partial last block
    var off = (arrival % b).toInt
    // cycle-walk the mod-2^k bijection until it lands inside the (possibly
    // partial) block — keeps the permutation bijective on [0, rows)
    do { off = (off * 741) & (b - 1) } while (off >= rows)
    base + off
  }

  /** The change log in arrival order. `numPartitions` fixes the source
    * split count independently of cluster size — required for the N-vs-4N
    * scaling protocol (same input partitioning at both parallelism levels). */
  def generate(spark: SparkSession, cfg: GenConfig,
      numPartitions: Option[Int] = None): Dataset[ChangeEvent] = {
    import spark.implicits._
    val parts = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    spark.range(0, cfg.numEvents, 1, parts).mapPartitions { it =>
      it.map(a => eventAt(cfg, arrivalToSource(cfg, a)))
    }
  }

  /** Ground-truth final state computed driver-side (small configs only):
    * per (repo,path,commit) key, the max-lsn event wins; D removes the key.
    * Independent code path used to validate the distributed pipeline. */
  def expectedFinalState(cfg: GenConfig): Map[(String, String, String), ChangeEvent] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String, String), ChangeEvent]
    var i = 0L
    while (i < cfg.numEvents) {
      val e = eventAt(cfg, i)
      val k = (e.repo, e.path, e.commit)
      val cur = m.get(k)
      if (cur.isEmpty || cur.get.lsn < e.lsn ||
          (cur.get.lsn == e.lsn && ChangeEvent.opPriority(cur.get.op) < ChangeEvent.opPriority(e.op)))
        m(k) = e
      i += 1
    }
    m.filter(_._2.op != "D").toMap
  }
}
