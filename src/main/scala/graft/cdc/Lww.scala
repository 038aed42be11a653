package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Last-writer-wins max-by-LSN over change events — the engine's one
  * genuinely custom aggregate (reference analogue: `SELECT DISTINCT ON (id)
  * ... ORDER BY id, pr.created_at DESC`, `queries/fact_studies.py:4,34`).
  *
  * A typed `Aggregator` is a commutative, associative monoid with a total
  * tiebreak order (lsn, then op priority D>U>I), so Catalyst plans it with
  * partial (map-side) aggregation — batch/partition boundaries cannot change
  * the outcome, which is exactly the replay-determinism requirement (ST8).
  * The window-function formulation (`row_number() over (partition by key
  * order by lsn desc) = 1`) shuffles every row and is kept only as the
  * property-test spec. */
object LwwAggregator extends Aggregator[ChangeEvent, ChangeEvent, ChangeEvent] {
  override def zero: ChangeEvent = null
  private def newer(a: ChangeEvent, b: ChangeEvent): ChangeEvent = {
    if (a == null) b
    else if (b == null) a
    else if (a.lsn != b.lsn) { if (a.lsn > b.lsn) a else b }
    else {
      val pa = ChangeEvent.opPriority(a.op); val pb = ChangeEvent.opPriority(b.op)
      if (pa >= pb) a else b
    }
  }
  override def reduce(buf: ChangeEvent, e: ChangeEvent): ChangeEvent = newer(buf, e)
  override def merge(a: ChangeEvent, b: ChangeEvent): ChangeEvent = newer(a, b)
  override def finish(r: ChangeEvent): ChangeEvent = r
  override def bufferEncoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]
  override def outputEncoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]
}

object Dedup {
  /** One winner per (repo, path, commit) via the typed Aggregator.
    * Partial aggregation gives map-side combine for free. */
  def lww(events: Dataset[ChangeEvent]): Dataset[ChangeEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.repo, e.path, e.commit))
      .agg(LwwAggregator.toColumn.name("winner"))
      .map(_._2)
  }

  /** Explicit two-phase salted dedup for pathologically hot keys (north
    * rule: "salted, skew-aware repartition on (repo, path)"). Phase 1
    * aggregates per (key, salt) — hot keys split across `salts` reducers —
    * phase 2 folds the ≤`salts` survivors per key. Associativity of the
    * aggregator guarantees salted ≡ unsalted (property-tested). For
    * commit-grained keys the built-in partial aggregation usually suffices;
    * this path is for update-storms on a single key at 10^10 scale. */
  def lwwSalted(events: Dataset[ChangeEvent], salts: Int): Dataset[ChangeEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.repo, e.path, e.commit, (e.lsn % salts).toInt))
      .agg(LwwAggregator.toColumn.name("winner"))
      .map(_._2)
      .groupByKey(e => (e.repo, e.path, e.commit))
      .agg(LwwAggregator.toColumn.name("winner"))
      .map(_._2)
  }

  /** Untyped LWW dedup over an envelope DataFrame (dynamic schema — needed
    * once schema evolution is in play) using the native [[graft.functions
    * .LwwMaxBy]] TypedImperativeAggregate: plans as ObjectHashAggregateExec
    * with map-side partial aggregation and NO sort (built-in
    * `max_by(struct,...)` would plan a SortAggregate that sorts every
    * payload row twice). A hot key collapses to one row per input partition
    * before the shuffle — the primary skew defense. `salts > 1` adds an
    * explicit two-phase salted aggregation on top (north-rule requirement)
    * for keys so hot that even the final-stage hash table is a bottleneck. */
  def lwwDf(batch: DataFrame, keyCols: Seq[String], salts: Int = 0,
      lsnCol: String = "lsn", opCol: String = "op"): DataFrame = {
    graft.functions.LwwMaxBy.tuneSession(batch.sparkSession)
    val pri = opPriority(col(opCol))
    val allCols = batch.columns.toSeq
    def agg(df: DataFrame, keys: Seq[Column]): DataFrame =
      df.groupBy(keys: _*)
        .agg(graft.functions.LwwMaxBy.lwwMaxBy(
          struct(allCols.map(col): _*), col(lsnCol).cast("long"), pri).as("__w"))
        .select("__w.*")
    if (salts <= 1) agg(batch, keyCols.map(col))
    else {
      val phase1 = agg(batch.withColumn("__salt", pmod(col(lsnCol), lit(salts))),
        keyCols.map(col) :+ col("__salt")) // __salt is not in allCols → dropped by select
      agg(phase1, keyCols.map(col))
    }
  }

  /** op → tiebreak priority (D > U > I > stored-state). */
  def opPriority(op: Column): Column =
    when(op === "D", 2).when(op === "U", 1).when(op === "I", 0)
      .otherwise(-1).cast("int")

  /** Window-function spec of the same semantics (untyped; used as the
    * property-test oracle and as the SQL-expressible operator variant). */
  def lwwWindowSpec(events: DataFrame, keyCols: Seq[String], lsnCol: String,
      opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = when(col(opCol) === "D", 2).when(col(opCol) === "U", 1).otherwise(0)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(lsnCol).desc, pri.desc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
