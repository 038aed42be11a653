package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Core relational operator surface (SURVEY.md §2.2-§2.6) over the driver's
  * TPC-H-ish testdata. Each op is the Spark-first expression of a reference
  * pattern; the DuckDB oracle restates it in ANSI SQL.
  *
  * Scale notes are per-op: the point of each formulation is that it keeps
  * filters/projections at the scan, joins broadcastable or shuffle-pruned,
  * and aggregations partial-aggregated.
  */
object RelationalOps {

  val all: Seq[OpQuery] = Seq(

    // P1/P2/P6 — projection + predicate pushdown (reference: explicit select
    // lists + watermark/org filters inside source SQL, queries/fact_studies.py:4-31).
    // Both filter and 4-column projection reach the Parquet scan (PushedFilters/ReadSchema).
    OpQuery("q01_pushdown_projection",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" &&
          to_date(col("l_shipdate")).between("1995-01-01", "1996-12-31"))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_returnflag = 'R'
             |  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'""".stripMargin)),

    // A5/A4 — grouped aggregation with exact decimal arithmetic (reference:
    // group-by-count views, migrations/20230207_01_53Bud.sql:4-24). Partial
    // aggregation (map-side combine) comes free from HashAggregateExec.
    OpQuery("q02_agg_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          countDistinct(col("l_orderkey")).as("n_orders")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  count(*) AS n_rows,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // J1/J5/J6 — fact ⋈ broadcast dim chain (reference: studies ⟕ facilities
    // ⟕ ..., queries/fact_studies.py:26-28). supplier/nation/region are dims:
    // explicitly broadcast so the fact table never shuffles.
    OpQuery("q03_join_broadcast_dims",
      (s, d) => {
        val li = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation"); val reg = t(s, d, "region")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("revenue"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_items,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // J3/P5 — LEFT join with residual predicate INSIDE the join condition
    // (reference: pr.is_active AND NOT pr.deleted in the LEFT JOIN,
    // queries/fact_studies.py:28 — moving it to WHERE would change null rows).
    OpQuery("q04_left_join_residual",
      (s, d) => {
        val c = t(s, d, "customer"); val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey") && o("o_orderstatus") === "O", "left")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("open_orders"),
            count(lit(1)).as("n_rows"),
            countDistinct(col("c_custkey")).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(o_orderkey) AS open_orders,
             |  count(*) AS n_rows, count(DISTINCT c_custkey) AS n_customers
             |FROM customer LEFT JOIN orders
             |  ON c_custkey = o_custkey AND o_orderstatus = 'O'
             |GROUP BY c_mktsegment""".stripMargin)),

    // J9/SO1/P7 — anti join (reference: reconciliation NOT IN id-list,
    // sync/sync_validator.py:40-49 — replaced by a distributed left_anti,
    // never a literal NOT IN at 10^10 scale).
    OpQuery("q05_anti_join",
      (s, d) => {
        val c = t(s, d, "customer")
        val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("customers_without_big_orders"))
      },
      Some("""SELECT c_nationkey, count(*) AS customers_without_big_orders
             |FROM customer WHERE NOT EXISTS
             |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |GROUP BY c_nationkey""".stripMargin)),

    // P8 — semi join (reference: targeted re-sync `ps.id IN %(ids)s`,
    // sync/studies.py:51-53).
    OpQuery("q06_semi_join",
      (s, d) => {
        val o = t(s, d, "orders"); val li = t(s, d, "lineitem")
        o.join(li.filter(col("l_quantity") >= 45), o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders WHERE EXISTS
             |  (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
             |GROUP BY o_orderpriority""".stripMargin)),

    // J7 — correlated scalar subquery rewritten as a join against a
    // pre-aggregated (broadcastable) per-group table (reference: per-row dim
    // lookups, queries/fact_studies.py:104-110 — the anti-pattern Spark
    // replaces wholesale).
    OpQuery("q07_scalar_subquery_as_join",
      (s, d) => {
        val o = t(s, d, "orders")
        val avgByStatus = o.groupBy(col("o_orderstatus").as("st"))
          .agg(avg(col("o_totalprice")).as("avg_price"))
        o.join(broadcast(avgByStatus), col("o_orderstatus") === col("st"))
          .filter(col("o_totalprice") > col("avg_price") * 1.5)
          .select(col("o_orderkey"), col("o_orderstatus"))
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders o
             |JOIN (SELECT o_orderstatus AS st, avg(o_totalprice) AS avg_price
             |      FROM orders GROUP BY o_orderstatus) a
             |  ON o.o_orderstatus = a.st
             |WHERE o_totalprice > avg_price * 1.5""".stripMargin)),

    // W1 — per-key ordered top-1 window (the LWW spec form; reference:
    // DISTINCT ON (id) ORDER BY created_at DESC, queries/fact_studies.py:4,34).
    OpQuery("q08_window_latest_order",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"))
      },
      Some("""SELECT o_custkey, o_orderkey AS latest_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS latest_date
             |FROM (SELECT *, row_number() OVER
             |        (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             |      FROM orders) WHERE rn = 1""".stripMargin)),

    // W2 + deterministic top-k — rank with a total tiebreak order so LIMIT
    // semantics are replay-stable (ties broken by key, never by scan order).
    // Plans TakeOrderedAndProject (distributed heaps), NOT a global window.
    OpQuery("q16_topk_customers",
      (s, d) => {
        val sums = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("total_spend"))
        rankedTopK(sums.select(col("o_custkey"), col("total_spend")),
          10, col("total_spend").desc, col("o_custkey").asc)
      },
      Some("""SELECT o_custkey, total_spend, rk FROM (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             |         row_number() OVER (ORDER BY CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC, o_custkey ASC) AS rk
             |  FROM orders GROUP BY o_custkey)
             |WHERE rk <= 10""".stripMargin)),

    // F8/F9 — calendar attribute suite derived as pure expressions, replacing
    // the reference's 29k-row precomputed dim_calendar + per-row key lookups
    // (migrations/20221214_01_9Jm6L.sql:44-84, J8): date_dim_id is a function
    // of the date, so the join disappears entirely.
    OpQuery("q18_calendar_derivation",
      (s, d) => t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .select(
          date_format(col("dt"), "yyyyMMdd").cast("int").as("date_dim_id"),
          year(col("dt")).as("year_actual"),
          quarter(col("dt")).as("quarter_actual"),
          month(col("dt")).as("month_actual"),
          date_format(col("dt"), "EEEE").as("day_name"),
          (weekday(col("dt")) + 1).as("iso_dow"),
          (weekday(col("dt")) >= 5).as("is_weekend"),
          date_format(col("dt"), "yyyy-MM-dd").as("date_str")),
      Some("""SELECT CAST(strftime(dt, '%Y%m%d') AS INT) AS date_dim_id,
             |  CAST(year(dt) AS INT) AS year_actual,
             |  CAST(quarter(dt) AS INT) AS quarter_actual,
             |  CAST(month(dt) AS INT) AS month_actual,
             |  dayname(dt) AS day_name,
             |  CAST(isodow(dt) AS INT) AS iso_dow,
             |  isodow(dt) >= 6 AS is_weekend,
             |  strftime(dt, '%Y-%m-%d') AS date_str
             |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)""".stripMargin)),

    // As-of (point-in-time) LEFT join: each event labeled with the latest
    // order its user had placed by the event's timestamp — AsOfJoin's
    // union + carry-forward plan: one |events|+|orders| exchange, never a
    // per-key cartesian. Ties (same customer, same order timestamp) are
    // pre-aggregated to max orderkey so the as-of pick is deterministic;
    // the % 3 key subset keeps genuine no-match (null) rows in the result.
    OpQuery("q52_asof_join",
      (s, d) => {
        val ord = t(s, d, "orders")
          .filter(col("o_custkey") % 3 === 0)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("asof_orderkey"))
        AsOfJoin.asOf(
          t(s, d, "events").select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts",
          ord, "o_custkey", "o_orderdate",
          Seq("asof_orderkey"))
          .select(col("event_id"), col("user_id"), col("asof_orderkey"))
      },
      Some("""WITH ord AS (
             |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS asof_orderkey
             |  FROM orders WHERE o_custkey % 3 = 0 GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, o.asof_orderkey
             |FROM events e ASOF LEFT JOIN ord o
             |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin)))
}
