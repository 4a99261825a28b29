package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational core: the filter/project/join/aggregate/window query surface
  * the reference's PySpark preprocessing stage exercises, re-expressed as
  * declarative DataFrame plans so Catalyst handles pushdown, pruning, join
  * strategy and AQE.
  *
  * Determinism-vs-oracle conventions (see SURVEY.md §6):
  *  - money/measure sums go through `decimal` casts so the result is
  *    independent of partial-aggregation order, then back to double;
  *  - every computed column is aliased identically in the DuckDB oracle
  *    SQL (driver hash-compares by sorted column name);
  *  - output rows get a deterministic total order (unique sort keys);
  *  - timestamps are only ever output as DATE or epoch-second BIGINT.
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  /** Order-independent sum of a double measure: exact decimal accumulate,
    * double result. The 2-dp inputs are ≥5e-7 away from any 6-dp rounding
    * boundary, so the double→decimal rounding is engine-agnostic. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** q1_agg — TPC-H Q1 pricing summary: scan-heavy groupBy aggregate.
    * Map-side partial aggregation collapses 6k rows/partition into 4
    * groups before the shuffle; at 100 TB this stays one scan + one
    * 4-row shuffle. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2_filter_project — selective predicate + narrow projection; both
    * reach the parquet scan (PushedFilters + 3-column ReadSchema), which
    * is the whole game at 100 TB: read 3 columns, skip row groups. */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45.0 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity > 45.0 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q3_join_agg — TPC-H Q3 shape: dim-filtered customer joined into
    * orders⋈lineitem, revenue per order, top 10. customer grows linearly
    * with SF, so its join strategy is deliberately left to stats/AQE —
    * broadcast while it fits, shuffled hash/sort-merge when it doesn't
    * (a forced broadcast() here is an OOM at 100 TB). orders⋈lineitem
    * shuffles on orderkey — the one unavoidable fact-fact shuffle. */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, d)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** q4_semijoin — EXISTS as left_semi: customers with at least one
    * high-value order. Semi join never duplicates or widens rows, so the
    * shuffle carries only the key column. */
  def q4Semijoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 150000.0)
      .select("o_custkey")
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  val q4Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q5_multijoin — TPC-H Q5 star join. Only the fixed-size dims
    * (region: 5 rows, nation: 25) carry broadcast hints — they stay tiny
    * at any SF. customer and supplier grow linearly with SF, so their
    * strategy is left to stats/AQE: broadcast while small, shuffle when
    * not. Only orders⋈lineitem must shuffle. */
  def q5Multijoin(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** q6_cond_agg — TPC-H Q6: tight-range filters fully pushed to the
    * scan, single global agg. The canonical "does pushdown work" probe. */
  def q6CondAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin

  /** q7_window_rank — rank per partition: top-3 lineitems by price within
    * each supplier. One shuffle on the window key; ties broken by unique
    * (orderkey, linenumber) so the rank is total and oracle-stable. */
  def q7WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("l_suppkey", "rk")
  }

  val q7Sql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rk
      |  FROM lineitem) t
      |WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin

  /** q8_window_running — running revenue per customer over their order
    * history (frame = unbounded preceding..current). Decimal accumulate
    * keeps the running value exact at every prefix. */
  def q8WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("order_date"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice"))
      .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val q8Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
      |    ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  /** q9_distinct_agg — multi countDistinct in one pass (Spark expands to
    * a single multi-distinct aggregate, not N scans). */
  def q9DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")

  val q9Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q10_antijoin — NOT EXISTS as left_anti: customers who never placed
    * a high-value order. The filter on the right side lands before the
    * join, so the anti join probes a small build side. */
  def q10Antijoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** q11_having — aggregate + HAVING (post-agg filter stays after the
    * partial/final agg, not on the scan). */
  def q11Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")

  val q11Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
      |ORDER BY o_custkey""".stripMargin

  /** q12_case_agg — TPC-H Q12 shape: CASE-WHEN conditional counts. */
  def q12CaseAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_orderstatus") =!= "F", 1)).as("n_open"),
        dsum(when(col("o_totalprice") > 100000.0, col("o_totalprice")).otherwise(0.0)).as("big_spend"))
      .orderBy("o_orderpriority")

  val q12Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
      |  COUNT(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS n_open,
      |  CAST(SUM(CAST(CASE WHEN o_totalprice > 100000.0 THEN o_totalprice ELSE 0.0 END
      |    AS DECIMAL(18,6))) AS DOUBLE) AS big_spend
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q13_outer_join — TPC-H Q13: customer × order-count distribution via
    * left outer join (customers with zero orders count at 0). */
  def q13OuterJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q14_scalar_subquery — TPC-H Q17 shape: rows above 1.3× their group
    * mean. The per-part average is a joined sub-aggregate, not a
    * correlated re-scan; it has one row per partkey (SF-proportional —
    * billions of rows at 100 TB), so no broadcast hint: stats/AQE
    * broadcast it while small and sort-merge on l_partkey when not.
    * avg is derived from a decimal sum → identical on both engines
    * regardless of accumulation order. */
  def q14ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val partAvg = l.groupBy(col("l_partkey").as("pk"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    l.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") > lit(1.3) * col("avg_qty"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q14Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.pk
      |WHERE l_quantity > 1.3 * avg_qty
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q15_topk_order — global ORDER BY + LIMIT: Spark plans TakeOrderedAndProject
    * (per-partition top-k + single merge), never a full sort at scale. */
  def q15TopkOrder(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(25)

  val q15Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin

  /** q16_union — UNION ALL then distinct UNION of two key sets. */
  def q16Union(s: SparkSession, d: String): DataFrame = {
    val highBal = Tables.customer(s, d).filter(col("c_acctbal") > 7000.0)
      .select(col("c_custkey").as("custkey"))
    val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    highBal.union(building).distinct()
      .orderBy("custkey")
  }

  val q16Sql: String =
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000.0
      |UNION
      |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY custkey""".stripMargin

  /** q17_rollup — hierarchical totals region→nation; NULL grouping rows
    * are the rollup super-aggregates on both engines. */
  def q17Rollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  val q17Sql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** q18_cube — full cube over two low-cardinality dims. */
  def q18Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val q18Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** q19_pivot — event_type → columns per user (the reference's one-hot /
    * per-dimension feature spread). Explicit value list keeps the plan
    * static (no driver-side distinct scan); na.fill(0) matches COUNT's
    * zero-for-empty on the oracle side. */
  def q19Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val q19Sql: String =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q20_approx_distinct — HLL++ approx_count_distinct. Approximate by
    * design → no SQL oracle (driver rows-only); RelationalSpec bounds the
    * estimate against the exact count. At 100 TB this is the only sane
    * way to count uniques per high-cardinality key. */
  def q20ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy("l_returnflag")

  /** q21_percentiles — exact interpolated percentiles (median, p90).
    * Spark `percentile` and DuckDB `quantile_cont` share linear
    * interpolation semantics. */
  def q21Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val q21Sql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private[graft] val ApproxPercentileAccuracy = 1000

  /** q26_approx_percentile — the sketch percentile the 100 TB path
    * actually uses: exact `percentile` buffers every group value in
    * memory (fine per-priority at test SF, lethal on a high-cardinality
    * key at scale), while `approx_percentile` keeps a bounded
    * GK-style sketch with deterministic rank error ≤ n/accuracy and
    * merges map-side. Approximate by design → no SQL oracle (driver
    * rows-only); OperatorsSpec brackets each estimate between the exact
    * percentiles at (p ± 1/accuracy·safety). */
  def q26ApproxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr(s"approx_percentile(o_totalprice, 0.5, $ApproxPercentileAccuracy)")
          .as("median_price_approx"),
        expr(s"approx_percentile(o_totalprice, 0.9, $ApproxPercentileAccuracy)")
          .as("p90_price_approx"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** q22_sampling — deterministic systematic sample (key mod), not
    * rand(): reproducible across engines, retries, and stage re-runs —
    * which is what a 100 TB pipeline actually needs from a sampler. */
  def q22Sampling(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(pmod(col("l_orderkey") * 2654435761L + col("l_linenumber"), lit(97)) < 5)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val q22Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
      |WHERE ((l_orderkey * 2654435761 + l_linenumber) % 97 + 97) % 97 < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q23_window_misc — ranking-function variety: percent_rank /
    * cume_dist / lag / lead over a total order (both engines share the
    * rational-arithmetic definitions, and the divisions are
    * deterministic doubles). */
  def q23WindowMisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(asc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("prev_bal", lag(col("c_acctbal"), 1).over(w))
      .withColumn("next_bal", lead(col("c_acctbal"), 1).over(w))
      .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
  }

  val q23Sql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  LAG(c_acctbal, 1) OVER w AS prev_bal,
      |  LEAD(c_acctbal, 1) OVER w AS next_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin

  /** q24_setops — INTERSECT / EXCEPT on key sets, tagged and unioned
    * into one result. */
  def q24Setops(s: SparkSession, d: String): DataFrame = {
    val highBal = Tables.customer(s, d).filter(col("c_acctbal") > 7000.0)
      .select(col("c_custkey").as("custkey"))
    val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    highBal.intersect(building).withColumn("op", lit("in_both"))
      .union(highBal.except(building).withColumn("op", lit("only_highbal")))
      .orderBy("op", "custkey")
  }

  val q24Sql: String =
    """SELECT custkey, 'in_both' AS op FROM (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000.0
      |  INTERSECT
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING') a
      |UNION ALL
      |SELECT custkey, 'only_highbal' AS op FROM (
      |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000.0
      |  EXCEPT
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING') b
      |ORDER BY op, custkey""".stripMargin

  /** q25_grouping_sets — explicit GROUPING SETS (the general form
    * rollup/cube specialize) through the SQL surface: per-(flag,status),
    * per-flag, and grand-total grains in one pass. Spark plans one
    * Expand + single aggregation — same shape as q17/q18, arbitrary
    * grain list. */
  def q25GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_q25_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM graft_q25_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val q25Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** name → (builder, optional oracle SQL) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q25_grouping_sets" -> (q25GroupingSets _, Some(q25Sql)),
    "q26_approx_percentile" -> (q26ApproxPercentile _, None),
    "q23_window_misc" -> (q23WindowMisc _, Some(q23Sql)),
    "q24_setops" -> (q24Setops _, Some(q24Sql)),
    "q1_agg" -> (q1Agg _, Some(q1Sql)),
    "q2_filter_project" -> (q2FilterProject _, Some(q2Sql)),
    "q3_join_agg" -> (q3JoinAgg _, Some(q3Sql)),
    "q4_semijoin" -> (q4Semijoin _, Some(q4Sql)),
    "q5_multijoin" -> (q5Multijoin _, Some(q5Sql)),
    "q6_cond_agg" -> (q6CondAgg _, Some(q6Sql)),
    "q7_window_rank" -> (q7WindowRank _, Some(q7Sql)),
    "q8_window_running" -> (q8WindowRunning _, Some(q8Sql)),
    "q9_distinct_agg" -> (q9DistinctAgg _, Some(q9Sql)),
    "q10_antijoin" -> (q10Antijoin _, Some(q10Sql)),
    "q11_having" -> (q11Having _, Some(q11Sql)),
    "q12_case_agg" -> (q12CaseAgg _, Some(q12Sql)),
    "q13_outer_join" -> (q13OuterJoin _, Some(q13Sql)),
    "q14_scalar_subquery" -> (q14ScalarSubquery _, Some(q14Sql)),
    "q15_topk_order" -> (q15TopkOrder _, Some(q15Sql)),
    "q16_union" -> (q16Union _, Some(q16Sql)),
    "q17_rollup" -> (q17Rollup _, Some(q17Sql)),
    "q18_cube" -> (q18Cube _, Some(q18Sql)),
    "q19_pivot" -> (q19Pivot _, Some(q19Sql)),
    "q20_approx_distinct" -> (q20ApproxDistinct _, None),
    "q21_percentiles" -> (q21Percentiles _, Some(q21Sql)),
    "q22_sampling" -> (q22Sampling _, Some(q22Sql)),
  )
}
