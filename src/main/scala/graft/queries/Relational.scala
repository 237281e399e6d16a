package graft.queries

import graft.{GraftQuery, Tables}
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational pack: scan → filter → join → aggregate → window →
  * top-k, TPC-H-flavored over the driver fixtures.
  *
  * Scale notes (100 TB): dimension joins (region/nation/supplier/
  * customer at these cardinalities) are explicit `broadcast`; fact-fact
  * joins shuffle on the join key only after filters are pushed to the
  * parquet scan; global top-k uses orderBy+limit which Spark plans as
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  * no global sort).
  *
  * Determinism notes: all double sums go through [[Tables.dsum]]
  * (exact decimal addition → one final rounding) so partition order
  * can't change low bits; every rank/limit ordering carries a unique
  * key tie-break.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary (agg breadth: sum/avg/count). */
  val q1PricingSummary = GraftQuery(
    "q1_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""),
    bench = true)

  /** TPC-H Q6-shaped single-row forecast (pure scan+filter+sum —
    * predicate pushdown showcase). */
  val q6ForecastRevenue = GraftQuery(
    "q6_forecast_revenue",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.04, 0.06) &&
          $"l_quantity" < 24)
        .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
             count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"""),
    bench = true)

  /** Multi-join star query: revenue per region/nation for 1996 orders.
    * Dims are broadcast; the lineitem⋈orders fact join shuffles on
    * orderkey AFTER the orderdate filter prunes the orders side. */
  val q3RevenueByNation = GraftQuery(
    "q3_revenue_by_nation",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      // nation/region are BOUNDED dims (25/5 rows at any SF) — pinned
      // broadcast. customer SCALES with the data; no hint, AQE
      // broadcasts it while it fits and shuffles at 100 TB.
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY r_name, n_name"""),
    bench = true)

  /** Left-semi join (EXISTS): order counts by priority where the order
    * has at least one returned line. SURVEY §2.4 notes semi comes free
    * with Dataset.join. */
  val q4OrderPriority = GraftQuery(
    "q4_order_priority",
    (s, d) => {
      import s.implicits._
      val returned = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .select($"l_orderkey")
      Tables.orders(s, d)
        .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority"""))

  /** Left-anti join — the reference's one true relational join (J1,
    * data_processing.py:8-12) re-expressed on the fixtures: customers
    * with no urgent 1996 order. Broadcast-able right side. */
  val q5AntiCustomers = GraftQuery(
    "q5_anti_join_customers",
    (s, d) => {
      import s.implicits._
      val urgent = Tables.orders(s, d).filter(
        $"o_orderpriority" === "1-URGENT" &&
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT'
                          AND o_orderdate >= TIMESTAMP '1996-01-01'
                          AND o_orderdate < TIMESTAMP '1997-01-01')"""))

  /** TRUE TPC-H Q5 (local supplier volume): revenue per nation from
    * 1996 orders where the CUSTOMER and the LINE'S SUPPLIER sit in
    * the same ASIA nation. The signature feature — and why this query
    * exists beyond q3 (VERDICT r9 #2) — is the join GRAPH: the
    * `c_nationkey = s_nationkey` equality ties two dimension legs of
    * the fact join to each other, making the graph a CYCLE, not a
    * star. Spark has no special cycle operator; the Spark-first
    * expression is to thread the customer's nationkey through the
    * fact side and close the cycle inside the supplier join
    * condition, so the plan stays one fact pipeline:
    *
    *  - region('ASIA') ⋈ nation first — 5 bounded rows, broadcast —
    *    and customer is semi-restricted by it BEFORE touching the
    *    fact join, so non-ASIA customers' orders never shuffle;
    *  - lineitem ⋈ orders(1996) is the one scaling exchange (orderkey,
    *    date filter pushed to the orders scan);
    *  - supplier joins on BOTH equalities
    *    (l_suppkey = s_suppkey AND c_nationkey = s_nationkey),
    *    UNHINTED: supplier is SF-scaled (10k rows × SF — ~1B at
    *    100 TB), so per the repo's scale-hint discipline (BASELINE
    *    r2; same rule as q8) only bounded dims get pinned broadcast.
    *    At bench scale AQE broadcasts it and the cycle closes
    *    map-side — the identical plan the old pinned hint produced
    *    (ScaleLayoutSpec proves both sides of the threshold); at
    *    100 TB AQE shuffles it on s_suppkey while the nationkey
    *    equality stays a post-join filter, same semantics.
    *
    * The bounded 25-nation aggregate + revenue sort cost nothing. */
  val q5RegionTrade = GraftQuery(
    "q5_region_trade",
    (s, d) => {
      import s.implicits._
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val custAsia = Tables.customer(s, d)
        .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_nationkey", $"n_name")
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey")
      val li = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      val sup = Tables.supplier(s, d)
        .select($"s_suppkey", $"s_nationkey")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(custAsia, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"n_name".asc)
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name"""))

  /** Windowed top-k per group: top 3 orders per customer by price
    * (row_number, tie-broken by orderkey → deterministic). */
  val q2TopOrders = GraftQuery(
    "q2_top_orders_per_customer",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) t
      WHERE rk <= 3"""),
    bench = true)

  /** Global top-k: 20 customers by returned-line revenue. Spark plans
    * orderBy+limit as TakeOrderedAndProject — no global sort at scale. */
  val q10ReturnedRevenue = GraftQuery(
    "q10_returned_revenue",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      // customer scales with SF — unhinted, AQE picks the strategy
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"revenue".desc, $"c_custkey".asc)
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey ASC
      LIMIT 20"""),
    bench = true)

  /** Revenue per supplier-nation per ship year (broadcast chain through
    * two dims + year() projection). */
  val q7SupplierYear = GraftQuery(
    "q7_supplier_nation_year",
    (s, d) => {
      import s.implicits._
      // supplier scales with SF — unhinted (AQE); nation is bounded
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name", year($"l_shipdate").as("ship_year"))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    },
    Some("""
      SELECT n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name, ship_year"""))

  /** Dimension stats: min/max/avg/count per brand (part table). */
  val q9PartStats = GraftQuery(
    "q9_part_brand_stats",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .groupBy($"p_brand")
        .agg(
          count(lit(1)).as("n_parts"),
          min($"p_size").as("min_size"),
          max($"p_size").as("max_size"),
          davg($"p_retailprice").as("avg_price"),
          countDistinct($"p_type").as("n_types"))
    },
    Some("""
      SELECT p_brand, COUNT(*) AS n_parts, MIN(p_size) AS min_size,
        MAX(p_size) AS max_size,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price,
        COUNT(DISTINCT p_type) AS n_types
      FROM part GROUP BY p_brand"""))

  /** A1 semantics (data_processing.py:11): groupBy + sorted distinct
    * collect + string-join — `', '.join(set(x))` pinned deterministic
    * via array_sort (SURVEY §7.4.2). */
  val qAggCollect = GraftQuery(
    "q_agg_collect_set",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_mktsegment")
        .agg(
          array_join(array_sort(collect_set($"n_name")), ", ").as("nations"),
          countDistinct($"n_name").as("n_nations"),
          count(lit(1)).as("n_customers"))
    },
    Some("""
      SELECT c_mktsegment,
        string_agg(DISTINCT n_name, ', ' ORDER BY n_name) AS nations,
        COUNT(DISTINCT n_name) AS n_nations,
        COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY c_mktsegment"""))

  /** A5 semantics (utahZip.py:28-44): grouped nested collection —
    * region → sorted list of its nations. The list is emitted joined
    * to a string so the driver's row hasher never sees a raw array
    * cell (list values hash differently across parquet/db readers). */
  val qAggNested = GraftQuery(
    "q_agg_nested_collect",
    (s, d) => {
      import s.implicits._
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), "|").as("nations"),
             count(lit(1)).as("n_nations"))
    },
    Some("""
      SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
        COUNT(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""))

  /** Correlated scalar subquery (Catalyst decorrelation): customers
    * above their segment's average balance. The inner AVG routes
    * through exact decimal so the comparison boundary is identical on
    * both engines. */
  val qCorrelatedSubquery = GraftQuery(
    "q_correlated_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
          FROM customer_v c2
          WHERE c2.c_mktsegment = c.c_mktsegment)""")
    },
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        FROM customer c2
        WHERE c2.c_mktsegment = c.c_mktsegment)"""))

  /** Full-outer join + conditional projection: customer account-balance
    * status vs their order spend (exercises outer join null handling). */
  val qOuterBalance = GraftQuery(
    "q_outer_join_balance",
    (s, d) => {
      import s.implicits._
      val spend = Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(dsum($"o_totalprice").as("total_spend"))
      Tables.customer(s, d)
        .join(spend, $"c_custkey" === $"o_custkey", "full_outer")
        .select(
          coalesce($"c_custkey", $"o_custkey").as("custkey"),
          coalesce($"total_spend", lit(0.0)).as("total_spend"),
          when($"c_acctbal".isNull, "unknown")
            .when($"c_acctbal" < 0, "overdrawn")
            .otherwise("ok").as("balance_status"))
    },
    Some("""
      SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        COALESCE(total_spend, 0.0) AS total_spend,
        CASE WHEN c_acctbal IS NULL THEN 'unknown'
             WHEN c_acctbal < 0 THEN 'overdrawn'
             ELSE 'ok' END AS balance_status
      FROM customer
      FULL OUTER JOIN (
        SELECT o_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey) s
      ON c_custkey = o_custkey"""))

  /** Set ops: union + except + intersect over customer key slices. */
  val qSetOps = GraftQuery(
    "q_set_ops",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val auto = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
      val rich = c.filter($"c_acctbal" > 0).select($"c_custkey")
      val both = auto.intersect(rich).withColumn("tag", lit("auto_positive"))
      val autoOnly = auto.except(rich).withColumn("tag", lit("auto_negative"))
      both.union(autoOnly)
    },
    Some("""
      SELECT c_custkey, 'auto_positive' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 0) a
      UNION ALL
      SELECT c_custkey, 'auto_negative' AS tag FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 0) b"""))

  /** Hierarchical totals: ROLLUP over (priority, status) — subtotal
    * and grand-total rows with NULL group keys, same on both engines. */
  val qRollup = GraftQuery(
    "q_rollup_priority_status",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
             dsum($"o_totalprice").as("total_price"))
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""))

  /** CUBE over (returnflag, linestatus): all grouping-set combos. */
  val qCube = GraftQuery(
    "q_cube_flag_status",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_items"),
             dsum($"l_quantity").as("sum_qty"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Integer floor-division on Columns: (a - a%b)/b is exact in
    * double for |a| < 2^53 because the numerator is a representable
    * multiple of b. Callers must guarantee b > 0 on evaluated rows. */
  private def idiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** Window-function breadth: rank/dense_rank/ntile/lead/lag over a
    * fully tie-broken ordering — computed WITHOUT a window keyed on
    * the 5-value o_orderpriority. `Window.partitionBy(priority)`
    * funnels every order in the corpus through ≤5 sort tasks — the
    * key space never grows with data, so at 100× it is a straggler
    * wall. Instead, two-phase distributed ranking with a
    * DATA-DERIVED bucket key: totalprice quantile split points are
    * frozen on the driver from a BOUNDED 5% sample, cached per
    * (dataset, nb) as a session stats artifact (~#buckets doubles of
    * driver traffic; the corpus itself is scanned exactly once per
    * run), every row's bucket is then a pure
    * function of its totalprice — identical on every recomputation,
    * with none of the exchange-reuse coupling a
    * spark_partition_id() bucketing would need — and rows are
    * ranked per (priority, bucket) and merged with bucket-count
    * offsets. Every window in the plan is keyed on
    * (priority, bucket) — cardinality grows with the configured
    * parallelism — and the only non-scalar driver data is the
    * priorities×buckets count table (broadcast back). Equal-frequency
    * buckets by construction, so no bucket straggles.
    *
    * The ORDER BY (totalprice DESC, orderkey ASC) is a total order —
    * o_orderkey is the table key — so rank == dense_rank ==
    * row_number by definition (no ties exist; the oracle's RANK over
    * the same spec agrees identically). ntile(4) is derived from the
    * global row number and the per-priority count by the standard
    * first-(n mod t)-tiles-get-one-extra rule. lead/lag are computed
    * INSIDE the one bucket-keyed window pass — correct everywhere
    * except at bucket boundaries — and the boundary rows (≤4 per
    * bucket: lrn ≤ 2 or ≥ cnt−1) are patched from a bucket-count-
    * sized table whose own window replays the true rank order
    * restricted to boundary rows (adjacent in that order, so the
    * tiny lead/lag equal the global ones for exactly the overridden
    * slots). The corpus therefore makes ONE pass through shuffle +
    * sort + window, is materialized once (localCheckpoint — the
    * same persisted-artifact shape as the dedup signature table),
    * and everything downstream of it is bucket-count-sized and
    * broadcast. */
  /** Split-point derivation for the two-phase ranking — a BOUNDED
    * sample, not a full scan (VERDICT r6: the full-scan approxQuantile
    * made q_window_functions read orders twice; at 100 TB the second
    * scan is the dominant avoidable cost). Correctness never depends
    * on the split values: ANY split set yields exact global ranks
    * (buckets only have to respect price order, and ties share a
    * bucket by construction), so a 5% sample only affects bucket
    * BALANCE, within sampling error. Counted via [[statsPasses]] so
    * the spec can pin the pass count. */
  private[graft] val statsPasses = new java.util.concurrent.atomic.AtomicInteger
  private[graft] def sampledSplitPoints(orders: DataFrame,
      nb: Int): Array[Double] = {
    statsPasses.incrementAndGet()
    orders.sample(withReplacement = false, fraction = 0.05, seed = 7L)
      .stat.approxQuantile("o_totalprice",
        (1 until nb).map(_.toDouble / nb).toArray, 0.01)
      .distinct.sorted
  }

  /** Session-scoped split-point artifact, keyed by (dataset dir, nb) —
    * the persisted-table-stats shape: a production deployment refreshes
    * quantile sketches on ingest and every ranking run reads them for
    * free; here the first run per session pays one bounded sample and
    * later runs (and re-runs) scan orders exactly once. */
  private val splitCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int), Array[Double]]]
  private def cachedSplitPoints(s: SparkSession, d: String,
      nb: Int): Array[Double] = {
    val perSession = splitCache.synchronized {
      var m = splitCache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap
          .empty[(String, Int), Array[Double]]
        splitCache.put(s, m)
      }
      m
    }
    perSession.getOrElseUpdate((d, nb),
      sampledSplitPoints(Tables.orders(s, d)
        .select(col("o_totalprice")), nb))
  }

  /** The single corpus window pass of [[qWindowFuncs]] (pre-
    * materialization), exposed so ScaleLayoutSpec can assert its
    * plan: local rank, local lead/lag, and bucket population, all
    * over the (priority, quantile-bucket) key. */
  private[graft] def windowCore(orders: DataFrame, nb: Int,
      splitsIn: Option[Array[Double]] = None): DataFrame = {
    val splitPoints = splitsIn.getOrElse(sampledSplitPoints(orders, nb))
    // bucket = how many split points this price exceeds: equal
    // prices share a bucket (ties never straddle a boundary), and
    // higher prices get higher buckets — so DESC rank order walks
    // buckets from high to low. The split points are frozen on the
    // driver (~nb doubles), making the bucket a pure function of the
    // row — identical on every recomputation, with none of the
    // exchange-reuse coupling a spark_partition_id() bucketing would
    // need.
    val bucket = splitPoints
      .map(sp => when(col("o_totalprice") > sp, 1).otherwise(0))
      .reduceOption[Column](_ + _).getOrElse(lit(0))
    val localW = Window.partitionBy(col("o_orderpriority"), col("bkt"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val cntW = Window.partitionBy(col("o_orderpriority"), col("bkt"))
    orders.withColumn("bkt", bucket)
      .withColumn("lrn", row_number().over(localW))
      .withColumn("llead", lead(col("o_orderkey"), 1).over(localW))
      .withColumn("llag2", lag(col("o_orderkey"), 2).over(localW))
      .withColumn("cnt", count(lit(1)).over(cntW))
      .select(col("o_orderkey"), col("o_orderpriority"), col("bkt"),
        col("lrn"), col("llead"), col("llag2"), col("cnt"))
  }

  /** Full two-phase window assembly over an (o_orderkey,
    * o_orderpriority, o_totalprice) frame — the registry query minus
    * the table read, exposed so the spec can stress tiny buckets
    * (cnt ∈ {1, 2}) that real fixtures may not produce. */
  private[graft] def windowFuncs(ordersIn: DataFrame, nb: Int,
      splitsIn: Option[Array[Double]] = None): DataFrame = {
      import ordersIn.sparkSession.implicits._
      val orders = ordersIn
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      // ONE corpus shuffle+sort+window, materialized once; the
      // offsets aggregate, the boundary patch, and the final
      // assembly all read this artifact instead of re-deriving the
      // window subtree (the plan audit showed 3 full recomputations
      // in the self-join formulation this replaces)
      // corpus-scale per-run scratch: the output reads it, so release
      // waits for the runner's post-materialization drain
      val core = graft.tools.Checkpoints.defer(
        windowCore(orders, nb, splitsIn).localCheckpoint(true))
      // priorities×buckets count table (tiny): cumulative offset of
      // each bucket in DESC order plus the per-priority total; its
      // windows run over nb·priorities aggregated rows, not the corpus
      val cw = Window.partitionBy($"o_orderpriority").orderBy($"bkt".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val nw = Window.partitionBy($"o_orderpriority")
      val offsets = core.groupBy($"o_orderpriority", $"bkt")
        .agg(count(lit(1)).as("bcnt"))
        .select($"o_orderpriority", $"bkt",
          coalesce(sum($"bcnt").over(cw), lit(0L)).as("off"),
          sum($"bcnt").over(nw).as("n"))
      // boundary rows (≤4 per bucket): their window replays the true
      // rank order restricted to boundary rows, which is exact for
      // the slots we override — the last row's lead is the next
      // bucket's first row, and the first two rows' lag(2) reaches
      // only first/last boundary rows of preceding buckets
      val pw = Window.partitionBy($"pp").orderBy($"pb".desc, $"pl".asc)
      val patch = core
        .filter($"lrn" <= 2 || $"lrn" >= $"cnt" - 1)
        .select($"o_orderpriority".as("pp"), $"bkt".as("pb"),
          $"lrn".as("pl"), $"o_orderkey")
        .select($"pp", $"pb", $"pl",
          lead($"o_orderkey", 1).over(pw).as("plead"),
          lag($"o_orderkey", 2).over(pw).as("plag2"))
      val glob = core
        .join(broadcast(offsets), Seq("o_orderpriority", "bkt"))
        .withColumn("rn", $"off" + $"lrn")
        .join(broadcast(patch), $"o_orderpriority" === $"pp" &&
          $"bkt" === $"pb" && $"lrn" === $"pl", "left")
      // ntile(4): q = n div 4 rows per tile, first r = n mod 4 tiles
      // take one extra; when n < 4 the first branch always fires
      // (rn <= n·1), so the q=0 division in the other branch is never
      // evaluated (CASE WHEN short-circuits per row)
      val q = idiv($"n", lit(4))
      val r = $"n" % 4
      val quartile = when($"rn" <= r * (q + 1),
          idiv($"rn" - 1, q + 1) + 1)
        .otherwise(r + idiv($"rn" - r * (q + 1) - 1, q) + 1)
      glob.select($"o_orderkey", $"o_orderpriority",
        $"rn".cast("int").as("rnk"), $"rn".cast("int").as("drnk"),
        quartile.cast("int").as("quartile"),
        when($"lrn" === $"cnt", $"plead").otherwise($"llead")
          .as("next_key"),
        when($"lrn" <= 2, $"plag2").otherwise($"llag2")
          .as("prev2_key"))
  }

  val qWindowFuncs = GraftQuery(
    "q_window_functions",
    (s, d) => {
      val nb = math.max(s.conf.get("spark.sql.shuffle.partitions").toInt, 2)
      windowFuncs(Tables.orders(s, d), nb,
        Some(cachedSplitPoints(s, d, nb)))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority,
        RANK() OVER w AS rnk,
        DENSE_RANK() OVER w AS drnk,
        NTILE(4) OVER w AS quartile,
        LEAD(o_orderkey, 1) OVER w AS next_key,
        LAG(o_orderkey, 2) OVER w AS prev2_key
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC)"""))

  /** Exact interpolated percentiles per group — Spark percentile() and
    * DuckDB quantile_cont() share the (1-d)·lower + d·upper formula
    * over the sorted set; rounded at the edge as a float belt. */
  val qPercentiles = GraftQuery(
    "q_percentiles_quantity",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_quantity, 0.99)"), 6).as("p99"),
          min($"l_quantity").as("min_q"),
          max($"l_quantity").as("max_q"))
    },
    Some("""
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        round(quantile_cont(l_quantity, 0.99), 6) AS p99,
        MIN(l_quantity) AS min_q,
        MAX(l_quantity) AS max_q
      FROM lineitem
      GROUP BY l_returnflag"""))

  /** Approximate percentiles (KLL/GK-style sketch via Spark's
    * percentile_approx) — the single-pass mergeable-sketch path that
    * replaces [[qPercentiles]]' exact sort-based percentile once the
    * group no longer fits a sort: bounded memory, partial-aggregate
    * merges, rank error ≤ 1/accuracy. No SQL oracle — DuckDB's
    * approx_quantile is a different sketch (t-digest), so the driver
    * records the rows-only check, exactly like t_approx_distinct_
    * tokens; the hard check lives in AnalyticsOpsSpec, which gates
    * every approx value inside the EXACT percentile envelope at
    * p ± 2·(1/accuracy) computed by the oracle-checked exact twin. */
  val qApproxPercentiles = GraftQuery(
    "q_approx_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile_approx(l_quantity, 0.5, 100)").as("ap50"),
          expr("percentile_approx(l_quantity, 0.9, 100)").as("ap90"),
          expr("percentile_approx(l_quantity, 0.99, 100)").as("ap99"),
          count(lit(1)).as("n"))
    },
    None)

  /** TPC-H Q18-shaped large-quantity orders: aggregate + HAVING +
    * re-join the qualifying keys back to the fact (semi on an agg). */
  val q18LargeOrders = GraftQuery(
    "q18_large_orders",
    (s, d) => {
      import s.implicits._
      val big = Tables.lineitem(s, d)
        .groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 150.0)
      // o_orderdate stays a timestamp: DATE cells read back as
      // datetime.date objects from Spark parquet but datetime64 from
      // DuckDB — a dtype-only hash mismatch (same trap as raw arrays)
      Tables.orders(s, d)
        .join(big, $"o_orderkey" === big("l_orderkey"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_orderdate,
        o_totalprice, total_qty
      FROM orders
      JOIN (
        SELECT l_orderkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 150.0) b
      ON o_orderkey = b.l_orderkey"""),
    bench = true)

  /** Explicit GROUPING SETS (beyond rollup/cube): chosen combos with
    * grouping_id to disambiguate real NULL keys from aggregated-out
    * keys on both engines. */
  val qGroupingSets = GraftQuery(
    "q_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) AS INT) AS g_status,
          CAST(grouping(o_orderpriority) AS INT) AS g_priority,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS INT) AS g_status,
        CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""))

  /** Pivot (long→wide) over a PINNED value list: per priority, one
    * (orders count, exact totalprice sum) column pair per order
    * status. The status list is declared, not discovered —
    * `.pivot(col)` without values runs a driver-side distinct scan of
    * the corpus before planning, a hidden collect AND an extra full
    * pass at 100 TB; pinning keeps the whole query two cascaded
    * map-side-partial hash aggregates ((priority, status) partials,
    * then pivotfirst per priority) — both shuffles aggregate-reduced,
    * no discovery job. Absent (priority, status) cells are
    * pinned to 0 / NULL explicitly because the two engines disagree
    * by default (Spark's pivot count yields NULL for an empty cell,
    * SQL's COUNT(*) FILTER yields 0; sums are NULL on both).
    * Oracle: the standard conditional-aggregation expansion. */
  val qPivotStatus = GraftQuery(
    "q_pivot_status",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .select($"o_orderpriority",
          coalesce($"F_n", lit(0L)).as("f_n"), $"F_total".as("f_total"),
          coalesce($"O_n", lit(0L)).as("o_n"), $"O_total".as("o_total"),
          coalesce($"P_n", lit(0L)).as("p_n"), $"P_total".as("p_total"))
    },
    Some("""
      SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_total
      FROM orders
      GROUP BY o_orderpriority"""))

  /** Column profile — the ANALYZE-shaped data-quality report a
    * pipeline runs before trusting a new drop: per-column row, null,
    * and exact distinct counts over lineitem, ONE table pass. Exact
    * integers only — min/max/mean are deliberately absent because
    * their cross-engine string/float formatting is where profile
    * tools silently disagree; cardinality and completeness are the
    * columns a loader actually gates on.
    *
    * Scale shape (revised round 15): one PRUNED single-column scan +
    * two-phase distinct aggregate per column, unioned — the
    * q_join_skew_report recipe. The previous one-pass formulation let
    * Catalyst plan the standard multi-distinct Expand: a ×12 row
    * fan-out into a partial hash-aggregate keyed on (gid, all 11
    * columns), which at any scale turns N rows into 12N wide
    * hash-table probes before the shuffle — measured round 15 at
    * sf0.1: 4.8s, with the Expand aggregate owning nearly all of it;
    * the per-column form runs 2.1s (−57%). On columnar storage the
    * "one table pass" the Expand bought is not a bytes win at all:
    * eleven single-column parquet scans read exactly the same pages
    * as one 11-column scan, each branch's shuffle carries only its
    * own column's distinct values, and the branches run as
    * independent stages (guide §2.6). At 100 TB the report still
    * swaps exact distincts for the HLL twin below; the exact
    * formulation is what the oracle can hash. */
  val qTableProfile = GraftQuery(
    "q_table_profile",
    (s, d) => {
      import s.implicits._
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        Tables.lineitem(s, d).select(col(c))
          .agg(count(lit(1)).as("n_rows"), count(col(c)).as("cnt"),
            countDistinct(col(c)).as("nd"))
          .select(lit(c).as("col"), $"n_rows",
            ($"n_rows" - $"cnt").as("n_nulls"), $"nd".as("n_distinct"))
      }.reduce(_ unionByName _)
    },
    Some {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS col, COUNT(*) AS n_rows,
          COUNT(*) - COUNT($c) AS n_nulls,
          CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
        FROM lineitem""").mkString("\nUNION ALL\n")
    },
    bench = true)

  /** The 100 TB profile [[qTableProfile]]'s own header promises: the
    * same per-column (rows, nulls, distinct) report with HLL++
    * sketches (`approx_count_distinct`) in place of exact distincts.
    * The win is plan-shape, not just constants: multi-column EXACT
    * distincts force the ×11 Expand fan-out before the shuffle, while
    * 11 HLL buffers ride ONE un-expanded aggregate pass — at 100 TB
    * that is 11× less shuffle input for a report whose consumers
    * (loader gates, drift monitors) tolerate ±rsd on cardinality.
    * n_rows / n_nulls stay EXACT (plain counts, no sketch involved).
    *
    * Rows-only in the driver's oracle (DuckDB's approx_count_distinct
    * is a different sketch — same policy as t_approx_distinct_tokens);
    * hard-checked instead by ScaleLayoutSpec against the exact twin:
    * n_rows/n_nulls must MATCH [[qTableProfile]] exactly and
    * n_distinct must sit within the HLL error envelope per column. */
  val qTableProfileApprox = GraftQuery(
    "q_table_profile_approx",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"cnt_$c"),
          approx_count_distinct(col(c)).as(s"nd_$c"))
      }
      val wide = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val stackArgs = cols.map(c =>
        s"'$c', n_rows, n_rows - cnt_$c, nd_$c").mkString(", ")
      wide.select(expr(
        s"stack(${cols.length}, $stackArgs) AS (col, n_rows, n_nulls, n_distinct)"))
    },
    None)

  /** TPC-H Q8-shaped market share: one nation's slice of a region's
    * PROMO-part revenue per order year. The nation dim joins TWICE
    * (customer side fixes the market region, supplier side names the
    * competitor) — both bounded, both pinned broadcast. The ratio is a
    * double quotient of two [[Tables.dsum]] results, so both engines
    * divide bit-identical numerators/denominators. */
  val q8MarketShare = GraftQuery(
    "q8_market_share",
    (s, d) => {
      import s.implicits._
      val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      val cn = Tables.nation(s, d)
        .select($"n_nationkey".as("cn_key"), $"n_regionkey".as("cn_region"))
      val sn = Tables.nation(s, d)
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(cn), $"c_nationkey" === $"cn_key")
        .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
          $"cn_region" === $"r_regionkey")
        .join(Tables.part(s, d).filter($"p_type" === "PROMO"),
          $"l_partkey" === $"p_partkey")
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(sn), $"s_nationkey" === $"sn_key")
        .groupBy(year($"o_orderdate").as("o_year"))
        .agg(
          dsum(when($"supp_nation" === "NATION_7", vol).otherwise(lit(0.0)))
            .as("nation_vol"),
          dsum(vol).as("total_vol"),
          count(lit(1)).as("n_items"))
        .select($"o_year", ($"nation_vol" / $"total_vol").as("mkt_share"),
          $"n_items")
    },
    Some("""
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_7'
            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
          AS mkt_share,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      GROUP BY o_year"""))

  /** TPC-H Q12-shaped shipping-delay split (the fixtures carry no
    * shipmode/commitdate, so "late" = shipped > 90 days after the
    * order date): per linestatus, how many late lines belonged to
    * high- vs low-priority orders. Conditional counts stay BIGINT on
    * both engines (count(when…) / COUNT(*) FILTER). The only shuffle
    * is the lineitem⋈orders fact join on orderkey. */
  val q12LatePriority = GraftQuery(
    "q12_late_lines_priority",
    (s, d) => {
      import s.implicits._
      val highPrio = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
        .groupBy($"l_linestatus")
        .agg(
          count(when(highPrio, 1)).as("high_line_count"),
          count(when(!highPrio, 1)).as("low_line_count"))
    },
    Some("""
      SELECT l_linestatus,
        COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
          AS high_line_count,
        COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
          AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      GROUP BY l_linestatus"""))

  /** TPC-H Q14-shaped promo-revenue share over one quarter: one
    * filtered fact⋈dim join, one ungrouped aggregate, the percentage
    * a double quotient of two dsum results scaled by an exact 100. */
  val q14PromoRevenue = GraftQuery(
    "q14_promo_revenue",
    (s, d) => {
      import s.implicits._
      val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
        .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
        .agg(
          dsum(when($"p_type" === "PROMO", vol).otherwise(lit(0.0)))
            .as("promo_vol"),
          dsum(vol).as("total_vol"),
          count(lit(1)).as("n_items"))
        .select((lit(100.0) * $"promo_vol" / $"total_vol").as("promo_pct"),
          $"n_items")
    },
    Some("""
      SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
          AS promo_pct,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'"""))

  /** TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    * keep the max. The max is a 1-row aggregate broadcast back over
    * the (supplier-count-sized) revenue table — no global sort, no
    * window over all suppliers; ties would surface as extra rows
    * identically on both engines since the compared doubles are
    * bit-identical dsum outputs. */
  val q15TopSupplier = GraftQuery(
    "q15_top_supplier",
    (s, d) => {
      import s.implicits._
      val rev = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
        .groupBy($"l_suppkey")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("total_revenue"))
      val top = rev.agg(max($"total_revenue").as("max_revenue"))
      Tables.supplier(s, d)
        .join(rev, $"s_suppkey" === $"l_suppkey")
        .join(broadcast(top), $"total_revenue" === $"max_revenue")
        .select($"s_suppkey", $"s_name", $"total_revenue")
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
            AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"""))

  /** TPC-H Q17-shaped small-quantity revenue: lines of one brand below
    * 20% of their part's average quantity. The correlated per-part
    * average decorrelates into a per-partkey aggregate joined back on
    * partkey — the aggregate runs over the brand-restricted lineitem
    * slice (identical to the correlated form: the average only ever
    * evaluates for that part's own lines). Threshold = 0.2 · davg in
    * double on both engines, so the comparison boundary agrees. */
  val q17SmallQtyRevenue = GraftQuery(
    "q17_small_qty_revenue",
    (s, d) => {
      import s.implicits._
      val brandParts = Tables.part(s, d)
        .filter($"p_brand" === "Brand#13").select($"p_partkey")
      val brandLines = Tables.lineitem(s, d)
        .join(brandParts, $"l_partkey" === $"p_partkey")
      val cut = brandLines
        .groupBy($"l_partkey".as("cut_partkey"))
        .agg((lit(0.2) * davg($"l_quantity")).as("qty_cut"))
      brandLines
        .join(cut, $"l_partkey" === $"cut_partkey")
        .filter($"l_quantity" < $"qty_cut")
        .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0
          AS avg_yearly,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13' AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                        / COUNT(l2.l_quantity))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  /** TPC-H Q19-shaped disjunctive-predicate revenue: an OR-of-ANDs
    * over brand/size/quantity. The brand+size legs are part-side and
    * the quantity legs lineitem-side, so Catalyst pushes the partial
    * disjunctions (brand IN … / quantity ranges) below the join while
    * keeping the cross-table conjunctions above it. */
  val q19DisjunctRevenue = GraftQuery(
    "q19_disjunct_revenue",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#21" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
          AS revenue,
        COUNT(*) AS n_lines
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)"""))

  /** TPC-H Q21-shaped sole-blame suppliers (no commit/receipt dates in
    * the fixtures, so "waiting" = returned lines on finalized orders):
    * suppliers whose line came back (R) on a finalized multi-supplier
    * order where NO other supplier's line came back. The EXISTS /
    * NOT EXISTS pair plans as a left-semi + left-anti self-join of
    * lineitem, all three legs shuffling on the same orderkey — one
    * exchange family, reused, no correlated re-scan per row. */
  val q21WaitingSuppliers = GraftQuery(
    "q21_waiting_suppliers",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val l1 = li.filter($"l_returnflag" === "R")
        .join(Tables.orders(s, d).filter($"o_orderstatus" === "F"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      val others = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("sk2"))
      val otherReturns = li.filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("k3"), $"l_suppkey".as("sk3"))
      l1.join(others, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"sk2",
          "left_semi")
        .join(otherReturns,
          $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"sk3", "left_anti")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
    },
    Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
      GROUP BY s_name"""))

  /** TPC-H Q22-shaped idle rich customers (the fixtures have no phone
    * country codes, so the cohort keys on mktsegment and "idle" = no
    * order in the last ~3 fixture years): above the global
    * positive-balance average AND absent from recent orders. The
    * average is a 1-row broadcast, the NOT EXISTS a left-anti join on
    * custkey — customer-sized work, order-side pre-filtered by the
    * pushed date predicate. */
  val q22IdleCustomers = GraftQuery(
    "q22_idle_customers",
    (s, d) => {
      import s.implicits._
      val avgBal = Tables.customer(s, d)
        .filter($"c_acctbal" > 0.0)
        .agg(davg($"c_acctbal").as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
        .select($"o_custkey")
      Tables.customer(s, d)
        .join(broadcast(avgBal), $"c_acctbal" > $"avg_bal")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_custs"),
          dsum($"c_acctbal").as("total_bal"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_custs,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(c2.c_acctbal)
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY c_mktsegment"""))

  /** TPC-H Q13 customer order-count distribution (the fixtures have
    * no o_comment, so the canonical `NOT LIKE '%special%requests%'`
    * exclusion adapts to excluding 5-LOW priority orders — same
    * left-join-with-join-side-predicate semantics: a customer whose
    * every order is excluded still appears, with count 0). THE
    * count-of-counts double aggregate on the natural skew key.
    *
    * Scale shape: orders pre-aggregate to one (custkey, n) row BEFORE
    * the outer join — the priority filter and 2-column pruning reach
    * the scan, the custkey shuffle gets map-side partial counts, and
    * the left join then carries one row per customer per side (AQE
    * skew-split applies to it at 100 TB) instead of fanning raw order
    * rows through the join. The second aggregate lands on the
    * max-orders-per-customer bounded c_count domain — a few dozen
    * keys at any SF. */
  val q13CustomerOrders = GraftQuery(
    "q13_customer_orders",
    (s, d) => {
      import s.implicits._
      val oc = Tables.orders(s, d)
        .filter(!$"o_orderpriority".like("5-%"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      Tables.customer(s, d).select($"c_custkey")
        .join(oc, $"c_custkey" === $"o_custkey", "left_outer")
        .select(coalesce($"n", lit(0L)).as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""
      WITH oc AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders
        WHERE o_orderpriority NOT LIKE '5-%' GROUP BY 1)
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT COALESCE(n, 0) AS c_count
        FROM customer LEFT JOIN oc ON c_custkey = o_custkey) t
      GROUP BY 1"""))

  /** Categorical drift report between ingest eras — the gate a
    * training-data pipeline runs before admitting a new slice: orders
    * split at 1998-01-01 into early/late eras, every
    * (status, priority) cell's population share computed per era in
    * exact 1e-6 fixed point (integer `div`, the t_idf_rarity
    * discipline — no float frequency ever exists, so the drift
    * magnitudes hash bit-identically), and the report emits
    * early/late counts, shares, and the absolute share shift — the
    * population-stability-style number a threshold gate consumes.
    * Cells present in only one era surface with an explicit 0 (full
    * outer join + coalesce), not silently dropped — appearing and
    * vanishing categories ARE the drift signal.
    *
    * Scale shape: one scan, one (era, cell) hash-aggregate, a
    * bounded-cardinality (cells × eras) tail — the per-era totals and
    * the era pivot all run on ≤ |status|·|priority| rows. */
  val qProfileDrift = GraftQuery(
    "q_profile_drift",
    (s, d) => {
      import s.implicits._
      val era = when($"o_orderdate" < lit("1998-01-01").cast("timestamp"),
        "early").otherwise("late")
      val cells = Tables.orders(s, d)
        .groupBy(era.as("era"), $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val withFrac = cells
        .join(cells.groupBy($"era").agg(sum($"n").as("tot")), "era")
        .withColumn("frac_micro", expr("(n * 1000000) div tot"))
      val early = withFrac.filter($"era" === "early")
        .select($"o_orderstatus", $"o_orderpriority",
          $"n".as("early_n"), $"frac_micro".as("early_frac_micro"))
      val late = withFrac.filter($"era" === "late")
        .select($"o_orderstatus".as("ls"), $"o_orderpriority".as("lp"),
          $"n".as("late_n"), $"frac_micro".as("late_frac_micro"))
      early.join(late,
          $"o_orderstatus" === $"ls" && $"o_orderpriority" === $"lp",
          "full_outer")
        .select(
          coalesce($"o_orderstatus", $"ls").as("o_orderstatus"),
          coalesce($"o_orderpriority", $"lp").as("o_orderpriority"),
          coalesce($"early_n", lit(0L)).as("early_n"),
          coalesce($"late_n", lit(0L)).as("late_n"),
          coalesce($"early_frac_micro", lit(0L)).as("early_frac_micro"),
          coalesce($"late_frac_micro", lit(0L)).as("late_frac_micro"),
          abs(coalesce($"late_frac_micro", lit(0L)) -
            coalesce($"early_frac_micro", lit(0L))).as("drift_micro"))
    },
    Some("""
      WITH cells AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                 THEN 'early' ELSE 'late' END AS era,
          o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY 1, 2, 3),
      fr AS (
        SELECT c.*, CAST((c.n * 1000000) // t.tot AS BIGINT) AS frac_micro
        FROM cells c JOIN (
          SELECT era, CAST(SUM(n) AS BIGINT) AS tot FROM cells GROUP BY era) t
          USING (era)),
      e AS (SELECT o_orderstatus, o_orderpriority, n AS early_n,
              frac_micro AS early_frac_micro FROM fr WHERE era = 'early'),
      l AS (SELECT o_orderstatus AS ls, o_orderpriority AS lp, n AS late_n,
              frac_micro AS late_frac_micro FROM fr WHERE era = 'late')
      SELECT
        coalesce(e.o_orderstatus, l.ls) AS o_orderstatus,
        coalesce(e.o_orderpriority, l.lp) AS o_orderpriority,
        CAST(coalesce(e.early_n, 0) AS BIGINT) AS early_n,
        CAST(coalesce(l.late_n, 0) AS BIGINT) AS late_n,
        CAST(coalesce(e.early_frac_micro, 0) AS BIGINT) AS early_frac_micro,
        CAST(coalesce(l.late_frac_micro, 0) AS BIGINT) AS late_frac_micro,
        CAST(abs(coalesce(l.late_frac_micro, 0) - coalesce(e.early_frac_micro, 0))
          AS BIGINT) AS drift_micro
      FROM e FULL OUTER JOIN l
        ON e.o_orderstatus = l.ls AND e.o_orderpriority = l.lp"""))

  /** Join-key skew report — the measurement behind every salting /
    * AQE-skew-join decision in this repo (operators/Skew applies the
    * cure; this query shows the diagnosis): for each fact-table join
    * key, total rows, distinct keys, the heaviest key's row count,
    * the mean rows-per-key in exact 1e-6 fixed point, and the skew
    * ratio max/mean in the same fixed point — all integer `div`
    * arithmetic, so the report hashes identically cross-engine.
    * skew_micro ≈ 1e6 means uniform; the threshold where a key
    * explodes a shuffle partition is a consumer policy, not baked in.
    *
    * Scale shape: per key column one (key) hash-aggregate + a 1-row
    * reduction — the same two-phase shape COUNT(DISTINCT) plans, run
    * once per audited key; the three key audits are independent
    * stages over independently-pruned single-column scans. */
  val qJoinSkewReport = GraftQuery(
    "q_join_skew_report",
    (s, d) => {
      import s.implicits._
      def audit(df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key)).agg(count(lit(1)).as("kn"))
          .agg(sum($"kn").as("n_rows"), count(lit(1)).as("n_keys"),
            max($"kn").as("max_key_rows"))
          .select(lit(key).as("key"), $"n_rows", $"n_keys", $"max_key_rows",
            expr("(n_rows * 1000000) div n_keys").as("mean_micro"),
            // max/mean = max·keys/rows, scaled before the one floor
            expr("(max_key_rows * n_keys * 1000000) div n_rows")
              .as("skew_micro"))
      audit(Tables.lineitem(s, d).select($"l_suppkey"), "l_suppkey")
        .unionByName(audit(Tables.lineitem(s, d).select($"l_partkey"), "l_partkey"))
        .unionByName(audit(Tables.orders(s, d).select($"o_custkey"), "o_custkey"))
    },
    Some {
      def audit(table: String, key: String) = s"""
        SELECT '$key' AS key, CAST(SUM(kn) AS BIGINT) AS n_rows,
          COUNT(*) AS n_keys, CAST(MAX(kn) AS BIGINT) AS max_key_rows,
          CAST((SUM(kn) * 1000000) // COUNT(*) AS BIGINT) AS mean_micro,
          CAST((MAX(kn) * COUNT(*) * 1000000) // SUM(kn) AS BIGINT)
            AS skew_micro
        FROM (SELECT $key, COUNT(*) AS kn FROM $table GROUP BY $key)"""
      Seq(audit("lineitem", "l_suppkey"), audit("lineitem", "l_partkey"),
        audit("orders", "o_custkey")).mkString("\nUNION ALL\n")
    })

  /** Market-basket pair mining — the association-rule co-occurrence
    * pass (the support/lift half of Apriori, which at pair depth needs
    * no candidate pruning at all): which part brands appear together
    * in the same order more often than independence predicts. Output
    * is one row per unordered brand pair above a minimum support of 5
    * co-orders, with the pair count, both marginals, and LIFT in 1e-6
    * fixed point — lift = P(a,b)/(P(a)·P(b)) = c_ab·N/(c_a·c_b).
    *
    * Determinism: lift is the t_collocations two-step sequential floor
    * — t = (c_ab·10⁶) div c_a (≤ 10⁶ since c_ab ≤ c_a), then
    * (t·N) div c_b — identical on both engines, every intermediate
    * bounded by 10⁶·N ≪ 2⁶³ at any real order count.
    *
    * Scale shape: the basket table is one DISTINCT hash-aggregate of
    * lineitem⋈part projected to (orderkey, brand); the pair explosion
    * self-joins that table on orderkey — the DISTINCT is keyed on
    * (orderkey, brand) and the checkpoint cuts lineage, so this is
    * the one designed orderkey shuffle/SMJ the plan audit allows —
    * with fan-out bounded by
    * the per-order brand count (≤ lines per order, single digits in
    * any order-shaped schema), never all-pairs over brands; pair and
    * marginal rollups land on the |brands|²-bounded key space, and N
    * is a 1-row broadcast. The basket table is localCheckpoint'd once
    * since three consumers (both join sides, the marginals, N) read
    * it. */
  val qBasketPairs = GraftQuery(
    "q_basket_pairs",
    (s, d) => {
      import s.implicits._
      // order×brand-scale per-run scratch (three consumers), deferred
      // to the runner's post-materialization drain
      // orderkey-keyed explicit layout: the repartition BEFORE the
      // distinct serves the dedup aggregate (hash(orderkey) clusters
      // (orderkey, brand)) AND is declared on the checkpoint, so the
      // pair self-join below reads both sides exchange- and sort-free
      // (guide §2.4; measured round 15: 3 ob-scale exchanges → 1)
      val ob = graft.tools.Checkpoints.defer(
        org.apache.spark.sql.graft.LayoutCheckpoint.checkpoint(
          Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
            .join(Tables.part(s, d)
              .select($"p_partkey".as("l_partkey"), $"p_brand"), "l_partkey")
            .repartition($"l_orderkey")
            .select($"l_orderkey", $"p_brand").distinct()
            .sortWithinPartitions($"l_orderkey"),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val tot = ob.agg(countDistinct($"l_orderkey").as("n_orders"))
      val ca = ob.groupBy($"p_brand").agg(count(lit(1)).as("c"))
      ob.as("x").join(ob.as("y"), "l_orderkey")
        .where($"x.p_brand" < $"y.p_brand")
        .select($"x.p_brand".as("brand_a"), $"y.p_brand".as("brand_b"))
        .groupBy($"brand_a", $"brand_b")
        .agg(count(lit(1)).as("c_ab"))
        .where($"c_ab" >= 5)
        // brand marginals are |brands|-bounded (attribute domain, not
        // SF-scaled) — pin the broadcast; AQE can't size an aggregate
        // over checkpointed lineage.
        .join(broadcast(ca.select($"p_brand".as("brand_a"), $"c".as("c_a"))),
          "brand_a")
        .join(broadcast(ca.select($"p_brand".as("brand_b"), $"c".as("c_b"))),
          "brand_b")
        .crossJoin(broadcast(tot))
        .select($"brand_a", $"brand_b", $"c_ab", $"c_a", $"c_b",
          expr("(((c_ab * 1000000) div c_a) * n_orders) div c_b")
            .as("lift_fp"))
    },
    Some("""
      WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
      ca AS (SELECT p_brand, COUNT(*) AS c FROM ob GROUP BY 1),
      pr AS (
        SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
          COUNT(*) AS c_ab
        FROM ob x JOIN ob y
          ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
        GROUP BY 1, 2
        HAVING COUNT(*) >= 5)
      SELECT brand_a, brand_b, CAST(c_ab AS BIGINT) AS c_ab,
        CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b,
        CAST((((c_ab * 1000000) // a.c) * (SELECT n_orders FROM tot))
          // b.c AS BIGINT) AS lift_fp
      FROM pr
      JOIN ca a ON a.p_brand = pr.brand_a
      JOIN ca b ON b.p_brand = pr.brand_b"""),
    bench = true)

  val all: Seq[GraftQuery] = Seq(
    q1PricingSummary, q2TopOrders, q3RevenueByNation, q4OrderPriority,
    q5AntiCustomers, q5RegionTrade, q6ForecastRevenue, q7SupplierYear,
    q8MarketShare,
    q9PartStats, q10ReturnedRevenue, q12LatePriority, q14PromoRevenue,
    q15TopSupplier, q17SmallQtyRevenue, q19DisjunctRevenue,
    q21WaitingSuppliers, q22IdleCustomers, q13CustomerOrders,
    qAggCollect, qAggNested,
    qOuterBalance, qSetOps, qRollup, qCube, qWindowFuncs, qPercentiles,
    qCorrelatedSubquery, q18LargeOrders, qGroupingSets, qPivotStatus,
    qApproxPercentiles, qTableProfile, qTableProfileApprox,
    qProfileDrift, qJoinSkewReport, qBasketPairs)
}
