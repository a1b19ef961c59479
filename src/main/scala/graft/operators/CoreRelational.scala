package graft.operators

import graft.{Det, QueryModule, Tables}
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.C): scans, filters,
  * the full join family, aggregation (hash / distinct / grouping sets /
  * having), window functions, global sort + top-k, set operations, and a
  * decorrelated scalar subquery.
  *
  * Scale notes (100 TB design point): every query is expressed
  * declaratively so Catalyst plans it — filters and projections push into
  * the parquet scan, small dimension sides are broadcast (explicitly where
  * we know the cardinality: part/supplier/nation/region), and wide results
  * always aggregate before any driver-visible materialization. No
  * `collect`, no hardcoded partition counts; AQE re-plans at runtime.
  */
object CoreRelational extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scan + projection: column pruning must reach the parquet footer ---
    "q_scan_project" -> ((s, d) =>
      table(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in the test data; only
        // the full row is — order by every output column for a total order.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")),

    // --- conjunctive/disjunctive predicate, pushed to the scan ---
    "q_filter_pred" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(
          (col("l_discount") > 0.05 && col("l_returnflag") === "R" &&
            col("l_quantity") < 30.0) ||
            (col("l_tax") <= 0.01 && col("l_linestatus") === "F"))
        .filter(col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
          "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
          "l_discount", "l_tax")),

    // --- equi inner join (shuffled hash/SMJ at scale; AQE decides) ---
    "q_join_inner" -> ((s, d) => {
      val o = table(s, d, "orders")
      val c = table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_custkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // --- broadcast join: part is a dimension, ship it to every executor ---
    "q_join_broadcast" -> ((s, d) => {
      val l = table(s, d, "lineitem")
      val p = table(s, d, "part").filter(col("p_size") <= 5)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .select(l("l_orderkey"), l("l_linenumber"), p("p_name"), p("p_brand"))
        .orderBy("l_orderkey", "l_linenumber", "p_name", "p_brand")
    }),

    // --- left outer join with a join-side predicate ---
    "q_join_left" -> ((s, d) => {
      val c = table(s, d, "customer")
      val o = table(s, d, "orders")
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
            o("o_orderpriority") === "1-URGENT", "left")
        .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),

    // --- right outer join ---
    "q_join_right" -> ((s, d) => {
      val o = table(s, d, "orders")
      val c = table(s, d, "customer")
      o.join(c,
          o("o_custkey") === c("c_custkey") && o("o_orderstatus") === "P",
          "right")
        .select(c("c_custkey"), o("o_orderkey"), o("o_totalprice"))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }),

    // --- full outer join: both sides filtered so each has unmatched
    // rows (shuffle join — full outer cannot broadcast either side) ---
    "q_join_full" -> ((s, d) => {
      val c = table(s, d, "customer").filter(col("c_custkey") < 500)
      val o = table(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(c("c_custkey"), c("c_name"), o("o_orderkey"),
          o("o_totalprice"))
        .orderBy(col("c_custkey").asc_nulls_first,
          col("o_orderkey").asc_nulls_first)
    }),

    // --- existence joins: semi (EXISTS) / anti (NOT EXISTS) ---
    "q_join_semi" -> ((s, d) => {
      val c = table(s, d, "customer")
      val big = table(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),
    "q_join_anti" -> ((s, d) => {
      val c = table(s, d, "customer")
      val big = table(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // --- correlated LATERAL join (top-N-per-outer-row subquery):
    // Catalyst decorrelates the per-order ORDER BY ... LIMIT subquery
    // into a window/top-k over one equi join — the declarative spelling
    // scales exactly like the explicit rank-filter it rewrites to, with
    // no per-row subquery execution anywhere. Ties beyond the total
    // order carry identical values (duplicated lineitems), so LIMIT's
    // choice between them cannot change the output. ---
    "q_join_lateral" -> ((s, d) => {
      table(s, d, "orders").createOrReplaceTempView("orders_v")
      table(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        |FROM orders_v o,
        |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem_v l
        |         WHERE l.l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
        |WHERE o.o_orderkey <= 1000
        |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber"""
        .stripMargin)
    }),

    // --- theta (range) join: small side broadcast -> nested loop ---
    "q_join_theta" -> ((s, d) => {
      val c = table(s, d, "customer")
      val sup = table(s, d, "supplier")
      c.join(broadcast(sup),
          c("c_acctbal") >= sup("s_acctbal") - 100.0 &&
            c("c_acctbal") <= sup("s_acctbal") + 100.0)
        .select(sup("s_suppkey"), c("c_custkey"), sup("s_acctbal"),
          c("c_acctbal"))
        .orderBy("s_suppkey", "c_custkey")
    }),

    // --- 4-way star join, dims broadcast, fact aggregated ---
    "q_join_multiway" -> ((s, d) => {
      val r = table(s, d, "region")
      val n = table(s, d, "nation")
      val c = table(s, d, "customer")
      val o = table(s, d, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"), n("n_name"))
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // --- hash aggregate (TPC-H Q1 shape; partial agg map-side) ---
    "q_agg_group" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumd(col("l_quantity")).as("sum_qty"),
          sumd(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgd(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // --- distinct aggregation (expand + two-phase agg) ---
    "q_agg_distinct" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // --- grouping sets: rollup / cube with grouping_id ---
    "q_agg_rollup" -> ((s, d) =>
      table(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sumd(col("o_totalprice")).as("revenue"),
          lng(grouping_id()).as("g"))
        .orderBy(col("g"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),
    "q_agg_cube" -> ((s, d) =>
      table(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"),
          lng(grouping_id()).as("g"))
        .orderBy(col("g"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // --- post-aggregation filter (HAVING) ---
    "q_agg_having" -> ((s, d) =>
      table(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice")).as("revenue"))
        .filter(col("n_orders") >= 3)
        .orderBy("o_custkey")),

    // --- ranking window functions, top-10 per partition. The
    // row_number filter sits on the UNCAST rank directly above its
    // window so InferWindowGroupLimit keeps per-group 10-row heaps
    // map-side (a filter on a cast of the rank defeats the rewrite
    // and full-sorts each priority group). rank/dense_rank then run
    // over the ≤10 survivors: the kept rows are a PREFIX of the
    // (price desc, orderkey) order and both functions only count rows
    // at-or-before, so their values are identical to the full-group
    // spelling (the oracle). ---
    "q_win_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val tiesOk = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byPrice).as("rn0"))
        .filter(col("rn0") <= 10)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          lng(col("rn0")).as("rn"),
          lng(rank().over(tiesOk)).as("rnk"),
          lng(dense_rank().over(tiesOk)).as("drnk"))
        .orderBy("o_orderpriority", "rn")
    }),

    // --- distribution window functions (round 10): percent_rank +
    // cume_dist of each order within ITS CUSTOMER's order history —
    // "how big is this order for this customer", the per-entity
    // percentile feature a personalization model consumes. The window
    // partitions by o_custkey (group size = orders-per-customer, a
    // CONSTANT of the schema — never a corpus-sized partition), with
    // (totalprice, orderkey) a total order so both functions are
    // deterministic; the distribution values are the engines' native
    // exact rational divisions. Single-order customers are kept
    // (percent_rank = 0 by definition — the n=1 edge both engines
    // define identically). ---
    "q_win_cumedist" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- ntile quartiles (round 14 — the last window function the
    // surface lacked): each customer's orders cut into 4 spend tiles,
    // rolled up to a per-tile spend profile. The ntile window
    // partitions by o_custkey (constant-bounded group size, never a
    // corpus-sized partition) over the (totalprice desc, orderkey)
    // total order, so tile assignment is deterministic and both
    // engines' ntile remainder rule (first n%4 tiles get the extra
    // row) agrees; the rollup shuffles 4 cells. ---
    "q_win_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"),
          lng(ntile(4).over(w)).as("tile"))
        .groupBy("tile")
        .agg(count(lit(1)).as("n_orders"),
          sumd(col("o_totalprice")).as("spend"))
        .orderBy("tile")
    }),

    // --- sliding-frame analytics + lag/lead (o_orderkey is unique, so
    // the window order is total and frames are deterministic) ---
    "q_win_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      table(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w.rowsBetween(-2, 0))
            .cast("double").as("run_price"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // --- global sort + limit => TakeOrderedAndProject (no full sort) ---
    "q_sort_limit" -> ((s, d) =>
      table(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // --- set operations ---
    "q_set_union" -> ((s, d) => {
      val c = table(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
        .select(lng(col("c_nationkey")).as("nk"), lit("cust").as("side"))
      val sup = table(s, d, "supplier")
        .select(lng(col("s_nationkey")).as("nk"), lit("supp").as("side"))
      c.union(sup).orderBy("side", "nk")
    }),
    "q_set_intersect" -> ((s, d) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),
    "q_set_except" -> ((s, d) => {
      val o = table(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // --- scalar subquery, decorrelated to a broadcast cross join ---
    "q_subquery_scalar" -> ((s, d) => {
      val c = table(s, d, "customer")
      val thr = c.agg((sum(dec(col("c_acctbal"))).cast("double") /
        count(col("c_acctbal"))).as("thr"))
      c.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_win_ntile" ->
      s"""WITH t AS (SELECT o_totalprice,
         |    CAST(ntile(4) OVER (PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
         |      AS tile
         |  FROM orders)
         |SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  ${graft.Det.S("o_totalprice")} AS spend
         |FROM t GROUP BY tile ORDER BY tile""".stripMargin,

    "q_win_cumedist" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  percent_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS pr,
        |  cume_dist() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS cd
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
        .stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |       l_discount, l_tax
        |FROM lineitem
        |WHERE ((l_discount > 0.05 AND l_returnflag = 'R' AND l_quantity < 30.0)
        |       OR (l_tax <= 0.01 AND l_linestatus = 'F'))
        |  AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        |         l_discount, l_tax""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |ORDER BY l_orderkey, l_linenumber, p_name, p_brand""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer
        |  ON o_custkey = c_custkey AND o_orderstatus = 'P'
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM customer WHERE c_custkey < 500) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_lateral" ->
      """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        |FROM orders o,
        |LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem l
        |         WHERE l.l_orderkey = o.o_orderkey
        |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
        |WHERE o.o_orderkey <= 1000
        |ORDER BY o_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin,

    "q_join_theta" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM customer JOIN supplier
        |  ON c_acctbal >= s_acctbal - 100.0 AND c_acctbal <= s_acctbal + 100.0
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    "q_join_multiway" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
         |       ${S("o_totalprice")} AS revenue
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,

    "q_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${S("l_quantity")} AS sum_qty,
         |  ${S("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
         |           (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         |    AS sum_disc_price,
         |  ${A("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |       ${S("o_totalprice")} AS revenue,
         |       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS g
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY g, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${S("l_quantity")} AS sum_qty,
         |       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS g
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY g, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${S("o_totalprice")} AS revenue
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
         |ORDER BY o_custkey""".stripMargin,

    "q_win_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
        |    CAST(rank() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
        |  FROM orders) t
        |WHERE rn <= 10
        |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_win_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_price,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_set_union" ->
      """SELECT * FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk, 'cust' AS side
        |  FROM customer WHERE c_mktsegment = 'MACHINERY'
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS nk, 'supp' AS side FROM supplier
        |) ORDER BY side, nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |                        AS DOUBLE) / COUNT(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin
  )
}
