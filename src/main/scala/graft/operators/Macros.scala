package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped macro queries (round 6): the composite shapes that
  * exercise the whole optimizer path at once — selective dimension
  * filters that must push into scans, a broadcast/shuffle join mix, a
  * decimal-exact revenue aggregate, and a bounded top-N that must plan
  * as TakeOrdered, never a global sort. Q1's shape already exists as
  * q_agg_group; these add the Q3 / Q5 / Q10 patterns over the driver
  * tables. All three carry full DuckDB oracles.
  *
  * Scale shape (SURVEY.md §4): facts shuffle on their join keys once
  * each; every dimension (customer segment slice, nation, region,
  * supplier) broadcasts; revenue sums are DECIMAL(18,4)-exact so the
  * merge order never changes the hash.
  */
object Macros extends QueryModule {

  private def revenue = dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- Q3 shape: unshipped-revenue priority ranking. The segment
      // slice of customer broadcasts into orders; the dated lineitem
      // slice (pushed filter) shuffle-joins on the order key; top-10 by
      // revenue is a TakeOrdered over the per-order aggregate. ---
      "q_tpch_q3" -> ((s, d) => {
        val cust = table(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = table(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01"))
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd")
              .as("o_orderdate"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),

      // --- Q5 shape: local-supplier revenue by nation. The
      // customer-nation and supplier-nation must MATCH (the classic
      // co-location predicate); region/nation/supplier broadcast, the
      // two fact tables shuffle once each on their natural keys. ---
      "q_tpch_q5" -> ((s, d) => {
        val r = table(s, d, "region").filter(col("r_name") === "ASIA")
        val n = table(s, d, "nation")
        val sup = table(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val cust = table(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

      // --- Q18 shape: large-volume customers. The classic
      // aggregate-then-semi-join: per-order quantity totals (one
      // map-side-combinable aggregate), the >300 HAVING slice becomes a
      // BROADCAST semi-join key set against orders (the fact table
      // never shuffles for the filter), then customer broadcasts onto
      // the survivors. Top-20 is a TakeOrdered. ---
      "q_tpch_q18" -> ((s, d) => {
        val big = table(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
          .filter(col("total_qty") > 300.0)
        val cust = table(s, d, "customer")
          .select(col("c_custkey"), col("c_name"))
        table(s, d, "orders")
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd")
              .as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(20)
      }),

      // --- Q10 shape: returned-item customer ranking for one quarter.
      // The returnflag slice of lineitem joins the quarter's orders on
      // the order key (both pushed filters reach the scans); customer
      // and nation broadcast onto the per-customer aggregate; top-20 is
      // a TakeOrdered. ---
      "q_tpch_q10" -> ((s, d) => {
        val n = table(s, d, "nation")
        val cust = table(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"))
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = table(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      }))

  override def oracle: Map[String, String] = Map(

    "q_tpch_q3" ->
      s"""SELECT l_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  $revenueSql AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    > 300.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
}
