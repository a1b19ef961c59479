package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-shaped macro queries (rounds 6-7): the composite shapes that
  * exercise the whole optimizer path at once — selective dimension
  * filters that must push into scans, a broadcast/shuffle join mix, a
  * decimal-exact revenue aggregate, and a bounded top-N that must plan
  * as TakeOrdered, never a global sort. Round 7 completes ALL 22 TPC-H
  * shapes over the driver schema: the driver tables lack partsupp,
  * commit/receipt dates, shipmode, and comment columns, so
  * Q2/Q9/Q11/Q16/Q20 derive their supply relation from lineitem
  * (distinct (partkey, suppkey) pairs with lineitem-derived cost/qty
  * measures), Q4/Q12/Q21 use "shipped >60 days after the order date"
  * as the lateness predicate, and Q13/Q16/Q22 swap the comment-pattern
  * slices for columns that exist — every adaptation keeps the
  * reference plan shape and is documented at the query. All carry full
  * DuckDB oracles.
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

      // --- Q7 shape: volume shipping between two nations. Both nation
      // slices reduce their dimension BEFORE the fact joins (suppliers
      // and customers shrink to the two nations — 8% of each — and
      // broadcast); lineitem's date slice pushes to the scan; the only
      // shuffle is the orderkey join; the asymmetric-pair predicate
      // closes on the already-joined rows. ---
      "q_tpch_q7" -> ((s, d) => {
        val n1 = table(s, d, "nation")
          .select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation"))
        val n2 = table(s, d, "nation")
          .select(col("n_nationkey").as("cnk"),
            col("n_name").as("cust_nation"))
        val sup = table(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
          .filter(col("supp_nation").isin("NATION_10", "NATION_12"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust = table(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(n2), col("c_nationkey") === col("cnk"))
          .filter(col("cust_nation").isin("NATION_10", "NATION_12"))
          .select(col("c_custkey"), col("cust_nation"))
        val ord = table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter((col("supp_nation") === "NATION_12" &&
              col("cust_nation") === "NATION_10") ||
            (col("supp_nation") === "NATION_10" &&
              col("cust_nation") === "NATION_12"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      }),

      // --- Q14 shape: promo revenue share for one month. The dated
      // lineitem slice pushes to the scan, part broadcasts, and the
      // conditional/total revenue pair lands in ONE aggregate row — the
      // share is a single IEEE division of two decimal-exact sums. ---
      "q_tpch_q14" -> ((s, d) => {
        val pt = table(s, d, "part").select(col("p_partkey"), col("p_type"))
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-03-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .select(col("l_partkey"), col("l_extendedprice"),
            col("l_discount"))
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            sum(when(col("p_type") === "PROMO", revenue)
              .otherwise(lit(0).cast(D))).cast("double")
            / sum(revenue).cast("double")).as("promo_share"))
      }),

      // --- Q19 shape: disjunctive discounted-revenue predicate. The
      // classic OR-of-ANDs that tests predicate normalization: the
      // optimizer must extract the common p_brand IN (...) superset
      // (pushable into the broadcast build side) while the per-branch
      // (brand, size, quantity) conjunctions evaluate post-join in one
      // codegen stage. part broadcasts; lineitem never shuffles. ---
      "q_tpch_q19" -> ((s, d) => {
        val pt = table(s, d, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        def branch(brand: String, szHi: Int, qLo: Int, qHi: Int) =
          col("p_brand") === brand &&
            col("p_size").between(1, szHi) &&
            col("l_quantity").between(qLo, qHi)
        table(s, d, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .filter(branch("Brand#1", 15, 1, 11) ||
            branch("Brand#2", 25, 10, 20) ||
            branch("Brand#3", 35, 20, 30))
          .agg(sum(revenue).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      }),

      // --- Q17 shape: small-quantity-order revenue. The brand slice of
      // part broadcasts twice (threshold pass + apply pass — the
      // q_join_bloom two-scan discipline); the per-part quantity
      // average is exact (decimal sum / count, one IEEE division per
      // part) and broadcasts back onto the brand slice. ---
      "q_tpch_q17" -> ((s, d) => {
        val pk = table(s, d, "part")
          .filter(col("p_brand") === "Brand#1").select("p_partkey")
        val liB = table(s, d, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"))
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        val avgq = liB.groupBy("l_partkey").agg(avgd(col("l_quantity"))
          .as("aq"))
        liB.join(broadcast(avgq), "l_partkey")
          .filter(col("l_quantity") < lit(0.2) * col("aq"))
          .agg((sumd(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      }),

      // --- Q1 shape: the pricing-summary full-scan aggregate — the
      // canonical map-side-combinable GROUP BY (6 groups from 600k+
      // rows, partials collapse to 6 rows per task before the
      // exchange). Every measure is decimal-accumulated; the averages
      // are one IEEE division each at the end. ---
      "q_tpch_q1" -> ((s, d) => {
        table(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2001-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sumd(col("l_extendedprice")).as("sum_base_price"),
            sum(revenue).cast("double").as("sum_disc_price"),
            // charge: never cast the 3-factor double product — its 6
            // decimal digits land on .xxxx5 shortest-repr ties that
            // Spark (HALF_UP) and DuckDB (half-even) round apart.
            // Round each tie-free 2-factor piece to decimal, then
            // multiply exactly in decimal space ((19,4)x(18,4) forces
            // DuckDB onto hugeint, avoiding its int64 overflow).
            // ... and render the scale-8 sum via FLOOR(s*1e4)/1e4: a
            // direct 17-significant-digit decimal -> double cast
            // differs in the last ulp between engines, and a decimal
            // downscale hits .xxxx5 ties that Spark rounds HALF_UP but
            // DuckDB truncates. Floor is tie-free, the floored integer
            // (13 digits) converts to double exactly, and the final
            // /1e4 is one identical IEEE division on both engines.
            (floor(sum(dec(col("l_extendedprice") *
                (lit(1.0) - col("l_discount"))).cast(DecimalType(19, 4)) *
              dec(lit(1.0) + col("l_tax"))) * lit(10000))
              .cast("double") / lit(10000.0)).as("sum_charge"),
            avgd(col("l_quantity")).as("avg_qty"),
            avgd(col("l_extendedprice")).as("avg_price"),
            avgd(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

      // --- Q4 shape: order-priority checking via EXISTS. The driver
      // tables carry no commit/receipt dates, so the reference's
      // "late delivery" predicate is adapted to "shipped >60 days after
      // the order date" — same decorrelated-EXISTS plan: the quarter's
      // orders slice (pushed filter) left-semi-joins lineitem on the
      // order key with the lateness predicate as a join residual; the
      // fact table is touched once, no subquery per row. ---
      "q_tpch_q4" -> ((s, d) => {
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-04-01"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      }),

      // --- Q6 shape: the forecasting-revenue scan — pure pushed-filter
      // aggregate, zero joins, one exchange of a single partial row per
      // task. The plan to demand: Filter directly over the scan (all
      // three predicates in PushedFilters) under one WholeStageCodegen
      // into a partial HashAggregate. ---
      "q_tpch_q6" -> ((s, d) => {
        table(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(sumd(col("l_extendedprice") * col("l_discount"))
            .as("revenue"),
            count(lit(1)).as("n_items"))
      }),

      // --- Q8 shape: national market share. Both nation lookups, the
      // part-type slice, the supplier map, and the region-sliced
      // customer set all broadcast; the only shuffle is lineitem↔orders
      // on the order key. The share is a conditional/total decimal-sum
      // pair divided once per year group (the Q14 discipline). ---
      "q_tpch_q8" -> ((s, d) => {
        val pt = table(s, d, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")
        val n2 = table(s, d, "nation")
          .select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation"))
        val sup = table(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(broadcast(n2), col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val r = table(s, d, "region").filter(col("r_name") === "ASIA")
        val n1 = table(s, d, "nation")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("cnk"))
        val custA = table(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(n1), col("c_nationkey") === col("cnk"))
          .select(col("c_custkey"))
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custA), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_12", revenue)
            .otherwise(lit(0).cast(D))).cast("double")
            / sum(revenue).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      }),

      // --- Q13 shape: customer order-count distribution. The driver
      // orders table has no comment column, so the reference's
      // comment-pattern exclusion is adapted to excluding URGENT
      // orders — same double-aggregate plan: a LEFT join that must keep
      // order-less customers (COUNT of the null-able key, not *), a
      // per-customer count, then the tiny count-of-counts rollup. ---
      "q_tpch_q13" -> ((s, d) => {
        val ord = table(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        table(s, d, "customer").select(col("c_custkey"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      }),

      // --- Q15 shape: top supplier by quarter revenue. The per-supplier
      // revenue aggregate stays DECIMAL for the max-equality test (exact
      // compare, no FP ties), the 1-row max broadcasts back over it, and
      // supplier broadcasts onto the surviving row(s). lineitem is
      // scanned once; the "view" of the reference is just a reused
      // plan subtree here. ---
      "q_tpch_q15" -> ((s, d) => {
        val rev = table(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revenue).as("tr"))
        val mx = rev.agg(max(col("tr")).as("mx"))
        val sup = table(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"))
        rev.crossJoin(broadcast(mx))
          .filter(col("tr") === col("mx"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("tr").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      }),

      // --- Q22 shape: dormant high-balance customers. The driver
      // customer table has no phone, and every customer has at least one
      // order, so the reference's country-code slice becomes a nationkey
      // set and "never ordered" becomes "no order since 2001-01-01" —
      // same plan skeleton: a scalar positive-balance average broadcast
      // over the slice, then an anti-join against the recent-orders
      // keys (the anti side carries the pushed date filter, so at fleet
      // scale it is a small fraction of orders). ---
      "q_tpch_q22" -> ((s, d) => {
        val pool = table(s, d, "customer")
          .filter(col("c_nationkey").isin(3, 8, 12, 17, 21))
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val ab = pool.filter(col("c_acctbal") > 0.0)
          .agg(avgd(col("c_acctbal")).as("ab"))
        val recent = table(s, d, "orders")
          .filter(col("o_orderdate") >= lit("2001-01-01"))
          .select(col("o_custkey"))
        pool.crossJoin(broadcast(ab))
          .filter(col("c_acctbal") > col("ab"))
          .join(recent, col("c_custkey") === col("o_custkey"),
            "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            sumd(col("c_acctbal")).as("totacctbal"))
          .orderBy("cntrycode")
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
      }),

      // --- Q2 shape: minimum-cost supplier per part. No partsupp
      // table, so the supply relation is derived from lineitem: a
      // (supplier, part) pair's cost is its minimum observed unit price
      // (l_extendedprice / l_quantity — MIN is order-independent, so
      // doubles are safe where a SUM would not be). The part slice and
      // the region's suppliers broadcast BEFORE the fact aggregate (the
      // reference filters partsupp the same way), the per-part minimum
      // is an aggregate of the already-sliced cost relation and
      // broadcasts back for the correlated-min equality. ---
      "q_tpch_q2" -> ((s, d) => {
        val sup = table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("n_name"))
        val pk = table(s, d, "part")
          .filter(col("p_size").between(10, 20) &&
            col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_name"))
        val cost = table(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("uc"))
          .join(broadcast(sup.select("s_suppkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(pk.select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("uc")).as("unit_cost"))
        val best = cost.groupBy(col("l_partkey").as("bpk"))
          .agg(min(col("unit_cost")).as("mc"))
        cost.join(broadcast(best), col("l_partkey") === col("bpk") &&
            col("unit_cost") === col("mc"))
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      }),

      // --- Q9 shape: product-line profit by nation and year. No
      // ps_supplycost, so unit cost is proxied as 10% of the part's
      // retail price (2-decimal retail x 0.1 x integer quantity = an
      // exact 3-decimal value — no rounding-mode ties when it lands in
      // DECIMAL(18,4)). Part-name slice and supplier-nation map
      // broadcast; the one shuffle is lineitem<->orders on the order
      // key; profit accumulates in exact decimal. ---
      "q_tpch_q9" -> ((s, d) => {
        val pt = table(s, d, "part")
          .filter(col("p_name").contains("bolt"))
          .select(col("p_partkey"), col("p_retailprice"))
        val sup = table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        val ord = table(s, d, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year"))
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), col("o_year"))
          .agg(sum(revenue -
            dec(col("p_retailprice") * lit(0.1) * col("l_quantity")))
            .cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      }),

      // --- Q11 shape: important-stock parts. The supply value of a
      // part is its region-local revenue (lineitem stands in for
      // partsupp); the global-threshold HAVING is the classic scalar
      // subquery — one total broadcast back over the per-part
      // aggregate. Both sides of the compare are the same decimal sums
      // cast to double, so the filter is engine-deterministic. ---
      "q_tpch_q11" -> ((s, d) => {
        val sup = table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"))
        val value = table(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(revenue).as("v"))
        val tot = value.agg(sum(col("v")).cast("double").as("t"))
        value.crossJoin(broadcast(tot))
          .filter(col("v").cast("double") > col("t") * lit(0.001))
          .select(col("l_partkey").as("p_partkey"),
            col("v").cast("double").as("value"))
          .orderBy(col("value").desc, col("p_partkey"))
      }),

      // --- Q12 shape: late-shipment priority counts. No shipmode or
      // commit/receipt dates: the mode slice becomes the returnflag
      // slice and "received after commit" becomes the Q4 lateness
      // predicate (shipped >60 days after the order date). Same plan:
      // the dated lineitem slice pushes to the scan, one shuffle join
      // on the order key, conditional counts collapse map-side. ---
      "q_tpch_q12" -> ((s, d) => {
        val li = table(s, d, "lineitem")
          .filter(col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_shipdate"))
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(table(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_returnflag"))
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_returnflag")
      }),

      // --- Q16 shape: supplier diversity per part group. The supply
      // relation is the DISTINCT (partkey, suppkey) pairs observed in
      // lineitem; the comment-pattern supplier exclusion becomes a
      // name-pattern anti-join (broadcast — the excluded list is a
      // dimension slice). The distinct-count aggregate shuffles once on
      // the (brand, type, size) group key. ---
      "q_tpch_q16" -> ((s, d) => {
        val pt = table(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        val bad = table(s, d, "supplier")
          .filter(col("s_name").contains("7")).select("s_suppkey")
        table(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"),
            col("p_type"), col("p_size"))
      }),

      // --- Q20 shape: suppliers with significant shipped volume of a
      // part line. partsupp availability becomes shipped-quantity: a
      // supplier qualifies if it moved >50 units of some 'bolt' part in
      // 1997. The part slice broadcasts into the dated fact aggregate;
      // the qualifying supplier keys semi-join (broadcast) into the
      // region's supplier slice — nested semi-joins, the fact table
      // touched once. ---
      "q_tpch_q20" -> ((s, d) => {
        val pk = table(s, d, "part")
          .filter(col("p_name").contains("bolt")).select("p_partkey")
        val qual = table(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(dec(col("l_quantity"))).cast("double").as("sq"))
          .filter(col("sq") > 50.0)
          .select("l_suppkey")
        table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(qual), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy("s_name")
      }),

      // --- Q21 shape: the sole late supplier on multi-supplier
      // finished orders — the classic semi-join + anti-join pair over
      // the same fact self-join key. Lateness is the Q4 adaptation
      // (shipped >60 days after the order date, via one orderkey join
      // to finished orders). All three logical scans of the order-line
      // relation join on the SAME key, so they co-partition after one
      // shuffle; the region's supplier slice broadcasts at the end. ---
      "q_tpch_q21" -> ((s, d) => {
        val lo = table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(table(s, d, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS")).as("late"))
        val late = lo.filter(col("late"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val sup = table(s, d, "supplier")
          .join(broadcast(table(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(table(s, d, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"))
        late
          .join(lo.select(col("l_orderkey"), col("l_suppkey")),
            col("l_orderkey") === col("ok") &&
              col("l_suppkey") =!= col("sk"), "left_semi")
          .join(late.select(col("ok").as("ok3"), col("sk").as("sk3")),
            col("ok3") === col("ok") && col("sk3") =!= col("sk"),
            "left_anti")
          .join(broadcast(sup), col("sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      }))

  override def oracle: Map[String, String] = Map(

    "q_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${S("l_quantity")} AS sum_qty,
         |  ${S("l_extendedprice")} AS sum_base_price,
         |  ${S("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  CAST(FLOOR(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |      AS DECIMAL(19,4))
         |    * CAST(1.0 + l_tax AS DECIMAL(18,4))) * 10000) AS DOUBLE)
         |    / 10000.0 AS sum_charge,
         |  ${A("l_quantity")} AS avg_qty,
         |  ${A("l_extendedprice")} AS avg_price,
         |  ${A("l_discount")} AS avg_disc,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q6" ->
      s"""SELECT ${S("l_extendedprice * l_discount")} AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_12'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q13" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS tr
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE tr = (SELECT MAX(tr) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q22" ->
      s"""WITH pool AS (
         |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
         |  WHERE c_nationkey IN (3, 8, 12, 17, 21)),
         |avgbal AS (SELECT ${A("c_acctbal")} AS ab
         |           FROM pool WHERE c_acctbal > 0.0)
         |SELECT c_nationkey AS cntrycode,
         |  CAST(COUNT(*) AS BIGINT) AS numcust,
         |  ${S("c_acctbal")} AS totacctbal
         |FROM pool, avgbal
         |WHERE c_acctbal > ab
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '2001-01-01')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

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
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
         |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "q_tpch_q19" ->
      s"""SELECT $revenueSql AS revenue, CAST(COUNT(*) AS BIGINT)
         |    AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q17" ->
      s"""WITH pk AS (SELECT p_partkey FROM part
         |            WHERE p_brand = 'Brand#1'),
         |li AS (SELECT l_partkey, l_quantity, l_extendedprice
         |       FROM lineitem JOIN pk ON l_partkey = p_partkey),
         |a AS (SELECT l_partkey, ${A("l_quantity")} AS aq
         |      FROM li GROUP BY l_partkey)
         |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
         |    AS DOUBLE) / 7.0 AS avg_yearly
         |FROM li JOIN a USING (l_partkey)
         |WHERE l_quantity < 0.2 * aq""".stripMargin,

    "q_tpch_q2" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |best AS (SELECT l_partkey, MIN(unit_cost) AS mc
        |         FROM cost GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        |FROM cost JOIN best USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |JOIN sup ON cost.l_suppkey = s_suppkey
        |WHERE unit_cost = mc AND p_size BETWEEN 10 AND 20
        |  AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))
        |    - CAST(p_retailprice * 0.1 * l_quantity AS DECIMAL(18,4)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS v
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS value
        |FROM val WHERE CAST(v AS DOUBLE) >
        |  (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM val)
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%7%')
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q20" ->
      """WITH pk AS (SELECT p_partkey FROM part
        |            WHERE p_name LIKE '%bolt%'),
        |qty AS (
        |  SELECT l_suppkey, l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT l_suppkey FROM qty
        |                    WHERE CAST(sq AS DOUBLE) > 50.0)
        |ORDER BY s_name""".stripMargin,

    "q_tpch_q21" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT l_orderkey, l_suppkey FROM lo
        |         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin)
}
