package graft.operators

import graft.{Det, QueryModule}
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.C): string, datetime, math,
  * conditional, array, and semi-structured (JSON) expressions. All are
  * built-in codegen'd `functions._` — no UDFs — so they stay inside
  * whole-stage codegen and push through the scan where applicable.
  *
  * Determinism notes: only IEEE-exact math ops are used (abs/ceil/floor/
  * sqrt/mod — never pow/ln/exp whose libm results differ across engines);
  * rounding happens on DECIMAL (half-up in both Spark and DuckDB);
  * integer-typed results are normalized to BIGINT (Det.lng).
  */
object ScalarFns extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_string" -> ((s, d) =>
      table(s, d, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          substring(col("c_name"), 10, 9).as("sub"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("cat"),
          lng(length(col("c_name"))).as("len"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("num"),
          regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("rep"),
          ltrim(rtrim(col("c_mktsegment"))).as("trimmed"))
        .orderBy("c_custkey")),

    "q_scalar_datetime" -> ((s, d) =>
      table(s, d, "orders")
        .select(col("o_orderkey"),
          lng(year(col("o_orderdate"))).as("yr"),
          lng(month(col("o_orderdate"))).as("mo"),
          lng(dayofmonth(col("o_orderdate"))).as("dy"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
          lng(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
            .as("days_since"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"))
        .orderBy("o_orderkey")),

    "q_scalar_math" -> ((s, d) =>
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("a"),
          ceil(col("l_extendedprice")).cast("double").as("c"),
          floor(col("l_extendedprice")).cast("double").as("f"),
          sqrt(col("l_quantity")).as("sq"),
          (col("l_orderkey") % 7).as("md"),
          round(dec(col("l_extendedprice")), 2).cast("double").as("r2"))
        // (l_orderkey, l_linenumber) is not unique — total order needs
        // every output column.
        .orderBy("l_orderkey", "l_linenumber", "a", "c", "f", "sq", "md",
          "r2")),

    "q_scalar_case" -> ((s, d) =>
      table(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 400000.0, "big")
            .when(col("o_totalprice") > 150000.0, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_or_open"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("urgent_flag"))
        .orderBy("o_orderkey")),

    // exact array ops only: no FP arithmetic, just structure + comparison
    "q_array_ops" -> ((s, d) =>
      table(s, d, "embeddings")
        .select(col("vec_id"),
          lng(size(col("embedding"))).as("n_dims"),
          lng(size(filter(col("embedding"), x => x > 0.0f))).as("n_pos"),
          array_max(col("embedding")).as("vmax"),
          array_min(col("embedding")).as("vmin"),
          element_at(col("embedding"), 1).as("first_val"))
        .orderBy("vec_id")),

    "q_array_explode" -> ((s, d) =>
      table(s, d, "embeddings")
        .filter(col("vec_id") < 3)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), lng(col("pos") + 1).as("idx"), col("val"))
        .orderBy("vec_id", "idx")),

    "q_json_extract" -> ((s, d) =>
      table(s, d, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy("event_id"))
  )

  override def oracle: Map[String, String] = Map(
    "q_scalar_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up,
        |  substring(c_name, 10, 9) AS sub,
        |  concat(c_mktsegment, ':', c_name) AS cat,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS num,
        |  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS rep,
        |  ltrim(rtrim(c_mktsegment)) AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_scalar_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dy,
        |  strftime(o_orderdate, '%Y-%m-%d') AS ds,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
        |    AS days_since,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS a,
        |  CAST(ceil(l_extendedprice) AS DOUBLE) AS c,
        |  CAST(floor(l_extendedprice) AS DOUBLE) AS f,
        |  sqrt(l_quantity) AS sq,
        |  l_orderkey % 7 AS md,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS r2
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, a, c, f, sq, md, r2""".stripMargin,

    "q_scalar_case" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 400000.0 THEN 'big'
        |       WHEN o_totalprice > 150000.0 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS urgent_flag
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_array_ops" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT) AS n_pos,
        |  list_max(embedding) AS vmax,
        |  list_min(embedding) AS vmin,
        |  embedding[1] AS first_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_array_explode" ->
      """SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS idx,
        |       unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 3
        |ORDER BY vec_id, idx""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin
  )
}
