package graft.operators

import graft.QueryModule
import graft.Tables.table
import graft.functions.UdfSurface
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** User-extension surface as registered queries: a typed Aggregator
  * (exact distinct via set-union buffer, oracle-checked against
  * COUNT(DISTINCT)) and a scalar Scala UDF (slug normalization,
  * oracle-checked against the equivalent SQL expression chain).
  */
object ExtensionFns extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udaf_distinct" -> ((s, d) => {
      val distinctCust =
        udaf(UdfSurface.DistinctLongAgg, Encoders.scalaLong)
      table(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(distinctCust(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    "q_udf_slugify" -> ((s, d) => {
      val slug = udf(UdfSurface.slugify)
      table(s, d, "customer")
        .select(col("c_custkey"), slug(col("c_name")).as("slug"),
          slug(col("c_mktsegment")).as("segment_slug"))
        .orderBy("c_custkey")
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_udaf_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin,

    "q_udf_slugify" ->
      """SELECT c_custkey,
        |  trim(regexp_replace(lower(c_name), '[^a-z0-9]+', '-', 'g'), '-')
        |    AS slug,
        |  trim(regexp_replace(lower(c_mktsegment), '[^a-z0-9]+', '-', 'g'), '-')
        |    AS segment_slug
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
