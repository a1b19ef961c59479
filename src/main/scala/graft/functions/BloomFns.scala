package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** SQL-callable registration of Spark's internal bloom-filter pair —
  * `BloomFilterAggregate` (build a sketch over join keys) and
  * `BloomFilterMightContain` (probe it) — the expressions Catalyst's own
  * runtime row-level filtering injects. Exposed as `graft_bloom_agg` /
  * `graft_might_contain` so the pruning pattern can be spelled
  * explicitly in a query (see q_join_bloom): the bloom binary travels as
  * a scalar-subquery result (driver-broadcast, a few KB), the fact scan
  * probes it before shuffling, and the exact join afterwards removes the
  * bloom's false positives, so results are bit-identical to the plain
  * join at any false-positive rate.
  */
object BloomFns {
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_bloom_agg",
      args => new BloomFilterAggregate(args(0), args(1), args(2))
        .toAggregateExpression())
    Bridge.registerFunction(spark, "graft_might_contain",
      args => BloomFilterMightContain(args(0), args(1)))
  }
}
