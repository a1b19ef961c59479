package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The size-gated q_graph_triangle strategy (round 13) flips between
  * the adjacency-broadcast edge-iterator and the co-partitioned wedge
  * join at TriangleBroadcastEdgeCap. The gate is only sound if the two
  * spellings are RESULT-IDENTICAL — same triangles found exactly once,
  * same per-node rollup, same top-20 — which this spec pins on the
  * real co-purchase graph at sf0.001 (where the registered query takes
  * the broadcast path, so the wedge path would otherwise go
  * unexercised by the oracle sweep).
  */
class TriangleEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("wedge-join and broadcast-adjacency triangle spellings return " +
    "identical rows") {
    val oriented = operators.Retrieval.orientedTriangleEdges(spark, sf)
    val viaBroadcast = operators.Retrieval.triangleByBroadcast(oriented)
      .collect().toSeq.map(_.toSeq)
    val viaWedge = operators.Retrieval.triangleByWedge(oriented)
      .collect().toSeq.map(_.toSeq)
    assert(viaBroadcast.nonEmpty, "graph yields triangles at sf0.001")
    assert(viaBroadcast == viaWedge,
      "the two triangle strategies must be result-identical")
  }
}
