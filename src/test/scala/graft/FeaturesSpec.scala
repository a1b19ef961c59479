package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the feature-engineering encoders at sf0.001. */
class FeaturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("one-hot rows carry exactly one indicator, matching the type") {
    val rows = q("q_onehot_encode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hot = Seq("click", "error", "purchase", "signup", "view")
        .map(c => c -> r.getAs[Long](s"ot_$c"))
      assert(hot.map(_._2).sum == 1L)
      assert(hot.toMap.apply(t) == 1L)
    }
  }

  test("min-max scaling hits 0 and 1 at each group's extremes") {
    val rows = q("q_minmax_scale").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("scaled")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).min == 0.0 && g.map(_._2).max == 1.0)
    }
  }

  test("target encoding equals the brute-force smoothing formula") {
    val rows = q("q_target_encode").collect()
    val ev = Tables.table(spark, sf, "events")
      .select(col("event_type"), round(col("value"), 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gm = ev.map(_._2).sum.toDouble / ev.length
    val byType = ev.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val g = byType(r.getAs[String]("event_type")).map(_._2)
      assert(r.getAs[Long]("n") == g.length)
      assert(r.getAs[Double]("enc")
        == (g.sum.toDouble + 10.0 * gm) / (g.length + 10))
    }
    // smoothing pulls small groups toward the global mean: every
    // encoding sits between its group mean and the global mean
    rows.foreach { r =>
      val g = byType(r.getAs[String]("event_type")).map(_._2)
      val lm = g.sum.toDouble / g.length
      val enc = r.getAs[Double]("enc")
      assert((enc - lm) * (enc - gm) <= 1e-9,
        s"enc $enc outside [$lm, $gm]")
    }
  }
}
