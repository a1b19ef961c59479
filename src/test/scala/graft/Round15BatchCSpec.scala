package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixture specs for the third round-15 query block (simhash radius
  * eval, preferential attachment, meta-analysis pooling, Bowker
  * symmetry, Little's law).
  */
class Round15BatchCSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def rm(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    ()
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q_simhash_eval: an identical pair is a radius-0 candidate, a " +
    "truth hit, and perfect precision/recall at every radius") {
    import spark.implicits._
    val dir = tmpDir("simhasheval")
    Seq((1L, "alpha beta gamma delta", "en", "s", 22L),
        (2L, "alpha beta gamma delta", "en", "s", 22L),
        (3L, "zz yy xx ww vv uu tt ss", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_simhash_eval")(spark, dir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_exact"),
        r.getAs[Double]("cand_precision"), r.getAs[Double]("recall")))
    assert(got.length == 4)
    // identical docs: simhash equal (hamming 0), jaccard 1 in truth
    assert(got.forall { case (_, np, nh, ne, p, rc) =>
      np == 1L && nh == 1L && ne == 1L && p == 1.0 && rc == 1.0
    }, got.toSeq.toString)
    rm(dir)
  }

  test("q_graph_pref_attach: head pairs ranked by degree product with " +
    "a correct linked flag; unlinked pairs first at equal score") {
    import spark.implicits._
    val dir = tmpDir("prefattach")
    // c1 {p1,p2,p3}, c2 {p1,p4}, c3 {p5}: c1-c2 share p1 (linked,
    // score 6); c1-c3 score 3 unlinked; c2-c3 score 2 unlinked
    Seq((10L, 1L), (20L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 4L),
        (30L, 5L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_graph_pref_attach")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("sa"), r.getAs[Long]("sb"),
        r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("score"), r.getAs[Long]("linked")))
    assert(got.toSeq == Seq((1L, 2L, 3L, 2L, 6L, 1L),
      (1L, 3L, 3L, 1L, 3L, 0L), (2L, 3L, 2L, 1L, 2L, 0L)))
    rm(dir)
  }

  test("q_meta_effect: hand-computed pooled effect, Cochran Q and I2 " +
    "over two planted sources") {
    import spark.implicits._
    val dir = tmpDir("metaeffect")
    // s1: en {100,200} fr {50,150} -> d=50, w100=100
    // s2: en {300} fr {100} -> d=200, w100=50
    // pooled_d=100, Q=7500, I2=7499/7500
    Seq((1L, "t", "en", "s1", 100L), (2L, "t", "en", "s1", 200L),
        (3L, "t", "fr", "s1", 50L), (4L, "t", "fr", "s1", 150L),
        (5L, "t", "en", "s2", 300L), (6L, "t", "fr", "s2", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_meta_effect")(spark, dir).head()
    assert(got.getAs[Long]("k") == 2L)
    assert(got.getAs[Double]("pooled_d") == 100.0)
    assert(got.getAs[Double]("q_stat") == 7500.0)
    assert(got.getAs[Double]("i2") == 7499.0 / 7500.0)
    rm(dir)
  }

  test("q_bowker: statistic matches an independent md5 recompute with " +
    "the same integer quantization") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def cls(c: Char): String =
      if (c <= '4') "x" else if (c <= 'a') "y" else "z"
    val dir = tmpDir("bowker")
    val ids = (0L until 200L)
    ids.map(i => (i, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent recompute
    val labs = ids.map { i =>
      val h = md5hex(i.toString)
      (cls(h(0)), cls(h(1)))
    }.filter { case (a, b) => a != b }
    val cells = labs.groupBy { case (a, b) =>
      (Seq(a, b).min, Seq(a, b).max)
    }.map { case (_, v) =>
      val nf = v.count { case (a, b) => a < b }.toLong
      val nr = v.size.toLong - nf
      ((nf - nr) * (nf - nr) * 1000000L) / (nf + nr)
    }.toSeq
    val expDf = cells.size.toLong
    val expChi = cells.sum.toDouble / 1e6
    val got = SparkEntry.queries("q_bowker")(spark, dir).head()
    assert(got.getAs[Long]("df") == expDf)
    assert(got.getAs[Double]("bowker_chi2") == expChi)
    rm(dir)
  }

  test("q_littles_law: hand-computed monthly arrivals/WIP/cycle and " +
    "the lambda*W prediction (leap-year February has 29 days)") {
    import spark.implicits._
    val dir = tmpDir("littles")
    Seq((1L, ts("2024-01-10")), (2L, ts("2024-01-20")),
        (3L, ts("2024-02-05")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // o1 completes Jan 15 (cyc 5); o2 completes Feb 10 (cyc 21);
    // o3 completes Feb 6 (cyc 1)
    Seq((1L, ts("2024-01-15")), (2L, ts("2024-01-25")),
        (2L, ts("2024-02-10")), (3L, ts("2024-02-06")))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_littles_law")(spark, dir).collect()
    assert(got.length == 2)
    val jan = got(0); val feb = got(1)
    assert(jan.getAs[java.sql.Date]("month_start").toString
      == "2024-01-01")
    assert(jan.getAs[Long]("arrivals") == 2L)
    assert(jan.getAs[Long]("completions") == 1L)
    assert(jan.getAs[Long]("wip_end") == 1L)
    assert(jan.getAs[Double]("w_days") == 5.0)
    assert(jan.getAs[Double]("lambda_day") == 2.0 / 31)
    assert(jan.getAs[Double]("l_pred") == (2.0 / 31) * 5.0)
    assert(feb.getAs[java.sql.Date]("month_start").toString
      == "2024-02-01")
    assert(feb.getAs[Long]("arrivals") == 1L)
    assert(feb.getAs[Long]("completions") == 2L)
    assert(feb.getAs[Long]("wip_end") == 0L)
    assert(feb.getAs[Double]("w_days") == 11.0)
    assert(feb.getAs[Double]("lambda_day") == 1.0 / 29)
    assert(feb.getAs[Double]("l_pred") == (1.0 / 29) * 11.0)
    rm(dir)
  }
}
