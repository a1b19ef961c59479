package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins: the q_dedup_embedding all-pairs guard is a PAIR
  * budget (verdict task #3) — the cap derivation is asserted in
  * closed form and the tripwire is exercised on a real over-budget
  * table, so a future loosening of either fails here.
  */
class Round17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def cleanup(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    ()
  }

  test("all-pairs vector cap derives from the 5e9 pair budget: " +
    "n(n-1)/2 <= budget and (n+1)n/2 > budget") {
    val n = graft.operators.Similarity.allPairsMaxVectors
    val b = graft.operators.Similarity.allPairsBudget
    assert(n * (n - 1) / 2 <= b,
      s"cap $n exceeds the pair budget: ${n * (n - 1) / 2} > $b")
    assert((n + 1) * n / 2 > b,
      s"cap $n is not tight: ${(n + 1) * n / 2} <= $b")
    // the budget keeps the cap five orders below the old 1M bound's
    // implied 5e11 pairs — the guard fires while work is tractable
    assert(n <= 200000L, s"cap $n admits an untractable all-pairs job")
  }

  test("q_dedup_embedding refuses an over-budget embeddings table " +
    "and names the bucketed spellings") {
    val dir = tmpDir("pairbudget")
    val cap = graft.operators.Similarity.allPairsMaxVectors
    // cap+1 one-element vectors: the guard's limit(cap+1).count()
    // trips before any join is planned
    spark.range(cap + 1)
      .select(col("id").as("vec_id"),
        array(lit(0.25f)).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q_dedup_embedding")(spark, dir)
    }
    assert(e.getMessage.contains("pair budget"), e.getMessage)
    assert(e.getMessage.contains("q_sim_lsh"), e.getMessage)
    cleanup(dir)
  }
}
