package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time (and optionally explain) individual registered
  * queries at an arbitrary scale factor.
  *
  * {{{
  *   sbt "runMain graft.tools.Profile q_dedup_ngram q_dedup_minhash"
  *   SPARK_GRAFT_EXPLAIN=1 sbt "runMain graft.tools.Profile q_dedup_ngram"
  * }}}
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "3600s")
      // shuffle/spill on tmpfs: the bench VM's block device stalls
      // under load (idle iowait load ~6), and disk-backed shuffle files
      // made identical queries 2-10x slower run-to-run
      .config("spark.local.dir", s"${graft.Scratch.root}/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
