package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway bisection harness for performance debugging (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"## $label: ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    val raw = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("warm")(raw.count())
    time("md5-raw")(raw.select(md5(lower(col("text")))).count())
    time("md5-raw2")(raw.select(md5(lower(col("text")))).count())
    val rep = raw.repartition(32)
    time("md5-rep")(rep.select(md5(lower(col("text")))).count())
    time("md5-rep2")(rep.select(md5(lower(col("text")))).count())
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val erep = emb.repartition(32)
    time("emb-raw-count")(emb.count())
    time("emb-rep-count")(erep.count())
    time("emb-rep-count2")(erep.count())
    val e = erep.select(col("vec_id"), col("embedding").as("q"))
      .withColumn("nn", graft.functions.QuantizedDot(col("q"), col("q")))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("nn").as("pn"))
    val cands = e.select(col("vec_id").as("cand_id"), col("q").as("cq"), col("nn").as("cn"))
    val scored = cands.crossJoin(broadcast(probes))
      .filter(col("cand_id") =!= col("probe_id"))
    time("topk-scored")(scored.count())
    time("topk-scored2")(scored.count())
    spark.stop()
  }
}
