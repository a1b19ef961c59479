package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the executed plan of the named queries
  * (comma list in args(1)) against the sf dir in args(0). Round
  * hygiene, not a driver artifact — used to eyeball new operators'
  * physical plans (broadcast placement, shuffle count, codegen spans)
  * before pinning them in PlanQualitySpec.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .appName("graft-explain").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    names.split(",").foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.treeString.take(12000))
    }
    spark.stop()
  }
}
