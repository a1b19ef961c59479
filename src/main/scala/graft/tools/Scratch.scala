package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Throwaway bisection harness for performance debugging (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "3600s")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val run = new LongAdder; val cpu = new LongAdder
    val gc = new LongAdder; val deser = new LongAdder
    val sched = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          run.add(m.executorRunTime); cpu.add(m.executorCpuTime / 1000000L)
          gc.add(m.jvmGCTime); deser.add(m.executorDeserializeTime)
          tasks.increment()
          sched.add(math.max(0L,
            t.taskInfo.finishTime - t.taskInfo.launchTime - m.executorRunTime
              - m.executorDeserializeTime))
        }
      }
    })
    def snap(): Seq[Long] =
      Seq(run.sum, cpu.sum, gc.sum, deser.sum, sched.sum, tasks.sum)
    val d = "/root/testdata/sf0.1"
    for (i <- 1 to 6) {
      val before = snap()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dedup_ngram")(spark, d).count()
      val wall = (System.nanoTime - t0) / 1e9
      Thread.sleep(200)
      val delta = snap().zip(before).map { case (a, b) => a - b }
      println(f"## ngram-$i wall=$wall%.2fs runMs=${delta(0)} cpuMs=${delta(1)} " +
        f"gcMs=${delta(2)} deserMs=${delta(3)} schedMs=${delta(4)} tasks=${delta(5)}")
    }
    spark.stop()
  }
}
