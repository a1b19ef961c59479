package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

import streaming.StatefulEwma
import streaming.StatefulEwma.{EwmaEvent, EwmaRow, EwmaState}

/** Checkpoint-recovery resilience: a stateful streaming query killed
  * mid-stream and RESTARTED from its checkpoint must produce exactly
  * the emissions of an uninterrupted run — per-user state (the 7-value
  * EWMA history) has to survive the restart through the state store,
  * and no emission may repeat or vanish across the boundary. This is
  * the property that makes the online-feature pattern operable at all:
  * executors die, drivers restart, and the feature stream must not
  * fork from its batch twin when they do.
  *
  * Harness: the bounded replay is staged one file at a time into a
  * scratch source dir; run 1 consumes batch0 and is STOPPED; batch1
  * lands while nothing is running; run 2 starts from the same
  * checkpoint and drains the rest. The sink is a real parquet FILE
  * sink (the memory sink refuses checkpoint recovery), so the
  * exactly-once guarantee under test is the production one: the file
  * sink's _spark_metadata commit log, which the batch reader then
  * consults for the committed-files view.
  */
class StreamingRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("stateful EWMA restarted from its checkpoint matches the " +
    "uninterrupted batch result exactly") {
    import spark.implicits._
    val replay = streaming.StatefulSession.replayDir(spark, sf)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val srcDir = new java.io.File(s"${graft.Scratch.root}/graft_ckpt/rst-src-$stamp")
    val ckpt = s"${graft.Scratch.root}/graft_ckpt/rst-ck-$stamp"
    srcDir.mkdirs()
    def stage(name: String): Unit =
      java.nio.file.Files.copy(
        new java.io.File(replay, name).toPath,
        new java.io.File(srcDir, name).toPath)
    val outDir = s"${graft.Scratch.root}/graft_ckpt/rst-out-$stamp"
    def readSink(): Set[(Long, Long, String, Double)] =
      if (!new java.io.File(outDir, "_spark_metadata").exists()) Set.empty
      else spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("ts_us LONG, user_id LONG, value DOUBLE, " +
          "event_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
        .selectExpr("ts_us", "user_id", "value", "event_id")
        .as[EwmaEvent]
        .filter(_.user_id >= 0L)
      val out = stream.groupByKey(_.user_id)
        .flatMapGroupsWithState[EwmaState, EwmaRow](
          OutputMode.Append(), GroupStateTimeout.NoTimeout)(
          StatefulEwma.smooth)
      val q = out.writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      ()
    }
    try {
      stage("batch0.parquet")
      runOnce()
      val run1 = readSink()
      // the incarnation is dead; more data arrives while nothing runs
      stage("batch1.parquet")
      runOnce()
      val all = readSink()
      val run2 = all -- run1
      assert(run1.nonEmpty && run2.nonEmpty,
        "both incarnations must emit (state carries real history)")
      assert(run1.subsetOf(all),
        "a committed emission may never vanish across the restart")
      val batch = SparkEntry.queries("q_ewma_smooth")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
      assert(all == batch,
        "combined incarnations == uninterrupted batch result")
      assert(all.size == run1.size + run2.size,
        "no emission repeats across the restart (exactly-once)")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(srcDir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
  }

  test("stateful sessionizer restarted from its checkpoint matches " +
    "the uninterrupted run — event-time timeouts re-arm from state") {
    import spark.implicits._
    import streaming.StatefulSession
    import streaming.StatefulSession.{OpenSession, SessEvent, SessionRow}
    val replay = streaming.StatefulSession.replayDir(spark, sf)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val srcDir = new java.io.File(s"${graft.Scratch.root}/graft_ckpt/rss-src-$stamp")
    val ckpt = s"${graft.Scratch.root}/graft_ckpt/rss-ck-$stamp"
    val outDir = s"${graft.Scratch.root}/graft_ckpt/rss-out-$stamp"
    srcDir.mkdirs()
    def stage(name: String): Unit =
      java.nio.file.Files.copy(
        new java.io.File(replay, name).toPath,
        new java.io.File(srcDir, name).toPath)
    def readSink(): Set[(Long, String, String, Long, Double)] =
      if (!new java.io.File(outDir, "_spark_metadata").exists()) Set.empty
      else spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("ts_us LONG, user_id LONG, value DOUBLE, " +
          "event_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.toString)
        .selectExpr("ts_us", "user_id", "value")
        .withColumn("ts", expr("timestamp_micros(ts_us)"))
        .withWatermark("ts", "0 seconds")
        .as[SessEvent]
      val out = stream.groupByKey(_.user_id)
        .flatMapGroupsWithState[OpenSession, SessionRow](
          org.apache.spark.sql.streaming.OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout)(StatefulSession.sessionize)
        .filter(col("user_id") >= 0L)
      val q = out.writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      ()
    }
    try {
      stage("batch0.parquet")
      runOnce()
      val run1 = readSink()
      stage("batch1.parquet")
      runOnce()
      val all = readSink()
      assert(run1.subsetOf(all))
      assert((all -- run1).nonEmpty,
        "the second incarnation must close the carried sessions")
      val reference = SparkEntry.queries("q_streaming_session")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(all == reference,
        "restarted emissions == uninterrupted run (sessions split or " +
          "lost across the boundary would differ)")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(srcDir)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    }
  }
}
