ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xml_to_parquetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Bench prints its result as ONE JSON line on stdout; sbt's trailing
// "[success] Total time" banner would otherwise be the last line and
// defeat last-line JSON parsing by the harness.
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not another setting —
// exclude it from the unused-key lint
Global / excludeLintKeys += showSuccess
// Forked run output goes straight to the sbt process's stdout/stderr,
// not through the logger — the logger would prefix every line with
// "[info] ", which breaks last-line JSON parsing just as surely as the
// success banner does. (All three prior bench records show parsed=None:
// the harness has never successfully parsed a bench line.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// 32 concurrent local tasks share one unified memory pool; 8g starves
// them into GC storms on the array-heavy dedup/similarity queries (and a
// GC-poisoned session then mistimes every later query). The bench box
// has 128 GiB; 32g keeps task memory ~600 MiB each with ample headroom.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pin the initial heap too: ParallelGC ergonomics start at ~2g and
  // grow reluctantly — an allocation-heavy 32-task stage hitting a
  // still-small heap full-GC-thrashes while it grows (measured: ONE
  // pair-emission stage burned 503 s of GC on its first run, 0 s once
  // the heap had grown; r18 StageProfile). Same value as -Xmx so the
  // committed young gen below is carved from a fixed-size heap.
  // SPARK_GRAFT_XMS overrides just the initial heap (A/B hook, and the
  // portability knob for hosts under 32 GB where committing the full
  // heap at startup would fail outright — r18 ADVICE).
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))}",
  // G1's adaptive young-gen sizing collapses under the allocation-heavy
  // interpreted expression pipelines (higher-order functions allocate
  // per-element), making identical queries bimodal 4s..60s with 40x CPU
  // inflation; throughput-oriented ParallelGC with a pinned young gen is
  // stable for this batch workload.
  // Young gen + capped GC threads: 4g young made each minor GC a
  // multi-GB copy with 23 GC threads contending against 32 task
  // threads; 1g/8 kept pauses short (bench total 133s -> 47s then).
  // r18 re-measured with threads already capped at 8: 1g collapses
  // under 32-task allocation-heavy stages (posting-pair emission burned
  // 36-93 s of task time vs 5 s at 8-16 tasks, 7-59 s of it GC — the
  // eden share per task is ~30 MB); 2g removes that cliff
  // (q_graph_resource_alloc 5.31s -> 1.13s same window) without
  // re-creating the 4g copy cost. Env-tunable for A/B.
  "-XX:+UseParallelGC",
  s"-Xmn${sys.env.getOrElse("SPARK_GRAFT_YOUNG", "2g")}",
  "-XX:ParallelGCThreads=8",
  // Codegen churns generated classes through Metaspace; the default
  // ~21 MB increment forces a Full GC at every threshold crossing (10+
  // "Metadata GC Threshold" pauses per bench run). Start large.
  "-XX:MetaspaceSize=512m",
  // Long time-to-safepoint from C2 counted loops over codegen'd array
  // kernels stalls all 32 task threads whenever GC needs a safepoint.
  "-XX:+UseCountedLoopSafepoints",
)
