package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.QueryModule

/** Custom stateful streaming: per-user sessionization via
  * `flatMapGroupsWithState` (SURVEY.md §2.C streaming surface), the
  * hand-rolled-state counterpart of the built-in `session_window` used by
  * `q_window_session` — the two are asserted equal in the test suite.
  *
  * Semantics: a session is a maximal run of events per user where each
  * event follows the previous within `Gap` (strictly greater gap starts a
  * new session); emitted as [min_ts, max_ts + Gap) exactly like
  * `session_window`. Each trigger emits a SNAPSHOT of every session
  * touched this batch (closed sessions are final; the open tail session
  * re-emits, updated, on later triggers — Update output mode). The open
  * tail is carried in `GroupState`, so state per user is one small
  * struct, not the event history: the shape that survives unbounded
  * streams. In production you would add an event-time timeout
  * (`GroupStateTimeout.EventTimeTimeout`) to finalize and evict idle
  * sessions at the watermark; the one-shot replay harness has a single
  * trigger, so no timeout ever fires here.
  *
  * Determinism: sums are accumulated as DECIMAL(18,4)-style unscaled
  * longs (value quantized at 1e-4, exactly the Det.sumd policy) and
  * rendered to double once at emit, so streaming and batch agree
  * bit-for-bit.
  */
object StatefulSession extends QueryModule {

  /** One event entering the sessionizer (ts in epoch micros). */
  final case class SessEvent(user_id: Long, ts_us: Long, value: Double)

  /** Open-session state: one struct per user, independent of history
    * length.
    */
  final case class OpenSession(start_us: Long, last_us: Long, n: Long,
      sum_q: Long)

  /** Emitted session row (same shape as q_window_session). */
  final case class SessionRow(user_id: Long, s_start: String, s_end: String,
      n: Long, sum_value: Double)

  private val GapUs = 30L * 60L * 1000000L

  /** DECIMAL(18,4) quantization of a measure (Det policy, JVM-side). */
  private def quant(v: Double): Long =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  private def fmtMicros(us: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  private def emit(user: Long, s: OpenSession): SessionRow =
    SessionRow(user, fmtMicros(s.start_us), fmtMicros(s.last_us + GapUs),
      s.n, BigDecimal(java.math.BigInteger.valueOf(s.sum_q), 4).toDouble)

  /** The stateful function: fold this batch's events (sorted by event
    * time) onto the carried open session, splitting at > Gap; emit every
    * session touched, carry the open tail.
    */
  private[streaming] def sessionize(user: Long, it: Iterator[SessEvent],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    val evs = it.toArray.sortBy(_.ts_us)
    if (evs.isEmpty) return Iterator.empty
    var sessions = List.empty[OpenSession]
    var cur = state.getOption.orNull
    evs.foreach { e =>
      val q = quant(e.value)
      cur match {
        case null =>
          cur = OpenSession(e.ts_us, e.ts_us, 1L, q)
        case c if e.ts_us - c.last_us > GapUs =>
          sessions ::= c
          cur = OpenSession(e.ts_us, e.ts_us, 1L, q)
        case c =>
          cur = OpenSession(c.start_us, math.max(c.last_us, e.ts_us),
            c.n + 1L, c.sum_q + q)
      }
    }
    state.update(cur)
    (cur :: sessions).reverseIterator.map(emit(user, _))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_streaming_session" -> ((s, d) => {
      import s.implicits._
      val schema = graft.Tables.rawEventsSchema(s, d)
      val stream = s.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .select(expr("ts div 1000").as("ts_us"), col("user_id"),
          col("value"))
        .as[SessEvent]
      val out = stream.groupByKey(_.user_id)
        .flatMapGroupsWithState[OpenSession, SessionRow](
          OutputMode.Update(), GroupStateTimeout.NoTimeout)(sessionize)
      val name = "graft_stream_session"
      // see StreamingSmoke: state partitions sized to the state, not CPUs
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = out.writeStream
          .outputMode("update").format("memory").queryName(name).start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(name).orderBy("user_id", "s_start")
    })
  )

  // Streaming result: rows-only check; asserted equal to the batch
  // session_window query in QueryInventorySpec.
  override def oracle: Map[String, String] = Map()
}
