package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing in batch form (SURVEY.md §2.C): tumbling windows
  * via `window()` and sessionization via `session_window()`. The same
  * expressions run unchanged under Structured Streaming (see
  * graft.streaming.StreamingSmoke) — watermarks are the only addition.
  *
  * Oracle note: `session_window(ts, gap)` sessions are [min_ts,
  * max_ts + gap) with a new session whenever the gap between consecutive
  * events (per key) reaches `gap` — the window range is half-open, so an
  * event landing exactly on `last + gap` starts a NEW session; the DuckDB
  * twin reproduces that with a gaps-and-islands running sum split at
  * `>= gap`.
  */
object TimeWindows extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_tumbling" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        .select(fmtTs(col("window.start")).as("hour_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type")),

    // --- hopping (sliding) window: 1-hour windows every 30 minutes —
    // each event lands in exactly 2 overlapping windows. Spark expands
    // the event into its windows with a generator before the hash
    // aggregate, so this is one shuffle keyed on (window, type), same
    // as tumbling — the 2x row fan-out happens map-side. ---
    "q_window_hopping" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        .select(fmtTs(col("window.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    "q_window_session" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        .select(col("user_id"),
          fmtTs(col("session_window.start")).as("s_start"),
          fmtTs(col("session_window.end")).as("s_end"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")),

    // --- sessionization with per-session stats (gaps-and-islands): the
    // explicit-session-id sibling of q_window_session — besides the
    // span, downstream funnel/LTV models need WHICH session each event
    // fell in plus entry/exit actions. The >=30-min break flags and
    // their running sum are two functions over ONE per-user window
    // (single sort, streams through the frame); entry/exit types are
    // struct-extremum aggregates over the unique (ts, event_id) key —
    // never a row_number pass. Reads the user_id-bucketed log: the
    // window AND the (user, sid) aggregate both inherit the scan
    // layout, so the whole query is exchange-free. ---
    "q_session_stats" -> ((s, d) => {
      val wl = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val run = wl.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("brk",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(wl)) >= 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("brk").over(run))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("dur_us"),
          min(struct(col("ts"), col("event_id"), col("event_type")))
            .getField("event_type").as("first_type"),
          max(struct(col("ts"), col("event_id"), col("event_type")))
            .getField("event_type").as("last_type"))
        .orderBy("user_id", "sid")
    }),

    // --- two-sided interval-overlap join (banded): per-user sessions
    // overlapped against error-burst incident windows — "which sessions
    // ran while the system was degraded", the attribution/ads-style
    // interval join the range/asof family doesn't cover (BOTH sides are
    // intervals). Scale shape: a naive s_start<=i_end AND i_start<=s_end
    // theta join is a nested loop; instead sessions explode across the
    // hour buckets they span (<=2 here — the band width is the interval
    // length over the band size, the q_join_range discipline
    // generalized to two sides) and equi-join on the bucket with the
    // overlap predicate as a residual. Incidents are O(active hours) —
    // a time-not-data-sized relation — so they broadcast; sessions come
    // off the user_id-bucketed log and their aggregate inherits the
    // scan layout. Incidents live inside one hour by construction, so
    // bucket matches are unique and no post-join distinct is needed. ---
    "q_join_interval" -> ((s, d) => {
      val wl = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val run = wl.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val sess = Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("brk",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(wl)) >= 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("brk").over(run))
        .groupBy("user_id", "sid")
        .agg(min(unix_micros(col("ts"))).as("s_start"),
          max(unix_micros(col("ts"))).as("s_end"))
      val inc = table(s, d, "events")
        .filter(col("event_type") === "error")
        .select(expr("unix_micros(ts) div 3600000000").as("h"),
          unix_micros(col("ts")).as("us"))
        .groupBy("h")
        .agg(min(col("us")).as("i_start"), max(col("us")).as("i_end"),
          count(lit(1)).as("n_err"))
        .filter(col("n_err") >= 2)
      sess
        .withColumn("b", explode(sequence(
          expr("s_start div 3600000000"), expr("s_end div 3600000000"))))
        .join(broadcast(inc), col("b") === col("h") &&
          col("s_start") <= col("i_end") && col("i_start") <= col("s_end"))
        .groupBy("user_id", "sid", "s_start")
        .agg(count(lit(1)).as("n_inc"), sum(col("n_err")).as("n_err"))
        .orderBy("user_id", "sid")
    }),

    // --- windowed event dedup: keep the FIRST event per (user, 5-min
    // tumbling window) — the standard client-retry / at-least-once
    // collapse before sessionization. Reads the user_id-bucketed event
    // log (Advanced.eventsByUser): bucketing on the user prefix
    // satisfies the (user, window) clustering, so there is no exchange —
    // just a per-partition sort; the window fan-in is map-side (window()
    // assigns the bucket before any movement). The same
    // dropDuplicates-shaped logic runs under Structured Streaming with a
    // watermark bounding state (see q_streaming_dedup); this is the
    // batch/backfill twin. ---
    "q_window_dedup" -> ((s, d) => {
      val w = Window
        .partitionBy(col("user_id"), col("win"))
        .orderBy(col("ts"), col("event_id"))
      Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), window(col("ts"), "5 minutes").as("win"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), fmtTs(col("win.start")).as("w_start"),
          col("event_id"), col("event_type"))
        .orderBy("user_id", "w_start")
    }),

    // --- ordered conversion funnel (view -> click -> purchase): each
    // stage is "first event of this type STRICTLY AFTER the previous
    // stage" — a per-user min-aggregate joined back, three times. Every
    // join/aggregate is keyed on user_id and reads the user_id-bucketed
    // event log, so ALL stages inherit the scan's bucket layout — no
    // exchange anywhere — and per-user state is one timestamp per stage
    // regardless of event volume: the funnel shape that holds on an
    // unbounded event history. ---
    "q_funnel" -> ((s, d) => {
      val ev = Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), fmtTs(col("t1")).as("t_view"),
          fmtTs(col("t2")).as("t_click"), fmtTs(col("t3")).as("t_purchase"),
          (lit(1L) + col("t2").isNotNull.cast("long") +
            col("t3").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    }),

    // --- time-boxed funnel: q_funnel with CONVERSION WINDOWS — the
    // click must land within 3 days of the first view and the purchase
    // within 3 days of that click, the attribution-window semantics
    // every marketing funnel actually uses (an unbounded "ever after"
    // stage overcredits). Same scale shape as q_funnel: every stage is
    // a user-keyed min-aggregate joined back on user_id (co-partitioned,
    // AQE reuses the exchange); the window bound is a pure timestamp
    // comparison pushed into the stage filter. ---
    "q_funnel_windowed" -> ((s, d) => {
      val ev = Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 3 DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 3 DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), fmtTs(col("t1")).as("t_view"),
          fmtTs(col("t2")).as("t_click"), fmtTs(col("t3")).as("t_purchase"),
          (lit(1L) + col("t2").isNotNull.cast("long") +
            col("t3").isNotNull.cast("long")).as("stage"))
        .orderBy("user_id")
    }),

    // --- per-user event deltas (lag/lead): inter-event gap in micros
    // and the next event's type — the sequence-feature primitive behind
    // dwell-time, churn, and bot-cadence signals. Reads the
    // user_id-bucketed event log, so the per-user window inherits the
    // scan layout (no exchange, one per-partition sort); state per row
    // is one neighbor — rows stream through the frame. The gap is exact
    // integer microseconds (unix_micros on both sides), never a float
    // interval. ---
    "q_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("gap_us",
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .cast("long"))
        .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
          col("gap_us"), lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "ts_s", "event_id")
    }),

    // --- window VALUE functions (first/nth/last over an explicit
    // unbounded frame): each user's first, second, and final event type
    // in one pass — the session-entry/exit feature shape. The frame
    // must be unbounded-BOTH-ways (the default RANGE..CURRENT frame
    // makes last_value just the current row); one row per user survives
    // via row_number, so the output is O(users). Reads the bucketed
    // event log: no exchange, one per-partition sort shared by all four
    // window functions. ---
    "q_win_nth" -> ((s, d) => {
      val ord = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val full = ord
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("first_type", first("event_type").over(full))
        .withColumn("second_type", nth_value(col("event_type"), 2)
          .over(full))
        .withColumn("last_type", last("event_type").over(full))
        .withColumn("n_events", count(lit(1)).over(full).cast("long"))
        .withColumn("rn", row_number().over(ord))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("first_type"), col("second_type"),
          col("last_type"), col("n_events"))
        .orderBy("user_id")
    }),

    // --- trailing-interval rolling window: per-user count/sum over the
    // last hour of EVENT TIME (a RANGE frame over unix_micros, not a
    // row-count frame — q_win_frame covers that): the rolling-metrics
    // shape behind rate limits, burst detection, and trailing-window
    // features. The frame is set-valued (all peers within the interval
    // enter regardless of tie order) and the sum is decimal-accumulated,
    // so the result is order-independent; the window reads the
    // user_id-bucketed event log — no exchange, one per-partition sort,
    // and Spark's sliding frame keeps running state (each row enters and
    // leaves the accumulator once — O(n) per partition, not O(n x
    // frame)). ---
    "q_win_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, 0L)
      Advanced.eventsByUser(s, d)
        .withColumn("n_1h", count(lit(1)).over(w).cast("long"))
        .withColumn("sum_1h", sum(dec(col("value"))).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
          col("n_1h"), col("sum_1h"))
        .orderBy("user_id", "ts_s", "event_id")
    }),

    "q_rollup_calendar" -> ((s, d) => rollupCalendarQuery(s, d)),

    // --- per-position session CTR (round 9): the product-analytics
    // readout of attention decay — at each position inside a 30-minute
    // gap session (gaps-and-islands: new-session flag → per-user
    // cumulative session id → per-session row_number), what share of
    // events are clicks vs views? Positions past 10 fold into the 10+
    // bucket so the output is O(10) forever. Rides the user_id-bucketed
    // layout: every window partitions by user (then (user, sid)), so
    // the plan carries zero hash exchange. ---
    "q_session_ctr" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val ev = Advanced.eventsByUser(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), unix_micros(col("ts")).as("us"))
        .withColumn("newsess",
          when(col("us") - lag("us", 1).over(wu) > 1800L * 1000000L ||
            lag("us", 1).over(wu).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum("newsess").over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val wp = Window.partitionBy("user_id", "sid")
        .orderBy(col("ts"), col("event_id"))
      ev.withColumn("pos",
          least(row_number().over(wp).cast("long"), lit(10L)))
        .groupBy("pos")
        .agg(count(lit(1)).as("n_events"),
          sum((col("event_type") === "view").cast("long")).as("n_views"),
          sum((col("event_type") === "click").cast("long")).as("n_clicks"))
        .withColumn("ctr",
          when(col("n_views") + col("n_clicks") > 0,
            col("n_clicks").cast("double") /
              (col("n_views") + col("n_clicks"))))
        .orderBy("pos")
    })
  )

  /** Calendar multi-grain rollup (round 9): day/week/month volume and
    * exact-decimal value totals in ONE scan via GROUPING SETS — the
    * Expand-based single-pass OLAP calendar rollup (a 3-branch union
    * would scan the corpus three times; the grouping-sets plan scans
    * once and expands rows map-side). Week truncation is ISO-Monday on
    * both engines; bucket labels render as strings so the output is a
    * plain comparable relation.
    */
  private val rollupCalendarQuery: (SparkSession, String) => DataFrame =
    (s, d) => {
      table(s, d, "events").createOrReplaceTempView("events_graft_cal")
      s.sql(
        s"""WITH e AS (SELECT
           |    date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
           |    date_format(date_trunc('week', ts), 'yyyy-MM-dd') AS week,
           |    date_format(date_trunc('month', ts), 'yyyy-MM-dd')
           |      AS month,
           |    value
           |  FROM events_graft_cal)
           |SELECT CASE WHEN day IS NOT NULL THEN 'day'
           |            WHEN week IS NOT NULL THEN 'week'
           |            ELSE 'month' END AS grain,
           |  COALESCE(day, week, month) AS bucket,
           |  COUNT(*) AS n, ${S("value")} AS total
           |FROM e GROUP BY GROUPING SETS ((day), (week), (month))
           |ORDER BY grain, bucket""".stripMargin)
    }

  override def oracle: Map[String, String] = Map(

    "q_session_ctr" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |    epoch_us(ts) AS us FROM events),
        |ns AS (SELECT *,
        |    CASE WHEN lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS newsess
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us, event_id)),
        |sd AS (SELECT *, CAST(SUM(newsess) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS sid
        |  FROM ns),
        |p AS (SELECT event_type,
        |    least(CAST(row_number() OVER (PARTITION BY user_id, sid
        |      ORDER BY us, event_id) AS BIGINT), 10) AS pos
        |  FROM sd),
        |g AS (SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_views,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clicks
        |  FROM p GROUP BY 1)
        |SELECT pos, n_events, n_views, n_clicks,
        |  CASE WHEN n_views + n_clicks > 0 THEN
        |    CAST(n_clicks AS DOUBLE) / (n_views + n_clicks) END AS ctr
        |FROM g ORDER BY pos""".stripMargin,

    "q_rollup_calendar" ->
      s"""WITH e AS (SELECT
         |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         |    strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
         |    value
         |  FROM events)
         |SELECT CASE WHEN day IS NOT NULL THEN 'day'
         |            WHEN week IS NOT NULL THEN 'week'
         |            ELSE 'month' END AS grain,
         |  COALESCE(day, week, month) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n, ${S("value")} AS total
         |FROM e GROUP BY GROUPING SETS ((day), (week), (month))
         |ORDER BY grain, bucket""".stripMargin,
    "q_win_nth" ->
      """WITH w AS (SELECT user_id,
        |    first_value(event_type) OVER fr AS first_type,
        |    nth_value(event_type, 2) OVER fr AS second_type,
        |    last_value(event_type) OVER fr AS last_type,
        |    CAST(COUNT(*) OVER fr AS BIGINT) AS n_events,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, second_type, last_type, n_events
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_win_range" ->
      s"""SELECT user_id, event_id, ${FT("ts")} AS ts_s,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
         |    AS sum_1h
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, ts_s, event_id""".stripMargin,

    "q_win_lag_lead" ->
      s"""SELECT user_id, event_id, ${FT("ts")} AS ts_s,
         |  CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT)
         |    AS gap_us,
         |  lead(event_type, 1) OVER w AS next_type
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, ts_s, event_id""".stripMargin,

    "q_window_tumbling" ->
      s"""SELECT ${FT("date_trunc('hour', ts)")} AS hour_start, event_type,
         |  COUNT(*) AS n, ${S("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY hour_start, event_type""".stripMargin,

    // each event belongs to the two 30-min-aligned starts covering it:
    // floor(ts to 30 min) and 30 min before that
    "q_window_hopping" ->
      s"""WITH h AS (
         |  SELECT make_timestamp(
         |           (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
         |            - g.s) * 1000000) AS w_start,
         |         event_type, value
         |  FROM events, (SELECT unnest([0, 1800]) AS s) g)
         |SELECT ${FT("w_start")} AS w_start, event_type,
         |  COUNT(*) AS n, ${S("value")} AS sum_value
         |FROM h GROUP BY 1, 2
         |ORDER BY w_start, event_type""".stripMargin,

    "q_join_interval" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id))
         |        >= 1800000000 THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |numbered AS (
         |  SELECT user_id, ts, event_id,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked),
         |sess AS (
         |  SELECT user_id, sid, MIN(epoch_us(ts)) AS s_start,
         |         MAX(epoch_us(ts)) AS s_end
         |  FROM numbered GROUP BY 1, 2),
         |inc AS (
         |  SELECT epoch_us(ts) // 3600000000 AS h,
         |         MIN(epoch_us(ts)) AS i_start,
         |         MAX(epoch_us(ts)) AS i_end, COUNT(*) AS n_err
         |  FROM events WHERE event_type = 'error'
         |  GROUP BY 1 HAVING COUNT(*) >= 2)
         |SELECT user_id, CAST(sid AS BIGINT) AS sid, s_start,
         |  CAST(COUNT(*) AS BIGINT) AS n_inc,
         |  CAST(SUM(n_err) AS BIGINT) AS n_err
         |FROM sess JOIN inc ON s_start <= i_end AND i_start <= s_end
         |GROUP BY 1, 2, 3 ORDER BY user_id, sid""".stripMargin,

    "q_session_stats" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER
         |        (PARTITION BY user_id ORDER BY ts, event_id))
         |        >= 1800000000 THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |numbered AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked),
         |fl AS (
         |  SELECT user_id, sid, ts, event_id, event_type,
         |    first_value(event_type) OVER w AS ft,
         |    last_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND UNBOUNDED FOLLOWING) AS lt
         |  FROM numbered
         |  WINDOW w AS (PARTITION BY user_id, sid
         |               ORDER BY ts, event_id))
         |SELECT user_id, CAST(sid AS BIGINT) AS sid,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)
         |    AS dur_us,
         |  MIN(ft) AS first_type, MIN(lt) AS last_type
         |FROM fl GROUP BY user_id, sid
         |ORDER BY user_id, sid""".stripMargin,

    "q_window_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |numbered AS (
         |  SELECT user_id, ts, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked)
         |SELECT user_id,
         |  ${FT("MIN(ts)")} AS s_start,
         |  ${FT("MAX(ts) + INTERVAL 30 MINUTE")} AS s_end,
         |  COUNT(*) AS n, ${S("value")} AS sum_value
         |FROM numbered
         |GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin,

    "q_window_dedup" ->
      s"""WITH b AS (
         |  SELECT user_id, event_id, event_type,
         |    make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT)
         |                   * 300 * 1000000) AS w_start,
         |    row_number() OVER (
         |      PARTITION BY user_id, CAST(floor(epoch(ts) / 300) AS BIGINT)
         |      ORDER BY ts, event_id) AS rn
         |  FROM events)
         |SELECT user_id, ${FT("w_start")} AS w_start, event_id, event_type
         |FROM b WHERE rn = 1
         |ORDER BY user_id, w_start""".stripMargin,

    "q_funnel" ->
      s"""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts) AS t2
         |      FROM events e JOIN v USING (user_id)
         |      WHERE e.event_type = 'click' AND e.ts > v.t1
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts) AS t3
         |      FROM events e JOIN c USING (user_id)
         |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
         |      GROUP BY e.user_id)
         |SELECT v.user_id, ${FT("t1")} AS t_view, ${FT("t2")} AS t_click,
         |  ${FT("t3")} AS t_purchase,
         |  (1 + CAST(t2 IS NOT NULL AS BIGINT)
         |     + CAST(t3 IS NOT NULL AS BIGINT)) AS stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "q_funnel_windowed" ->
      s"""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts) AS t2
         |      FROM events e JOIN v USING (user_id)
         |      WHERE e.event_type = 'click' AND e.ts > v.t1
         |        AND e.ts <= v.t1 + INTERVAL 3 DAY
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts) AS t3
         |      FROM events e JOIN c USING (user_id)
         |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
         |        AND e.ts <= c.t2 + INTERVAL 3 DAY
         |      GROUP BY e.user_id)
         |SELECT v.user_id, ${FT("t1")} AS t_view, ${FT("t2")} AS t_click,
         |  ${FT("t3")} AS t_purchase,
         |  (1 + CAST(t2 IS NOT NULL AS BIGINT)
         |     + CAST(t3 IS NOT NULL AS BIGINT)) AS stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin
  )
}
