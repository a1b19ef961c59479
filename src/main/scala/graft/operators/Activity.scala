package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Activity & composition reports (round 8, batch 12): the daily
  * new-vs-returning split, DAU/MAU stickiness, knee-point detection on
  * the coverage curve, the missingness co-occurrence histogram, and
  * share-of-parent hierarchy rollups. All five carry full DuckDB
  * oracles. Exact int64 counting with terminal divisions throughout;
  * the knee is an exact-integer argmax (cum·V − k·total scaled
  * distance), so no floating-point comparison ever picks the winner.
  */
object Activity extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- daily new vs returning users (the growth-accounting
      // split): a user's first-ever event day marks them "new" that
      // day, "returning" after. Per-(user, day) presence and the
      // per-user first day reduce off the SAME user-keyed aggregate
      // shape (both map-side combinable); the join is on the natural
      // user key; the day rollup is time-sized. ---
      "q_new_returning" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"))
        val perDay = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
        val first = perDay.groupBy("user_id").agg(min("day").as("d0"))
        perDay.join(first, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("n_active"),
            sum((col("day") === col("d0")).cast("long")).as("n_new"),
            sum((col("day") =!= col("d0")).cast("long"))
              .as("n_returning"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_active"), col("n_new"), col("n_returning"))
          .orderBy("day")
      }),

      // --- DAU/MAU stickiness per day: daily active users over the
      // calendar month's active users — the engagement ratio product
      // teams watch. Exact distinct counts from per-(user, day) and
      // per-(user, month) dedup aggregates (both natural-key shuffles);
      // the O(months) MAU relation broadcasts onto the O(days) DAU
      // relation. ---
      "q_stickiness" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"),
            date_format(col("ts"), "yyyy-MM").as("mon"))
        val dau = ev.select("user_id", "day").distinct()
          .groupBy("day").agg(count(lit(1)).as("dau"))
        val mau = ev.select("user_id", "mon").distinct()
          .groupBy("mon").agg(count(lit(1)).as("mau"))
        dau
          .withColumn("mon", date_format(col("day"), "yyyy-MM"))
          .join(broadcast(mau), "mon")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("mau"),
            (col("dau").cast("double") / col("mau")).as("stickiness"))
          .orderBy("day")
      }),

      // --- behavioral-diversity histogram (round 9): each user's
      // event-type entropy in the integer floor-log2 device (hb =
      // Σ c_t·bits(n div c_t), so hb div n ∈ {0..log2(types)} — exact
      // int64, zero libm), then the census of users per diversity band
      // — single-type loyalists vs broad explorers, the segmentation
      // cut per-user personalization starts from. Two keyed reductions
      // ((user, type) → user), O(log types) output. ---
      "q_user_entropy_hist" -> ((s, d) => {
        val cells = table(s, d, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("c"))
        val totals = cells.groupBy("user_id")
          .agg(sum("c").as("n"), count(lit(1)).as("n_types"))
        val per = cells.join(totals, "user_id")
          .select(col("user_id"), col("n"), col("n_types"),
            (col("c") *
              (length(bin(expr("n div c"))) - 1).cast("long"))
              .as("contrib"))
          .groupBy("user_id")
          .agg(max("n").as("n"), max("n_types").as("n_types"),
            sum("contrib").as("hb"))
        per
          .groupBy(expr("hb div n").as("h_band"))
          .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"),
            (sum("n_types").cast("double") / count(lit(1)))
              .as("mean_types"))
          .orderBy("h_band")
      }),

      // --- DAU growth accounting (round 9): every active (user, day)
      // classifies as NEW (first day ever), RETAINED (also active
      // yesterday), or RESURRECTED (returning after a gap), and a user
      // CHURNS on the day after an activity day with no follow-up —
      // the product-growth ledger new+resurrected−churned that
      // explains every DAU move. One distinct (user, day) reduction,
      // two per-user lag/lead windows, two O(days) rollups joined
      // full-outer; churn days past the observation window are dropped
      // against a broadcast max-day row. ---
      "q_growth_accounting" -> ((s, d) => {
        val active = table(s, d, "events")
          .select(col("user_id"),
            date_trunc("day", col("ts")).as("day"))
          .distinct()
        val wu = Window.partitionBy("user_id").orderBy("day")
        val cls = active
          .withColumn("prev", lag("day", 1).over(wu))
          .withColumn("nxt", lead("day", 1).over(wu))
        val daily = cls.groupBy("day").agg(
          sum(col("prev").isNull.cast("long")).as("n_new"),
          sum((col("prev").isNotNull &&
            datediff(col("day"), col("prev")) === 1).cast("long"))
            .as("n_retained"),
          sum((col("prev").isNotNull &&
            datediff(col("day"), col("prev")) > 1).cast("long"))
            .as("n_resurrected"))
        val churn = cls
          .filter(col("nxt").isNull ||
            datediff(col("nxt"), col("day")) > 1)
          .select(date_add(col("day"), 1).cast("timestamp").as("day"))
          .groupBy("day").agg(count(lit(1)).as("n_churned"))
        val maxDay = active.agg(max("day").as("maxd"))
        daily.join(churn, Seq("day"), "full_outer")
          .crossJoin(broadcast(maxDay))
          .filter(col("day") <= col("maxd"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .orderBy("day")
      }),

      // --- user-activity distribution (round 9): the log2-bucketed
      // events-per-user histogram — the heavy-tail readout behind
      // every per-user state/quota decision (how many users fall in
      // the 2^k..2^(k+1) activity band, what share of EVENTS the band
      // carries). Per-user counts reduce first (the only corpus
      // shuffle); the bucket is the integer floor-log2 device
      // (length(bin(c)) - 1, zero libm); output is O(log n) rows
      // forever. ---
      "q_activity_hist" -> ((s, d) => {
        val perUser = table(s, d, "events")
          .groupBy("user_id").agg(count(lit(1)).as("c"))
        val tot = perUser.agg(sum("c").as("te"),
          count(lit(1)).as("tu"))
        perUser
          .groupBy((length(bin(col("c"))) - 1).cast("long").as("log2_bkt"))
          .agg(count(lit(1)).as("n_users"), sum("c").as("n_events"),
            min("c").as("min_events"), max("c").as("max_events"))
          .crossJoin(broadcast(tot))
          .select(col("log2_bkt"), col("n_users"), col("n_events"),
            col("min_events"), col("max_events"),
            (col("n_users").cast("double") / col("tu")).as("user_share"),
            (col("n_events").cast("double") / col("te")).as("event_share"))
          .orderBy("log2_bkt")
      }),

      // --- knee-point detection on the bigram coverage curve (the
      // elbow rule that picks a vocabulary/cache size): the rank k
      // whose cumulative-coverage point lies farthest above the
      // (0,0)→(V,1) chord. The distance argmax is EXACT-INTEGER —
      // maximize cum·V − k·total (ties → smallest k via a struct max
      // with negated rank) — and the vocabulary-sized rank/cumsum
      // windows are GONE: within a tie group (count c, ranks
      // off+1..off+m) the score cum(k)·V − k·total is LINEAR in k, so
      // its max sits at a group endpoint; each group emits its two
      // endpoint candidates and one tiny aggregate picks the global
      // winner. The only window is the exclusive prefix-sum over the
      // O(distinct counts) tie-group relation (the q_dense_ids
      // discipline). Bit-identical to the global-rank spelling (the
      // struct max orders (score, −k), and within a group a linear
      // score's max-then-smallest-k is always an endpoint). ---
      "q_knee_point" -> ((s, d) => {
        val grams = table(s, d, "documents")
          .select(graft.functions.NGramGenerator(
            split(col("text"), " "), 2).alias("gram"))
          .groupBy("gram").agg(count(lit(1)).as("c"))
        val tot = grams.agg(sum("c").as("total"),
          count(lit(1)).as("vocab"))
        val wb = Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val groups = grams.groupBy("c").agg(count(lit(1)).as("m"))
          .withColumn("off", coalesce(sum("m").over(wb), lit(0L)))
          .withColumn("cumoff",
            coalesce(sum(col("c") * col("m")).over(wb), lit(0L)))
          .crossJoin(broadcast(tot))
        def candAt(k: Column): Column = {
          val cum = col("cumoff") + col("c") * (k - col("off"))
          struct((cum * col("vocab") - k * col("total")).as("score"),
            (-k).as("nrk"), cum.as("cum"), col("total"), col("vocab"))
        }
        groups
          .select(greatest(candAt(col("off") + 1),
            candAt(col("off") + col("m"))).as("cand"))
          .agg(max(col("cand")).as("m"))
          .select((-col("m.nrk")).as("knee_k"), col("m.vocab").as("vocab"),
            col("m.score").as("score"),
            (col("m.cum").cast("double") / col("m.total"))
              .as("knee_coverage"))
      }),

      // --- missingness co-occurrence histogram: three md5-gated
      // "missing" flags (balance 1/8, phone 1/16, segment 1/16 —
      // deterministic, reproducible) roll into a bitmask pattern and
      // the per-pattern census — the first diagnostic of whether
      // nulls cluster (MNAR) or spread independently (MCAR). Pure
      // map-side pattern assignment; O(8) output. ---
      "q_null_patterns" -> ((s, d) => {
        def gate(salt: String, hexes: Seq[String]) =
          substring(md5(concat(lit(salt), col("c_custkey").cast("string"))),
            1, 1).isin(hexes: _*)
        val c = table(s, d, "customer")
          .select(gate("nb", Seq("0", "1")).cast("long").as("mb"),
            gate("np", Seq("0")).cast("long").as("mp"),
            gate("ns", Seq("0")).cast("long").as("ms"))
        val tot = c.agg(count(lit(1)).as("n"))
        c.groupBy((col("mb") * 4 + col("mp") * 2 + col("ms"))
            .as("pattern"))
          .agg(count(lit(1)).as("n_rows"),
            max("mb").as("miss_bal"), max("mp").as("miss_phone"),
            max("ms").as("miss_seg"))
          .crossJoin(broadcast(tot))
          .select(col("pattern"), col("miss_bal"), col("miss_phone"),
            col("miss_seg"), col("n_rows"),
            (col("n_rows").cast("double") / col("n")).as("share"))
          .orderBy("pattern")
      }),

      // --- share-of-parent hierarchy rollup (region → nation):
      // each nation's customer count and balance as a share of its
      // region, and each region's share of the total — the
      // drill-down report a BI layer derives from one fact scan.
      // Exact decimal balance sums; the region and global totals are
      // O(regions) relations broadcast back onto the nation rows;
      // shares are terminal divisions. ---
      "q_share_of_parent" -> ((s, d) => {
        val c = table(s, d, "customer")
          .join(table(s, d, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .join(table(s, d, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name"), col("n_name"),
            dec(col("c_acctbal")).as("bal"))
        val nat = c.groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"), sum("bal").as("bal"))
        val reg = nat.groupBy("r_name")
          .agg(sum("n_cust").as("r_cust"), sum("bal").as("r_bal"))
        val tot = reg.agg(sum("r_cust").as("t_cust"))
        nat.join(broadcast(reg), "r_name")
          .crossJoin(broadcast(tot))
          .select(col("r_name"), col("n_name"), col("n_cust"),
            col("bal").cast("double").as("bal"),
            (col("n_cust").cast("double") / col("r_cust"))
              .as("share_of_region"),
            (col("r_cust").cast("double") / col("t_cust"))
              .as("region_share"))
          .orderBy("r_name", "n_name")
      }),

      // --- rolling 7-day active users (round 10): per day, DAU and
      // the TRAILING-7-day distinct-user count plus their ratio — the
      // engagement readout q_stickiness reports at calendar-month
      // grain, here as the sliding window product teams actually
      // watch. Rolling DISTINCT does not decompose into a window
      // aggregate, so each (user, day) contributes itself to the 7
      // window END days it can appear in (a bounded ×7 map-side
      // explode of the O(users·days) distinct relation) and one
      // distinct count per end-day finishes it — no window function,
      // no self-join, exact counts. ---
      "q_rolling_dau7" -> ((s, d) => {
        val ud = table(s, d, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")).cast("long").as("day"))
          .distinct()
        val bounds = ud.agg(min("day").as("lo"), max("day").as("hi"))
        val dau = ud.groupBy("day")
          .agg(countDistinct("user_id").as("dau"))
        val wau = ud
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("day"))
          .crossJoin(broadcast(bounds))
          .filter(col("day") <= col("hi"))
          .groupBy("day")
          .agg(countDistinct("user_id").as("wau7"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau7"),
            (col("dau").cast("double") / col("wau7")).as("stickiness7"))
          .orderBy("day")
      }),

      // --- discrete-time churn hazard (round 10): for each tenure
      // week t, the share of still-active users who make week t their
      // LAST — the retention curve's derivative, which localizes WHEN
      // users quit where q_cohort_retention only shows that they did.
      // Users active in the final observed week are censored (still
      // alive), not churned — the Kaplan-Meier discipline
      // (q_survival_km) on the activity stream. The corpus reduces to
      // one (first, last) week pair per user, then to the O(weeks)
      // tenure grid; at-risk counts are a suffix prefix-sum over that
      // bounded calendar domain; hazard is one exact-count division
      // per row. ---
      "q_churn_hazard" -> ((s, d) => {
        val per = table(s, d, "events")
          .select(col("user_id"),
            expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') " +
              "AS BIGINT) div 7").as("wk"))
          .groupBy("user_id")
          .agg(min("wk").as("fw"), max("wk").as("lw"))
        val mx = per.agg(max("lw").as("maxw"))
        val grid = per.crossJoin(broadcast(mx))
          .select((col("lw") - col("fw")).as("tenure"),
            (col("lw") < col("maxw")).cast("long").as("ended"))
          .groupBy("tenure")
          .agg(count(lit(1)).as("n_last"), sum("ended").as("churned"))
        val ws = Window.orderBy(col("tenure").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .withColumn("at_risk", sum("n_last").over(ws))
          .select(col("tenure").as("tenure_weeks"), col("at_risk"),
            col("churned"),
            (col("churned").cast("double") / col("at_risk"))
              .as("hazard"))
          .orderBy("tenure_weeks")
      })
    )

  override def oracle: Map[String, String] = Map(

    "q_rolling_dau7" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |b AS (SELECT MAX(day) AS hi FROM ud),
        |dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT e.day,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
        |  FROM (SELECT user_id, day + g.x AS day
        |        FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS x) g)
        |    e CROSS JOIN b
        |  WHERE e.day <= b.hi GROUP BY 1)
        |SELECT day, dau, wau7,
        |  CAST(dau AS DOUBLE) / wau7 AS stickiness7
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    "q_churn_hazard" ->
      """WITH per AS (SELECT user_id,
        |    MIN(CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) // 7) AS fw,
        |    MAX(CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) // 7) AS lw
        |  FROM events GROUP BY 1),
        |mx AS (SELECT MAX(lw) AS maxw FROM per),
        |grid AS (SELECT lw - fw AS tenure,
        |    CAST(COUNT(*) AS BIGINT) AS n_last,
        |    CAST(SUM(CASE WHEN lw < maxw THEN 1 ELSE 0 END) AS BIGINT)
        |      AS churned
        |  FROM per CROSS JOIN mx GROUP BY 1)
        |SELECT tenure AS tenure_weeks,
        |  CAST(SUM(n_last) OVER (ORDER BY tenure DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS at_risk,
        |  churned,
        |  CAST(churned AS DOUBLE) /
        |    SUM(n_last) OVER (ORDER BY tenure DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS hazard
        |FROM grid ORDER BY tenure_weeks""".stripMargin,

    "q_user_entropy_hist" ->
      """WITH cells AS (SELECT user_id, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM cells GROUP BY 1),
        |p AS (SELECT cells.user_id, MAX(n) AS n,
        |    MAX(n_types) AS n_types,
        |    CAST(SUM(c * CAST(length(bin(n // c)) - 1 AS BIGINT))
        |      AS BIGINT) AS hb
        |  FROM cells JOIN t ON t.user_id = cells.user_id
        |  GROUP BY 1)
        |SELECT CAST(hb // n AS BIGINT) AS h_band,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(SUM(n_types) AS DOUBLE) / COUNT(*) AS mean_types
        |FROM p GROUP BY 1 ORDER BY h_band""".stripMargin,

    "q_growth_accounting" ->
      """WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        |  FROM events),
        |c AS (SELECT user_id, day, lag(day) OVER w AS prev,
        |    lead(day) OVER w AS nxt
        |  FROM a WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |dd AS (SELECT day,
        |    CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(SUM(CASE WHEN prev IS NOT NULL
        |      AND date_diff('day', prev, day) = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN prev IS NOT NULL
        |      AND date_diff('day', prev, day) > 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected
        |  FROM c GROUP BY 1),
        |ch AS (SELECT day + INTERVAL 1 DAY AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM c WHERE nxt IS NULL OR date_diff('day', day, nxt) > 1
        |  GROUP BY 1),
        |m AS (SELECT MAX(day) AS maxd FROM a)
        |SELECT strftime(COALESCE(dd.day, ch.day), '%Y-%m-%d') AS day,
        |  COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM dd FULL OUTER JOIN ch ON ch.day = dd.day CROSS JOIN m
        |WHERE COALESCE(dd.day, ch.day) <= maxd
        |ORDER BY day""".stripMargin,

    "q_activity_hist" ->
      """WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS te,
        |    CAST(COUNT(*) AS BIGINT) AS tu FROM pu),
        |g AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS log2_bkt,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS n_events,
        |    MIN(c) AS min_events, MAX(c) AS max_events
        |  FROM pu GROUP BY 1)
        |SELECT log2_bkt, n_users, n_events, min_events, max_events,
        |  CAST(n_users AS DOUBLE) / tu AS user_share,
        |  CAST(n_events AS DOUBLE) / te AS event_share
        |FROM g CROSS JOIN t ORDER BY log2_bkt""".stripMargin,
    "q_new_returning" ->
      """WITH pd AS (SELECT user_id, CAST(ts AS DATE) AS day
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT user_id, MIN(day) AS d0 FROM pd GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN day <> d0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning
        |FROM pd JOIN f USING (user_id)
        |GROUP BY day ORDER BY day""".stripMargin,

    "q_stickiness" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |mu AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS mon
        |  FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM du GROUP BY day),
        |mau AS (SELECT mon, CAST(COUNT(*) AS BIGINT) AS mau
        |  FROM mu GROUP BY mon)
        |SELECT strftime(day, '%Y-%m-%d') AS day, dau, mau,
        |  CAST(dau AS DOUBLE) / mau AS stickiness
        |FROM dau JOIN mau ON strftime(day, '%Y-%m') = mon
        |ORDER BY day""".stripMargin,

    "q_knee_point" ->
      """WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
        |         for i in range(1, len(tk))]) AS gram FROM d),
        |v AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM g GROUP BY gram),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS vocab FROM v),
        |r AS (SELECT
        |    CAST(row_number() OVER (ORDER BY c DESC, gram) AS BIGINT)
        |      AS rk,
        |    CAST(SUM(c) OVER (ORDER BY c DESC, gram
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM v),
        |sc AS (SELECT rk, cum, total, vocab,
        |    cum * vocab - rk * total AS score
        |  FROM r CROSS JOIN tot),
        |best AS (SELECT rk, cum, total, vocab, score,
        |    row_number() OVER (ORDER BY score DESC, rk) AS b
        |  FROM sc)
        |SELECT rk AS knee_k, vocab, score,
        |  CAST(cum AS DOUBLE) / total AS knee_coverage
        |FROM best WHERE b = 1""".stripMargin,

    "q_null_patterns" ->
      """WITH c AS (SELECT
        |    CAST(substr(md5('nb' || CAST(c_custkey AS VARCHAR)), 1, 1)
        |      IN ('0', '1') AS BIGINT) AS mb,
        |    CAST(substr(md5('np' || CAST(c_custkey AS VARCHAR)), 1, 1)
        |      = '0' AS BIGINT) AS mp,
        |    CAST(substr(md5('ns' || CAST(c_custkey AS VARCHAR)), 1, 1)
        |      = '0' AS BIGINT) AS ms
        |  FROM customer),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c)
        |SELECT CAST(mb * 4 + mp * 2 + ms AS BIGINT) AS pattern,
        |  MAX(mb) AS miss_bal, MAX(mp) AS miss_phone,
        |  MAX(ms) AS miss_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS DOUBLE) / MAX(n) AS share
        |FROM c CROSS JOIN t
        |GROUP BY 1 ORDER BY pattern""".stripMargin,

    "q_share_of_parent" ->
      """WITH c AS (SELECT r_name, n_name,
        |    CAST(c_acctbal AS DECIMAL(18,4)) AS bal
        |  FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey),
        |nat AS (SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT)
        |      AS n_cust,
        |    SUM(bal) AS bal
        |  FROM c GROUP BY 1, 2),
        |reg AS (SELECT r_name, CAST(SUM(n_cust) AS BIGINT) AS r_cust,
        |    SUM(bal) AS r_bal
        |  FROM nat GROUP BY 1),
        |tot AS (SELECT CAST(SUM(r_cust) AS BIGINT) AS t_cust FROM reg)
        |SELECT nat.r_name, n_name, n_cust,
        |  CAST(nat.bal AS DOUBLE) AS bal,
        |  CAST(n_cust AS DOUBLE) / r_cust AS share_of_region,
        |  CAST(r_cust AS DOUBLE) / t_cust AS region_share
        |FROM nat JOIN reg ON nat.r_name = reg.r_name CROSS JOIN tot
        |ORDER BY nat.r_name, n_name""".stripMargin
  )
}
