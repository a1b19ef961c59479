package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Association & coverage statistics (round 8, batch 14): directed-graph
  * reciprocity, the Poisson dispersion test, Kendall's tau between
  * rankings, weekday seasonality strength, Chapman capture-recapture
  * coverage estimation, and the 2×2 odds ratio. All six carry full
  * DuckDB oracles. Exact int64 counting with terminal fixed-tree
  * divisions; the only cross-group double sums (seasonality SSB terms,
  * 7 groups) go through DECIMAL(18,4).
  */
object Association extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- reciprocity of the directed word graph: the share of edges
      // whose reverse also occurs ("a b" and "b a") — the texture
      // statistic separating citation-like DAGs from conversation-like
      // graphs (and a predictor of whether an undirected projection
      // halves the edge count). Distinct edges join their reversal —
      // one vocabulary-keyed self-join, self-loops excluded. ---
      "q_graph_recip" -> ((s, d) => {
        val e = Relevance.wordEdges(s, d).select("src", "dst")
          .filter(col("src") =!= col("dst"))
        val r = e.select(col("dst").as("src"), col("src").as("dst"))
          .withColumn("hasRev", lit(1L))
        e.join(r, Seq("src", "dst"), "left")
          .agg(count(lit(1)).as("n_edges"),
            sum(coalesce(col("hasRev"), lit(0L))).as("n_recip"))
          .select(col("n_edges"), col("n_recip"),
            (col("n_recip").cast("double") / col("n_edges"))
              .as("reciprocity"))
      }),

      // --- Poisson dispersion test on hourly arrival counts per type:
      // χ² = Σ(x−x̄)²/x̄ = (n·Σx² − S²)/(n·x̄)… collapsed to the
      // EXACT-integer form (n·Σx² − S²)/S with ONE division — "are
      // arrivals Poisson, scheduled (under-dispersed) or bursty
      // (over-dispersed)?", the q_order_gap_cv companion on counts
      // instead of gaps. The corpus reduces to the O(hours) grid
      // first. ---
      "q_poisson_disp" -> ((s, d) => {
        val hours = table(s, d, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("hr"))
          .agg(count(lit(1)).as("x"))
        hours.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n").as("n_hours"),
            (col("sx").cast("double") / col("n")).as("mean"),
            ((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") / col("sx")).as("chi2"),
            (col("n") - 1L).as("df"),
            ((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") / col("sx") / (col("n") - 1L).cast("double"))
              .as("vmr"))
          .orderBy("event_type")
      }),

      // --- Kendall's tau between the two halves' token rankings (the
      // pair-concordance complement of q_rank_rbo: RBO weights the
      // top, tau counts inversions): over tokens in BOTH top-20 lists,
      // concordant minus discordant pairs stays exact int64; tau-a is
      // one division by m(m−1)/2. The pair join is O(m²) over m ≤ 20
      // shared tokens. Each half's top-20 is a TakeOrdered
      // (per-partition heaps + driver merge — the q_vocab_drift
      // spelling); the rank window runs AFTER the limit, over 20
      // surviving rows, bounded by k forever. (The previous spelling
      // filtered on a CAST of a vocabulary-wide row_number, which
      // defeats Spark's InferWindowGroupLimit rescue — a
      // vocabulary-sized single-partition sort at scale.) ---
      "q_kendall_tau" -> ((s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 2 === 1).cast("long").as("h"))
        def top20(h: Int): DataFrame = {
          val wr = Window.orderBy(col("c").desc, col("w").asc)
          docs.filter(col("h") === h)
            .select(explode(split(col("text"), " ")).as("w"))
            .groupBy("w").agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("w").asc).limit(20)
            .select(col("w"), col("c"),
              row_number().over(wr).cast("long").as("rk"))
        }
        val joint = top20(0).select(col("w"), col("rk").as("ra"))
          .join(top20(1).select(col("w"), col("rk").as("rb")), "w")
        val a = joint.select(col("w").as("wa"), col("ra").as("ra1"),
          col("rb").as("rb1"))
        val b = joint.select(col("w").as("wb"), col("ra").as("ra2"),
          col("rb").as("rb2"))
        val pairs = a.join(b, col("wa") < col("wb"))
          .select((((col("ra1") - col("ra2")) * (col("rb1") - col("rb2")))
            > 0L).cast("long").as("conc"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            sum("conc").as("concordant"))
          .select(col("n_pairs"), col("concordant"),
            (col("n_pairs") - col("concordant")).as("discordant"),
            ((lit(2L) * col("concordant") - col("n_pairs")).cast("double")
              / col("n_pairs")).as("tau"))
      }),

      // --- weekday seasonality strength per event type: the share of
      // daily-count variance explained by day-of-week (the ANOVA R²
      // that decides whether a forecaster needs the seasonal term —
      // q_holt_winters' admission test). SST is exact int64; the 7
      // per-weekday SSB terms S_g²/n_g are one double each, summed
      // through DECIMAL(18,4). ---
      "q_seasonality_strength" -> ((s, d) => {
        val g = table(s, d, "events")
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("dow", expr("day % 7"))
        val dows = g.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("ng"), sum("cnt").as("sg"))
          .withColumn("term",
            col("sg").cast("double") * col("sg") / col("ng"))
        val per = g.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cnt").as("st"),
            sum(col("cnt") * col("cnt")).as("stt"))
        dows.groupBy("event_type")
          .agg(sum(dec(col("term"))).cast("double").as("sterm"))
          .join(broadcast(per), "event_type")
          .select(col("event_type"), col("n").as("n_days"),
            ((col("sterm") -
              col("st").cast("double") * col("st") / col("n")) /
              (col("stt").cast("double") -
                col("st").cast("double") * col("st") / col("n")))
              .as("strength"))
          .orderBy("event_type")
      }),

      // --- day-of-week seasonal ADJUSTMENT (round 13): the operator
      // q_seasonality_strength motivates — divide each day's count by
      // its weekday factor (mean_dow / mean_overall) so trend readers
      // see the deseasonalized series. Exact cross-multiplied form:
      // factor = sx_dow·n_days / (n_dow·sx_tot) and adjusted =
      // x·n_dow·sx_tot / (sx_dow·n_days) — integer products, one IEEE
      // division each at render. O(days) grid + an O(7) factor
      // relation broadcast back. ---
      "q_dow_adjust" -> ((s, d) => {
        val g = table(s, d, "events")
          .groupBy(datediff(col("ts").cast("date"),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", expr("day % 7"))
        val dows = g.groupBy("dow")
          .agg(count(lit(1)).as("n_dow"), sum("x").as("sx_dow"))
        val tot = g.agg(count(lit(1)).as("n_days"),
          sum("x").as("sx_tot"))
        g.join(broadcast(dows), "dow")
          .crossJoin(broadcast(tot))
          .select(col("day"), col("dow"), col("x"),
            ((col("sx_dow") * col("n_days")).cast("double") /
              (col("n_dow") * col("sx_tot")).cast("double"))
              .as("dow_factor"),
            ((col("x") * col("n_dow") * col("sx_tot")).cast("double") /
              (col("sx_dow") * col("n_days")).cast("double"))
              .as("adjusted"))
          .orderBy("day")
      }),

      // --- Chapman capture-recapture estimate of the active-user
      // population from two deterministic md5 "samples" (the coverage
      // estimator a pipeline uses when no single source sees everyone
      // — do our logs capture the whole population?). N̂ =
      // (n1+1)(n2+1)/(m+1) − 1 from three exact counts; the true user
      // count rides along as the audit column. ---
      "q_capture_recapture" -> ((s, d) => {
        val u = table(s, d, "events")
          .select(col("user_id")).distinct()
          .select(col("user_id"),
            substring(md5(concat(lit("s1"), col("user_id").cast("string"))),
              1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7").as("a"),
            substring(md5(concat(lit("s2"), col("user_id").cast("string"))),
              1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7").as("b"))
        u.agg(count(lit(1)).as("n_true"),
            sum(col("a").cast("long")).as("n1"),
            sum(col("b").cast("long")).as("n2"),
            sum((col("a") && col("b")).cast("long")).as("m"))
          .select(col("n_true"), col("n1"), col("n2"), col("m"),
            (((col("n1") + 1L) * (col("n2") + 1L)).cast("double") /
              (col("m") + 1L) - lit(1.0)).as("n_hat"))
      }),

      // --- 2×2 odds ratio and risk ratio: does clicking associate
      // with purchasing at the user grain? One user-keyed conditional
      // aggregate builds (exposed, outcome); the four cells are exact
      // int64; OR = ad/bc and RR are fixed division trees — the
      // epidemiology-style association readout q_chisq_test's
      // significance lacks. ---
      "q_odds_ratio" -> ((s, d) => {
        // heavy-clicker (≥14) vs heavy-purchaser (≥14): thresholds at
        // the per-user median so all four cells are populated (every
        // user has SOME clicks — presence would degenerate the table)
        val per = table(s, d, "events")
          .groupBy(col("user_id"))
          .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("ex"),
            (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              >= 14L).as("oc"))
        def cell(e: Boolean, o: Boolean, nm: String) =
          sum(when(col("ex") === e && col("oc") === o, 1L).otherwise(0L))
            .as(nm)
        per.agg(cell(e = true, o = true, "a"),
            cell(e = true, o = false, "b"),
            cell(e = false, o = true, "c"),
            cell(e = false, o = false, "dd"))
          .select(col("a"), col("b"), col("c"), col("dd"),
            (col("a").cast("double") * col("dd") /
              (col("b").cast("double") * col("c"))).as("odds_ratio"),
            ((col("a").cast("double") / (col("a") + col("b"))) /
              (col("c").cast("double") / (col("c") + col("dd"))))
              .as("risk_ratio"))
      })
    )

  override def oracle: Map[String, String] = Map(
    "q_dow_adjust" ->
      """WITH g AS (SELECT CAST(date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |gd AS (SELECT day, x, day % 7 AS dow FROM g),
        |dw AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_dow,
        |    CAST(SUM(x) AS BIGINT) AS sx_dow FROM gd GROUP BY dow),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS BIGINT) AS sx_tot FROM gd)
        |SELECT day, dow, x,
        |  CAST(sx_dow * n_days AS DOUBLE) /
        |    CAST(n_dow * sx_tot AS DOUBLE) AS dow_factor,
        |  CAST(x * n_dow * sx_tot AS DOUBLE) /
        |    CAST(sx_dow * n_days AS DOUBLE) AS adjusted
        |FROM gd JOIN dw USING (dow) CROSS JOIN tt
        |ORDER BY day""".stripMargin,

    "q_graph_recip" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
        |         for i in range(1, len(tk))]) AS gram FROM t),
        |e0 AS (SELECT gram FROM g GROUP BY gram),
        |e AS (SELECT string_split(gram, ' ')[1] AS src,
        |        string_split(gram, ' ')[2] AS dst FROM e0),
        |ed AS (SELECT src, dst FROM e WHERE src <> dst)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM ed r
        |      WHERE r.src = ed.dst AND r.dst = ed.src)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_recip,
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM ed r
        |      WHERE r.src = ed.dst AND r.dst = ed.src)
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS reciprocity
        |FROM ed""".stripMargin,

    "q_poisson_disp" ->
      """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM h GROUP BY event_type)
        |SELECT event_type, n AS n_hours,
        |  CAST(sx AS DOUBLE) / n AS mean,
        |  CAST(n * sxx - sx * sx AS DOUBLE) / sx AS chi2,
        |  n - 1 AS df,
        |  CAST(n * sxx - sx * sx AS DOUBLE) / sx /
        |    CAST(n - 1 AS DOUBLE) AS vmr
        |FROM m ORDER BY event_type""".stripMargin,

    "q_kendall_tau" ->
      """WITH tk AS (SELECT CAST(doc_id % 2 = 1 AS BIGINT) AS h,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT h, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |rk AS (SELECT h, w,
        |    CAST(row_number() OVER (PARTITION BY h
        |      ORDER BY c DESC, w) AS BIGINT) AS rk
        |  FROM cnt),
        |j AS (SELECT a.w, a.rk AS ra, b.rk AS rb
        |  FROM (SELECT w, rk FROM rk WHERE h = 0 AND rk <= 20) a
        |  JOIN (SELECT w, rk FROM rk WHERE h = 1 AND rk <= 20) b
        |    USING (w)),
        |p AS (SELECT CAST((x.ra - y.ra) * (x.rb - y.rb) > 0 AS BIGINT)
        |    AS conc
        |  FROM j x JOIN j y ON x.w < y.w),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(conc) AS BIGINT) AS concordant FROM p)
        |SELECT n_pairs, concordant,
        |  n_pairs - concordant AS discordant,
        |  CAST(2 * concordant - n_pairs AS DOUBLE) / n_pairs AS tau
        |FROM m""".stripMargin,

    "q_seasonality_strength" ->
      """WITH g AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |dw AS (SELECT event_type, day % 7 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(cnt) AS BIGINT) AS sg
        |  FROM g GROUP BY 1, 2),
        |tb AS (SELECT event_type,
        |    CAST(SUM(CAST(CAST(sg AS DOUBLE) * sg / ng
        |      AS DECIMAL(18,4))) AS DOUBLE) AS sterm
        |  FROM dw GROUP BY event_type),
        |pt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS st,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS stt
        |  FROM g GROUP BY event_type)
        |SELECT event_type, n AS n_days,
        |  (sterm - CAST(st AS DOUBLE) * st / n) /
        |  (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
        |    AS strength
        |FROM tb JOIN pt USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_capture_recapture" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |f AS (SELECT user_id,
        |    substr(md5('s1' || CAST(user_id AS VARCHAR)), 1, 1) IN
        |      ('0','1','2','3','4','5','6','7') AS a,
        |    substr(md5('s2' || CAST(user_id AS VARCHAR)), 1, 1) IN
        |      ('0','1','2','3','4','5','6','7') AS b
        |  FROM u)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
        |  CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |    AS m,
        |  CAST((SUM(CASE WHEN a THEN 1 ELSE 0 END) + 1) *
        |       (SUM(CASE WHEN b THEN 1 ELSE 0 END) + 1) AS DOUBLE) /
        |    (SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) + 1) - 1.0
        |    AS n_hat
        |FROM f""".stripMargin,

    "q_odds_ratio" ->
      """WITH per AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) >= 14
        |      AS ex,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 14 AS oc
        |  FROM events GROUP BY user_id),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN ex AND oc THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(SUM(CASE WHEN ex AND NOT oc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN NOT ex AND oc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN NOT ex AND NOT oc THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dd
        |  FROM per)
        |SELECT a, b, c, dd,
        |  CAST(a AS DOUBLE) * dd / (CAST(b AS DOUBLE) * c)
        |    AS odds_ratio,
        |  (CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + dd))
        |    AS risk_ratio
        |FROM c""".stripMargin
  )
}
