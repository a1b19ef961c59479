package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Telemetry-analytics operators (round 7, seventh block): lead-lag
  * cross-correlation between event streams, burst-episode detection, and
  * the audience-overlap matrix. All three carry full DuckDB oracles.
  *
  * Determinism: cross-correlation rides the q_corr_matrix exact-decimal
  * moment discipline (one terminal FP division per lag); burst gates are
  * integer cross-multiplications (no mean-rate division); overlap
  * counts are exact integers with one Jaccard division per pair.
  */
object Telemetry extends QueryModule {

  /** Daily exact-decimal value totals for one event type. */
  private def dailyOf(s: SparkSession, d: String, et: String): DataFrame =
    table(s, d, "events")
      .filter(col("event_type") === et)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec(col("value"))).cast(D).as("v"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- lead-lag cross-correlation: corr(click_t, view_{t+k}) for
      // k in -3..3 — the causality screen (does one stream lead the
      // other, and by how many days?). Each series collapses to exact
      // decimal day totals first (the q_autocorr discipline); the
      // 7-lag fan-out is a map-side explode of the CLICK side joined
      // to the view side on the shifted day key (an equi join per lag
      // — never a window per lag, and never a cross join); Pearson
      // per lag comes from exact decimal sums with ONE terminal FP
      // division (q_corr_matrix). Output is 7 rows. ---
      "q_cross_corr" -> ((s, d) => {
        val x = dailyOf(s, d, "click")
          .select(col("day"), col("v").as("x"))
        val y = dailyOf(s, d, "view")
          .select(col("day").as("yday"), col("v").as("y"))
        val lagged = x
          .select(col("day"), col("x"),
            explode(sequence(lit(-3), lit(3))).as("k"))
          .withColumn("jday", expr("timestampadd(DAY, k, day)"))
          .join(y, col("jday") === col("yday"))
        val g = lagged.groupBy("k").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        def Dd(name: String) = col(name).cast("double")
        g.select(col("k").cast("long").as("k"), col("n"),
            ((Dd("n") * Dd("sxy") - Dd("sx") * Dd("sy")) /
              (sqrt(Dd("n") * Dd("sxx") - Dd("sx") * Dd("sx")) *
                sqrt(Dd("n") * Dd("syy") - Dd("sy") * Dd("sy"))))
              .as("xcorr"))
          .orderBy("k")
      }),

      // --- burst-episode detection: maximal runs of consecutive hours
      // whose event count clears 2x the type's mean hourly rate — the
      // incident/virality readout. The threshold gate is an integer
      // cross-multiplication (n·H ≥ 2·total — no mean division, no
      // epsilon); episodes are gaps-and-islands over the SURVIVING
      // hours only (consecutive = exactly 3600s apart, island ids via
      // lag + cumsum on one per-type window); output is one row per
      // episode with span and peak. Everything after the hourly
      // aggregate is O(bursty hours). ---
      "q_burst_detect" -> ((s, d) => {
        val hourly = table(s, d, "events")
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val tot = hourly.groupBy("event_type")
          .agg(sum("n").as("total"), count(lit(1)).as("hours"))
        val hot = hourly.join(broadcast(tot), "event_type")
          .filter(col("n") * col("hours") >= col("total") * 2)
          .select(col("event_type"), col("h"), col("n"),
            unix_micros(col("h")).as("hu"))
        val wl = Window.partitionBy("event_type").orderBy("hu")
        val wc = Window.partitionBy("event_type").orderBy("hu")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hot
          .withColumn("prev", lag("hu", 1).over(wl))
          .withColumn("newi",
            (col("prev").isNull ||
              col("hu") - col("prev") =!= 3600000000L).cast("long"))
          .withColumn("ep", sum("newi").over(wc))
          .groupBy("event_type", "ep")
          .agg(date_format(min("h"), "yyyy-MM-dd HH:00").as("start_h"),
            count(lit(1)).as("n_hours"),
            max("n").as("peak"))
          .select(col("event_type"), col("start_h"), col("n_hours"),
            col("peak"))
          .orderBy("event_type", "start_h")
      }),

      // --- audience-overlap matrix: pairwise distinct-user overlap and
      // Jaccard between event types — the segmentation readout (which
      // behaviors share an audience?). The (user, type) distinct
      // relation collapses to ONE sorted type list per user (types are
      // a tiny domain), i<j pairs stream map-side from each list (the
      // posting-list pair idiom — never a self-join of the user-type
      // relation), and per-type audience sizes broadcast back for the
      // Jaccard. Output is O(types²). ---
      "q_user_overlap" -> ((s, d) => {
        val ut = table(s, d, "events")
          .select(col("user_id"), col("event_type")).distinct()
        val sizes = ut.groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val lists = ut.groupBy("user_id")
          .agg(sort_array(collect_set(col("event_type"))).as("ts"))
        val pairs = lists
          .select(posexplode(col("ts")).as(Seq("i", "ta")), col("ts"))
          .select(col("ta"), col("i"),
            posexplode(col("ts")).as(Seq("j", "tb")))
          .filter(col("i") < col("j"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("inter"))
        pairs
          .join(broadcast(sizes).withColumnRenamed("event_type", "ta")
            .withColumnRenamed("cnt", "na"), Seq("ta"))
          .join(broadcast(sizes).withColumnRenamed("event_type", "tb")
            .withColumnRenamed("cnt", "nb"), Seq("tb"))
          .select(col("ta"), col("tb"), col("inter"), col("na"),
            col("nb"),
            (col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")).cast("double"))
              .as("jaccard"))
          .orderBy("ta", "tb")
      }))

  override def oracle: Map[String, String] = Map(

    "q_cross_corr" ->
      """WITH x AS (
        |  SELECT date_trunc('day', ts) AS day,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |           AS DECIMAL(18,4)) AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |y AS (
        |  SELECT date_trunc('day', ts) AS yday,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |           AS DECIMAL(18,4)) AS y
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |l AS (SELECT k, x.x, y.y
        |      FROM x CROSS JOIN (SELECT unnest(range(-3, 4)) AS k) ks
        |      JOIN y ON y.yday = x.day + k * INTERVAL 1 DAY),
        |g AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |        SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(CAST(x AS DECIMAL(19,4)) * y) AS sxy,
        |        SUM(CAST(x AS DECIMAL(19,4)) * x) AS sxx,
        |        SUM(CAST(y AS DECIMAL(19,4)) * y) AS syy
        |      FROM l GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS k, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS xcorr
        |FROM g ORDER BY k""".stripMargin,

    "q_burst_detect" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |          CAST(COUNT(*) AS BIGINT) AS hours
        |        FROM hourly GROUP BY 1),
        |hot AS (SELECT hourly.event_type, h, n, epoch_us(h) AS hu
        |        FROM hourly JOIN tot USING (event_type)
        |        WHERE n * hours >= total * 2),
        |f AS (SELECT event_type, h, n, hu,
        |        lag(hu, 1) OVER (PARTITION BY event_type ORDER BY hu)
        |          AS prev
        |      FROM hot),
        |i AS (SELECT event_type, h, n,
        |        SUM(CASE WHEN prev IS NULL OR hu - prev <> 3600000000
        |            THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY event_type ORDER BY hu
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS ep
        |      FROM f)
        |SELECT event_type, strftime(MIN(h), '%Y-%m-%d %H:00')
        |    AS start_h,
        |  CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(MAX(n) AS BIGINT) AS peak
        |FROM i GROUP BY event_type, ep
        |ORDER BY event_type, start_h""".stripMargin,

    "q_user_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM ut GROUP BY 1),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |         CAST(COUNT(*) AS BIGINT) AS inter
        |       FROM ut a JOIN ut b
        |         ON a.user_id = b.user_id
        |        AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT ta, tb, inter, sa.cnt AS na, sb.cnt AS nb,
        |  CAST(inter AS DOUBLE) /
        |    CAST(sa.cnt + sb.cnt - inter AS DOUBLE) AS jaccard
        |FROM pr JOIN sz sa ON sa.event_type = ta
        |        JOIN sz sb ON sb.event_type = tb
        |ORDER BY ta, tb""".stripMargin)
}
