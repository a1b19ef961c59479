package graft.operators

import graft.QueryModule
import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators (rounds 6-7): the model-input prep a
  * training pipeline runs after curation — categorical one-hot
  * encoding, per-group min-max and robust (median/IQR) scaling, and
  * smoothed target encoding. All carry full DuckDB oracles.
  *
  * Scale shape: every encoder is a map-side expression over the fact
  * rows plus (at most) a broadcast of per-category statistics — the
  * corpus is never shuffled to be encoded.
  */
object Features extends QueryModule {

  private val types = Seq("click", "error", "purchase", "signup", "view")

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- one-hot encoding over the known category domain: pure
      // map-side indicator columns (the domain is part of the feature
      // schema, not discovered at runtime — discovery would be a
      // separate distinct() job and a nondeterministic column order).
      "q_onehot_encode" -> ((s, d) => {
        val base = table(s, d, "events")
          .select(col("event_id") +: col("event_type") +:
            types.map(t => (col("event_type") === t).cast("long")
              .as(s"ot_$t")): _*)
        base.orderBy("event_id")
      }),

      // --- robust (median/IQR) scaling: the outlier-immune sibling of
      // min-max scaling. The order statistics are exact over the
      // quantized CENT domain (bounded by the value range — ~50k
      // buckets forever — not the row count): one aggregate to bucket
      // counts, one cumulative window over the per-type bucket domain,
      // conditional-mins to pick q1/median/q3 (percentile_disc
      // semantics), thresholds broadcast back, and the scale itself is
      // map-side IEEE arithmetic written as the identical expression
      // tree in the oracle. Degenerate IQR (q3 == q1) gates to 0.0 —
      // 0/0 NaN semantics differ across engines. ---
      "q_robust_scale" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val wc = Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = ev
          .groupBy(col("event_type"),
            floor(col("value") * lit(100)).cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(wc))
        val tot = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        val th = cum.join(broadcast(tot), "event_type")
          .groupBy("event_type")
          .agg(
            min(when(col("cum") >= ceil(col("n") * lit(0.25)), col("v")))
              .as("q1"),
            min(when(col("cum") >= ceil(col("n") * lit(0.50)), col("v")))
              .as("p50"),
            min(when(col("cum") >= ceil(col("n") * lit(0.75)), col("v")))
              .as("q3"))
        ev.join(broadcast(th), "event_type")
          .select(col("event_id"), col("event_type"),
            when(col("q3") > col("q1"),
              (col("value") - col("p50").cast("double") / lit(100.0)) /
                ((col("q3").cast("double") - col("q1").cast("double"))
                  / lit(100.0)))
              .otherwise(0.0).as("scaled"))
          .orderBy("event_id")
      }),

      // --- per-group min-max scaling to [0,1]: group extremes reduce
      // map-side (min/max combine partially), broadcast back, and the
      // scaling itself is one subtraction + one division per row —
      // exact input values, IEEE ops, deterministic. Constant groups
      // (max == min) gate to 0.5 explicitly (0/0 is NaN and NaN
      // semantics differ across engines). ---
      "q_minmax_scale" -> ((s, d) => {
        val ext = table(s, d, "events")
          .groupBy("event_type")
          .agg(min("value").as("vmin"), max("value").as("vmax"))
        table(s, d, "events")
          .join(broadcast(ext), "event_type")
          .select(col("event_id"), col("event_type"),
            when(col("vmax") > col("vmin"),
              (col("value") - col("vmin")) / (col("vmax") - col("vmin")))
              .otherwise(0.5).as("scaled"))
          .orderBy("event_id")
      }),

      // --- smoothed target encoding (m=10): enc = (sum_y + m·ȳ)/(n + m)
      // over the quantized target. Both the per-category and global
      // moments are exact int64 sums off ONE aggregate pass; the
      // smoothing formula is driver-scale double arithmetic written as
      // the identical tree in the oracle. The encoder table is
      // O(categories) — at serving time it broadcasts onto the corpus
      // as a map-side join, like the scaler above. ---
      // --- mutual-information feature screen (which embedding
      // dimension is informative about the label? — the selection
      // pass before training touches anything): each of the first 4
      // dimensions discretizes to its sign, the (dim, bucket, label)
      // contingency reduces FIRST (compact-first — O(dims·4) cells),
      // margins join back on the cell relation, and each cell
      // contributes O·⌊log2(O·N / (rowTot·colTot))⌋ in SIGNED integer
      // bits via the floor-log2 device — the MI proxy is an exact
      // int64 sum, bit-identical across engines with zero libm.
      // (Empty cells contribute 0 — absent from the cell relation by
      // construction.) ---
      "q_feature_mi" -> ((s, d) => {
        def bits(x: Column, z: Column): Column =
          (length(bin(floor(x.cast("double") / z.cast("double"))
            .cast("long"))) - 1).cast("long")
        val ex = table(s, d, "embeddings")
          .select(col("label"), col("embedding"),
            explode(sequence(lit(1), lit(4))).as("dim"))
          .select(col("dim"),
            (element_at(col("embedding"), col("dim").cast("int")) > 0)
              .cast("long").as("b"),
            (col("label") % 2).cast("long").as("y"))
        val cells = ex.groupBy("dim", "b", "y")
          .agg(count(lit(1)).as("o"))
        val rb = cells.groupBy("dim", "b").agg(sum("o").as("rb"))
        val cy = cells.groupBy("dim", "y").agg(sum("o").as("cy"))
        val nn = cells.groupBy("dim").agg(sum("o").as("nn"))
        cells.join(rb, Seq("dim", "b")).join(cy, Seq("dim", "y"))
          .join(broadcast(nn), "dim")
          .withColumn("x", col("o") * col("nn"))
          .withColumn("z", col("rb") * col("cy"))
          .withColumn("contrib",
            when(col("x") >= col("z"),
              col("o") * bits(col("x"), col("z")))
              .otherwise(-col("o") * bits(col("z"), col("x"))))
          .groupBy("dim").agg(max("nn").as("n"),
            sum("contrib").as("mi_bits"))
          .select(col("dim").cast("long").as("dim"), col("n"),
            col("mi_bits"))
          .orderBy("dim")
      }),

      // --- point-in-time feature join (round 9): the feature-store
      // JOIN — each 'purchase' label row picks up the latest
      // at-or-before 'view' and 'click' feature values (and the view
      // feature's staleness) WITHOUT a per-feature as-of join: labels
      // and feature events union into ONE stream, a single per-user
      // window carries each feature forward via last_value(ignoreNulls),
      // and only label rows survive. One shuffle on user_id total,
      // independent of the number of feature columns — the spelling
      // that keeps a 100-feature training matrix at one exchange where
      // naive as-of joins pay one per feature. At-or-before (<=)
      // visibility: features stamped at the label instant are usable
      // (the snapshot convention; ties order features first). ---
      "q_pit_features" -> ((s, d) => {
        val ev = table(s, d, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"), col("value"), col("event_id"),
            (col("event_type") === "purchase").cast("int").as("islabel"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("islabel"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("f_view", last(
            when(col("event_type") === "view", col("value")), true).over(w))
          .withColumn("f_click", last(
            when(col("event_type") === "click", col("value")), true).over(w))
          .withColumn("view_us", last(
            when(col("event_type") === "view", col("us")), true).over(w))
          .filter(col("islabel") === 1)
          .select(col("event_id"), col("user_id"), col("us").as("label_us"),
            col("f_view"), col("f_click"),
            (col("us") - col("view_us")).as("view_age_us"))
          .orderBy("event_id")
      }),

      // --- sequential lag/rolling feature extraction (round 9): per
      // user, the lag-1/lag-2 values, first difference, and 3-event
      // rolling mean over the event stream — the feature block every
      // sequence model's training table starts with. Reads the
      // user_id-bucketed event log (Advanced.eventsByUser), so the
      // window inherits the scan's clustering and the plan carries
      // ZERO hash exchange; values go through DECIMAL(18,4) before the
      // 3-term sum (exact, order-independent) with one terminal IEEE
      // division. Map-side projection + partitioned window — the
      // corpus is never globally sorted. ---
      "q_lag_features" -> ((s, d) => {
        import graft.Det.dec
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        Advanced.eventsByUser(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            dec(col("value")).as("v"))
          .withColumn("l1", lag("v", 1).over(w))
          .withColumn("l2", lag("v", 2).over(w))
          .select(col("event_id"), col("user_id"),
            col("v").cast("double").as("v"),
            col("l1").cast("double").as("lag1"),
            col("l2").cast("double").as("lag2"),
            (col("v") - col("l1")).cast("double").as("delta1"),
            when(col("l2").isNotNull,
              (col("v") + col("l1") + col("l2")).cast("double") / 3)
              .as("roll3"))
          .orderBy("event_id")
      }),

      "q_target_encode" -> ((s, d) => {
        val per = table(s, d, "events")
          .select(col("event_type"),
            round(col("value"), 0).cast("long").as("vq"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("vq").as("sx"))
        val glob = per.agg(sum("n").as("gn"), sum("sx").as("gsx"))
        per.crossJoin(broadcast(glob))
          .select(col("event_type"), col("n"),
            ((col("sx").cast("double")
              + lit(10.0) * (col("gsx").cast("double") / col("gn")))
              / (col("n") + 10)).as("enc"))
          .orderBy("event_type")
      }))

  override def oracle: Map[String, String] = Map(

    "q_pit_features" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type,
        |    value, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS islabel
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |c AS (SELECT event_id, user_id, us, islabel,
        |    last_value(CASE WHEN event_type = 'view' THEN value END
        |      IGNORE NULLS) OVER w AS f_view,
        |    last_value(CASE WHEN event_type = 'click' THEN value END
        |      IGNORE NULLS) OVER w AS f_click,
        |    last_value(CASE WHEN event_type = 'view' THEN us END
        |      IGNORE NULLS) OVER w AS view_us
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us, islabel, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, us AS label_us, f_view, f_click,
        |  us - view_us AS view_age_us
        |FROM c WHERE islabel = 1 ORDER BY event_id""".stripMargin,

    "q_lag_features" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |l AS (SELECT event_id, user_id, v,
        |    lag(v) OVER w AS l1, lag(v, 2) OVER w AS l2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_id, user_id, CAST(v AS DOUBLE) AS v,
        |  CAST(l1 AS DOUBLE) AS lag1, CAST(l2 AS DOUBLE) AS lag2,
        |  CAST(v - l1 AS DOUBLE) AS delta1,
        |  CASE WHEN l2 IS NOT NULL
        |    THEN CAST(v + l1 + l2 AS DOUBLE) / 3 END AS roll3
        |FROM l ORDER BY event_id""".stripMargin,

    "q_onehot_encode" -> {
      val cols = types.map(t =>
        s"CAST(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END AS BIGINT) AS ot_$t")
        .mkString(",\n  ")
      s"""SELECT event_id, event_type,
         |  $cols
         |FROM events ORDER BY event_id""".stripMargin
    },

    "q_robust_scale" ->
      """WITH dom AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, v,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dom),
        |tot AS (SELECT event_type, COUNT(*) AS n
        |        FROM events GROUP BY 1),
        |th AS (SELECT event_type,
        |    MIN(CASE WHEN cum >= ceil(n * 0.25) THEN v END) AS q1,
        |    MIN(CASE WHEN cum >= ceil(n * 0.50) THEN v END) AS p50,
        |    MIN(CASE WHEN cum >= ceil(n * 0.75) THEN v END) AS q3
        |  FROM cum JOIN tot USING (event_type) GROUP BY event_type)
        |SELECT event_id, e.event_type,
        |  CASE WHEN q3 > q1
        |       THEN (value - CAST(p50 AS DOUBLE) / 100.0)
        |         / ((CAST(q3 AS DOUBLE) - CAST(q1 AS DOUBLE)) / 100.0)
        |       ELSE 0.0 END AS scaled
        |FROM events e JOIN th USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_minmax_scale" ->
      """WITH ext AS (SELECT event_type, MIN(value) AS vmin,
        |               MAX(value) AS vmax
        |             FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type,
        |  CASE WHEN vmax > vmin
        |       THEN (value - vmin) / (vmax - vmin)
        |       ELSE 0.5 END AS scaled
        |FROM events e JOIN ext ON e.event_type = ext.event_type
        |ORDER BY event_id""".stripMargin,

    "q_feature_mi" ->
      """WITH dims AS (SELECT unnest(range(1, 5)) AS dim),
        |ex AS (SELECT CAST(dim AS BIGINT) AS dim,
        |    CAST(embedding[dim] > 0 AS BIGINT) AS b,
        |    CAST(label % 2 AS BIGINT) AS y
        |  FROM embeddings CROSS JOIN dims),
        |cells AS (SELECT dim, b, y, CAST(COUNT(*) AS BIGINT) AS o
        |          FROM ex GROUP BY dim, b, y),
        |rb AS (SELECT dim, b, CAST(SUM(o) AS BIGINT) AS rb
        |       FROM cells GROUP BY dim, b),
        |cy AS (SELECT dim, y, CAST(SUM(o) AS BIGINT) AS cy
        |       FROM cells GROUP BY dim, y),
        |nn AS (SELECT dim, CAST(SUM(o) AS BIGINT) AS nn
        |       FROM cells GROUP BY dim),
        |ctr AS (SELECT dim, o * nn AS x, rb * cy AS z, o, nn
        |  FROM cells JOIN rb USING (dim, b) JOIN cy USING (dim, y)
        |  JOIN nn USING (dim))
        |SELECT dim, MAX(nn) AS n,
        |  CAST(SUM(CASE WHEN x >= z
        |    THEN o * (length(bin(x // z)) - 1)
        |    ELSE -o * (length(bin(z // x)) - 1) END) AS BIGINT)
        |    AS mi_bits
        |FROM ctr GROUP BY dim ORDER BY dim""".stripMargin,

    "q_target_encode" ->
      """WITH per AS (SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round(value, 0) AS BIGINT)) AS BIGINT) AS sx
        |  FROM events GROUP BY event_type),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS gn,
        |        CAST(SUM(sx) AS BIGINT) AS gsx FROM per)
        |SELECT event_type, n,
        |  ((CAST(sx AS DOUBLE)
        |    + 10.0 * (CAST(gsx AS DOUBLE) / gn)) / (n + 10)) AS enc
        |FROM per CROSS JOIN g ORDER BY event_type""".stripMargin)
}
