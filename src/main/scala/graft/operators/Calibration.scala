package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Calibration & model hygiene (round 8, batch 16): isotonic
  * regression over the calibration bins, the two-proportion z-test,
  * and correlation-based feature pruning. All three carry full DuckDB
  * oracles.
  *
  * Determinism: the isotonic fit uses the MINIMAX identity
  * fitted(i) = max_{j≤i} min_{k≥i} avg(j..k) instead of the
  * sequential PAVA stack — each candidate average is one division of
  * exact int64 prefix sums and min/max over deterministic doubles
  * needs no floating-point accumulation, so both engines build the
  * identical fit from the identical O(bins³) grid (bins ≈ 20, grid ≈
  * 4k rows — trivial forever because bins never grow with the
  * corpus).
  */
object Calibration extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- isotonic (monotone) calibration of the per-bin positive
      // rate — the nonparametric alternative to Platt scaling, fitted
      // here via the closed minimax form rather than a sequential
      // PAVA loop (same function, embarrassingly parallel). Bins come
      // from the q_calibration grid; prefix sums index the O(bins²)
      // interval averages; two bounded group-bys take min-over-right
      // then max-over-left. The output rate is nondecreasing by
      // construction. ---
      "q_isotonic_fit" -> ((s, d) => {
        val bins = table(s, d, "embeddings")
          .select((col("label") % 2 === 1).cast("long").as("pos"),
            round(element_at(col("embedding"), 1).cast("double") * 1000, 0)
              .cast("long").as("sq"))
          .groupBy(floor(col("sq") / 100.0).cast("long").as("bin"))
          .agg(count(lit(1)).as("nk"), sum("pos").as("ok"))
        val wb = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = bins
          .withColumn("i", row_number().over(Window.orderBy("bin"))
            .cast("long"))
          .withColumn("pc", sum("ok").over(wb))
          .withColumn("cc", sum("nk").over(wb))
        val j = pre.select(col("i").as("j"), col("pc").as("pj"),
          col("cc").as("cj"), col("ok").as("oj"), col("nk").as("nj"))
        val k = pre.select(col("i").as("k"), col("pc").as("pk"),
          col("cc").as("ck"))
        val pairs = j.join(k, col("j") <= col("k"))
          .select(col("j"), col("k"),
            ((col("pk") - (col("pj") - col("oj"))).cast("double") /
              (col("ck") - (col("cj") - col("nj")))).as("avg"))
        val idx = pre.select(col("i"))
        val fitted = idx
          .join(pairs, col("j") <= col("i") && col("k") >= col("i"))
          .groupBy("i", "j").agg(min("avg").as("mn"))
          .groupBy("i").agg(max("mn").as("iso_rate"))
        pre.join(fitted, "i")
          .select(col("bin"), col("nk").as("n"),
            (col("ok").cast("double") / col("nk")).as("raw_rate"),
            col("iso_rate"))
          .orderBy("bin")
      }),

      // --- two-proportion z-test: click-arm vs view-arm success rate
      // (value > 50) — the proportions sibling of q_ab_ttest (means)
      // and q_mannwhitney_u (ranks). Four exact int64 counts; pooled
      // rate, difference and z are one fixed division/sqrt tree. ---
      "q_prop_ztest" -> ((s, d) => {
        val q = table(s, d, "events")
          .filter(col("event_type").isin("click", "view"))
          .select((col("event_type") === "click").as("c"),
            (round(col("value"), 0).cast("long") > 50).cast("long")
              .as("r"))
        val m = q.agg(
          sum(when(col("c"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("c"), col("r")).otherwise(0L)).as("k1"),
          sum(when(!col("c"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("c"), col("r")).otherwise(0L)).as("k2"))
        val p1 = col("k1").cast("double") / col("n1")
        val p2 = col("k2").cast("double") / col("n2")
        val pp = (col("k1") + col("k2")).cast("double") /
          (col("n1") + col("n2"))
        m.select(col("n1"), col("n2"), p1.as("p1"), p2.as("p2"),
          (p1 - p2).as("diff"),
          ((p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n1") + lit(1.0) / col("n2")))).as("z"))
      }),

      // --- correlation-based feature pruning over the embedding
      // dimensions: drop any dimension that is too correlated with an
      // EARLIER one (the index-greedy approximation every feature
      // pipeline ships; the threshold is the exact-rank p90 of the
      // |corr| distribution so the query is meaningful on any data).
      // Pairwise moments are exact int64 off ONE quantized posexplode
      // self-join keyed on vec_id (the q_feature_mi shape, dims²
      // output); the 2016-pair relation carries every later window
      // and the witness argmax is a struct max. ---
      "q_corr_prune" -> ((s, d) => {
        val x = table(s, d, "embeddings")
          .select(col("vec_id"),
            posexplode(transform(col("embedding"),
              v => floor(v.cast("double") * 1024).cast("long")))
              .as(Seq("i0", "v")))
          .select(col("vec_id"), (col("i0") + 1).cast("long").as("i"),
            col("v"))
        val a = x.select(col("vec_id"), col("i").as("ia"),
          col("v").as("va"))
        val b = x.select(col("vec_id"), col("i").as("ib"),
          col("v").as("vb"))
        val mom = a.join(b, Seq("vec_id")).filter(col("ia") < col("ib"))
          .groupBy("ia", "ib")
          .agg(count(lit(1)).as("n"), sum("va").as("sa"),
            sum("vb").as("sb"), sum(col("va") * col("va")).as("saa"),
            sum(col("vb") * col("vb")).as("sbb"),
            sum(col("va") * col("vb")).as("sab"))
        val corr = mom.select(col("ia"), col("ib"),
          abs((col("n") * col("sab") - col("sa") * col("sb"))
            .cast("double") /
            sqrt((col("n") * col("saa") - col("sa") * col("sa"))
              .cast("double") *
              (col("n") * col("sbb") - col("sb") * col("sb"))
                .cast("double"))).as("ac"))
        val wr = Window.orderBy(col("ac").desc, col("ia").asc,
          col("ib").asc)
        val np = corr.agg(count(lit(1)).as("np"))
        val tau = corr.withColumn("rk", row_number().over(wr).cast("long"))
          .crossJoin(broadcast(np))
          .filter(col("rk") === expr("(np + 9) div 10"))
          .select(col("ac").as("tau"))
        val hits = corr.crossJoin(broadcast(tau))
          .filter(col("ac") >= col("tau"))
        val dropped = hits.groupBy(col("ib").as("dim"))
          .agg(max(struct(col("ac"), col("ia"))).as("m"))
          .select(col("dim"), lit(1L).as("dropped"),
            col("m.ia").as("witness_dim"), col("m.ac").as("witness_corr"))
        x.select(col("i").as("dim")).distinct()
          .join(dropped, Seq("dim"), "left")
          .select(col("dim"), coalesce(col("dropped"), lit(0L))
            .as("dropped"), col("witness_dim"), col("witness_corr"))
          .orderBy("dim")
      }),

      // --- Wilson 95% score interval per event type (round 9): the
      // small-sample-safe success-rate interval every SRE/experiment
      // dashboard should use instead of the Wald +-1.96*se (which
      // collapses at p near 0/1). Success = the apdex satisfied gate
      // (value <= 50). One conditional-count pass to exact (n, k) per
      // type; the interval is ONE fixed IEEE expression tree (z =
      // 1.96, z^2 = 3.8416 exact decimal literals) rendered
      // identically in both dialects. O(types) output. ---
      "q_wilson_ci" -> ((s, d) => {
        val g = table(s, d, "events")
          .select(col("event_type"),
            (round(col("value"), 0).cast("long") <= 50L).cast("long")
              .as("ok"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("ok").as("k"))
        g.selectExpr("event_type", "n", "k",
            "CAST(k AS DOUBLE) / n AS p_hat",
            s"${wilsonSql("-")} AS lo",
            s"${wilsonSql("+")} AS hi")
          .orderBy("event_type")
      }),

      // --- empirical-Bayes (beta-binomial) rate shrinkage: per-source
      // long-doc rates pulled toward the corpus mean with a prior
      // strength ESTIMATED from the between-source dispersion
      // (method of moments: M = μ(1−μ)/s² − 1) — the principled
      // small-sample smoothing q_target_encode hard-codes. The
      // dispersion needs Σx²/n, kept deterministic as the INTEGER
      // floor Σ(x²·10⁶ div n) (identical on both engines); every
      // double then flows through ONE shared expression tree
      // (wilson-style single-source string). Degenerate zero
      // dispersion pins the prior at 10⁹ (full pooling). ---
      "q_eb_shrinkage" -> ((s, d) => {
        val g = table(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
            sum((col("n_chars") >= 350).cast("long")).as("x"))
        val glob = g.agg(sum("x").as("sx"), sum("n").as("sn"),
          sum(expr("(x * 1000000 * x) div n")).as("sq2"))
        g.crossJoin(broadcast(glob))
          .selectExpr(Seq("source", "n", "x",
            "CAST(x AS DOUBLE) / n AS raw_rate") ++ Seq(
            s"$ebPriorSql AS prior_strength",
            s"(CAST(x AS DOUBLE) + $ebPriorSql * $ebMuSql) " +
              s"/ (CAST(n AS DOUBLE) + $ebPriorSql) AS shrunk_rate",
            s"CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + $ebPriorSql) " +
              "AS weight"): _*)
          .orderBy("source")
      })
    )

  /** Shared EB expression fragments — ONE spelling rendered into both
    * dialects (q_eb_shrinkage).
    */
  private val ebMuSql = "(CAST(sx AS DOUBLE) / sn)"
  private val ebS2Sql =
    "((CAST(sq2 AS DOUBLE) / 1000000 - CAST(sx AS DOUBLE) * sx / sn) / sn)"
  private val ebPriorSql =
    s"(CASE WHEN $ebS2Sql > 0 THEN GREATEST($ebMuSql * (1 - $ebMuSql) " +
      s"/ $ebS2Sql - 1, 0.0) ELSE 1000000000.0 END)"

  /** The Wilson-interval IEEE expression tree, written ONCE and
    * rendered into both dialects (identical parenthesization =
    * identical doubles): z = 1.96, z^2 = 3.8416 exactly.
    */
  private def wilsonSql(sign: String): String =
    "(CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)) / (1 + 3.8416 / n) " +
      s"$sign 1.96 * sqrt((CAST(k AS DOUBLE) / n) * " +
      "(1 - CAST(k AS DOUBLE) / n) / n + " +
      "3.8416 / (4 * CAST(n AS DOUBLE) * n)) / (1 + 3.8416 / n)"

  override def oracle: Map[String, String] = Map(

    "q_wilson_ci" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN CAST(round(value, 0) AS BIGINT) <= 50
         |      THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM events GROUP BY event_type)
         |SELECT event_type, n, k,
         |  CAST(k AS DOUBLE) / n AS p_hat,
         |  ${wilsonSql("-")} AS lo,
         |  ${wilsonSql("+")} AS hi
         |FROM g ORDER BY event_type""".stripMargin,
    "q_isotonic_fit" ->
      """WITH e AS (SELECT CAST(label % 2 = 1 AS BIGINT) AS pos,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 1000, 0)
        |      AS BIGINT) AS sq
        |  FROM embeddings),
        |bins AS (SELECT CAST(floor(sq / 100.0) AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(pos) AS BIGINT)
        |      AS ok
        |  FROM e GROUP BY 1),
        |pre AS (SELECT bin, nk, ok,
        |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
        |    CAST(SUM(ok) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS pc,
        |    CAST(SUM(nk) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
        |  FROM bins),
        |pairs AS (SELECT j.i AS j, k.i AS k,
        |    CAST(k.pc - (j.pc - j.ok) AS DOUBLE) /
        |      (k.cc - (j.cc - j.nk)) AS avg
        |  FROM pre j JOIN pre k ON j.i <= k.i),
        |inner1 AS (SELECT p.i, pairs.j, MIN(avg) AS mn
        |  FROM pre p JOIN pairs ON pairs.j <= p.i AND pairs.k >= p.i
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, MAX(mn) AS iso_rate FROM inner1 GROUP BY i)
        |SELECT bin, nk AS n,
        |  CAST(ok AS DOUBLE) / nk AS raw_rate, iso_rate
        |FROM pre JOIN fit USING (i) ORDER BY bin""".stripMargin,

    "q_prop_ztest" ->
      """WITH q AS (SELECT event_type = 'click' AS c,
        |    CAST(CAST(round(value, 0) AS BIGINT) > 50 AS BIGINT) AS r
        |  FROM events WHERE event_type IN ('click', 'view')),
        |m AS (SELECT
        |    CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN c THEN r ELSE 0 END) AS BIGINT) AS k1,
        |    CAST(SUM(CASE WHEN NOT c THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(SUM(CASE WHEN NOT c THEN r ELSE 0 END) AS BIGINT)
        |      AS k2
        |  FROM q)
        |SELECT n1, n2,
        |  CAST(k1 AS DOUBLE) / n1 AS p1,
        |  CAST(k2 AS DOUBLE) / n2 AS p2,
        |  CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2 AS diff,
        |  (CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2) /
        |  sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) *
        |    (1.0 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2)) *
        |    (1.0 / n1 + 1.0 / n2)) AS z
        |FROM m""".stripMargin,

    "q_corr_prune" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024)
        |      AS BIGINT) AS v
        |  FROM embeddings),
        |mom AS (SELECT a.i AS ia, b.i AS ib,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.v) AS BIGINT) AS sa,
        |    CAST(SUM(b.v) AS BIGINT) AS sb,
        |    CAST(SUM(a.v * a.v) AS BIGINT) AS saa,
        |    CAST(SUM(b.v * b.v) AS BIGINT) AS sbb,
        |    CAST(SUM(a.v * b.v) AS BIGINT) AS sab
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i < b.i
        |  GROUP BY 1, 2),
        |corr AS (SELECT ia, ib,
        |    abs(CAST(n * sab - sa * sb AS DOUBLE) /
        |      sqrt(CAST(n * saa - sa * sa AS DOUBLE) *
        |           CAST(n * sbb - sb * sb AS DOUBLE))) AS ac
        |  FROM mom),
        |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM corr),
        |tau AS (SELECT ac AS tau FROM (
        |    SELECT ac, CAST(row_number() OVER (ORDER BY ac DESC, ia, ib)
        |      AS BIGINT) AS rk
        |    FROM corr) CROSS JOIN np
        |  WHERE rk = (np + 9) // 10),
        |hits AS (SELECT ia, ib, ac FROM corr CROSS JOIN tau
        |  WHERE ac >= tau),
        |drp AS (SELECT ib AS dim, 1 AS dropped,
        |    ia AS witness_dim, ac AS witness_corr
        |  FROM (SELECT ib, ia, ac, row_number() OVER (PARTITION BY ib
        |          ORDER BY ac DESC, ia DESC) AS wrn FROM hits)
        |  WHERE wrn = 1),
        |dims AS (SELECT DISTINCT i AS dim FROM x)
        |SELECT dim,
        |  CAST(COALESCE(dropped, 0) AS BIGINT) AS dropped,
        |  witness_dim, witness_corr
        |FROM dims LEFT JOIN drp USING (dim)
        |ORDER BY dim""".stripMargin,

    "q_eb_shrinkage" ->
      s"""WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM documents GROUP BY source),
         |gl AS (SELECT CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(n) AS BIGINT) AS sn,
         |    CAST(SUM((x * 1000000 * x) // n) AS BIGINT) AS sq2
         |  FROM g)
         |SELECT source, n, x,
         |  CAST(x AS DOUBLE) / n AS raw_rate,
         |  $ebPriorSql AS prior_strength,
         |  (CAST(x AS DOUBLE) + $ebPriorSql * $ebMuSql)
         |    / (CAST(n AS DOUBLE) + $ebPriorSql) AS shrunk_rate,
         |  CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + $ebPriorSql)
         |    AS weight
         |FROM g CROSS JOIN gl ORDER BY source""".stripMargin
  )
}
