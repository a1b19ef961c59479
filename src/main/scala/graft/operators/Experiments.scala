package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Experimentation & distribution shape (round 8, batch 13): CUPED
  * variance reduction, inter-event regularity, local peak detection,
  * and equi-depth histograms. All four carry full DuckDB oracles.
  *
  * Determinism: per-user covariates are integer counts, so every
  * moment (including the CUPED θ numerators) is exact int64/decimal;
  * variances come from closed-form moment identities — no per-row
  * adjusted values are ever summed as doubles.
  */
object Experiments extends QueryModule {

  /** SPRT micro-nat constants (ln(22/18), ln(78/82), ln(19) × 1e6) —
    * shared with the streamed twin (streaming.StatefulSprt) so the two
    * spellings can never drift apart.
    */
  private[graft] val SprtSucc = 200671L
  private[graft] val SprtFail = 50010L
  private[graft] val SprtThresh = 2944439L

  /** The (source, lang) cell grid with per-cell 2×2 chi-square of
    * long-doc rate (n_chars ≥ 350) against the rest of the corpus and
    * the monotone proxy p = 1/(1+χ²) — ONE fixed IEEE tree off exact
    * int64 cell counts (the q_ab_srm discipline). Shared by the two
    * multiple-testing gates (q_fdr_bh step-up, q_holm step-down) so
    * the p-value device can never drift between them. Columns:
    * source, lang, n_cell, n_long, m (family size), chi2, p.
    *
    * Degenerate-margin guard (ADVICE r10 #2): a zero margin — no long
    * docs anywhere (atot = 0), ALL docs long (atot = n), or a single
    * cell (n_cell = n) — makes the raw expression 0/0 = NaN, and NaN
    * p-values order differently in Spark (nan-safe, sorts last) than
    * DuckDB (NULL). A zero margin means the 2×2 has no discrimination:
    * chi2 := 0 (p = 1), guarded by the IDENTICAL CASE on both engines.
    * (a+b = n_cell ≥ 1 always — a cell exists only with members.)
    */
  private def longDocCellP(s: SparkSession, d: String): DataFrame = {
    val cell = table(s, d, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_cell"),
        sum((col("n_chars") >= 350).cast("long")).as("a"))
    val tot = cell.agg(sum("n_cell").as("n"), sum("a").as("atot"),
      count(lit(1)).as("m"))
    val x = cell.crossJoin(tot)
      .withColumn("b", col("n_cell") - col("a"))
      .withColumn("c", col("atot") - col("a"))
      .withColumn("dd", col("n") - col("n_cell") - col("c"))
    val t = col("a").cast("double") * col("dd") -
      col("b").cast("double") * col("c")
    val chi2raw = t * t / (col("a") + col("b")).cast("double") /
      (col("c") + col("dd")).cast("double") /
      (col("a") + col("c")).cast("double") /
      (col("b") + col("dd")).cast("double") * col("n").cast("double")
    val chi2 = when(col("atot") > 0 && col("atot") < col("n") &&
      col("n_cell") < col("n"), chi2raw).otherwise(lit(0.0))
    x.select(col("source"), col("lang"), col("n_cell"),
        col("a").as("n_long"), col("m"), chi2.as("chi2"))
      .withColumn("p", lit(1.0) / (lit(1.0) + col("chi2")))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- Hoeffding adequacy gate (round 13): is the A/B sample big
      // enough that the observed conversion gap EXCEEDS both arms'
      // distribution-free Hoeffding half-widths ε = sqrt(ln(2/δ)/2n),
      // δ=0.05? The always-valid stopping check a dashboard runs before
      // anyone reads the t-test — no variance estimate, no normality.
      // Exact integer per-arm tallies; ln(2/0.05) is the literal
      // 3.6888794541139363 — spelled 3.6888794541139363e0 in the
      // oracle: a bare 17-digit literal parses as DECIMAL(17,16) in
      // DuckDB and its decimal→double CAST lands 1 ulp off the
      // correctly-rounded parse; the e-notation forces a true double
      // literal (measured: the CAST spelling hash-mismatched). ---
      "q_hoeffding_gate" -> ((s, d) => {
        val per = table(s, d, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
          .select(pmod(col("user_id"), lit(2L)).as("arm"), col("conv"))
        val ln2d = 3.6888794541139363
        per.agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("long")
              .as("n0"),
            sum(when(col("arm") === 0, col("conv")).otherwise(0L))
              .cast("long").as("conv0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("long")
              .as("n1"),
            sum(when(col("arm") === 1, col("conv")).otherwise(0L))
              .cast("long").as("conv1"))
          .select(col("n0"), col("conv0"), col("n1"), col("conv1"),
            (col("conv0").cast("double") / col("n0").cast("double"))
              .as("p0"),
            (col("conv1").cast("double") / col("n1").cast("double"))
              .as("p1"),
            sqrt(lit(ln2d) / (lit(2.0) * col("n0").cast("double")))
              .as("eps0"),
            sqrt(lit(ln2d) / (lit(2.0) * col("n1").cast("double")))
              .as("eps1"))
          .withColumn("gap", abs(col("p0") - col("p1")))
          .withColumn("separated",
            col("gap") > col("eps0") + col("eps1"))
      }),

      // --- CUPED variance reduction (the standard experimentation
      // trick: regress the experiment metric on its pre-period twin
      // and remove the explained variance). Per-user pre/post counts
      // are ONE user-keyed conditional aggregate; θ = cov(X,Y)/var(X)
      // comes from pooled exact int64 moments (broadcast 1-row);
      // per-arm adjusted means and variances use closed-form moment
      // identities (var_adj = var_y − 2θcov + θ²var_x), so nothing
      // per-row is ever accumulated in floating point. Arms are a
      // deterministic user-id parity. ---
      // --- sample-ratio mismatch gate (round 9): the experiment-
      // hygiene check every A/B platform runs before reading a result —
      // chi-square of the OBSERVED train/val/test assignment counts
      // (q_train_split's md5 nibble gate, weights 12/2/2 of 16) against
      // the DECLARED ratios. One conditional-count scan to exact
      // (n, n_train, n_val, n_test); each chi-square component is the
      // identical fixed IEEE tree on both engines ((16·O − w·n)² /
      // (16·w·n), summed in written order); the 5.991 flag is the 95%
      // chi-square(2) critical value. One-row output. ---
      "q_ab_srm" -> ((s, d) => {
        val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
        val g = table(s, d, "documents").agg(
          count(lit(1)).as("n"),
          sum((nib <= "b").cast("long")).as("n_train"),
          sum((nib > "b" && nib <= "d").cast("long")).as("n_val"),
          sum((nib > "d").cast("long")).as("n_test"))
        def comp(o: String, w: Int): String =
          s"CAST(16 * $o - $w * n AS DOUBLE) * " +
            s"CAST(16 * $o - $w * n AS DOUBLE) / (16.0 * $w * n)"
        g.selectExpr("n", "n_train", "n_val", "n_test",
            s"${comp("n_train", 12)} + ${comp("n_val", 2)} + " +
              s"${comp("n_test", 2)} AS chi2")
          .withColumn("srm_detected", col("chi2") > 5.991)
      }),

      // --- cluster design effect (round 16): what a user-randomized
      // experiment on this stream actually costs in effective sample
      // size — one-way ANOVA over user clusters gives the intraclass
      // correlation ρ = (MSB−MSW)/(MSB+(m̄−1)·MSW), and
      // DEFF = 1 + (m̄−1)·ρ is the variance inflation every
      // cluster-randomized power calc (q_power_mde's per-unit
      // formula) must divide by. Outcome = event value in cents.
      // Between-group Σ S_g²/m_g quantizes each per-user term to
      // 1e-6 micro-units before the cross-user sum (the q_smape
      // discipline; S_g² stays inside double's 2^53 for user sums
      // < ~$950M); Σx² rides DECIMAL(38,0); everything terminal is
      // one fixed tree. One shuffle on user_id; O(1) out. ---
      "q_design_effect" -> ((s, d) => {
        val d38 = DecimalType(38, 0)
        val per = table(s, d, "events")
          .select(col("user_id"),
            expr("CAST(round(value * 100, 0) AS BIGINT)").as("x"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("m"), sum("x").as("sg"),
            sum((col("x").cast(d38) * col("x"))).as("qg"))
        val gterm = col("sg").cast("double") * col("sg") / col("m")
        val agg = per.agg(count(lit(1)).as("k_users"),
          sum("m").cast("long").as("n"),
          sum("sg").cast("long").as("s_tot"),
          sum("qg").as("q_tot"),
          sum(round(gterm * 1e6, 0).cast(d38)).as("gq"))
        val gsum = col("gq").cast("double") / 1e6
        val ssb = gsum - col("s_tot").cast("double") * col("s_tot")
          .cast("double") / col("n")
        val ssw = col("q_tot").cast("double") - gsum
        val msb = ssb / (col("k_users") - 1L).cast("double")
        val msw = ssw / (col("n") - col("k_users")).cast("double")
        val mbar = col("n").cast("double") / col("k_users")
        val icc = (msb - msw) / (msb + (mbar - 1.0) * msw)
        agg.select(col("k_users"), col("n"),
            when(col("k_users") > 1 && col("n") > col("k_users"),
              msb).as("msb"),
            when(col("k_users") > 1 && col("n") > col("k_users"),
              msw).as("msw"),
            mbar.as("m_bar"),
            when(col("k_users") > 1 && col("n") > col("k_users"),
              icc).as("icc"),
            when(col("k_users") > 1 && col("n") > col("k_users"),
              lit(1.0) + (mbar - 1.0) * icc).as("deff"))
      }),

      "q_cuped_adjust" -> ((s, d) => {
        val per = table(s, d, "events")
          .groupBy(col("user_id"))
          .agg(sum((datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")) < 15).cast("long")).as("x"),
            sum((datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")) >= 15).cast("long")).as("y"))
          .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
        val g = per.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        val theta = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val xbarG = col("sx").cast("double") / col("n")
        val arm = per.groupBy("arm").agg(count(lit(1)).as("na"),
          sum("x").as("ax"), sum("y").as("ay"),
          sum(col("x") * col("x")).as("axx"),
          sum(col("y") * col("y")).as("ayy"),
          sum(col("x") * col("y")).as("axy"))
        val meanY = col("ay").cast("double") / col("na")
        val meanX = col("ax").cast("double") / col("na")
        val varY = (col("ayy").cast("double") -
          col("ay").cast("double") * col("ay") / col("na")) / col("na")
        val varX = (col("axx").cast("double") -
          col("ax").cast("double") * col("ax") / col("na")) / col("na")
        val covA = (col("axy").cast("double") -
          col("ax").cast("double") * col("ay") / col("na")) / col("na")
        val varAdj = varY - lit(2.0) * col("th") * covA +
          col("th") * col("th") * varX
        arm.crossJoin(broadcast(
            g.select(theta.as("th"), xbarG.as("xg"))))
          .select(col("arm"), col("na").as("n"),
            meanY.as("mean_y"),
            (meanY - col("th") * (meanX - col("xg"))).as("mean_y_adj"),
            varY.as("var_y"), varAdj.as("var_y_adj"),
            (varAdj / varY).as("var_ratio"))
          .orderBy("arm")
      }),

      // --- inter-event regularity per event type: the coefficient of
      // variation of the gaps between a user's consecutive events of
      // that type — CV ≈ 1 is Poisson-random, ≪ 1 is scheduled, ≫ 1
      // is bursty (the behavioral texture statistic behind retention
      // models). Gaps come from one (user,type)-keyed lag window,
      // quantized to whole seconds; moments accumulate in
      // DECIMAL(38,0) (squared seconds pass int64 only to ~month-long
      // gaps); CV is one fixed sqrt/division tree. ---
      "q_order_gap_cv" -> ((s, d) => {
        val wt = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = table(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("gapus",
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(wt)))
          .filter(col("gapus").isNotNull)
          .select(col("event_type"), expr("gapus div 1000000").as("g"))
        val d38 = DecimalType(38, 0)
        gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("g").cast(d38)).as("sg"),
            sum((col("g") * col("g")).cast(d38)).as("sgg"))
          .select(col("event_type"), col("n"),
            (col("sg").cast("double") / col("n")).as("mean_gap_s"),
            (sqrt((col("sgg").cast("double") -
              col("sg").cast("double") * col("sg").cast("double") /
                col("n")) / col("n")) /
              (col("sg").cast("double") / col("n"))).as("cv"))
          .orderBy("event_type")
      }),

      // --- local peak detection on the daily series: days whose count
      // beats both neighbors AND clears 1.2× their average (the
      // prominence gate, kept integer as 5·cnt ≥ 3·(prev+next)) — the
      // alarm-worthy spikes, separated from plateau noise. lag/lead
      // over the time-sized per-type grid; pure integer predicate. ---
      "q_local_peaks" -> ((s, d) => {
        val wt = Window.partitionBy("event_type").orderBy("day")
        table(s, d, "events")
          .groupBy(col("event_type"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("prev", lag("cnt", 1).over(wt))
          .withColumn("nxt", lead("cnt", 1).over(wt))
          .filter(col("prev").isNotNull && col("nxt").isNotNull &&
            col("cnt") > col("prev") && col("cnt") > col("nxt") &&
            col("cnt") * 5 >= (col("prev") + col("nxt")) * 3)
          .select(col("event_type"), col("day"), col("cnt"),
            col("prev"), col("nxt"))
          .orderBy("event_type", "day")
      }),

      // --- equi-depth histogram (4 quantile bins) per event type:
      // the ANALYZE-style statistic behind selectivity estimation —
      // unlike q_histogram_equiwidth, bin EDGES adapt to the data so
      // every bin holds ~n/4 rows. Boundaries are exact-rank order
      // statistics off cumulative counts over the O(bins) value
      // domain, broadcast back for a map-side bin assignment over the
      // SAME domain relation (rows never re-scan). ---
      "q_histogram_equidepth" -> ((s, d) => {
        val dom = table(s, d, "events")
          .groupBy(col("event_type"),
            round(col("value"), 0).cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val wb = Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dom
          .withColumn("cum", sum("c").over(wb))
          .withColumn("n",
            sum("c").over(Window.partitionBy("event_type")))
        val bounds = cum.groupBy("event_type")
          .agg(
            min(when(col("cum") * 4 >= col("n"), col("v"))).as("t1"),
            min(when(col("cum") * 2 >= col("n"), col("v"))).as("t2"),
            min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("t3"))
        cum.join(broadcast(bounds), "event_type")
          .withColumn("bin",
            lit(1L) + (col("v") > col("t1")).cast("long") +
              (col("v") > col("t2")).cast("long") +
              (col("v") > col("t3")).cast("long"))
          .groupBy("event_type", "bin")
          .agg(sum("c").as("n_rows"), min("v").as("lo"), max("v").as("hi"))
          .orderBy("event_type", "bin")
      }),

      // --- Benjamini-Hochberg FDR step-up over the (source, lang)
      // metric grid: the multiple-testing gate every experimentation /
      // data-quality platform needs once it tests MANY cells at once —
      // control the EXPECTED share of false rejections at q=0.25
      // instead of Bonferroni's family-wise overkill. Per cell, a 2x2
      // chi-square of long-doc rate (n_chars >= 350) vs the rest of
      // the corpus, computed as ONE fixed IEEE tree off exact int64
      // cell counts (the q_ab_srm discipline); the monotone proxy
      // p = 1/(1+chi2) preserves the chi-square order exactly, which
      // is all BH's rank comparison consumes. The step-up itself:
      // rank cells by p ascending, k* = max{i : p_i*m <= q*i}, reject
      // ranks <= k*. The rank window is over the O(sources x langs)
      // CELL grid — schema constants, never corpus-sized — and k*
      // is one 1-row aggregate crossed back (AQE broadcasts). ---
      "q_fdr_bh" -> ((s, d) => {
        val pr = longDocCellP(s, d)
        // rank over the bounded cell grid (<= sources x langs rows)
        val rk = pr.withColumn("rnk",
          row_number().over(Window.orderBy("p", "source", "lang"))
            .cast("long"))
        val ks = rk.agg(coalesce(max(when(
          col("p") * col("m").cast("double") <= lit(0.25) *
            col("rnk").cast("double"), col("rnk"))), lit(0L)).as("kstar"))
        rk.crossJoin(ks)
          .select(col("source"), col("lang"), col("n_cell"), col("n_long"),
            col("chi2"), col("p"), col("rnk"),
            (col("rnk") <= col("kstar")).as("rejected"))
          .orderBy("rnk")
      }),

      // --- Benjamini-Yekutieli FDR gate (round 16): the third
      // multiple-testing contract over the SAME (source, lang) cell
      // grid — BH assumes independence/PRDS across cells, which
      // source×lang quality cells (shared corpus margins) do not
      // obviously satisfy; BY divides the budget by the harmonic
      // number H(m) and stays valid under ARBITRARY dependence.
      // H(m) accumulates on the exact 10⁻¹² reciprocal grid
      // (10¹² div rnk per ranked cell — no order-dependent FP sum);
      // the step-up cut mirrors q_fdr_bh with the extra H factor.
      // O(sources × langs) rows throughout. ---
      "q_fdr_by" -> ((s, d) => {
        val pr = longDocCellP(s, d)
        val rk = pr.withColumn("rnk",
          row_number().over(Window.orderBy("p", "source", "lang"))
            .cast("long"))
        val hm = rk.agg(sum(expr("1000000000000 div rnk"))
          .cast("long").as("hq"))
        val ks = rk.crossJoin(broadcast(hm))
          .groupBy("hq")
          .agg(coalesce(max(when(
            col("p") * col("m").cast("double")
              * (col("hq").cast("double") / 1e12)
              <= lit(0.25) * col("rnk").cast("double"), col("rnk"))),
            lit(0L)).as("kstar"))
        rk.crossJoin(broadcast(ks))
          .select(col("source"), col("lang"), col("n_cell"),
            col("n_long"), col("chi2"), col("p"), col("rnk"),
            (col("hq").cast("double") / 1e12).as("h_m"),
            (col("rnk") <= col("kstar")).as("rejected"))
          .orderBy("rnk")
      }),

      // --- Holm step-down family-wise gate (round 16): the SAME
      // (source, lang) cell grid and chi-square proxy p-values as
      // q_fdr_bh, under the OTHER canonical multiple-testing contract
      // — control the probability of ANY false rejection (FWER) at
      // α = 0.25, uniformly more powerful than plain Bonferroni.
      // Adjusted p_i = min(1, max_{j<=i} (m−j+1)·p_j) via a running
      // max over the rank window (the monotone enforcement step that
      // makes step-down coherent); reject where adjusted p ≤ α. The
      // windows run over the O(sources × langs) cell grid — schema
      // constants. The FP running max is order-fixed by the rank
      // window on both engines. ---
      "q_holm" -> ((s, d) => {
        val pr = longDocCellP(s, d)
        val rk = pr.withColumn("rnk",
          row_number().over(Window.orderBy("p", "source", "lang"))
            .cast("long"))
        val wRun = Window.orderBy("rnk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rk.withColumn("adj_p",
            least(lit(1.0),
              max((col("m") - col("rnk") + 1L).cast("double")
                * col("p")).over(wRun)))
          .select(col("source"), col("lang"), col("n_cell"),
            col("n_long"), col("chi2"), col("p"), col("rnk"),
            col("adj_p"), (col("adj_p") <= 0.25).as("rejected"))
          .orderBy("rnk")
      }),

      // --- group-sequential SPRT gate (daily looks): Wald's sequential
      // probability ratio test of the purchase share, H0 p=0.18 vs H1
      // p=0.22, alpha=beta=0.05, evaluated at DAILY checkpoints per
      // arm — the "peek early, stop early" discipline real experiment
      // platforms run instead of fixed-horizon tests. The two
      // log-likelihood increments and the log((1-b)/a) thresholds are
      // precomputed MICRO-NAT INTEGER literals (ln(22/18)=+200671,
      // ln(78/82)=-50010, ln(19)=+/-2944439), so the cumulative LLR is
      // exact int64 arithmetic — no libm on either engine. Cumulation
      // runs over the O(days) per-arm grid (bounded by the calendar,
      // never corpus-sized); the first-crossing day is one per-arm
      // window min. ---
      "q_sprt_gate" -> ((s, d) => {
        val daily = table(s, d, "events")
          .groupBy((col("user_id") % 2).as("arm"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("n_d"),
            sum((col("event_type") === "purchase").cast("long")).as("s_d"))
        val wc = Window.partitionBy("arm").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = daily
          .withColumn("cum_n", sum("n_d").over(wc))
          .withColumn("cum_s", sum("s_d").over(wc))
          .withColumn("llr_micro",
            col("cum_s") * SprtSucc -
              (col("cum_n") - col("cum_s")) * SprtFail)
          .withColumn("state",
            when(col("llr_micro") >= SprtThresh, "accept_h1")
              .when(col("llr_micro") <= -SprtThresh, "accept_h0")
              .otherwise("continue"))
        // the decision column is CAUSAL (running min up to this look):
        // rows before the crossing read null, the crossing and every
        // later look read the first crossing day — exactly the state
        // an online monitor can know, which is what lets the streamed
        // twin (q_streaming_sprt) emit bit-equal rows as days close
        cum.withColumn("first_decision_day",
            min(when(col("state") =!= "continue", col("day")))
              .over(Window.partitionBy("arm").orderBy("day")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("arm"), col("day"), col("cum_n"), col("cum_s"),
            col("llr_micro"), col("state"), col("first_decision_day"))
          .orderBy("arm", "day")
      }),

      // --- delta-method variance for a RATIO metric (clicks/views per
      // arm): the correct uncertainty for ratio-of-sums metrics, where
      // the naive per-user-ratio variance is both biased and undefined
      // for zero-view users. Var(X̄/Ȳ) ≈ (σx² − 2R·σxy + R²·σy²) /
      // (μy²·n), every moment from exact int64 per-user count sums
      // (the q_cuped_adjust discipline) and the whole estimator ONE
      // fixed IEEE tree replayed identically by the oracle. One
      // user-keyed aggregate + one O(arms) rollup. ---
      "q_delta_method" -> ((s, d) => {
        val per = table(s, d, "events")
          .groupBy(col("user_id"))
          .agg(sum((col("event_type") === "click").cast("long")).as("x"),
            sum((col("event_type") === "view").cast("long")).as("y"))
          .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
        val g = per.groupBy("arm")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
        val n = col("n").cast("double")
        val r = col("sx").cast("double") / col("sy").cast("double")
        val my = col("sy").cast("double") / n
        val vx = (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx") / n) / n
        val vy = (col("syy").cast("double") -
          col("sy").cast("double") * col("sy") / n) / n
        val cxy = (col("sxy").cast("double") -
          col("sx").cast("double") * col("sy") / n) / n
        val varR = (vx - lit(2.0) * r * cxy + r * r * vy) / (my * my * n)
        g.select(col("arm"), col("n"), col("sx").as("sum_clicks"),
            col("sy").as("sum_views"), r.as("ratio"),
            varR.as("var_delta"), sqrt(varR).as("se"))
          .orderBy("arm")
      }),

      // --- minimum-detectable-effect grid: the experiment-DESIGN
      // readout — at the observed conversion base rate, the smallest
      // absolute/relative lift a two-proportion z-test resolves
      // (α=0.05 two-sided, 80% power) at full, half and quarter
      // enrollment. z_{α/2}+z_β is the precomputed literal 2.801585219
      // (no inverse-normal on either engine); the rest is one exact
      // user-grain aggregate + a 3-row scenario explode + a fixed
      // sqrt tree. 1-row input, O(scenarios) out. ---
      "q_power_mde" -> ((s, d) => {
        val g = table(s, d, "events")
          .groupBy("user_id")
          .agg(max((col("event_type") === "purchase").cast("long"))
            .as("conv"))
          .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
        val p = col("n_conv").cast("double") / col("n_users").cast("double")
        g.select(explode(array(lit(1L), lit(2L), lit(4L))).as("divisor"),
            col("n_users"), col("n_conv"))
          .withColumn("n_per_arm", expr("(n_users div 2) div divisor"))
          .select(col("divisor"), col("n_per_arm"), p.as("p_base"),
            (lit(2.801585219) * sqrt(lit(2.0) * p * (lit(1.0) - p) /
              col("n_per_arm").cast("double"))).as("mde_abs"),
            (lit(2.801585219) * sqrt(lit(2.0) * p * (lit(1.0) - p) /
              col("n_per_arm").cast("double")) / p).as("mde_rel"))
          .orderBy("divisor")
      })
    )

  override def oracle: Map[String, String] = Map(

    "q_hoeffding_gate" ->
      """WITH per AS (SELECT user_id % 2 AS arm,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv1
        |  FROM per),
        |e AS (SELECT n0, conv0, n1, conv1,
        |    CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |    CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |    sqrt(3.6888794541139363e0 /
        |      (2.0 * CAST(n0 AS DOUBLE))) AS eps0,
        |    sqrt(3.6888794541139363e0 /
        |      (2.0 * CAST(n1 AS DOUBLE))) AS eps1
        |  FROM c)
        |SELECT n0, conv0, n1, conv1, p0, p1, eps0, eps1,
        |  abs(p0 - p1) AS gap,
        |  abs(p0 - p1) > eps0 + eps1 AS separated
        |FROM e""".stripMargin,

    "q_ab_srm" -> {
      def comp(o: String, w: Int): String =
        s"CAST(16 * $o - $w * n AS DOUBLE) * " +
          s"CAST(16 * $o - $w * n AS DOUBLE) / (16.0 * $w * n)"
      s"""WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |      <= 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |    CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |      > 'b' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |    CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |      > 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
         |  FROM documents),
         |c AS (SELECT n, n_train, n_val, n_test,
         |    ${comp("n_train", 12)} + ${comp("n_val", 2)}
         |      + ${comp("n_test", 2)} AS chi2
         |  FROM g)
         |SELECT n, n_train, n_val, n_test, chi2,
         |  chi2 > 5.991 AS srm_detected
         |FROM c""".stripMargin
    },
    "q_design_effect" ->
      """WITH e AS (SELECT user_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS x FROM events),
        |per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(x) AS BIGINT) AS sg,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
        |  FROM e GROUP BY user_id),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_users,
        |    CAST(SUM(m) AS BIGINT) AS n,
        |    CAST(SUM(sg) AS BIGINT) AS s_tot,
        |    CAST(SUM(qg) AS HUGEINT) AS q_tot,
        |    CAST(SUM(CAST(round(CAST(sg AS DOUBLE) * sg / m
        |      * 1000000.0, 0) AS HUGEINT)) AS HUGEINT) AS gq
        |  FROM per),
        |b AS (SELECT k_users, n,
        |    CAST(gq AS DOUBLE) / 1000000.0 AS gsum,
        |    CAST(s_tot AS DOUBLE) AS std,
        |    CAST(q_tot AS DOUBLE) AS qtd
        |  FROM a),
        |c AS (SELECT k_users, n,
        |    (gsum - std * std / n) / CAST(k_users - 1 AS DOUBLE)
        |      AS msb,
        |    (qtd - gsum) / CAST(n - k_users AS DOUBLE) AS msw,
        |    CAST(n AS DOUBLE) / k_users AS m_bar
        |  FROM b)
        |SELECT k_users, n,
        |  CASE WHEN k_users > 1 AND n > k_users THEN msb END AS msb,
        |  CASE WHEN k_users > 1 AND n > k_users THEN msw END AS msw,
        |  m_bar,
        |  CASE WHEN k_users > 1 AND n > k_users THEN
        |    (msb - msw) / (msb + (m_bar - 1.0) * msw) END AS icc,
        |  CASE WHEN k_users > 1 AND n > k_users THEN
        |    1.0 + (m_bar - 1.0)
        |      * ((msb - msw) / (msb + (m_bar - 1.0) * msw)) END
        |    AS deff
        |FROM c""".stripMargin,

    "q_cuped_adjust" ->
      """WITH per AS (SELECT user_id % 2 AS arm,
        |    CAST(SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
        |        CAST(ts AS DATE)) < 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x,
        |    CAST(SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
        |        CAST(ts AS DATE)) >= 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY user_id),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM per),
        |th AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS th,
        |    CAST(sx AS DOUBLE) / n AS xg
        |  FROM g),
        |arm AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS na,
        |    CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay,
        |    CAST(SUM(x * x) AS BIGINT) AS axx,
        |    CAST(SUM(y * y) AS BIGINT) AS ayy,
        |    CAST(SUM(x * y) AS BIGINT) AS axy
        |  FROM per GROUP BY arm)
        |SELECT CAST(arm AS BIGINT) AS arm, na AS n,
        |  CAST(ay AS DOUBLE) / na AS mean_y,
        |  (CAST(ay AS DOUBLE) / na -
        |    th * (CAST(ax AS DOUBLE) / na - xg)) AS mean_y_adj,
        |  (CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * ay / na) / na
        |    AS var_y,
        |  ((CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * ay / na) / na
        |    - 2.0 * th * ((CAST(axy AS DOUBLE) -
        |        CAST(ax AS DOUBLE) * ay / na) / na)
        |    + th * th * ((CAST(axx AS DOUBLE) -
        |        CAST(ax AS DOUBLE) * ax / na) / na)) AS var_y_adj,
        |  (((CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * ay / na) / na
        |    - 2.0 * th * ((CAST(axy AS DOUBLE) -
        |        CAST(ax AS DOUBLE) * ay / na) / na)
        |    + th * th * ((CAST(axx AS DOUBLE) -
        |        CAST(ax AS DOUBLE) * ax / na) / na)) /
        |   ((CAST(ayy AS DOUBLE) - CAST(ay AS DOUBLE) * ay / na) / na))
        |    AS var_ratio
        |FROM arm CROSS JOIN th ORDER BY arm""".stripMargin,

    "q_order_gap_cv" ->
      """WITH l AS (SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id))) // 1000000 AS g
        |  FROM events),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(g) AS sg, SUM(g * g) AS sgg
        |  FROM l WHERE g IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(sg AS DOUBLE) / n AS mean_gap_s,
        |  sqrt((CAST(sgg AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / n) / n) /
        |    (CAST(sg AS DOUBLE) / n) AS cv
        |FROM m ORDER BY event_type""".stripMargin,

    "q_local_peaks" ->
      """WITH g AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, cnt,
        |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day)
        |      AS prev,
        |    lead(cnt) OVER (PARTITION BY event_type ORDER BY day)
        |      AS nxt
        |  FROM g)
        |SELECT event_type, day, cnt, prev, nxt
        |FROM w
        |WHERE prev IS NOT NULL AND nxt IS NOT NULL
        |  AND cnt > prev AND cnt > nxt
        |  AND cnt * 5 >= (prev + nxt) * 3
        |ORDER BY event_type, day""".stripMargin,

    "q_histogram_equidepth" ->
      """WITH dom AS (SELECT event_type,
        |    CAST(round(value, 0) AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM dom),
        |b AS (SELECT event_type,
        |    MIN(CASE WHEN cum * 4 >= n THEN v END) AS t1,
        |    MIN(CASE WHEN cum * 2 >= n THEN v END) AS t2,
        |    MIN(CASE WHEN cum * 4 >= n * 3 THEN v END) AS t3
        |  FROM cum GROUP BY event_type)
        |SELECT event_type,
        |  CAST(1 + CAST(v > t1 AS BIGINT) + CAST(v > t2 AS BIGINT) +
        |    CAST(v > t3 AS BIGINT) AS BIGINT) AS bin,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  MIN(v) AS lo, MAX(v) AS hi
        |FROM cum JOIN b USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "q_fdr_bh" ->
      """WITH cell AS (SELECT source, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_cell,
        |    CAST(SUM(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS atot,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM cell),
        |x AS (SELECT source, lang, n_cell, a, n_cell - a AS b,
        |    atot - a AS c, n - n_cell - (atot - a) AS dd, n, m
        |  FROM cell CROSS JOIN tot),
        |ch AS (SELECT source, lang, n_cell, a, m,
        |    CASE WHEN a + c > 0 AND b + dd > 0 AND c + dd > 0 THEN
        |      (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      * (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      / CAST(a + b AS DOUBLE) / CAST(c + dd AS DOUBLE)
        |      / CAST(a + c AS DOUBLE) / CAST(b + dd AS DOUBLE)
        |      * CAST(n AS DOUBLE) ELSE 0.0 END AS chi2
        |  FROM x),
        |pr AS (SELECT source, lang, n_cell, a, m, chi2,
        |    1.0 / (1.0 + chi2) AS p
        |  FROM ch),
        |rk AS (SELECT source, lang, n_cell, a, m, chi2, p,
        |    CAST(row_number() OVER (ORDER BY p, source, lang) AS BIGINT)
        |      AS rnk
        |  FROM pr),
        |ks AS (SELECT COALESCE(MAX(CASE WHEN p * CAST(m AS DOUBLE)
        |      <= 0.25 * CAST(rnk AS DOUBLE) THEN rnk END),
        |    0) AS kstar
        |  FROM rk)
        |SELECT source, lang, n_cell, a AS n_long, chi2, p, rnk,
        |  rnk <= kstar AS rejected
        |FROM rk CROSS JOIN ks ORDER BY rnk""".stripMargin,

    "q_fdr_by" ->
      """WITH cell AS (SELECT source, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_cell,
        |    CAST(SUM(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS atot,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM cell),
        |x AS (SELECT source, lang, n_cell, a, n_cell - a AS b,
        |    atot - a AS c, n - n_cell - (atot - a) AS dd, n, m
        |  FROM cell CROSS JOIN tot),
        |ch AS (SELECT source, lang, n_cell, a, m,
        |    CASE WHEN a + c > 0 AND b + dd > 0 AND c + dd > 0 THEN
        |      (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      * (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      / CAST(a + b AS DOUBLE) / CAST(c + dd AS DOUBLE)
        |      / CAST(a + c AS DOUBLE) / CAST(b + dd AS DOUBLE)
        |      * CAST(n AS DOUBLE) ELSE 0.0 END AS chi2
        |  FROM x),
        |pr AS (SELECT source, lang, n_cell, a, m, chi2,
        |    1.0 / (1.0 + chi2) AS p
        |  FROM ch),
        |rk AS (SELECT source, lang, n_cell, a, m, chi2, p,
        |    CAST(row_number() OVER (ORDER BY p, source, lang) AS BIGINT)
        |      AS rnk
        |  FROM pr),
        |hm AS (SELECT CAST(SUM(1000000000000 // rnk) AS BIGINT) AS hq
        |  FROM rk),
        |ks AS (SELECT hq, COALESCE(MAX(CASE WHEN p * CAST(m AS DOUBLE)
        |      * (CAST(hq AS DOUBLE) / 1e12)
        |      <= 0.25 * CAST(rnk AS DOUBLE) THEN rnk END),
        |    0) AS kstar
        |  FROM rk CROSS JOIN hm GROUP BY hq)
        |SELECT source, lang, n_cell, a AS n_long, chi2, p, rnk,
        |  CAST(hq AS DOUBLE) / 1e12 AS h_m,
        |  rnk <= kstar AS rejected
        |FROM rk CROSS JOIN ks ORDER BY rnk""".stripMargin,

    "q_holm" ->
      """WITH cell AS (SELECT source, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_cell,
        |    CAST(SUM(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n,
        |    CAST(SUM(a) AS BIGINT) AS atot,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM cell),
        |x AS (SELECT source, lang, n_cell, a, n_cell - a AS b,
        |    atot - a AS c, n - n_cell - (atot - a) AS dd, n, m
        |  FROM cell CROSS JOIN tot),
        |ch AS (SELECT source, lang, n_cell, a, m,
        |    CASE WHEN a + c > 0 AND b + dd > 0 AND c + dd > 0 THEN
        |      (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      * (CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
        |      / CAST(a + b AS DOUBLE) / CAST(c + dd AS DOUBLE)
        |      / CAST(a + c AS DOUBLE) / CAST(b + dd AS DOUBLE)
        |      * CAST(n AS DOUBLE) ELSE 0.0 END AS chi2
        |  FROM x),
        |pr AS (SELECT source, lang, n_cell, a, m, chi2,
        |    1.0 / (1.0 + chi2) AS p
        |  FROM ch),
        |rk AS (SELECT source, lang, n_cell, a, m, chi2, p,
        |    CAST(row_number() OVER (ORDER BY p, source, lang) AS BIGINT)
        |      AS rnk
        |  FROM pr),
        |ad AS (SELECT source, lang, n_cell, a, chi2, p, rnk,
        |    LEAST(1.0, MAX(CAST(m - rnk + 1 AS DOUBLE) * p)
        |      OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW)) AS adj_p
        |  FROM rk)
        |SELECT source, lang, n_cell, a AS n_long, chi2, p, rnk, adj_p,
        |  adj_p <= 0.25 AS rejected
        |FROM ad ORDER BY rnk""".stripMargin,

    "q_sprt_gate" ->
      """WITH daily AS (SELECT user_id % 2 AS arm,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_d,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s_d
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT arm, day,
        |    CAST(SUM(n_d) OVER (PARTITION BY arm ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_n,
        |    CAST(SUM(s_d) OVER (PARTITION BY arm ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_s
        |  FROM daily),
        |st AS (SELECT arm, day, cum_n, cum_s,
        |    cum_s * 200671 - (cum_n - cum_s) * 50010 AS llr_micro,
        |    CASE WHEN cum_s * 200671 - (cum_n - cum_s) * 50010
        |        >= 2944439 THEN 'accept_h1'
        |      WHEN cum_s * 200671 - (cum_n - cum_s) * 50010
        |        <= -2944439 THEN 'accept_h0'
        |      ELSE 'continue' END AS state
        |  FROM cum)
        |SELECT arm, day, cum_n, cum_s, llr_micro, state,
        |  CAST(MIN(CASE WHEN state <> 'continue' THEN day END)
        |    OVER (PARTITION BY arm ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS first_decision_day
        |FROM st ORDER BY arm, day""".stripMargin,

    "q_delta_method" ->
      """WITH per AS (SELECT user_id % 2 AS arm,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM per GROUP BY arm),
        |t AS (SELECT arm, n, sx, sy,
        |    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vx,
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vy,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy
        |      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS cxy
        |  FROM g)
        |SELECT arm, n, sx AS sum_clicks, sy AS sum_views, r AS ratio,
        |  (vx - 2.0 * r * cxy + r * r * vy)
        |    / (my * my * CAST(n AS DOUBLE)) AS var_delta,
        |  sqrt((vx - 2.0 * r * cxy + r * r * vy)
        |    / (my * my * CAST(n AS DOUBLE))) AS se
        |FROM t ORDER BY arm""".stripMargin,

    "q_power_mde" ->
      """WITH u AS (SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(conv) AS BIGINT) AS n_conv
        |  FROM u),
        |sc AS (SELECT unnest([CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |    CAST(4 AS BIGINT)]) AS divisor, n_users, n_conv
        |  FROM g),
        |x AS (SELECT divisor, (n_users // 2) // divisor AS n_per_arm,
        |    n_conv, n_users
        |  FROM sc)
        |SELECT divisor, n_per_arm,
        |  CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p_base,
        |  2.801585219 * sqrt(2.0
        |    * (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    / CAST(n_per_arm AS DOUBLE)) AS mde_abs,
        |  2.801585219 * sqrt(2.0
        |    * (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    / CAST(n_per_arm AS DOUBLE))
        |    / (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    AS mde_rel
        |FROM x ORDER BY divisor""".stripMargin
  )
}
