package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Training-mix planning operators (round 12): the arithmetic a
  * pretraining-data owner runs between "corpus is curated" and "launch
  * the run" — token-budget selection, epoch/step planning, truncation
  * waste, soft (down-weighted) dedup, CCNet-style perplexity
  * bucketing, and a two-phase annealed mixture schedule. All six carry
  * full DuckDB oracles.
  *
  * Determinism disciplines (see SURVEY §5): quality scores are INTEGER
  * ratios (`(nd*1000) div nt` — no FP threshold can disagree);
  * cumulative selection runs over score BANDS (bounded ≤1001 rows),
  * never a corpus-sized global window; per-doc weights quantize to
  * DECIMAL(18,4) before any sum; surprisal is the bin-length integer
  * floor-log2 (Scoring.bits — no libm).
  */
object TrainingMix extends QueryModule {

  private def toks: Column = split(col("text"), " ")

  /** Integer quality proxy: distinct-token rate in thousandths —
    * `(nd * 1000) div nt`, both longs, truncation = floor (positive).
    */
  private val scoreExpr = "(nd * 1000) div nt"

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- quality-ranked greedy selection under a global token
      // budget (40% of corpus tokens): the "which docs make the cut"
      // readout. Docs rank by integer quality score desc; the
      // cumulative-token curve is computed over SCORE BANDS (≤1001
      // rows — score is a thousandths ratio), so the only window runs
      // over a value-bounded relation and each band reports
      // kept / boundary / dropped against the budget line. The
      // corpus-sized work is one map-side score computation + one
      // groupBy(score) partial aggregate. ---
      "q_token_budget" -> ((s, d) => {
        val t = table(s, d, "documents")
          .select(lng(size(toks)).as("nt"),
            lng(size(array_distinct(toks))).as("nd"))
          .withColumn("score", expr(scoreExpr))
        val bd = t.groupBy("score")
          .agg(count(lit(1)).as("n_docs"),
            sum("nt").cast("long").as("band_tokens"))
        val tot = t.agg(sum("nt").cast("long").as("total"))
        val wb = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        bd.withColumn("cum_before",
            coalesce(sum("band_tokens").over(wb), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("budget", expr("(total * 2) div 5"))
          .select(col("score"), col("n_docs"), col("band_tokens"),
            (col("cum_before") + col("band_tokens")).as("cum_tokens"),
            when(col("cum_before") + col("band_tokens") <= col("budget"),
              "kept")
              .when(col("cum_before") >= col("budget"), "dropped")
              .otherwise("boundary").as("status"))
          .orderBy("score")
      }),

      // --- epoch/step plan per source at pack_len=512, global batch
      // 64 sequences: sequence counts and steps-per-epoch are exact
      // ceil-divisions; the per-source token allocation under the
      // sqrt-share target mix (same decimal-quantized sqrt spelling as
      // q_mix_weights) yields epochs_at_target — how many passes over
      // a source one total-corpus-sized run implies (the >1 values are
      // the up-sampled sources). One groupBy(source) + two broadcast
      // scalars; O(sources) output. ---
      "q_epoch_plan" -> ((s, d) => {
        val src = table(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("docs"),
            sum(size(toks)).cast("long").as("tokens"))
        val tot = src.agg(sum("tokens").cast("long").as("total"))
        val sh = src.crossJoin(broadcast(tot))
          .withColumn("n_seqs", expr("(tokens + 511) div 512"))
          .withColumn("steps_per_epoch",
            expr("(((tokens + 511) div 512) + 63) div 64"))
          .withColumn("p_raw",
            dec(sqrt(col("tokens").cast("double")
              / col("total").cast("double"))))
        val z = sh.agg(sum("p_raw").as("z"))
        sh.crossJoin(broadcast(z))
          .select(col("source"), col("docs"), col("tokens"),
            col("n_seqs"), col("steps_per_epoch"),
            (col("p_raw").cast("double") / col("z").cast("double"))
              .as("p_target"),
            (col("p_raw").cast("double") / col("z").cast("double")
              * col("total").cast("double") / col("tokens").cast("double"))
              .as("epochs_at_target"))
          .orderBy("source")
      }),

      // --- truncation/padding waste at a fixed context of 128 tokens
      // (one doc = one sequence, no packing — the naive baseline
      // q_pack_sequences improves on): per source, tokens lost to
      // truncation, pad slots burned, and the resulting context
      // utilization. Pure map-side integer aggregate — greatest/least
      // against the constant, no shuffle beyond the source rollup. ---
      "q_trunc_waste" -> ((s, d) => {
        val L = 128L
        table(s, d, "documents")
          .select(col("source"), lng(size(toks)).as("nt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("nt").cast("long").as("total_tokens"),
            sum((col("nt") > L).cast("long")).as("n_trunc_docs"),
            sum(greatest(col("nt") - L, lit(0L))).cast("long")
              .as("trunc_tokens"),
            sum(greatest(lit(L) - col("nt"), lit(0L))).cast("long")
              .as("pad_tokens"),
            sum(least(col("nt"), lit(L))).cast("long").as("kept_tokens"))
          .select(col("source"), col("n_docs"), col("total_tokens"),
            col("n_trunc_docs"), col("trunc_tokens"), col("pad_tokens"),
            (col("kept_tokens").cast("double")
              / (col("n_docs") * L).cast("double")).as("utilization"))
          .orderBy("source")
      }),

      // --- soft dedup: down-weight near-dup copies by 1/|cluster|
      // instead of deleting them (the loss-weighting alternative real
      // pipelines ship when dup removal is too aggressive). Reuses
      // q_dedup_cluster's min-label propagation (Dedup.clusterLoop —
      // the iterative phase shuffles only the skinny label/edge
      // relations); per-doc weight quantizes 1/n to DECIMAL(18,4)
      // BEFORE the sum so the per-source effective-doc/token masses
      // are exact decimal folds, never float accumulation. ---
      "q_soft_dedup" -> ((s, d) => {
        val pairs = TextPipeline.ngramPairs(s, d)
          .select(col("a_id"), col("b_id"))
        val labels = Dedup.clusterLoop(s, d, pairs)
          .select(col("doc_id"), col("n_members"))
        table(s, d, "documents")
          .select(col("doc_id"), col("source"), lng(size(toks)).as("nt"))
          .join(labels, "doc_id")
          .select(col("source"), col("nt"),
            dec(lit(1.0) / col("n_members")).as("w"),
            dec(col("nt").cast("double")
              * (lit(1.0) / col("n_members"))).as("wt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("w").cast("double").as("eff_docs"),
            sum("nt").cast("long").as("total_tokens"),
            sum("wt").cast("double").as("eff_tokens"))
          .select(col("source"), col("n_docs"), col("eff_docs"),
            col("total_tokens"), col("eff_tokens"),
            (col("eff_docs") / col("n_docs").cast("double"))
              .as("keep_ratio"))
          .orderBy("source")
      }),

      // --- CCNet-style head/middle/tail perplexity bucketing per
      // language: per-doc unigram surprisal (q_perplexity's integer
      // bin-length bits, scaled to thousandths per token), then
      // per-lang tertile THRESHOLDS read off the score-band cumulative
      // curve (cum*3 <= n — pure integer comparison, no quantile
      // interpolation to disagree on). Bands, not docs, flow through
      // the per-lang window (value-bounded relation); the threshold
      // table broadcasts back onto the bands. Boundary docs land with
      // their whole band — band-granular tertiles, identically on both
      // engines. ---
      "q_ccnet_buckets" -> ((s, d) => {
        val ex = table(s, d, "documents")
          .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
        // ONE tokenize pass (r18): reduce the occurrence stream to
        // per-(doc, tok) counts first — the vocabulary AND the per-doc
        // surprisal both derive from it (checkpointed, spread), so the
        // corpus is exploded once instead of twice and the vocab join
        // streams doc-distinct tokens instead of every occurrence.
        // sum_bits is unchanged exactly: k occurrences of one (doc,
        // tok) each contribute the same bits(n_total, c), so the
        // per-occurrence sum equals k * bits (bits < 64, k <= doc len
        // — the product is nowhere near int64).
        val tf = graft.Tables.spread(
          ex.groupBy("doc_id", "lang", "tok")
            .agg(count(lit(1)).as("k")).localCheckpoint())
        val vocab = tf.groupBy("tok").agg(sum("k").cast("long").as("c"))
        val tot = vocab.agg(sum(col("c")).cast("long").as("n_total"))
        val perDoc = tf.join(vocab, "tok")
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("lang"), col("k"),
            (col("k") * Scoring.bits(col("n_total"), col("c"))).as("b"))
          .groupBy("doc_id", "lang")
          .agg(sum("k").cast("long").as("n_tok"),
            sum("b").cast("long").as("sum_bits"))
          .withColumn("smilli", expr("(sum_bits * 1000) div n_tok"))
        val bands = perDoc.groupBy("lang", "smilli")
          .agg(count(lit(1)).as("cnt"),
            sum("n_tok").cast("long").as("tok_sum"))
        val wl = Window.partitionBy("lang").orderBy("smilli")
        val cum = bands.withColumn("cum", sum("cnt").over(wl))
        val n = perDoc.groupBy("lang").agg(count(lit(1)).as("n"))
        val th = cum.join(broadcast(n), "lang")
          .groupBy("lang")
          .agg(max(when(col("cum") * 3 <= col("n"), col("smilli")))
              .as("t1r"),
            max(when(col("cum") * 3 <= col("n") * 2, col("smilli")))
              .as("t2r"))
          .select(col("lang"), coalesce(col("t1r"), lit(-1L)).as("t1"),
            coalesce(col("t2r"), lit(-1L)).as("t2"))
        bands.join(broadcast(th), "lang")
          .withColumn("bucket",
            when(col("smilli") <= col("t1"), "head")
              .when(col("smilli") <= col("t2"), "middle")
              .otherwise("tail"))
          .groupBy("lang", "bucket")
          .agg(sum("cnt").cast("long").as("n_docs"),
            sum("tok_sum").cast("long").as("tokens"),
            min("smilli").as("min_score"), max("smilli").as("max_score"))
          .orderBy("lang", "bucket")
      }),

      // --- leave-one-source-out mixture ablation (round 12): for each
      // source REMOVED, the remaining corpus's doc/token mass, mean
      // integer quality, and language diversity — the "which source is
      // dragging the mix" table a curator reads before cutting one.
      // Everything derives from per-source and per-(source,lang)
      // aggregates (one corpus pass); the ablation arithmetic runs on
      // O(sources x langs) rows — global minus slice, never a second
      // scan per source. Entropy uses the banded integer bits
      // spelling (q_lang_mix_entropy), quality the exact decimal sum.
      "q_mixture_ablate" -> ((s, d) => {
        val base = table(s, d, "documents")
          .select(col("source"), col("lang"),
            lng(size(toks)).as("nt"),
            lng(size(array_distinct(toks))).as("nd"))
          .withColumn("score", expr(scoreExpr))
        val bySrc = base.groupBy("source")
          .agg(count(lit(1)).as("n_s"),
            sum("nt").cast("long").as("t_s"),
            sum(dec(col("score"))).as("q_s"))
        val glob = bySrc.agg(sum("n_s").cast("long").as("nn"),
          sum("t_s").cast("long").as("tt"), sum("q_s").as("qq"))
        val langCells = base.groupBy("lang").agg(count(lit(1)).as("cl"))
        val srcLang = base.groupBy("source", "lang")
          .agg(count(lit(1)).as("csl"))
        val ent = bySrc.select("source", "n_s")
          .crossJoin(broadcast(langCells))
          .join(srcLang, Seq("source", "lang"), "left")
          .select(col("source"), col("n_s"),
            (col("cl") - coalesce(col("csl"), lit(0L))).as("cr"))
          .filter(col("cr") > 0)
          .crossJoin(broadcast(glob.select("nn")))
          .select(col("source"),
            (col("cr") * (length(bin(expr("(nn - n_s) div cr"))) - 1)
              .cast("long")).as("contrib"))
          .groupBy("source").agg(sum("contrib").cast("long").as("hb"))
        bySrc.crossJoin(broadcast(glob))
          .join(ent, "source")
          .select(col("source"),
            (col("nn") - col("n_s")).as("docs_left"),
            (col("tt") - col("t_s")).as("tokens_left"),
            ((col("qq") - col("q_s")).cast("double")
              / (col("nn") - col("n_s")).cast("double"))
              .as("mean_score_left"),
            expr("hb div (nn - n_s)").as("h_band_left"))
          .orderBy("source")
      }),

      // --- two-phase annealed mixture schedule: the "upweight the
      // best data for the last 10% of training" recipe. Sources rank
      // by mean integer quality (decimal-exact average of the
      // thousandths score); the top-2 get 3x token mass in the anneal
      // phase; blended share = 0.9*base + 0.1*anneal. The only window
      // runs over the O(sources) relation; token masses stay integer
      // until the final share divisions. ---
      "q_anneal_mix" -> ((s, d) => {
        val src = table(s, d, "documents")
          .select(col("source"), lng(size(toks)).as("nt"),
            lng(size(array_distinct(toks))).as("nd"))
          .withColumn("score", expr(scoreExpr))
          .groupBy("source")
          .agg(count(lit(1)).as("docs"),
            sum("nt").cast("long").as("tokens"),
            avgd(col("score")).as("avg_score"))
        val w = Window.orderBy(col("avg_score").desc, col("source"))
        val rk = src
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("adj_tokens",
            col("tokens") * when(col("rnk") <= 2, 3L).otherwise(1L))
        val tot = rk.agg(sum("tokens").cast("long").as("tb"),
          sum("adj_tokens").cast("long").as("ta"))
        rk.crossJoin(broadcast(tot))
          .select(col("source"), col("docs"), col("tokens"),
            col("avg_score"), col("rnk"),
            (col("tokens").cast("double") / col("tb").cast("double"))
              .as("base_share"),
            (col("adj_tokens").cast("double") / col("ta").cast("double"))
              .as("anneal_share"),
            (lit(0.9) * (col("tokens").cast("double")
                / col("tb").cast("double"))
              + lit(0.1) * (col("adj_tokens").cast("double")
                / col("ta").cast("double"))).as("blended_share"))
          .orderBy("source")
      }),

      // --- temperature-scaled mixture weights (round 14): the
      // multilingual/multi-source sampling formula w_α(s) = n_s^α / Σ
      // n^α for α ∈ {0.25, 0.5, 0.75, 1} — lower temperature lifts
      // small sources (the mBERT/XLM-R exponent trick every
      // multi-source pretraining mix is provisioned with). All powers
      // are SQRT CHAINS (n^.5 = sqrt, n^.25 = sqrt∘sqrt, n^.75 =
      // their product): sqrt is IEEE correctly-rounded in both
      // engines, unlike pow — the same libm-avoidance discipline as
      // the floor-log2 surprisal. Each n^α quantizes to DECIMAL(18,4)
      // before the cross-source sum (order-free exact addition), and
      // uplift divides by the α=1 proportional weight. O(sources)
      // relations end-to-end; the corpus contributes one map-side
      // token count. ---
      "q_mix_temperature" -> ((s, d) => {
        def q(c: Column) = c.cast("decimal(18,4)")
        val td = col("tokens").cast("double")
        val sc = table(s, d, "documents")
          .select(col("source"), lng(size(toks)).as("nt"))
          .groupBy("source").agg(sum("nt").cast("long").as("tokens"))
          .withColumn("p25", q(sqrt(sqrt(td))))
          .withColumn("p50", q(sqrt(td)))
          .withColumn("p75", q(sqrt(td) * sqrt(sqrt(td))))
          .withColumn("p100", q(td))
        val tot = sc.agg(
          sum("p25").cast("double").as("s25"),
          sum("p50").cast("double").as("s50"),
          sum("p75").cast("double").as("s75"),
          sum("p100").cast("double").as("s100"))
        sc.crossJoin(broadcast(tot))
          .withColumn("w1",
            col("p100").cast("double") / col("s100"))
          .select(col("source"), col("tokens"), col("w1"),
            explode(array(
              struct(lit(0.25).as("alpha"),
                (col("p25").cast("double") / col("s25")).as("weight")),
              struct(lit(0.5).as("alpha"),
                (col("p50").cast("double") / col("s50")).as("weight")),
              struct(lit(0.75).as("alpha"),
                (col("p75").cast("double") / col("s75")).as("weight")),
              struct(lit(1.0).as("alpha"), col("w1").as("weight"))))
              .as("x"))
          .select(col("source"), col("x.alpha").as("alpha"),
            col("tokens"), col("x.weight").as("weight"),
            (col("x.weight") / col("w1")).as("uplift"))
          .orderBy("source", "alpha")
      }),

      // --- context-length provisioning grid (round 14): q_trunc_waste
      // at one L generalized to the curve a run owner actually reads —
      // per source × L ∈ {64,128,256,512}, the kept/truncated/padded
      // token budget and the two ratios that pick the context length
      // (utilization = kept / (docs·L) — padding waste; trunc_share =
      // truncated / total — information loss). One corpus scan
      // computes the token count map-side; the 4-way L grid rides a
      // generator explode, so the shuffle moves |sources|·4 aggregate
      // cells, never the corpus. ---
      "q_ctx_len_plan" -> ((s, d) => {
        val ls = Seq(64L, 128L, 256L, 512L)
        table(s, d, "documents")
          .select(col("source"), lng(size(toks)).as("nt"),
            explode(array(ls.map(lit(_)): _*)).as("L"))
          .groupBy("source", "L")
          .agg(count(lit(1)).as("n_docs"),
            sum("nt").cast("long").as("total_tokens"),
            sum(least(col("nt"), col("L"))).cast("long")
              .as("kept_tokens"),
            sum(greatest(col("nt") - col("L"), lit(0L))).cast("long")
              .as("trunc_tokens"),
            sum(greatest(col("L") - col("nt"), lit(0L))).cast("long")
              .as("pad_tokens"),
            sum((col("nt") > col("L")).cast("long"))
              .as("n_trunc_docs"))
          .select(col("source"), col("L"), col("n_docs"),
            col("total_tokens"), col("kept_tokens"),
            col("trunc_tokens"), col("pad_tokens"), col("n_trunc_docs"),
            (col("kept_tokens").cast("double")
              / (col("n_docs") * col("L")).cast("double"))
              .as("utilization"),
            (col("trunc_tokens").cast("double")
              / col("total_tokens").cast("double")).as("trunc_share"))
          .orderBy("source", "L")
      })
    )

  private val scoreSql = "(nd * 1000) // nt"

  override def oracle: Map[String, String] = Map(

    "q_mix_temperature" ->
      """WITH src AS (SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |p AS (SELECT source, tokens,
        |    CAST(sqrt(sqrt(CAST(tokens AS DOUBLE))) AS DECIMAL(18,4))
        |      AS p25,
        |    CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(18,4)) AS p50,
        |    CAST(sqrt(CAST(tokens AS DOUBLE))
        |      * sqrt(sqrt(CAST(tokens AS DOUBLE))) AS DECIMAL(18,4))
        |      AS p75,
        |    CAST(CAST(tokens AS DOUBLE) AS DECIMAL(18,4)) AS p100
        |  FROM src),
        |t AS (SELECT CAST(SUM(p25) AS DOUBLE) AS s25,
        |    CAST(SUM(p50) AS DOUBLE) AS s50,
        |    CAST(SUM(p75) AS DOUBLE) AS s75,
        |    CAST(SUM(p100) AS DOUBLE) AS s100 FROM p),
        |e AS (
        |  SELECT source, tokens, 0.25 AS alpha,
        |    CAST(p25 AS DOUBLE) / s25 AS weight,
        |    CAST(p100 AS DOUBLE) / s100 AS w1 FROM p CROSS JOIN t
        |  UNION ALL SELECT source, tokens, 0.5,
        |    CAST(p50 AS DOUBLE) / s50, CAST(p100 AS DOUBLE) / s100
        |  FROM p CROSS JOIN t
        |  UNION ALL SELECT source, tokens, 0.75,
        |    CAST(p75 AS DOUBLE) / s75, CAST(p100 AS DOUBLE) / s100
        |  FROM p CROSS JOIN t
        |  UNION ALL SELECT source, tokens, 1.0,
        |    CAST(p100 AS DOUBLE) / s100, CAST(p100 AS DOUBLE) / s100
        |  FROM p CROSS JOIN t)
        |SELECT source, CAST(alpha AS DOUBLE) AS alpha, tokens, weight,
        |  weight / w1 AS uplift
        |FROM e ORDER BY source, alpha""".stripMargin,

    "q_ctx_len_plan" ->
      """WITH tw AS (SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |g AS (SELECT source, nt, L
        |  FROM tw, unnest([CAST(64 AS BIGINT), CAST(128 AS BIGINT),
        |    CAST(256 AS BIGINT), CAST(512 AS BIGINT)]) AS u(L))
        |SELECT source, L, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  CAST(SUM(LEAST(nt, L)) AS BIGINT) AS kept_tokens,
        |  CAST(SUM(GREATEST(nt - L, 0)) AS BIGINT) AS trunc_tokens,
        |  CAST(SUM(GREATEST(L - nt, 0)) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(CASE WHEN nt > L THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_trunc_docs,
        |  CAST(SUM(LEAST(nt, L)) AS DOUBLE)
        |    / CAST(COUNT(*) * L AS DOUBLE) AS utilization,
        |  CAST(SUM(GREATEST(nt - L, 0)) AS DOUBLE)
        |    / CAST(SUM(nt) AS DOUBLE) AS trunc_share
        |FROM g GROUP BY source, L ORDER BY source, L""".stripMargin,

    "q_token_budget" ->
      """WITH tq AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
        |              AS nt,
        |            CAST(len(list_distinct(string_split(text, ' ')))
        |              AS BIGINT) AS nd
        |          FROM documents),
        |sq AS (SELECT nt, (nd * 1000) // nt AS score FROM tq),
        |bd AS (SELECT score, COUNT(*) AS n_docs,
        |         CAST(SUM(nt) AS BIGINT) AS band_tokens
        |       FROM sq GROUP BY score),
        |tb AS (SELECT (CAST(SUM(nt) AS BIGINT) * 2) // 5 AS budget
        |       FROM sq),
        |cm AS (SELECT score, n_docs, band_tokens,
        |         CAST(COALESCE(SUM(band_tokens) OVER (ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS cum_before
        |       FROM bd)
        |SELECT score, n_docs, band_tokens,
        |  cum_before + band_tokens AS cum_tokens,
        |  CASE WHEN cum_before + band_tokens <= budget THEN 'kept'
        |       WHEN cum_before >= budget THEN 'dropped'
        |       ELSE 'boundary' END AS status
        |FROM cm CROSS JOIN tb ORDER BY score""".stripMargin,

    "q_epoch_plan" ->
      """WITH sr AS (SELECT source, COUNT(*) AS docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |           AS tokens
        |       FROM documents GROUP BY source),
        |tt AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM sr),
        |sh AS (SELECT source, docs, tokens, total,
        |         (tokens + 511) // 512 AS n_seqs,
        |         (((tokens + 511) // 512) + 63) // 64 AS steps_per_epoch,
        |         CAST(sqrt(CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE))
        |           AS DECIMAL(18,4)) AS p_raw
        |       FROM sr CROSS JOIN tt),
        |zz AS (SELECT SUM(p_raw) AS z FROM sh)
        |SELECT source, docs, tokens, n_seqs, steps_per_epoch,
        |  CAST(p_raw AS DOUBLE) / CAST(z AS DOUBLE) AS p_target,
        |  CAST(p_raw AS DOUBLE) / CAST(z AS DOUBLE)
        |    * CAST(total AS DOUBLE) / CAST(tokens AS DOUBLE)
        |    AS epochs_at_target
        |FROM sh CROSS JOIN zz ORDER BY source""".stripMargin,

    "q_trunc_waste" ->
      """WITH tw AS (SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |       FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |  CAST(SUM(CASE WHEN nt > 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_trunc_docs,
        |  CAST(SUM(greatest(nt - 128, 0)) AS BIGINT) AS trunc_tokens,
        |  CAST(SUM(greatest(128 - nt, 0)) AS BIGINT) AS pad_tokens,
        |  CAST(SUM(least(nt, 128)) AS DOUBLE)
        |    / CAST(COUNT(*) * 128 AS DOUBLE) AS utilization
        |FROM tw GROUP BY source ORDER BY source""".stripMargin,

    "q_soft_dedup" ->
      s"""WITH RECURSIVE ${TextPipeline.ngramPairCte},
         |ed2 AS (SELECT a_id AS src, b_id AS dst FROM p
         |        UNION ALL
         |        SELECT b_id, a_id FROM p),
         |rr AS (SELECT doc_id AS doc, doc_id AS reach FROM documents
         |       UNION
         |       SELECT rr.doc, ed2.dst FROM rr
         |       JOIN ed2 ON ed2.src = rr.reach),
         |cl2 AS (SELECT doc AS doc_id, MIN(reach) AS cluster_id
         |        FROM rr GROUP BY doc),
         |sz2 AS (SELECT cluster_id, COUNT(*) AS n_members
         |        FROM cl2 GROUP BY cluster_id),
         |dw AS (SELECT d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
         |         CAST(CAST(1.0 AS DOUBLE) / sz2.n_members
         |           AS DECIMAL(18,4)) AS w,
         |         CAST(CAST(len(string_split(d.text, ' ')) AS DOUBLE)
         |           * (CAST(1.0 AS DOUBLE) / sz2.n_members)
         |           AS DECIMAL(18,4)) AS wt
         |       FROM documents d
         |       JOIN cl2 ON cl2.doc_id = d.doc_id
         |       JOIN sz2 USING (cluster_id))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(w) AS DOUBLE) AS eff_docs,
         |  CAST(SUM(nt) AS BIGINT) AS total_tokens,
         |  CAST(SUM(wt) AS DOUBLE) AS eff_tokens,
         |  CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS keep_ratio
         |FROM dw GROUP BY source ORDER BY source""".stripMargin,

    "q_ccnet_buckets" ->
      """WITH ex AS (SELECT doc_id, lang,
        |              unnest(string_split(text, ' ')) AS tok
        |            FROM documents),
        |vb AS (SELECT tok, COUNT(*) AS c FROM ex GROUP BY tok),
        |tv AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM vb),
        |pd AS (SELECT doc_id, lang, COUNT(*) AS n_tok,
        |         CAST(SUM(CAST(length(bin(CAST(floor(
        |           CAST(n_total AS DOUBLE) / c) AS BIGINT))) - 1
        |           AS BIGINT)) AS BIGINT) AS sum_bits
        |       FROM ex JOIN vb USING (tok) CROSS JOIN tv
        |       GROUP BY doc_id, lang),
        |ps AS (SELECT doc_id, lang, n_tok,
        |         (sum_bits * 1000) // n_tok AS smilli
        |       FROM pd),
        |bn AS (SELECT lang, smilli, COUNT(*) AS cnt,
        |         CAST(SUM(n_tok) AS BIGINT) AS tok_sum
        |       FROM ps GROUP BY lang, smilli),
        |cw AS (SELECT lang, smilli, cnt, tok_sum,
        |         CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY smilli
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum
        |       FROM bn),
        |nn AS (SELECT lang, COUNT(*) AS n FROM ps GROUP BY lang),
        |th AS (SELECT cw.lang,
        |         COALESCE(MAX(CASE WHEN cum * 3 <= n THEN smilli END),
        |           -1) AS t1,
        |         COALESCE(MAX(CASE WHEN cum * 3 <= n * 2 THEN smilli
        |           END), -1) AS t2
        |       FROM cw JOIN nn ON nn.lang = cw.lang
        |       GROUP BY cw.lang)
        |SELECT bn.lang,
        |  CASE WHEN smilli <= t1 THEN 'head'
        |       WHEN smilli <= t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |  CAST(SUM(tok_sum) AS BIGINT) AS tokens,
        |  MIN(smilli) AS min_score, MAX(smilli) AS max_score
        |FROM bn JOIN th ON th.lang = bn.lang
        |GROUP BY bn.lang, CASE WHEN smilli <= t1 THEN 'head'
        |  WHEN smilli <= t2 THEN 'middle' ELSE 'tail' END
        |ORDER BY bn.lang, bucket""".stripMargin,

    "q_mixture_ablate" ->
      """WITH b4 AS (SELECT source, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |         (CAST(len(list_distinct(string_split(text, ' ')))
        |            AS BIGINT) * 1000)
        |           // CAST(len(string_split(text, ' ')) AS BIGINT)
        |           AS score
        |       FROM documents),
        |bs AS (SELECT source, COUNT(*) AS n_s,
        |         CAST(SUM(nt) AS BIGINT) AS t_s,
        |         SUM(CAST(score AS DECIMAL(18,4))) AS q_s
        |       FROM b4 GROUP BY source),
        |gl AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn,
        |         CAST(SUM(t_s) AS BIGINT) AS tt, SUM(q_s) AS qq
        |       FROM bs),
        |lc AS (SELECT lang, COUNT(*) AS cl FROM b4 GROUP BY lang),
        |slc AS (SELECT source, lang, COUNT(*) AS csl
        |        FROM b4 GROUP BY 1, 2),
        |cr2 AS (SELECT bs.source, bs.n_s, lc.lang,
        |          lc.cl - COALESCE(slc.csl, 0) AS cr
        |        FROM bs CROSS JOIN lc
        |        LEFT JOIN slc ON slc.source = bs.source
        |          AND slc.lang = lc.lang),
        |en AS (SELECT cr2.source,
        |         CAST(SUM(cr * CAST(length(bin((nn - n_s) // cr)) - 1
        |           AS BIGINT)) AS BIGINT) AS hb
        |       FROM cr2 CROSS JOIN gl
        |       WHERE cr > 0 GROUP BY 1)
        |SELECT bs.source, nn - n_s AS docs_left,
        |  tt - t_s AS tokens_left,
        |  CAST(qq - q_s AS DOUBLE) / CAST(nn - n_s AS DOUBLE)
        |    AS mean_score_left,
        |  CAST(hb // (nn - n_s) AS BIGINT) AS h_band_left
        |FROM bs JOIN en ON en.source = bs.source CROSS JOIN gl
        |ORDER BY bs.source""".stripMargin,

    "q_anneal_mix" ->
      """WITH sd AS (SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |         CAST(len(list_distinct(string_split(text, ' ')))
        |           AS BIGINT) AS nd
        |       FROM documents),
        |sg AS (SELECT source, COUNT(*) AS docs,
        |         CAST(SUM(nt) AS BIGINT) AS tokens,
        |         (CAST(SUM(CAST((nd * 1000) // nt AS DECIMAL(18,4)))
        |            AS DOUBLE) / COUNT(*)) AS avg_score
        |       FROM sd GROUP BY source),
        |rk AS (SELECT source, docs, tokens, avg_score,
        |         CAST(ROW_NUMBER() OVER (ORDER BY avg_score DESC, source)
        |           AS BIGINT) AS rnk
        |       FROM sg),
        |aj AS (SELECT source, docs, tokens, avg_score, rnk,
        |         tokens * (CASE WHEN rnk <= 2 THEN 3 ELSE 1 END)
        |           AS adj_tokens
        |       FROM rk),
        |tl AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tb,
        |         CAST(SUM(adj_tokens) AS BIGINT) AS ta
        |       FROM aj)
        |SELECT source, docs, tokens, avg_score, rnk,
        |  CAST(tokens AS DOUBLE) / CAST(tb AS DOUBLE) AS base_share,
        |  CAST(adj_tokens AS DOUBLE) / CAST(ta AS DOUBLE) AS anneal_share,
        |  0.9 * (CAST(tokens AS DOUBLE) / CAST(tb AS DOUBLE))
        |    + 0.1 * (CAST(adj_tokens AS DOUBLE) / CAST(ta AS DOUBLE))
        |    AS blended_share
        |FROM aj CROSS JOIN tl ORDER BY source""".stripMargin
  )
}
