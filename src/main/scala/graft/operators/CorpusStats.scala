package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Corpus composition & behavior readouts (round 8, batch 10):
  * categorical drift effect size (Cramér's V), U-shaped multi-touch
  * attribution, KWIC concordance, the top-k n-gram coverage curve,
  * Simpson diversity, and rank-biased overlap between two token
  * rankings with exact dyadic weights. All six carry full DuckDB
  * oracles.
  *
  * Determinism: exact int64 counting throughout; the only non-terminal
  * doubles are the U-shaped middle credits (a fixed per-touch tree,
  * quantized through DECIMAL(18,4) before summation) and RBO stays
  * exact-integer via 2^k·lcm(1..10) scaling until ONE division.
  */
object CorpusStats extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- hapax-legomena profile per source (round 15): the share of
      // each source's vocabulary that occurs EXACTLY ONCE corpus-wide —
      // the classic lexical-richness / OCR-noise signal (clean prose
      // runs ~40-60% hapax; boilerplate and template farms collapse it,
      // gibberish inflates it). Work: one (source, token) aggregate, a
      // vocabulary-keyed rollup to corpus frequency, one vocab-keyed
      // join back (both relations are skinny token rows — the standard
      // vocabulary shuffle, never document payloads), then an
      // O(sources) rollup. A corpus-hapax token lives in exactly one
      // source, so per-source hapax counts partition the global hapax
      // set. ---
      "q_hapax_ratio" -> ((s, d) => {
        val tf = table(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) > 0)
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
        val g = tf.groupBy("t").agg(sum("c").as("n"))
        tf.join(g, "t")
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            sum("c").cast("long").as("n_tokens"),
            sum((col("n") === 1).cast("long")).as("n_hapax"))
          .withColumn("hapax_share",
            col("n_hapax").cast("double") / col("n_types"))
          .orderBy("source")
      }),

      // --- type-token ratio per source (round 15): vocabulary size
      // over token volume, plus Guiraud's root-TTR (types/sqrt(tokens),
      // the length-corrected variant actually comparable across
      // sources of different size — raw TTR decays mechanically with
      // volume). One (source, token) aggregate then an O(sources)
      // rollup; sqrt is IEEE-correctly-rounded on both engines, and it
      // plus the two terminal divisions are the only FP ops. ---
      "q_ttr" -> ((s, d) => {
        table(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) > 0)
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            sum("c").cast("long").as("n_tokens"))
          .select(col("source"), col("n_types"), col("n_tokens"),
            (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
            (col("n_types").cast("double")
              / sqrt(col("n_tokens").cast("double"))).as("root_ttr"))
          .orderBy("source")
      }),

      // --- Yule's characteristic K per source (round 16): the
      // repeat-rate lexical-richness constant — K = 10⁴·(Σc² − N)/N²
      // over source-local token frequencies — which, unlike TTR,
      // is (approximately) invariant to corpus length and so directly
      // comparable across sources; inflated K marks template/boiler-
      // plate repetition the hapax share reads from the other end.
      // One (source, token) aggregate then an O(sources) rollup; the
      // moments (N, V, Σc²) are exact int64, FP is one fixed
      // multiply-divide tree. ---
      "q_yule_k" -> ((s, d) => {
        table(s, d, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) > 0)
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            sum("c").cast("long").as("n_tokens"),
            sum(col("c") * col("c")).cast("long").as("sum_c2"))
          .select(col("source"), col("n_types"), col("n_tokens"),
            (lit(10000.0)
              * (col("sum_c2") - col("n_tokens")).cast("double")
              / (col("n_tokens").cast("double")
                * col("n_tokens").cast("double"))).as("yule_k"))
          .orderBy("source")
      }),

      // --- Heaps-law vocabulary growth curve (round 15): cumulative
      // distinct vocabulary as the corpus accumulates in doc_id order,
      // over ten equal id bands — the readout that tells a crawl
      // whether new data still buys new vocabulary (V(n) ~ K·n^beta
      // flattening) or has gone stale. The device is exact and
      // window-free at corpus scale: a token's FIRST band is a min
      // aggregate, so "new types per band" is one vocabulary rollup,
      // and the only window runs over the ten band rows. Band bounds
      // ride a broadcast 1-row max; integer band arithmetic end to
      // end. ---
      "q_heaps_law" -> ((s, d) => {
        val mx = table(s, d, "documents")
          .agg((max("doc_id") + 1).as("mxid"))
        val tok = table(s, d, "documents")
          .crossJoin(broadcast(mx))
          .select(expr("doc_id * 10 div mxid").as("band"),
            explode(split(col("text"), " ")).as("t"))
          .filter(length(col("t")) > 0)
        val perBand = tok.groupBy("band").agg(count(lit(1)).as("n_tokens"))
        val firstB = tok.groupBy("t").agg(min("band").as("band"))
          .groupBy("band").agg(count(lit(1)).as("new_types"))
        val w = Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perBand.join(firstB, Seq("band"), "left")
          .na.fill(0L, Seq("new_types"))
          .withColumn("cum_tokens", sum("n_tokens").over(w).cast("long"))
          .withColumn("cum_types", sum("new_types").over(w).cast("long"))
          .orderBy("band")
      }),

      // --- Cramér's V on categorical drift: event-type mix, first half
      // of time vs second half (the effect-size companion to the PSI /
      // KS monitors — χ² says "significant", V says "big enough to
      // care"). The time cut comes from a broadcast 1-row bounds
      // aggregate (map-side CASE, the q_temporal_split discipline);
      // the contingency reduces to 2×k cells; with r=2, V =
      // sqrt(χ²/n). Cell terms sum through DECIMAL(18,4). ---
      "q_cramers_v" -> ((s, d) => {
        val ev = table(s, d, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"))
        val b = ev.agg(min("us").as("mn"), max("us").as("mx"))
        val cells = ev.crossJoin(broadcast(b))
          .select(col("event_type"),
            (col("us") >= col("mn") + expr("(mx - mn) div 2"))
              .cast("long").as("half"))
          .groupBy("half", "event_type").agg(count(lit(1)).as("o"))
        val rowt = cells.groupBy("half").agg(sum("o").as("rt"))
        val colt = cells.groupBy("event_type").agg(sum("o").as("ct"))
        val tot = cells.agg(sum("o").as("n"))
        val e = col("rt").cast("double") * col("ct") / col("n")
        val term = (col("o") - e) * (col("o") - e) / e
        cells
          .join(broadcast(rowt), "half")
          .join(broadcast(colt), "event_type")
          .crossJoin(broadcast(tot))
          .agg(max("n").as("n"), count(lit(1)).as("n_cells"),
            sum(dec(term)).cast("double").as("chi2"))
          .select(col("n"), col("n_cells"), col("chi2"),
            sqrt(col("chi2") / col("n")).as("cramers_v"))
      }),

      // --- U-shaped (position-based) multi-touch attribution: each
      // purchase credits its journey's touches 40% first / 40% last /
      // 20% split across the middles (the credit model between
      // first-touch and linear). Journeys are per-user runs ending at
      // a purchase — journey id is a prefix count of prior purchases,
      // so ONE user-keyed window pass builds position, length and
      // journey key together; per-touch credit is a fixed double tree
      // quantized through DECIMAL(18,4) before the channel rollup.
      // Everything shuffles once on user_id, then once on the O(k)
      // channel key. ---
      "q_attrib_ushape" -> ((s, d) => {
        val wj = Window.partitionBy("user_id", "jid")
        val marked = table(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("isp", (col("event_type") === "purchase")
            .cast("long"))
          .withColumn("jid", sum("isp").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("jid", coalesce(col("jid"), lit(0L)))
        val touches = marked.filter(col("isp") === 0L)
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id", "jid").orderBy("ts", "event_id"))
            .cast("long"))
          .withColumn("m", count(lit(1)).over(wj))
        // journeys that actually end in a purchase: the purchase with
        // prefix-count jid exists
        val convs = marked.filter(col("isp") === 1L)
          .select(col("user_id"), col("jid"))
        val credited = touches
          .join(convs, Seq("user_id", "jid"))
          .withColumn("credit",
            when(col("m") === 1L, lit(1.0))
              .when(col("m") === 2L, lit(0.5))
              .otherwise(
                when(col("pos") === 1L || col("pos") === col("m"), lit(0.4))
                  .otherwise(lit(0.2) / (col("m") - lit(2L)))))
        credited.groupBy(col("event_type").as("channel"))
          .agg(count(lit(1)).as("n_touches"),
            sum(dec(col("credit"))).cast("double").as("credit"))
          .orderBy("channel")
      }),

      // --- KWIC concordance for "join": the top (left, right) context
      // word pairs around every occurrence — the lexicographer's (and
      // prompt-engineer's) usage readout. Contexts come from lag/lead
      // over the doc-partitioned position order (document-sized
      // windows, embarrassingly parallel); the rollup is
      // vocabulary-bounded; top 15 by TakeOrdered. ---
      "q_concordance" -> ((s, d) => {
        val wd = Window.partitionBy("doc_id").orderBy("p")
        val toks = table(s, d, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("p0", "w")))
          .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
            col("w"))
        toks
          .withColumn("lft", lag("w", 1).over(wd))
          .withColumn("rgt", lead("w", 1).over(wd))
          .filter(col("w") === "join" && col("lft").isNotNull &&
            col("rgt").isNotNull)
          .groupBy(col("lft"), col("rgt"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("lft").asc, col("rgt").asc)
          .limit(15)
      }),

      // --- top-k n-gram coverage curve: what share of all bigram
      // occurrences do the top 10/100/1000 bigrams cover? (The
      // Zipf-mass readout a tokenizer-vocabulary or cache-sizing
      // decision reads.) Counts reduce to the vocabulary relation —
      // and the vocabulary-sized rank/cumsum windows are GONE: a
      // checkpoint rank k falls inside ONE tie group (all bigrams with
      // count c, ranks off+1..off+m, each adding the same c), so
      // cum(k) = cumoff + c·(k−off) in exact int64 on the O(distinct
      // counts) tie-group relation. The only window is the exclusive
      // prefix-sum over that boundary relation (the q_dense_ids
      // discipline); the 3-row checkpoint table broadcasts in.
      // Bit-identical to the global-rank spelling. ---
      "q_coverage_curve" -> ((s, d) => {
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
        import s.implicits._
        val ks = Seq(10L, 100L, 1000L).toDF("k")
        groups.crossJoin(broadcast(ks))
          .filter(col("k") > col("off") &&
            col("k") <= col("off") + col("m"))
          .withColumn("cum",
            col("cumoff") + col("c") * (col("k") - col("off")))
          .crossJoin(broadcast(tot))
          .select(col("k"), col("cum"), col("total"), col("vocab"),
            (col("cum").cast("double") / col("total")).as("coverage"))
          .orderBy("k")
      }),

      // --- Jensen-Shannon vocabulary drift proxy (round 9): the
      // symmetric distribution-level drift score between the two
      // corpus halves, in the integer floor-log2 device (the
      // q_feature_mi discipline — per-token ratios p/m and q/m floor
      // to signed bits, weighted by exact counts, zero libm, so the
      // whole score is bit-identical across engines). Complements
      // q_vocab_drift (rank churn) and q_psi_drift (value bins) with
      // the token-DISTRIBUTION divergence. Products go through
      // DECIMAL(38,0) so count × corpus-size terms can't wrap at fleet
      // scale; one vocabulary-sized aggregate + a broadcast totals
      // row. ---
      // --- 1-D Wasserstein (earth-mover) drift per source (round 13):
      // the OTHER canonical distribution distance next to q_js_drift —
      // JS reads density overlap, W1 reads how FAR mass must move, the
      // distinction that matters for length/quality drift (a corpus
      // whose docs all grew 20% has tiny JS overlap change but large
      // W1). Banded exactly: doc-length bands of 100 chars, W1 over
      // the banded CDFs = sum over bands of |cumP − cumQ|, computed as
      // cross-multiplied exact integers |cum_src·n_all − cum_all·n_src|
      // with ONE division at render — no float accumulation. The
      // per-source cum runs on the dense (source × band) grid, an
      // O(sources·bands) relation; at 100 TB the bands stay O(100) so
      // the windows never see corpus-sized input. ---
      "q_wasserstein_drift" -> ((s, d) => {
        val t = table(s, d, "documents")
          .select(col("source"),
            expr("CAST(n_chars div 100 AS BIGINT)").as("band"))
        val cell = t.groupBy("source", "band")
          .agg(count(lit(1)).as("c"))
        val bands = t.select("band").distinct()
        val srcN = t.groupBy("source").agg(count(lit(1)).as("n_src"))
        val allCell = t.groupBy("band").agg(count(lit(1)).as("ca"))
        val wS = Window.partitionBy("source").orderBy("band")
        val wA = Window.orderBy("band") // O(bands) rows — bounded
        val allCum = bands.join(allCell, Seq("band"), "left")
          .na.fill(0L, Seq("ca"))
          .withColumn("cum_all", sum("ca").over(wA))
        val grid = srcN.crossJoin(bands)
          .join(cell, Seq("source", "band"), "left")
          .na.fill(0L, Seq("c"))
          .withColumn("cum_src", sum("c").over(wS))
          .join(allCum.select("band", "cum_all"), "band")
        val nAll = t.agg(count(lit(1)).as("n_all"))
        grid.crossJoin(broadcast(nAll))
          .groupBy("source")
          .agg(max("n_src").cast("long").as("n_docs"),
            count(lit(1)).as("n_bands"),
            sum(abs(col("cum_src") * col("n_all")
              - col("cum_all") * col("n_src"))).cast("long")
              .as("emd_num"),
            max("n_all").cast("long").as("n_all"))
          .select(col("source"), col("n_docs"), col("n_bands"),
            col("emd_num"),
            (col("emd_num").cast("double") /
              (col("n_docs") * col("n_all")).cast("double"))
              .as("emd_bands"))
          .orderBy("source")
      }),

      "q_js_drift" -> ((s, d) => {
        val counts = table(s, d, "documents")
          .select((col("doc_id") % 2 === 0).cast("long").as("ga"),
            explode(split(col("text"), " ")).as("t"))
          .groupBy("t")
          .agg(sum("ga").as("a"), sum(lit(1L) - col("ga")).as("b"))
        val tot = counts.agg(sum("a").as("na"), sum("b").as("nb"))
        // signed floor-log2 of (num/den) with DECIMAL(38,0) operands
        def sbits(num: String, den: String): String =
          s"""CASE WHEN $num >= $den THEN
             |  CAST(length(bin(CAST($num div $den AS BIGINT))) - 1
             |    AS BIGINT)
             |ELSE
             |  -CAST(length(bin(CAST($den div $num AS BIGINT))) - 1
             |    AS BIGINT)
             |END""".stripMargin
        val withM = counts.crossJoin(broadcast(tot))
          .selectExpr("a", "b",
            "CAST(a AS DECIMAL(38,0)) * nb AS anb",
            "CAST(b AS DECIMAL(38,0)) * na AS bna")
          .selectExpr("a", "b",
            "anb + bna AS m2",
            "2 * anb AS pa2", "2 * bna AS pb2")
        // the a/b > 0 guards keep the div-by-zero branch unevaluated
        // (an absent token weighs 0 anyway)
        val g = withM.selectExpr(
          s"CASE WHEN a > 0 THEN a * (${sbits("pa2", "m2")}) " +
            "ELSE 0 END AS ca",
          s"CASE WHEN b > 0 THEN b * (${sbits("pb2", "m2")}) " +
            "ELSE 0 END AS cb")
          .agg(sum("ca").as("kla_bits"), sum("cb").as("klb_bits"))
        g.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"), col("kla_bits"), col("klb_bits"),
            ((col("kla_bits").cast("double") / col("na") +
              col("klb_bits").cast("double") / col("nb")) / 2.0)
              .as("js_bits"))
      }),

      // --- cross-language vocabulary overlap (round 9): token-set
      // Jaccard between every language pair — the language-
      // contamination proxy (a high en↔es overlap means mislabeled or
      // code-switched documents leak across the lang split, poisoning
      // per-language sampling weights). Vocabularies reduce to distinct
      // (lang, token) rows first; the pair intersection is a token-
      // keyed self-join over that vocabulary relation (bounded by
      // langs² per token — never corpus-sized); sizes broadcast back;
      // Jaccard is one exact-int division. O(langs²) output. ---
      "q_vocab_overlap" -> ((s, d) => {
        val v = table(s, d, "documents")
          .select(col("lang"), explode(split(col("text"), " ")).as("t"))
          .distinct()
        val sizes = v.groupBy("lang").agg(count(lit(1)).as("nv"))
        val inter = v.as("a")
          .join(v.as("b"), col("a.t") === col("b.t") &&
            col("a.lang") < col("b.lang"))
          .groupBy(col("a.lang").as("la"), col("b.lang").as("lb"))
          .agg(count(lit(1)).as("n_common"))
        inter
          .join(broadcast(sizes.select(col("lang").as("la"),
            col("nv").as("na"))), "la")
          .join(broadcast(sizes.select(col("lang").as("lb"),
            col("nv").as("nb"))), "lb")
          .select(col("la"), col("lb"), col("n_common"), col("na"),
            col("nb"),
            (col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common"))).as("jaccard"))
          .orderBy("la", "lb")
      }),

      // --- Simpson diversity of the source mix per language: the
      // inverse Simpson index (Σc)²/Σc² = the "effective number of
      // sources" feeding each language slice, plus the Gini-Simpson
      // probability-of-difference — the composition-concentration
      // readout next to q_hhi_concentration (which scores revenue).
      // Exact int64 throughout; two terminal divisions. ---
      "q_simpson_diversity" -> ((s, d) => {
        val cells = table(s, d, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("c"))
        cells.groupBy("lang")
          .agg(sum("c").as("n"), count(lit(1)).as("n_sources"),
            sum(col("c") * col("c")).as("ssq"))
          .select(col("lang"), col("n"), col("n_sources"),
            ((col("n") * col("n")).cast("double") / col("ssq"))
              .as("simpson_inv"),
            ((col("n") * col("n") - col("ssq")).cast("double") /
              (col("n") * col("n"))).as("gini_simpson"))
          .orderBy("lang")
      }),

      // --- cross-source near-duplicate contamination: of the exact
      // n-gram near-dup pairs (the q_dedup_ngram relation), how many
      // CROSS a source boundary? If most dups are intra-source,
      // per-source dedup sharding is safe; a high cross share means
      // the minhash->cluster path must run globally. The pair relation
      // computes once; the doc→source dimension broadcasts onto both
      // endpoints; output is the O(sources²) pair matrix. ---
      "q_cross_source_dups" -> ((s, d) => {
        val src = table(s, d, "documents").select(col("doc_id"),
          col("source"))
        TextPipeline.ngramPairs(s, d)
          .join(broadcast(src.select(col("doc_id").as("a_id"),
            col("source").as("sa"))), "a_id")
          .join(broadcast(src.select(col("doc_id").as("b_id"),
            col("source").as("sb"))), "b_id")
          .groupBy(least(col("sa"), col("sb")).as("s1"),
            greatest(col("sa"), col("sb")).as("s2"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("is_cross", (col("s1") =!= col("s2")).cast("long"))
          .orderBy("s1", "s2")
      }),

      // --- effective sample size under length weighting per language:
      // ESS = (Σw)²/Σw² with w = n_chars — if training samples are
      // weighted by document length, how many "effective" documents
      // does each language really contribute, and what is the design
      // effect n/ESS (the variance price of the weighting)? The
      // moments accumulate in DECIMAL(38,0) (the q_elasticity
      // discipline): a plain int64 SUM wraps silently past ~3e9 total
      // chars per language while DuckDB promotes to HUGEINT and stays
      // exact — the decimal sums match the oracle at any scale. Two
      // terminal divisions. ---
      "q_ess_weights" -> ((s, d) => {
        val d38 = DecimalType(38, 0)
        table(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("n_chars").cast(d38)).as("sw"),
            sum((col("n_chars") * col("n_chars")).cast(d38)).as("sww"))
          .select(col("lang"), col("n"),
            ((col("sw") * col("sw")).cast("double") /
              col("sww").cast("double")).as("ess"),
            (col("n").cast("double") * col("sww").cast("double") /
              (col("sw") * col("sw")).cast("double")).as("deff"))
          .orderBy("lang")
      }),

      // --- Gini coefficient of the token frequency distribution: the
      // one-number vocabulary-inequality summary next to q_zipf_slope's
      // tail fit (G ≈ 1 means a few tokens dominate — the cache/vocab
      // design regime). The closed form G = Σ cᵢ(2i−n−1)/(n·S) stays
      // EXACT int64 until one terminal division — and the rank window
      // is GONE: within a tie group (all tokens sharing count c at
      // ranks off+1..off+m) Σ(2i−1) = 2·m·off + m², independent of the
      // intra-group order, so the per-rank sum collapses to the
      // O(distinct counts) tie-group relation. The only window is the
      // exclusive prefix-sum over that boundary relation (the
      // q_dense_ids discipline) — no single task ever sorts the
      // vocabulary. Bit-identical to the global-rank spelling. ---
      "q_vocab_gini" -> ((s, d) => {
        val v = table(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val g = v.groupBy("c").agg(count(lit(1)).as("m"))
        val wb = Window.orderBy(col("c").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        g.withColumn("off", coalesce(sum("m").over(wb), lit(0L)))
          .agg(sum("m").as("n"), sum(col("c") * col("m")).as("s"),
            sum(col("c") * (lit(2L) * col("m") * col("off")
              + col("m") * col("m"))).as("num0"))
          .select(col("n").as("vocab"), col("s").as("total"),
            ((col("num0") - col("n") * col("s")).cast("double") /
              (col("n") * col("s")).cast("double")).as("gini"))
      }),

      // --- Apdex score per event type (value read as latency, target
      // T=50, tolerating ≤ 4T=200): the industry-standard UX summary
      // (satisfied + tolerating/2)/n, kept exact as (2·sat + tol)/(2n).
      // One conditional-count pass; O(types) output. ---
      "q_apdex" -> ((s, d) => {
        table(s, d, "events")
          .select(col("event_type"),
            round(col("value"), 0).cast("long").as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum((col("v") <= 50L).cast("long")).as("n_sat"),
            sum((col("v") > 50L && col("v") <= 200L).cast("long"))
              .as("n_tol"))
          .select(col("event_type"), col("n"), col("n_sat"), col("n_tol"),
            ((lit(2L) * col("n_sat") + col("n_tol")).cast("double") /
              (lit(2L) * col("n"))).as("apdex"))
          .orderBy("event_type")
      }),

      // --- rank-biased overlap (RBO@10, p=1/2) between the two
      // halves' token rankings: how stable is the frequency ranking
      // across time — the rank-level drift metric that punishes
      // disagreement at the TOP (where vocabulary/cache decisions
      // live). p=1/2 makes every weight dyadic, so the whole sum is
      // exact-integer at scale 2^10·2520 until one division. Both
      // rankings reduce to vocabulary-sized relations; overlaps come
      // from a rank-pair join bounded to the top 10. ---
      "q_rank_rbo" -> ((s, d) => {
        val docs = table(s, d, "documents")
        val half = docs.select(col("doc_id"), col("text"),
          (col("doc_id") % 2 === 1).cast("long").as("h"))
        // each top-10 is a TakeOrdered (per-partition heaps + driver
        // merge); the rank window runs AFTER the limit over 10 rows —
        // a rank-filter on a CAST of a vocabulary-wide row_number
        // would defeat InferWindowGroupLimit and single-partition-sort
        // the vocabulary
        def top10(h: Int): DataFrame = {
          val wr = Window.orderBy(col("c").desc, col("w").asc)
          half.filter(col("h") === h)
            .select(explode(split(col("text"), " ")).as("w"))
            .groupBy("w").agg(count(lit(1)).as("c"))
            .orderBy(col("c").desc, col("w").asc).limit(10)
            .withColumn("rk", row_number().over(wr).cast("long"))
        }
        val a = top10(0).select(col("w"), col("rk").as("ra"))
        val b = top10(1).select(col("w"), col("rk").as("rb"))
        val joint = a.join(b, Seq("w"))
        // o_k = |prefix_a(k) ∩ prefix_b(k)|: count pairs with both
        // ranks <= k, for k = 1..10 — a 10-row grid join over the <=10
        // shared tokens
        val grid = joint.crossJoin(
          broadcast(s.range(1, 11).select(col("id").as("k"))))
          .filter(col("ra") <= col("k") && col("rb") <= col("k"))
          .groupBy("k").agg(count(lit(1)).as("o"))
        // scaled term: o_k · 2^(10-k) · (2520/k); RBO = Σ/ (2^10·2520)
        grid
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(10 - k AS INT)) * (2520 div k) * o")).as("scaled"))
          .select(col("scaled"),
            (col("scaled").cast("double") / lit(1024.0 * 2520.0))
              .as("rbo10"))
      }),

      // --- cross-language near-dup census (round 10): near-dup pairs
      // whose two docs carry DIFFERENT language labels — each one is
      // either a mislabeled language, boilerplate that survives
      // translation, or machine-translated duplication, all three of
      // which poison a per-language training mix (the pair-level
      // sharpening of q_vocab_overlap's vocabulary-level screen).
      // Reads the materialized truth relation; two broadcast-size
      // lang lookups; the (lang, lang) rollup is O(langs²). ---
      "q_cross_lang_dups" -> ((s, d) => {
        val lang = table(s, d, "documents").select("doc_id", "lang")
        val pairs = TextPipeline.ngramPairs(s, d)
          .join(lang.withColumnRenamed("doc_id", "a_id")
            .withColumnRenamed("lang", "lang_a"), "a_id")
          .join(lang.withColumnRenamed("doc_id", "b_id")
            .withColumnRenamed("lang", "lang_b"), "b_id")
        pairs
          .filter(col("lang_a") =!= col("lang_b"))
          .select(least(col("lang_a"), col("lang_b")).as("lang_lo"),
            greatest(col("lang_a"), col("lang_b")).as("lang_hi"),
            col("jac"))
          .groupBy("lang_lo", "lang_hi")
          .agg(count(lit(1)).as("n_pairs"),
            max("jac").as("jac_max"))
          .orderBy("lang_lo", "lang_hi")
      }),

      // --- per-source language-mix entropy (round 10): how mixed each
      // source's language distribution is — the mixture-design readout
      // that separates mono-lingual crawl slices from mixed portals
      // (with q_vocab_overlap this is the contamination pre-screen).
      // The integer floor-log2 surprisal device (q_user_entropy_hist):
      // Σ c·⌊log2(n/c)⌋ via length(bin(n div c))−1 — a libm-free
      // entropy lower bound both engines compute bit-identically; the
      // dominant-language share is one exact-count division. O(sources)
      // out of one (source, lang) reduction. ---
      "q_lang_mix_entropy" -> ((s, d) => {
        val cells = table(s, d, "documents")
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("c"))
        val totals = cells.groupBy("source")
          .agg(sum("c").as("n"), count(lit(1)).as("n_langs"),
            max("c").as("cmax"))
        cells.join(totals, "source")
          .select(col("source"), col("n"), col("n_langs"), col("cmax"),
            (col("c") * (length(bin(expr("n div c"))) - 1).cast("long"))
              .as("contrib"))
          .groupBy("source")
          .agg(max("n").as("n_docs"), max("n_langs").as("n_langs"),
            max("cmax").as("cmax"), sum("contrib").as("hb"))
          .select(col("source"), col("n_docs"), col("n_langs"),
            expr("hb div n_docs").as("h_band"),
            (col("cmax").cast("double") / col("n_docs")).as("dom_share"))
          .orderBy("source")
      })
    )

  override def oracle: Map[String, String] = Map(

    "q_hapax_ratio" ->
      """WITH tf AS (
        |  SELECT source, t, COUNT(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |g AS (SELECT t, SUM(c) AS n FROM tf GROUP BY 1)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS hapax_share
        |FROM tf JOIN g USING (t)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q_ttr" ->
      """WITH tf AS (
        |  SELECT source, t, COUNT(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
        |  CAST(COUNT(*) AS DOUBLE) / sqrt(CAST(SUM(c) AS DOUBLE))
        |    AS root_ttr
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,

    "q_yule_k" ->
      """WITH tf AS (
        |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(c * c) AS BIGINT) AS sum_c2
        |  FROM tf GROUP BY source)
        |SELECT source, n_types, n_tokens,
        |  10000.0 * CAST(sum_c2 - n_tokens AS DOUBLE)
        |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |    AS yule_k
        |FROM g ORDER BY source""".stripMargin,

    "q_heaps_law" ->
      """WITH mx AS (SELECT MAX(doc_id) + 1 AS mxid FROM documents),
        |tok AS (
        |  SELECT doc_id * 10 // mxid AS band, t
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents), mx
        |  WHERE length(t) > 0),
        |pb AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |       FROM tok GROUP BY 1),
        |fb AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS new_types
        |       FROM (SELECT t, MIN(band) AS band FROM tok GROUP BY 1)
        |       GROUP BY 1)
        |SELECT pb.band, pb.n_tokens,
        |  CAST(COALESCE(fb.new_types, 0) AS BIGINT) AS new_types,
        |  CAST(SUM(pb.n_tokens) OVER (ORDER BY pb.band) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(SUM(COALESCE(fb.new_types, 0)) OVER (ORDER BY pb.band)
        |    AS BIGINT) AS cum_types
        |FROM pb LEFT JOIN fb USING (band)
        |ORDER BY band""".stripMargin,

    "q_cross_lang_dups" ->
      s"""WITH ${TextPipeline.ngramPairCte},
         |j AS (SELECT least(da.lang, db.lang) AS lang_lo,
         |        greatest(da.lang, db.lang) AS lang_hi, p.jac
         |      FROM p JOIN documents da ON da.doc_id = p.a_id
         |             JOIN documents db ON db.doc_id = p.b_id
         |      WHERE da.lang <> db.lang)
         |SELECT lang_lo, lang_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  MAX(jac) AS jac_max
         |FROM j GROUP BY 1, 2 ORDER BY lang_lo, lang_hi""".stripMargin,

    "q_lang_mix_entropy" ->
      """WITH cells AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_langs,
        |    CAST(MAX(c) AS BIGINT) AS cmax
        |  FROM cells GROUP BY 1),
        |p AS (SELECT cells.source, MAX(n) AS n, MAX(n_langs) AS n_langs,
        |    MAX(cmax) AS cmax,
        |    CAST(SUM(c * CAST(length(bin(n // c)) - 1 AS BIGINT))
        |      AS BIGINT) AS hb
        |  FROM cells JOIN t ON t.source = cells.source
        |  GROUP BY 1)
        |SELECT source, n AS n_docs, n_langs,
        |  CAST(hb // n AS BIGINT) AS h_band,
        |  CAST(cmax AS DOUBLE) / n AS dom_share
        |FROM p ORDER BY source""".stripMargin,

    "q_wasserstein_drift" ->
      """WITH t AS (SELECT source, n_chars // 100 AS band
        |           FROM documents),
        |cell AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM t GROUP BY 1, 2),
        |bands AS (SELECT DISTINCT band FROM t),
        |srcn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
        |         FROM t GROUP BY source),
        |ac AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS ca
        |       FROM t GROUP BY band),
        |acum AS (SELECT b.band,
        |    CAST(SUM(COALESCE(ac.ca, 0)) OVER (ORDER BY b.band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_all
        |  FROM bands b LEFT JOIN ac USING (band)),
        |grid AS (SELECT s.source, s.n_src, b.band,
        |    CAST(SUM(COALESCE(cell.c, 0)) OVER (PARTITION BY s.source
        |      ORDER BY b.band ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS cum_src
        |  FROM srcn s CROSS JOIN bands b
        |  LEFT JOIN cell ON cell.source = s.source
        |    AND cell.band = b.band),
        |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM t)
        |SELECT g.source,
        |  CAST(MAX(g.n_src) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_bands,
        |  CAST(SUM(abs(g.cum_src * na.n_all - a.cum_all * g.n_src))
        |    AS BIGINT) AS emd_num,
        |  CAST(SUM(abs(g.cum_src * na.n_all - a.cum_all * g.n_src))
        |      AS DOUBLE) /
        |    CAST(MAX(g.n_src) * MAX(na.n_all) AS DOUBLE) AS emd_bands
        |FROM grid g JOIN acum a USING (band) CROSS JOIN na
        |GROUP BY g.source ORDER BY g.source""".stripMargin,

    "q_js_drift" -> {
      def sbits(num: String, den: String): String =
        s"""CASE WHEN $num >= $den THEN
           |  CAST(length(bin(CAST($num // $den AS BIGINT))) - 1 AS BIGINT)
           |ELSE
           |  -CAST(length(bin(CAST($den // $num AS BIGINT))) - 1 AS BIGINT)
           |END""".stripMargin
      s"""WITH tk AS (SELECT CAST(doc_id % 2 = 0 AS BIGINT) AS ga,
         |    unnest(string_split(text, ' ')) AS t FROM documents),
         |c AS (SELECT t, CAST(SUM(ga) AS BIGINT) AS a,
         |    CAST(SUM(1 - ga) AS BIGINT) AS b FROM tk GROUP BY t),
         |tt AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
         |    CAST(SUM(b) AS BIGINT) AS nb FROM c),
         |w AS (SELECT a, b, CAST(a AS HUGEINT) * nb AS anb,
         |    CAST(b AS HUGEINT) * na AS bna FROM c CROSS JOIN tt),
         |w2 AS (SELECT a, b, anb + bna AS m2, 2 * anb AS pa2,
         |    2 * bna AS pb2 FROM w),
         |g AS (SELECT
         |    CAST(SUM(CASE WHEN a > 0 THEN a * (${sbits("pa2", "m2")})
         |      ELSE 0 END) AS BIGINT) AS kla_bits,
         |    CAST(SUM(CASE WHEN b > 0 THEN b * (${sbits("pb2", "m2")})
         |      ELSE 0 END) AS BIGINT) AS klb_bits
         |  FROM w2)
         |SELECT na, nb, kla_bits, klb_bits,
         |  (CAST(kla_bits AS DOUBLE) / na
         |    + CAST(klb_bits AS DOUBLE) / nb) / 2.0 AS js_bits
         |FROM g CROSS JOIN tt""".stripMargin
    },

    "q_vocab_overlap" ->
      """WITH v AS (SELECT DISTINCT lang, t FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS t
        |    FROM documents)),
        |sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM v GROUP BY 1),
        |i AS (SELECT a.lang AS la, b.lang AS lb,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM v a JOIN v b ON a.t = b.t AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT la, lb, n_common, sa.nv AS na, sb.nv AS nb,
        |  CAST(n_common AS DOUBLE) / (sa.nv + sb.nv - n_common)
        |    AS jaccard
        |FROM i JOIN sz sa ON sa.lang = la JOIN sz sb ON sb.lang = lb
        |ORDER BY la, lb""".stripMargin,
    "q_cross_source_dups" ->
      s"""WITH ${TextPipeline.ngramPairCte},
         |sa AS (SELECT doc_id, source FROM documents)
         |SELECT least(x.source, y.source) AS s1,
         |  greatest(x.source, y.source) AS s2,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(least(x.source, y.source) <> greatest(x.source, y.source)
         |    AS BIGINT) AS is_cross
         |FROM p JOIN sa x ON x.doc_id = a_id
         |       JOIN sa y ON y.doc_id = b_id
         |GROUP BY 1, 2 ORDER BY s1, s2""".stripMargin,

    "q_ess_weights" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) * SUM(n_chars) AS DOUBLE) /
        |    SUM(n_chars * n_chars) AS ess,
        |  CAST(COUNT(*) AS DOUBLE) * SUM(n_chars * n_chars) /
        |    CAST(SUM(n_chars) * SUM(n_chars) AS DOUBLE) AS deff
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_vocab_gini" ->
      """WITH v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |r AS (SELECT c,
        |    CAST(row_number() OVER (ORDER BY c, w) AS BIGINT) AS i
        |  FROM v),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s,
        |    CAST(SUM(c * (2 * i - 1)) AS BIGINT) AS num0
        |  FROM r)
        |SELECT n AS vocab, s AS total,
        |  CAST(num0 - n * s AS DOUBLE) / CAST(n * s AS DOUBLE) AS gini
        |FROM m""".stripMargin,

    "q_apdex" ->
      """WITH q AS (SELECT event_type,
        |    CAST(round(value, 0) AS BIGINT) AS v
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN v <= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sat,
        |  CAST(SUM(CASE WHEN v > 50 AND v <= 200 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_tol,
        |  CAST(2 * SUM(CASE WHEN v <= 50 THEN 1 ELSE 0 END) +
        |    SUM(CASE WHEN v > 50 AND v <= 200 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / (2 * COUNT(*)) AS apdex
        |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cramers_v" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
        |cells AS (SELECT
        |    CAST(us >= mn + (mx - mn) // 2 AS BIGINT) AS half,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM ev CROSS JOIN b GROUP BY 1, 2),
        |rowt AS (SELECT half, CAST(SUM(o) AS BIGINT) AS rt
        |  FROM cells GROUP BY half),
        |colt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS ct
        |  FROM cells GROUP BY event_type),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |j AS (SELECT o, CAST(rt AS DOUBLE) * ct / n AS e, n
        |  FROM cells JOIN rowt USING (half) JOIN colt USING (event_type)
        |  CROSS JOIN tot)
        |SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(18,4)))
        |    AS DOUBLE) AS chi2,
        |  sqrt(CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(18,4)))
        |    AS DOUBLE) / MAX(n)) AS cramers_v
        |FROM j""".stripMargin,

    "q_attrib_ushape" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CAST(event_type = 'purchase' AS BIGINT) AS isp,
        |    COALESCE(CAST(SUM(CAST(event_type = 'purchase' AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS jid
        |  FROM events),
        |t AS (SELECT user_id, jid, event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id, jid
        |      ORDER BY ts, event_id) AS BIGINT) AS pos,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id, jid) AS BIGINT)
        |      AS mlen
        |  FROM m WHERE isp = 0),
        |cv AS (SELECT user_id, jid FROM m WHERE isp = 1),
        |cr AS (SELECT t.event_type,
        |    CASE WHEN mlen = 1 THEN 1.0
        |         WHEN mlen = 2 THEN 0.5
        |         WHEN pos = 1 OR pos = mlen THEN 0.4
        |         ELSE 0.2 / (mlen - 2) END AS credit
        |  FROM t JOIN cv USING (user_id, jid))
        |SELECT event_type AS channel, CAST(COUNT(*) AS BIGINT)
        |    AS n_touches,
        |  CAST(SUM(CAST(credit AS DECIMAL(18,4))) AS DOUBLE) AS credit
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_concordance" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    CAST(generate_subscripts(string_split(text, ' '), 1)
        |      AS BIGINT) AS p
        |  FROM documents),
        |c AS (SELECT doc_id, p, w,
        |    lag(w) OVER (PARTITION BY doc_id ORDER BY p) AS lft,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS rgt
        |  FROM t)
        |SELECT lft, rgt, CAST(COUNT(*) AS BIGINT) AS n
        |FROM c
        |WHERE w = 'join' AND lft IS NOT NULL AND rgt IS NOT NULL
        |GROUP BY lft, rgt
        |ORDER BY n DESC, lft, rgt LIMIT 15""".stripMargin,

    "q_coverage_curve" ->
      """WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
        |         for i in range(1, len(tk))]) AS gram FROM d),
        |v AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM g GROUP BY gram),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS vocab FROM v),
        |r AS (SELECT gram, c,
        |    CAST(row_number() OVER (ORDER BY c DESC, gram) AS BIGINT)
        |      AS rk,
        |    CAST(SUM(c) OVER (ORDER BY c DESC, gram
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM v)
        |SELECT rk AS k, cum, total, vocab,
        |  CAST(cum AS DOUBLE) / total AS coverage
        |FROM r CROSS JOIN tot
        |WHERE rk IN (10, 100, 1000) ORDER BY k""".stripMargin,

    "q_simpson_diversity" ->
      """WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT)
        |    AS c
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources,
        |    CAST(SUM(c * c) AS BIGINT) AS ssq
        |  FROM cells GROUP BY lang)
        |SELECT lang, n, n_sources,
        |  CAST(n * n AS DOUBLE) / ssq AS simpson_inv,
        |  CAST(n * n - ssq AS DOUBLE) / (n * n) AS gini_simpson
        |FROM m ORDER BY lang""".stripMargin,

    "q_rank_rbo" ->
      """WITH tk AS (SELECT CAST(doc_id % 2 = 1 AS BIGINT) AS h,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT h, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY 1, 2),
        |rk AS (SELECT h, w,
        |    CAST(row_number() OVER (PARTITION BY h
        |      ORDER BY c DESC, w) AS BIGINT) AS rk
        |  FROM cnt),
        |a AS (SELECT w, rk AS ra FROM rk WHERE h = 0 AND rk <= 10),
        |b AS (SELECT w, rk AS rb FROM rk WHERE h = 1 AND rk <= 10),
        |j AS (SELECT ra, rb FROM a JOIN b USING (w)),
        |grid AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM j CROSS JOIN (SELECT unnest(range(1, 11)) AS k)
        |  WHERE ra <= k AND rb <= k GROUP BY k),
        |sc AS (SELECT CAST(SUM((1 << (10 - k)) * (2520 // k) * o)
        |    AS BIGINT) AS scaled FROM grid)
        |SELECT scaled,
        |  CAST(scaled AS DOUBLE) / (1024.0 * 2520.0) AS rbo10
        |FROM sc""".stripMargin
  )
}
