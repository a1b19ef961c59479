package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Relevance / classifier-evaluation operators (round 8, second block):
  * a HITS hub/authority iteration on the word graph, positional
  * phrase matching, corpus-keyness scoring, the feature-hashing trick,
  * rare-token collapse to `<unk>`, and the binned precision-recall /
  * cumulative-lift readouts. All seven carry full DuckDB oracles.
  *
  * Determinism: bucket/score integers come from md5 hex (decoded with
  * base-16 `conv` on Spark, nibble shifts on DuckDB — same value);
  * keyness uses the integer floor-log2 device; HITS weight sums
  * accumulate int64 products into DECIMAL(38,0); every ratio is one
  * terminal IEEE division of exact integers.
  */
object Relevance extends QueryModule {

  private def toks: Column = split(col("text"), " ")
  private val D38 = DecimalType(38, 0)

  /** floor(log2(n div c)) for n >= c >= 1 — the Scoring.bits device on
    * an integer ratio: exact int64 arithmetic on both engines. The
    * quotient is Catalyst's IntegralDivide (the SQL `div`), NOT
    * floor(double/double) — double division loses low bits once the
    * cross-multiplied operands pass 2^53, and a quotient within one
    * ulp of a power of two would then land in a different log2 bucket
    * than DuckDB's exact `//` (round 17 review finding).
    */
  private def ratioBits(n: Column, c: Column): Column = {
    val q = org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(n),
        org.apache.spark.sql.graft.Bridge.expression(c)))
    (length(bin(q)) - 1).cast("long")
  }

  /** The standing token bigram graph (q_pagerank_iter's derivation):
    * weighted edges src -> dst with adjacency counts.
    */
  private[operators] def wordEdges(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(graft.functions.NGramGenerator(toks, 2).alias("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .select(let(split(col("gram"), " ")) { ws =>
        struct(element_at(ws, 1).as("s"), element_at(ws, 2).as("t"))
      }.as("ws"), col("c"))
      .select(col("ws.s").as("src"), col("ws.t").as("dst"), col("c"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- HITS hub/authority, one power iteration from h0 = 1 on the
      // word bigram graph (the link-analysis complement of
      // q_pagerank_iter: PageRank rewards being LINKED-TO by heavy
      // nodes, HITS separates pointing-well from being-pointed-at).
      // a1 = in-weight; h1 = sum over out-edges of c * a1(dst). The
      // c*a1 product is exact int64 (both bounded by corpus token
      // count), accumulated into DECIMAL(38,0) so the sum cannot
      // overflow at fleet scale; normalization is one decimal->double
      // cast + division per column. Two vocabulary-sized aggregates
      // and one vocabulary-keyed join — no per-document work after the
      // bigram count. The exact DECIMAL(38,0) hub weight is SPLIT into
      // hi/lo int64 output columns (div/mod 10^18 — both exact BIGINTs
      // on both engines) so no wide-decimal rendering reaches the
      // comparison layer (round-8 artifact flagged the D38 column). ---
      "q_hits_iter" -> ((s, d) => {
        val edges = wordEdges(s, d)
        val auth = edges.groupBy("dst").agg(sum("c").as("a1"))
        val hub = edges.join(auth, "dst")
          .groupBy("src")
          .agg(sum((col("c") * col("a1")).cast(D38)).as("h1"))
        val tot = auth.agg(sum(col("a1").cast(D38)).as("ta"))
          .crossJoin(hub.agg(sum("h1").as("th")))
        auth.select(col("dst").as("tok"), col("a1"))
          .join(hub.select(col("src").as("tok"), col("h1")),
            Seq("tok"), "full_outer")
          .crossJoin(broadcast(tot))
          .withColumn("h1c", coalesce(col("h1"), lit(0).cast(D38)))
          .select(col("tok"),
            coalesce(col("a1"), lit(0L)).as("a1"),
            expr("CAST(h1c div 1000000000000000000 AS BIGINT)")
              .as("h1_hi"),
            expr("CAST(h1c - (h1c div 1000000000000000000) * " +
              "CAST(1000000000000000000 AS DECIMAL(38,0)) AS BIGINT)")
              .as("h1_lo"),
            (coalesce(col("a1"), lit(0L)).cast("double") /
              col("ta").cast("double")).as("auth"),
            (col("h1c").cast("double") /
              col("th").cast("double")).as("hub"))
          .orderBy("tok")
      }),

      // --- positional phrase match ("table hash"): the posting-list
      // intersection a positional inverted index runs — each term's
      // (doc, position) postings meet in an equi join on (doc_id,
      // adjacent position). The join moves 12-byte posting rows, never
      // documents, and each side is pre-filtered to ONE term's
      // postings: the selective-phrase cost profile of a real search
      // engine (the oracle states the same result as a per-document
      // bigram count). ---
      "q_phrase_match" -> ((s, d) => {
        val ex = table(s, d, "documents")
          .select(col("doc_id"), posexplode(toks))
          .select(col("doc_id"), col("pos"), col("col").as("tok"))
        val t1 = ex.filter(col("tok") === "table")
          .select(col("doc_id"), col("pos"))
        val t2 = ex.filter(col("tok") === "hash")
          .select(col("doc_id").as("d2"), col("pos").as("p2"))
        t1.join(t2, col("doc_id") === col("d2") &&
            col("p2") === col("pos") + 1)
          .groupBy("doc_id").agg(count(lit(1)).as("n_occur"))
          .orderBy(col("n_occur").desc, col("doc_id"))
      }),

      // --- corpus keyness (which tokens characterize corpus A vs B?):
      // add-one-smoothed frequency-ratio in bits, signed —
      // floor(log2(((a+1)/NA) / ((b+1)/NB))) via exact-integer
      // cross-multiplications (DECIMAL(38,0) / HUGEINT — the factors
      // are corpus-scale counts, so int64 would wrap) + the
      // floor-log2 device, so the score is bit-identical across
      // engines with zero libm. The split is a
      // deterministic doc_id parity (any metadata split works the
      // same); one vocabulary-sized aggregate + a 1-row totals
      // broadcast. ---
      "q_keyness_llr" -> ((s, d) => {
        val tk = table(s, d, "documents")
          .select((col("doc_id") % 2 === 0).cast("long").as("ga"),
            explode(toks).as("tok"))
        val counts = tk.groupBy("tok")
          .agg(sum("ga").as("a"), sum(lit(1L) - col("ga")).as("b"))
        val tot = counts.agg(sum("a").as("na"), sum("b").as("nb"))
        // cross-products in DECIMAL(38,0): both factors are corpus-
        // scale token counts, so the raw int64 product wraps silently
        // past ~3e9 grams per side while DuckDB hard-errors — the
        // q_ams_f2 asymmetry class; ratioBits' IntegralDivide takes
        // decimal operands exactly (r18 ADVICE, same fix as
        // q_dsir_select)
        counts.crossJoin(broadcast(tot))
          .withColumn("ra",
            ((col("a") + 1).cast(D38) * col("nb")).cast(D38))
          .withColumn("rb",
            ((col("b") + 1).cast(D38) * col("na")).cast(D38))
          .select(col("tok"), col("a"), col("b"),
            when(col("ra") >= col("rb"), ratioBits(col("ra"), col("rb")))
              .otherwise(-ratioBits(col("rb"), col("ra")))
              .as("keyness_bits"))
          .orderBy(col("keyness_bits").desc, col("tok"))
      }),

      // --- DSIR data selection (round 17): Data Selection via
      // Importance Resampling (Xie et al. 2023) — the
      // target-domain-matching selection pass a pretraining pipeline
      // runs over raw crawl, here in its deterministic top-k twin.
      // Hashed BIGRAM features (DSIR's hashed n-grams; the
      // q_feature_hash trick, 256 buckets — no vocabulary built or
      // shipped), target distribution = src0 docs, raw = the rest;
      // per-bucket log importance in BITS via the integer floor-log2
      // ratio device (q_keyness_llr — zero libm, bit-identical across
      // engines) with add-one smoothing over the 256-bucket grid, the
      // smoothing cross-products accumulated in DECIMAL(38,0)/HUGEINT
      // (corpus-scale factors would wrap int64); per-doc score =
      // Σ count·bits, exact int64 (bits ≤ 127, counts ≤ doc length). Scale shape: the
      // gram stream aggregates once to (doc, bucket) cells; the
      // 256-row weight table broadcasts; winners via TakeOrdered —
      // never a corpus-wide sort. The stochastic resample (Gumbel
      // noise on the weights) is the one part deliberately not here:
      // deterministic top-k is its oracle-checkable twin. ---
      "q_dsir_select" -> ((s, d) => {
        val feat = table(s, d, "documents")
          .select(col("doc_id"), (col("source") === "src0").as("tgt"),
            graft.functions.NGramGenerator(toks, 2).alias("gram"))
          .select(col("doc_id"), col("tgt"),
            (conv(substring(md5(col("gram")), 1, 2), 16, 10)
              .cast("long") % 256).as("bucket"))
        val dist = feat.groupBy("bucket")
          .agg(sum(col("tgt").cast("long")).as("ct"),
            sum((!col("tgt")).cast("long")).as("cr"))
        val tot = dist.agg(sum("ct").as("nt"), sum("cr").as("nr"))
        // smoothing cross-products in DECIMAL(38,0): (ct+1)*(nr+256)
        // is a product of two corpus-scale gram counts — raw int64
        // wraps silently past ~3e9 grams per side where DuckDB
        // hard-errors (r18 ADVICE); ratioBits' IntegralDivide handles
        // decimal operands, so the bits stay exact at any scale
        val w = dist.crossJoin(broadcast(tot))
          .withColumn("ra",
            ((col("ct") + 1).cast(D38) * (col("nr") + 256)).cast(D38))
          .withColumn("rb",
            ((col("cr") + 1).cast(D38) * (col("nt") + 256)).cast(D38))
          .select(col("bucket"),
            when(col("ra") >= col("rb"),
              ratioBits(col("ra"), col("rb")))
              .otherwise(-ratioBits(col("rb"), col("ra")))
              .as("w_bits"))
        val scored = feat.filter(!col("tgt"))
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .join(broadcast(w), "bucket")
          .groupBy("doc_id")
          .agg(sum(col("cnt") * col("w_bits")).as("dsir_bits"),
            sum("cnt").as("n_feats"))
        val top = scored
          .orderBy(col("dsir_bits").desc, col("doc_id")).limit(20)
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("dsir_bits").desc, col("doc_id"))
        top.withColumn("rank", row_number().over(rw).cast("long"))
          .orderBy("rank")
      }),

      // --- feature hashing (the hashing trick): token -> bucket in
      // [0, 64) via the first md5 byte, sparse doc-term matrix as
      // (doc_id, bucket, count) rows. No vocabulary is built, shipped,
      // or joined — the defining property of the trick, and why it
      // runs as a pure map-side explode + one aggregate at any corpus
      // size. Bucket decode is base-16 conv (Spark) / nibble shifts
      // (DuckDB) of the same md5 hex — identical integers. ---
      "q_feature_hash" -> ((s, d) => {
        val bucket =
          (conv(substring(md5(col("tok")), 1, 2), 16, 10)
            .cast("long") % 64).as("bucket")
        table(s, d, "documents")
          .select(col("doc_id"), explode(toks).as("tok"))
          .select(col("doc_id"), bucket)
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .orderBy("doc_id", "bucket")
      }),

      // --- rare-token collapse to <unk>: the vocabulary-truncation
      // move every tokenizer pipeline makes (tokens below a frequency
      // floor fold into one symbol). Corpus counts -> broadcast into
      // the token stream -> per-source coverage report: total tokens,
      // <unk> tokens, surviving vocab size, and the <unk> share a
      // curator alarms on. The vocab relation is vocabulary-sized
      // (broadcastable by construction); everything else is the token
      // scan + one aggregate. ---
      "q_rare_collapse" -> ((s, d) => {
        val tk = table(s, d, "documents")
          .select(col("source"), explode(toks).as("tok"))
        val vocab = tk.groupBy("tok").agg(count(lit(1)).as("c"))
        tk.join(broadcast(vocab), "tok")
          .select(col("source"),
            when(col("c") < 100, lit("<unk>")).otherwise(col("tok"))
              .as("m"))
          .groupBy("source")
          .agg(count(lit(1)).as("total_toks"),
            sum(when(col("m") === "<unk>", 1L).otherwise(0L))
              .as("unk_toks"),
            countDistinct(col("m")).as("vocab_size"))
          .withColumn("unk_share",
            col("unk_toks").cast("double") / col("total_toks"))
          .orderBy("source")
      }),

      // --- binned precision-recall curve: scores quantize to ~70
      // integer bins (compact-first — the curve's resolution knob),
      // cumulative TP/FP run over the BIN relation ordered by
      // threshold descending, so the global window is bounded by bin
      // cardinality no matter how many rows were scored. Precision
      // and recall are terminal divisions of exact counts. ---
      "q_pr_curve" -> ((s, d) => {
        val e = table(s, d, "embeddings").select(
          (col("label") % 2 === 1).cast("long").as("pos"),
          round(element_at(col("embedding"), 1).cast("double") * 100, 0)
            .cast("long").as("sq"))
        val bins = e.groupBy("sq").agg(
          sum("pos").as("p"), sum(lit(1L) - col("pos")).as("n"))
        val tot = bins.agg(sum("p").as("np"))
        val w = Window.orderBy(col("sq").desc)
        bins
          .withColumn("tp", sum("p").over(w))
          .withColumn("fp", sum("n").over(w))
          .crossJoin(broadcast(tot))
          .select(col("sq").as("thr"), col("tp"), col("fp"),
            (col("tp").cast("double") / (col("tp") + col("fp")))
              .as("precision"),
            (col("tp").cast("double") / col("np")).as("recall"))
          .orderBy(col("thr").desc)
      }),

      // --- cumulative gains / lift deciles (the campaign-targeting
      // readout: "the top 20% of scores holds X% of positives"):
      // same compact-first discipline — deciles are assigned to score
      // BINS by exact integer arithmetic on cumulative bin counts
      // (bin_start * 10 div N + 1), then two bounded windows over ≤70
      // bins and 10 deciles produce cumulative capture and lift. ---
      "q_lift_deciles" -> ((s, d) => {
        val e = table(s, d, "embeddings").select(
          (col("label") % 2 === 1).cast("long").as("pos"),
          round(element_at(col("embedding"), 1).cast("double") * 100, 0)
            .cast("long").as("sq"))
        val bins = e.groupBy("sq").agg(
          sum("pos").as("p"), sum(lit(1L) - col("pos")).as("n"))
        val tot = bins.agg(sum(col("p") + col("n")).as("nn"),
          sum("p").as("np"))
        val w = Window.orderBy(col("sq").desc)
        val binned = bins
          .withColumn("cum", sum(col("p") + col("n")).over(w))
          .crossJoin(broadcast(tot))
          .withColumn("decile",
            expr("(cum - (p + n)) * 10 div nn + 1").cast("long"))
        val wd = Window.orderBy("decile")
        binned.groupBy("decile")
          .agg(sum(col("p") + col("n")).as("n_rows"),
            sum("p").as("n_pos"),
            max("nn").as("nn"), max("np").as("np"))
          .withColumn("cum_rows", sum("n_rows").over(wd))
          .withColumn("cum_pos", sum("n_pos").over(wd))
          .select(col("decile"), col("n_rows"), col("n_pos"),
            col("cum_rows"), col("cum_pos"),
            ((col("cum_pos") * col("nn")).cast("double") /
              (col("cum_rows") * col("np"))).as("lift"))
          .orderBy("decile")
      }))

  override def oracle: Map[String, String] = Map(

    "q_hits_iter" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
        |         for i in range(1, len(tk))]) AS gram FROM t),
        |e0 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM g GROUP BY gram),
        |e AS (SELECT string_split(gram, ' ')[1] AS src,
        |        string_split(gram, ' ')[2] AS dst, c FROM e0),
        |a AS (SELECT dst, CAST(SUM(c) AS BIGINT) AS a1
        |      FROM e GROUP BY dst),
        |h AS (SELECT src, CAST(SUM(CAST(c * a1 AS DECIMAL(38,0)))
        |          AS DECIMAL(38,0)) AS h1
        |      FROM e JOIN a USING (dst) GROUP BY src),
        |tt AS (SELECT
        |  (SELECT CAST(SUM(CAST(a1 AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |     FROM a) AS ta,
        |  (SELECT CAST(SUM(h1) AS DECIMAL(38,0)) FROM h) AS th)
        |SELECT COALESCE(a.dst, h.src) AS tok,
        |  COALESCE(a1, 0) AS a1,
        |  CAST(CAST(COALESCE(h1, 0) AS HUGEINT)
        |    // 1000000000000000000 AS BIGINT) AS h1_hi,
        |  CAST(CAST(COALESCE(h1, 0) AS HUGEINT)
        |    % 1000000000000000000 AS BIGINT) AS h1_lo,
        |  CAST(COALESCE(a1, 0) AS DOUBLE) / CAST(ta AS DOUBLE) AS auth,
        |  CAST(COALESCE(h1, 0) AS DOUBLE) / CAST(th AS DOUBLE) AS hub
        |FROM a FULL OUTER JOIN h ON a.dst = h.src CROSS JOIN tt
        |ORDER BY tok""".stripMargin,

    "q_phrase_match" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, len(list_filter(
        |    [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))],
        |    g -> g = 'table hash')) AS n_occur FROM t)
        |SELECT doc_id, CAST(n_occur AS BIGINT) AS n_occur FROM c
        |WHERE n_occur > 0 ORDER BY n_occur DESC, doc_id""".stripMargin,

    "q_keyness_llr" ->
      """WITH tk AS (SELECT CAST(doc_id % 2 = 0 AS BIGINT) AS ga,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(SUM(ga) AS BIGINT) AS a,
        |        CAST(SUM(1 - ga) AS BIGINT) AS b
        |      FROM tk GROUP BY tok),
        |t AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
        |        CAST(SUM(b) AS BIGINT) AS nb FROM c),
        |r AS (SELECT tok, a, b,
        |      CAST(a + 1 AS HUGEINT) * nb AS ra,
        |      CAST(b + 1 AS HUGEINT) * na AS rb
        |      FROM c CROSS JOIN t)
        |SELECT tok, a, b,
        |  CASE WHEN ra >= rb
        |    THEN CAST(length(bin(ra // rb)) - 1 AS BIGINT)
        |    ELSE -CAST(length(bin(rb // ra)) - 1 AS BIGINT)
        |  END AS keyness_bits
        |FROM r ORDER BY keyness_bits DESC, tok""".stripMargin,

    "q_dsir_select" ->
      """WITH tk AS (SELECT doc_id, source = 'src0' AS tgt,
        |    string_split(text, ' ') AS t FROM documents),
        |f AS (SELECT doc_id, tgt,
        |    CAST(list_sum([CAST(strpos('0123456789abcdef',
        |          substr(md5(g), i, 1)) - 1 AS BIGINT)
        |        << (4 * (2 - i)) for i in range(1, 3)]) AS BIGINT)
        |      % 256 AS bucket
        |  FROM (SELECT doc_id, tgt,
        |      unnest([t[i] || ' ' || t[i+1]
        |        for i in range(1, len(t))]) AS g
        |    FROM tk) gg),
        |dist AS (SELECT bucket,
        |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
        |  FROM f GROUP BY bucket),
        |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
        |    CAST(SUM(cr) AS BIGINT) AS nr FROM dist),
        |wp AS (SELECT bucket,
        |    CAST(ct + 1 AS HUGEINT) * (nr + 256) AS ra,
        |    CAST(cr + 1 AS HUGEINT) * (nt + 256) AS rb
        |  FROM dist CROSS JOIN tot),
        |w AS (SELECT bucket,
        |    CASE WHEN ra >= rb
        |      THEN CAST(length(bin(ra // rb)) - 1 AS BIGINT)
        |      ELSE -CAST(length(bin(rb // ra)) - 1 AS BIGINT)
        |    END AS w_bits
        |  FROM wp),
        |cells AS (SELECT doc_id, bucket,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM f WHERE NOT tgt GROUP BY doc_id, bucket),
        |sc AS (SELECT doc_id,
        |    CAST(SUM(cnt * w_bits) AS BIGINT) AS dsir_bits,
        |    CAST(SUM(cnt) AS BIGINT) AS n_feats
        |  FROM cells JOIN w USING (bucket) GROUP BY doc_id),
        |top AS (SELECT * FROM sc
        |  ORDER BY dsir_bits DESC, doc_id LIMIT 20)
        |SELECT doc_id, dsir_bits, n_feats,
        |  CAST(row_number() OVER (ORDER BY dsir_bits DESC, doc_id)
        |    AS BIGINT) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    "q_feature_hash" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |b AS (SELECT doc_id,
        |    CAST(list_sum([CAST(strpos('0123456789abcdef',
        |          substr(md5(tok), i, 1)) - 1 AS BIGINT)
        |        << (4 * (2 - i)) for i in range(1, 3)]) AS BIGINT) % 64
        |      AS bucket
        |  FROM tk)
        |SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM b GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_rare_collapse" ->
      """WITH tk AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM tk GROUP BY tok),
        |m AS (SELECT source,
        |    CASE WHEN c < 100 THEN '<unk>' ELSE tok END AS m
        |  FROM tk JOIN v USING (tok))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS total_toks,
        |  CAST(SUM(CASE WHEN m = '<unk>' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS unk_toks,
        |  CAST(COUNT(DISTINCT m) AS BIGINT) AS vocab_size,
        |  CAST(SUM(CASE WHEN m = '<unk>' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS unk_share
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q_pr_curve" ->
      """WITH e AS (SELECT CAST(label % 2 = 1 AS BIGINT) AS pos,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 100, 0) AS BIGINT)
        |      AS sq FROM embeddings),
        |b AS (SELECT sq, CAST(SUM(pos) AS BIGINT) AS p,
        |        CAST(SUM(1 - pos) AS BIGINT) AS n
        |      FROM e GROUP BY sq),
        |t AS (SELECT CAST(SUM(p) AS BIGINT) AS np FROM b),
        |c AS (SELECT sq, CAST(SUM(p) OVER (ORDER BY sq DESC)
        |        AS BIGINT) AS tp,
        |      CAST(SUM(n) OVER (ORDER BY sq DESC) AS BIGINT) AS fp
        |    FROM b)
        |SELECT sq AS thr, tp, fp,
        |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
        |  CAST(tp AS DOUBLE) / np AS recall
        |FROM c CROSS JOIN t ORDER BY thr DESC""".stripMargin,

    "q_lift_deciles" ->
      """WITH e AS (SELECT CAST(label % 2 = 1 AS BIGINT) AS pos,
        |    CAST(round(CAST(embedding[1] AS DOUBLE) * 100, 0) AS BIGINT)
        |      AS sq FROM embeddings),
        |b AS (SELECT sq, CAST(SUM(pos) AS BIGINT) AS p,
        |        CAST(SUM(1 - pos) AS BIGINT) AS n
        |      FROM e GROUP BY sq),
        |t AS (SELECT CAST(SUM(p + n) AS BIGINT) AS nn,
        |        CAST(SUM(p) AS BIGINT) AS np FROM b),
        |c AS (SELECT sq, p, n, CAST(SUM(p + n) OVER (ORDER BY sq DESC)
        |        AS BIGINT) AS cum FROM b),
        |dd AS (SELECT (cum - (p + n)) * 10 // nn + 1 AS decile, p, n
        |       FROM c CROSS JOIN t),
        |g AS (SELECT decile, CAST(SUM(p + n) AS BIGINT) AS n_rows,
        |        CAST(SUM(p) AS BIGINT) AS n_pos
        |      FROM dd GROUP BY decile),
        |cc AS (SELECT decile, n_rows, n_pos,
        |        CAST(SUM(n_rows) OVER (ORDER BY decile) AS BIGINT)
        |          AS cum_rows,
        |        CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT)
        |          AS cum_pos
        |      FROM g)
        |SELECT decile, n_rows, n_pos, cum_rows, cum_pos,
        |  CAST(cum_pos * nn AS DOUBLE) / (cum_rows * np) AS lift
        |FROM cc CROSS JOIN t ORDER BY decile""".stripMargin)
}
