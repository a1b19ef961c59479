package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Training-data construction operators (round 8, fourth block):
  * deterministic negative sampling, hard-negative mining over the
  * embedding corpus, a one-way ANOVA gate, CDC MERGE with delete
  * tombstones, and an embedding-norm preflight audit. All five carry
  * full DuckDB oracles.
  *
  * Determinism: sampled ids come from md5 (base-16 conv on Spark,
  * nibble shifts on DuckDB — same integer); similarity reuses the
  * exact 2^20 fixed-point scoring (Similarity.dotQ — bit-stable
  * rankings); ANOVA moments accumulate as exact decimals and fold in
  * ONE fixed expression-tree order over the five known event types.
  */
object Training extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- deterministic negative sampling (contrastive-training
      // pairs): 8 candidate negatives per anchor doc, each id drawn by
      // hashing (anchor, attempt) into the dense doc-id range — O(n·k)
      // map-side generation with ZERO coordination (no shuffle builds
      // a candidate pool, no RNG state on executors, and re-running
      // yields the SAME pairs — dataset versioning requires it).
      // Collisions with the anchor and with KNOWN POSITIVES (the
      // near-dup pair relation — sampling a near-dup as a "negative"
      // poisons the loss) are anti-joined away; both exclusion
      // relations are O(pairs), never corpus-sized. Assumes dense doc
      // ids (the corpus contract here); with gaps the same hash keys a
      // row_number-densified id map. ---
      "q_negative_sample" -> ((s, d) => {
        val docs = table(s, d, "documents").select(col("doc_id"))
        val b = docs.agg(min("doc_id").as("i0"), max("doc_id").as("i1"))
        val cand = docs.crossJoin(broadcast(b))
          .select(col("doc_id"),
            explode(sequence(lit(1L), lit(8L))).as("k"),
            col("i0"), col("i1"))
          .withColumn("neg_id",
            col("i0") + conv(substring(md5(concat(lit("neg"),
              col("doc_id").cast("string"), lit("-"),
              col("k").cast("string"))), 1, 14), 16, 10).cast("long")
              % (col("i1") - col("i0") + 1))
          .filter(col("neg_id") =!= col("doc_id"))
          .select(col("doc_id"), col("k"), col("neg_id"))
        val pos = TextPipeline.ngramPairs(s, d)
          .select(col("a_id"), col("b_id"))
        val sym = pos.unionByName(
          pos.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        cand.join(sym,
            cand("doc_id") === sym("a_id") && cand("neg_id") === sym("b_id"),
            "left_anti")
          .orderBy("doc_id", "k")
      }),

      // --- hard-negative mining (the retrieval-training step after
      // random negatives stop teaching): per probe, the top-3 most
      // similar vectors with a DIFFERENT label — high-cosine
      // cross-label neighbors are exactly the pairs a contrastive
      // model is getting wrong. Same broadcast-probe corpus scan and
      // exact fixed-point cosine as q_sim_topk (bit-stable ranking),
      // plus one label inequality before the bounded per-probe
      // window. ---
      "q_hard_negative" -> ((s, d) => {
        val e = table(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").as("q"), col("label"))
          .withColumn("nn", Similarity.dotQ(col("q"), col("q")))
        val probes = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("q").as("pq"),
            col("nn").as("pn"), col("label").as("plab"))
        val cands = e.select(col("vec_id").as("cand_id"),
          col("q").as("cq"), col("nn").as("cn"), col("label").as("clab"))
        val scored = cands.crossJoin(broadcast(probes))
          .filter(col("cand_id") =!= col("probe_id") &&
            col("clab") =!= col("plab"))
          .select(col("probe_id"), col("cand_id"),
            col("clab").cast("long").as("neg_label"),
            Similarity.cosQ(Similarity.dotQ(col("pq"), col("cq")),
              col("pn"), col("cn")).as("cos"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("cos").desc, col("cand_id").asc)
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy("probe_id", "rn")
      }),

      // --- one-way ANOVA F (does event value differ across the five
      // event types? — the k-group generalization of q_ab_ttest's
      // two-sample gate): per-type moments (n, Σv, Σv²) accumulate as
      // exact decimals with map-side partials, pivot into ONE row via
      // conditional aggregation over the KNOWN type set, and the
      // between/within sums of squares fold in a FIXED left-to-right
      // expression tree — the same tree in the oracle, so the handful
      // of terminal FP ops agree bit-for-bit. Shuffle volume: 5
      // moment triples. ---
      "q_anova_f" -> ((s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val e = table(s, d, "events")
          .select(col("event_type"), dec(col("value")).as("v"))
        val aggs = types.flatMap { t =>
          Seq(
            sum(when(col("event_type") === t, 1L).otherwise(0L))
              .as(s"n_$t"),
            sum(when(col("event_type") === t, col("v"))
              .otherwise(lit(0).cast(D))).as(s"s_$t"),
            sum(when(col("event_type") === t, col("v") * col("v"))
              .otherwise(lit(0).cast(D) * lit(0).cast(D)))
              .as(s"q_$t"))
        }
        val g = e.agg(aggs.head, aggs.tail: _*)
        def nD(t: String) = col(s"n_$t").cast("double")
        def sD(t: String) = col(s"s_$t").cast("double")
        def qD(t: String) = col(s"q_$t").cast("double")
        val n = types.map(t => col(s"n_$t")).reduce(_ + _)
        val sTot = types.map(sD).reduce(_ + _)
        val groupTerm = types.map(t => sD(t) * sD(t) / nD(t))
          .reduce(_ + _)
        val qTot = types.map(qD).reduce(_ + _)
        val k = types.length
        g.select(n.as("n"), lit(k.toLong).as("k"),
            (groupTerm - sTot * sTot / n.cast("double")).as("ssb"),
            (qTot - groupTerm).as("ssw"))
          .select(col("n"), col("k"), col("ssb"), col("ssw"),
            ((col("ssb") / (col("k") - 1).cast("double")) /
              (col("ssw") / (col("n") - col("k")).cast("double")))
              .as("f_stat"))
      }),

      // --- CDC MERGE with delete tombstones (the full change-feed
      // apply q_merge_upsert's insert/update half leaves out): delete
      // ops win over updates for the same key, deleted rows vanish
      // from the snapshot, inserts land under new keys. One left-anti
      // join of the base against the touched-key set + the change
      // relation union — the standard log-compaction read shape; at
      // fleet scale both sides shuffle on the same key. ---
      "q_merge_delete" -> ((s, d) => {
        val base = table(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val dels = base.filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"))
        val upds = base
          .filter(col("o_orderkey") % 13 =!= 0 &&
            col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 1.1).as("o_totalprice"),
            lit("updated").as("change"))
        val ins = base.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_totalprice"), lit("inserted").as("change"))
        val touched = dels.unionByName(upds.select("o_orderkey"))
        base.join(touched, Seq("o_orderkey"), "left_anti")
          .withColumn("change", lit("kept"))
          .unionByName(upds).unionByName(ins)
          .orderBy("o_orderkey", "change")
      }),

      // --- embedding-norm preflight audit (run before ANY cosine ANN
      // build: zero or wildly-skewed norms break normalization and
      // bucket balance): exact fixed-point squared norms via the
      // codegen'd QuantizedDot, bucketed into power-of-two octaves
      // with the floor-log2 device — one corpus scan, O(octaves)
      // output. ---
      "q_embed_norm" -> ((s, d) => {
        val e = table(s, d, "embeddings")
          .select(col("vec_id"),
            Similarity.dotQ(col("embedding"), col("embedding")).as("nq"))
        e.select((length(bin(col("nq"))) - 1).cast("long").as("octave"),
            col("nq"))
          .groupBy("octave")
          .agg(count(lit(1)).as("n"), min("nq").as("min_sq"),
            max("nq").as("max_sq"))
          .orderBy("octave")
      }))

  override def oracle: Map[String, String] = Map(

    "q_negative_sample" -> {
      s"""WITH ${TextPipeline.ngramPairCte},
         |d AS (SELECT doc_id FROM documents),
         |b AS (SELECT MIN(doc_id) AS i0, MAX(doc_id) AS i1 FROM d),
         |ks AS (SELECT unnest(range(1, 9)) AS k),
         |cand AS (SELECT doc_id, CAST(k AS BIGINT) AS k,
         |    i0 + CAST(list_sum([CAST(strpos('0123456789abcdef',
         |          substr(md5('neg' || CAST(doc_id AS VARCHAR) || '-'
         |            || CAST(k AS VARCHAR)), i, 1)) - 1 AS BIGINT)
         |        << (4 * (14 - i)) for i in range(1, 15)]) AS BIGINT)
         |      % (i1 - i0 + 1) AS neg_id
         |  FROM d CROSS JOIN b CROSS JOIN ks),
         |sym AS (SELECT a_id, b_id FROM p
         |        UNION ALL SELECT b_id, a_id FROM p)
         |SELECT doc_id, k, neg_id FROM cand
         |WHERE neg_id <> doc_id
         |  AND NOT EXISTS (SELECT 1 FROM sym
         |    WHERE sym.a_id = cand.doc_id AND sym.b_id = cand.neg_id)
         |ORDER BY doc_id, k""".stripMargin
    },

    "q_hard_negative" ->
      s"""WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1)
         |    AS i, unnest(${Similarity.qSql}) AS v FROM embeddings),
         |n AS (SELECT vec_id, SUM(v * v) AS nn FROM x GROUP BY vec_id),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |dot AS (SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
         |               SUM(a.v * b.v) AS d
         |        FROM x a JOIN x b ON a.i = b.i
         |        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
         |        GROUP BY 1, 2),
         |sc AS (SELECT probe_id, cand_id,
         |         CAST(lc.label AS BIGINT) AS neg_label,
         |         CAST(d AS DOUBLE) /
         |           (sqrt(CAST(np.nn AS DOUBLE))
         |             * sqrt(CAST(nc.nn AS DOUBLE))) AS cos
         |       FROM dot
         |       JOIN n np ON np.vec_id = probe_id
         |       JOIN n nc ON nc.vec_id = cand_id
         |       JOIN lb lp ON lp.vec_id = probe_id
         |       JOIN lb lc ON lc.vec_id = cand_id
         |       WHERE lp.label <> lc.label),
         |r AS (SELECT probe_id, cand_id, neg_label, cos,
         |        CAST(row_number() OVER (PARTITION BY probe_id
         |          ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
         |      FROM sc)
         |SELECT probe_id, cand_id, neg_label, cos, rn FROM r
         |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,

    "q_anova_f" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val nAgg = types.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t").mkString(",\n|  ")
      val sAgg = types.map(t =>
        s"SUM(CASE WHEN event_type = '$t' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END) AS s_$t").mkString(",\n|  ")
      val qAgg = types.map(t =>
        s"SUM(CASE WHEN event_type = '$t' THEN v * v ELSE CAST(0 AS DECIMAL(36,8)) END) AS q_$t").mkString(",\n|  ")
      val nSum = types.map(t => s"n_$t").mkString(" + ")
      val sSum = types.map(t => s"CAST(s_$t AS DOUBLE)").mkString(" + ")
      val gTerm = types.map(t =>
        s"CAST(s_$t AS DOUBLE) * CAST(s_$t AS DOUBLE) / CAST(n_$t AS DOUBLE)").mkString(" + ")
      val qSum = types.map(t => s"CAST(q_$t AS DOUBLE)").mkString(" + ")
      s"""WITH e AS (SELECT event_type,
         |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
         |g AS (SELECT
         |  $nAgg,
         |  $sAgg,
         |  $qAgg
         |  FROM e),
         |m AS (SELECT CAST($nSum AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
         |    ($gTerm) - ($sSum) * ($sSum) / CAST($nSum AS DOUBLE) AS ssb,
         |    ($qSum) - ($gTerm) AS ssw
         |  FROM g)
         |SELECT n, k, ssb, ssw,
         |  (ssb / CAST(k - 1 AS DOUBLE))
         |    / (ssw / CAST(n - k AS DOUBLE)) AS f_stat
         |FROM m""".stripMargin
    },

    "q_merge_delete" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        |dels AS (SELECT o_orderkey FROM base WHERE o_orderkey % 13 = 0),
        |upds AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
        |    'updated' AS change
        |  FROM base WHERE o_orderkey % 13 <> 0 AND o_orderkey % 10 = 0),
        |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey,
        |    o_totalprice, 'inserted' AS change
        |  FROM base WHERE o_orderkey % 97 = 0),
        |touched AS (SELECT o_orderkey FROM dels
        |  UNION ALL SELECT o_orderkey FROM upds)
        |SELECT b.o_orderkey, b.o_totalprice, 'kept' AS change
        |FROM base b ANTI JOIN touched t ON t.o_orderkey = b.o_orderkey
        |UNION ALL SELECT o_orderkey, o_totalprice, change FROM upds
        |UNION ALL SELECT o_orderkey, o_totalprice, change FROM ins
        |ORDER BY o_orderkey, change""".stripMargin,

    "q_embed_norm" ->
      s"""WITH x AS (SELECT vec_id, unnest(${Similarity.qSql}) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nq
         |      FROM x GROUP BY vec_id)
         |SELECT CAST(length(bin(nq)) - 1 AS BIGINT) AS octave,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(nq) AS min_sq, MAX(nq) AS max_sq
         |FROM n GROUP BY octave ORDER BY octave""".stripMargin)
}
