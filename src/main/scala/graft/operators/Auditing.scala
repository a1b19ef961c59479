package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Governance / evaluation auditing operators (round 8, third block):
  * grouping_id-disambiguated cube rollups, a t-closeness EMD audit,
  * per-class precision/recall/F1, the word-graph degree distribution,
  * and a clustering-depth layout audit. All five carry full DuckDB
  * oracles.
  *
  * Determinism: every distribution distance is exact integer
  * cross-multiplication summed in DECIMAL(38,0); metric divisions are
  * terminal IEEE ops on exact operands with a FIXED expression tree
  * (identical in the oracle SQL); null-ambiguous cube rows are keyed by
  * grouping_id so the sort never compares NULL orderings.
  */
object Auditing extends QueryModule {

  private val D38 = DecimalType(38, 0)

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(

      // --- CUBE + grouping_id: the disambiguation every BI rollup
      // needs — a NULL cell can mean "aggregated over this column" or
      // a genuinely NULL value, and only the grouping bitmask tells
      // them apart (bit per cube column, rightmost = last). Sorting
      // leads with gid, so within each stratum the nulled-out column
      // is constant and the sort never compares NULL against data
      // (Spark orders NULLS FIRST, DuckDB NULLS LAST — a latent
      // cross-engine trap this spelling sidesteps). One pass, 4
      // grouping sets, map-side partials for each. ---
      "q_grouping_id" -> ((s, d) => {
        table(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            sumd(col("o_totalprice")).as("sum_price"))
          .orderBy(col("gid"), col("o_orderstatus"),
            col("o_orderpriority"))
      }),

      // --- t-closeness audit (the distribution-level privacy check
      // k-anonymity and l-diversity miss): per market segment, the
      // Earth Mover's Distance between the segment's account-balance
      // distribution and the global one, over ordered 1000-unit bins.
      // EMD for an ordered attribute is the mean absolute difference
      // of cumulative shares; spelled as |cum_seg·N − cum_glob·n_seg|
      // — exact int64 cross-multiplication (bounds the audited table
      // at ~3e9 rows; shard the audit beyond) — summed in
      // DECIMAL(38,0), with ONE terminal division by the fixed tree
      // (n_seg·N)·(m−1). The grid is segments × bins (two tiny
      // broadcast relations), cumulative windows partition by segment
      // over ≤ a few dozen bins. ---
      "q_tcloseness" -> ((s, d) => {
        val c = table(s, d, "customer")
          .select(col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") / 1000).cast("long").as("bin"))
        val byBin = c.groupBy("seg", "bin").agg(count(lit(1)).as("cnt"))
        val glob = c.groupBy("bin").agg(count(lit(1)).as("gcnt"))
        val segs = c.select("seg").distinct()
        val tot = glob.agg(sum("gcnt").as("nn"),
          count(lit(1)).as("m"))
        val segN = byBin.groupBy("seg").agg(sum("cnt").as("ns"))
        val grid = segs.crossJoin(broadcast(glob))
          .join(byBin, Seq("seg", "bin"), "left")
          .na.fill(0L, Seq("cnt"))
        val w = Window.partitionBy("seg").orderBy("bin")
        grid
          .withColumn("cums", sum("cnt").over(w))
          .withColumn("cumg", sum("gcnt").over(w))
          .join(broadcast(segN), "seg")
          .crossJoin(broadcast(tot))
          .select(col("seg"), col("ns"), col("nn"), col("m"),
            abs(col("cums") * col("nn") - col("cumg") * col("ns"))
              .cast(D38).as("dd"))
          .groupBy("seg").agg(max("ns").as("n"),
            sum("dd").as("ss"), max("nn").as("nn"), max("m").as("m"))
          .select(col("seg"), col("n"),
            (col("ss").cast("double") /
              ((col("n") * col("nn")).cast("double") *
                (col("m") - 1).cast("double"))).as("emd"))
          .orderBy("seg")
      }),

      // --- per-class precision/recall/F1 (the multi-class readout
      // q_confusion's binary cells can't give): corpus reduces to the
      // 16-cell (label, predicted) confusion relation FIRST
      // (compact-first — everything after is O(classes²)), then each
      // class derives tp/fp/fn by conditional sums over the cells.
      // F1 = 2tp/(2tp+fp+fn) — ONE division per metric on exact
      // int64 counts, the same formula tree in the oracle. ---
      "q_class_f1" -> ((s, d) => {
        val e = table(s, d, "embeddings").select(
          (col("label") % 4).cast("long").as("y"),
          (abs(round(element_at(col("embedding"), 2).cast("double")
            * 1000, 0)).cast("long") % 4).as("p"))
        val cells = e.groupBy("y", "p").agg(count(lit(1)).as("c"))
        val classes = cells.select(col("y").as("cls")).distinct()
        classes.crossJoin(cells)
          .groupBy("cls")
          .agg(
            sum(when(col("y") === col("cls") && col("p") === col("cls"),
              col("c")).otherwise(0L)).as("tp"),
            sum(when(col("p") === col("cls") && col("y") =!= col("cls"),
              col("c")).otherwise(0L)).as("fp"),
            sum(when(col("y") === col("cls") && col("p") =!= col("cls"),
              col("c")).otherwise(0L)).as("fn"))
          .select(col("cls"), col("tp"), col("fp"), col("fn"),
            (col("tp") + col("fn")).as("support"),
            (col("tp").cast("double") / (col("tp") + col("fp")))
              .as("precision"),
            (col("tp").cast("double") / (col("tp") + col("fn")))
              .as("recall"),
            ((lit(2L) * col("tp")).cast("double") /
              (lit(2L) * col("tp") + col("fp") + col("fn"))).as("f1"))
          .orderBy("cls")
      }),

      // --- word-graph degree distribution (the first statistic any
      // graph pipeline computes — it decides whether skew handling is
      // needed at all): distinct-neighbor out-degree per node, then
      // count-of-counts. Both aggregates are vocabulary-bounded;
      // share is one terminal division. ---
      "q_degree_dist" -> ((s, d) => {
        val deg = Relevance.wordEdges(s, d)
          .groupBy("src").agg(countDistinct("dst").as("degree"))
        val tot = deg.agg(count(lit(1)).as("nodes"))
        deg.groupBy("degree").agg(count(lit(1)).as("n_nodes"))
          .crossJoin(broadcast(tot))
          .select(col("degree"), col("n_nodes"),
            (col("n_nodes").cast("double") / col("nodes")).as("share"))
          .orderBy("degree")
      }),

      // --- clustering-depth layout audit (the OPTIMIZE/Z-ORDER
      // decision metric): simulate 32 files under two layouts —
      // ingestion order (bin by doc_id) vs value-sorted (bin by
      // n_chars) — take each file's zone map (min/max n_chars), and
      // count how many OTHER files' ranges overlap each file's. A
      // sorted layout reads ~1 file per point lookup; an ingestion
      // layout reads all 32 — the avg_overlap gap IS the measured
      // benefit of re-clustering, the number a lake maintenance
      // planner acts on. Bin assignment is map-side integer
      // arithmetic from broadcast bounds; the overlap join is
      // O(files²) = 1024 tiny rows. ---
      "q_cluster_depth" -> ((s, d) => {
        val docs = table(s, d, "documents")
          .select(col("doc_id"), col("n_chars"))
        val b = docs.agg(min("doc_id").as("i0"), max("doc_id").as("i1"),
          min("n_chars").as("c0"), max("n_chars").as("c1"))
        val binned = docs.crossJoin(broadcast(b)).select(
          expr("(doc_id - i0) * 32 div (i1 - i0 + 1)").as("bin_ingest"),
          expr("(n_chars - c0) * 32 div (c1 - c0 + 1)").as("bin_sorted"),
          col("n_chars"))
        def zones(bcol: String, layout: String) = binned
          .groupBy(col(bcol).as("bin"))
          .agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
          .withColumn("layout", lit(layout))
        val z = zones("bin_ingest", "ingest")
          .unionByName(zones("bin_sorted", "sorted"))
        val zz = z.select(col("layout").as("l2"), col("bin").as("bin2"),
          col("lo").as("lo2"), col("hi").as("hi2"))
        z.join(zz, col("layout") === col("l2") &&
            col("bin") =!= col("bin2") &&
            col("lo") <= col("hi2") && col("hi") >= col("lo2"), "left")
          .groupBy("layout", "bin")
          .agg(sum(when(col("bin2").isNotNull, 1L).otherwise(0L))
            .as("ovl"))
          .groupBy("layout")
          .agg(count(lit(1)).as("n_files"),
            sum("ovl").as("total_overlaps"),
            max("ovl").as("max_overlap"))
          .select(col("layout"), col("n_files"), col("total_overlaps"),
            col("max_overlap"),
            (col("total_overlaps").cast("double") / col("n_files"))
              .as("avg_overlap"))
          .orderBy("layout")
      }),

      // --- disparate-impact fairness audit (four-fifths rule): per
      // language group, the length-gate pass rate against the
      // best-treated group — the pre-training mix check that catches a
      // quality filter silently starving one language (the known CJK
      // failure mode of char-length gates). Rates are single divisions
      // off exact conditional counts; the reference rate is a 1-row
      // max over the O(langs) rate relation crossed back; the 0.8
      // flag compares engine-identical doubles. ---
      "q_fairness_audit" -> ((s, d) => {
        val g = table(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum((col("n_chars") >= 200).cast("long")).as("n_pass"))
          .withColumn("pass_rate",
            col("n_pass").cast("double") / col("n").cast("double"))
        val ref = g.agg(max(col("pass_rate")).as("max_rate"))
        g.crossJoin(broadcast(ref))
          .select(col("lang"), col("n"), col("n_pass"), col("pass_rate"),
            (col("pass_rate") / col("max_rate")).as("di_ratio"),
            (col("pass_rate") / col("max_rate") < 0.8).as("flagged"))
          .orderBy("lang")
      }))

  override def oracle: Map[String, String] = Map(

    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT)
        |    AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "q_tcloseness" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bin
        |  FROM customer),
        |bb AS (SELECT seg, bin, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM c GROUP BY seg, bin),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS gcnt
        |      FROM c GROUP BY bin),
        |segs AS (SELECT DISTINCT seg FROM c),
        |t AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS nn,
        |        CAST(COUNT(*) AS BIGINT) AS m FROM g),
        |sn AS (SELECT seg, CAST(SUM(cnt) AS BIGINT) AS ns
        |       FROM bb GROUP BY seg),
        |grid AS (SELECT segs.seg, g.bin, g.gcnt,
        |    COALESCE(bb.cnt, 0) AS cnt
        |  FROM segs CROSS JOIN g
        |  LEFT JOIN bb ON bb.seg = segs.seg AND bb.bin = g.bin),
        |cum AS (SELECT seg,
        |    CAST(SUM(cnt) OVER (PARTITION BY seg ORDER BY bin)
        |      AS BIGINT) AS cums,
        |    CAST(SUM(gcnt) OVER (PARTITION BY seg ORDER BY bin)
        |      AS BIGINT) AS cumg
        |  FROM grid),
        |dd AS (SELECT seg, ns, nn, m,
        |    CAST(abs(cums * nn - cumg * ns) AS DECIMAL(38,0)) AS dd
        |  FROM cum JOIN sn USING (seg) CROSS JOIN t)
        |SELECT seg, MAX(ns) AS n,
        |  CAST(SUM(dd) AS DOUBLE) /
        |    (CAST(MAX(ns) * MAX(nn) AS DOUBLE)
        |      * CAST(MAX(m) - 1 AS DOUBLE)) AS emd
        |FROM dd GROUP BY seg ORDER BY seg""".stripMargin,

    "q_class_f1" ->
      """WITH e AS (SELECT CAST(label % 4 AS BIGINT) AS y,
        |    abs(CAST(round(CAST(embedding[2] AS DOUBLE) * 1000, 0)
        |      AS BIGINT)) % 4 AS p
        |  FROM embeddings),
        |cells AS (SELECT y, p, CAST(COUNT(*) AS BIGINT) AS c
        |          FROM e GROUP BY y, p),
        |cls AS (SELECT DISTINCT y AS cls FROM cells),
        |m AS (SELECT cls,
        |    CAST(SUM(CASE WHEN y = cls AND p = cls THEN c ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN p = cls AND y <> cls THEN c ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN y = cls AND p <> cls THEN c ELSE 0 END)
        |      AS BIGINT) AS fn
        |  FROM cls CROSS JOIN cells GROUP BY cls)
        |SELECT cls, tp, fp, fn, tp + fn AS support,
        |  CAST(tp AS DOUBLE) / (tp + fp) AS precision,
        |  CAST(tp AS DOUBLE) / (tp + fn) AS recall,
        |  CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) AS f1
        |FROM m ORDER BY cls""".stripMargin,

    "q_degree_dist" ->
      """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
        |         for i in range(1, len(tk))]) AS gram FROM t),
        |e0 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM g GROUP BY gram),
        |e AS (SELECT string_split(gram, ' ')[1] AS src,
        |        string_split(gram, ' ')[2] AS dst FROM e0),
        |deg AS (SELECT src, CAST(COUNT(DISTINCT dst) AS BIGINT)
        |          AS degree FROM e GROUP BY src),
        |t2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nodes FROM deg)
        |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(COUNT(*) AS DOUBLE) / MAX(nodes) AS share
        |FROM deg CROSS JOIN t2 GROUP BY degree
        |ORDER BY degree""".stripMargin,

    "q_cluster_depth" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
        |b AS (SELECT MIN(doc_id) AS i0, MAX(doc_id) AS i1,
        |        MIN(n_chars) AS c0, MAX(n_chars) AS c1 FROM d),
        |binned AS (SELECT
        |    (doc_id - i0) * 32 // (i1 - i0 + 1) AS bin_ingest,
        |    (n_chars - c0) * 32 // (c1 - c0 + 1) AS bin_sorted,
        |    n_chars
        |  FROM d CROSS JOIN b),
        |z AS (
        |  SELECT 'ingest' AS layout, bin_ingest AS bin,
        |      MIN(n_chars) AS lo, MAX(n_chars) AS hi
        |    FROM binned GROUP BY bin_ingest
        |  UNION ALL
        |  SELECT 'sorted' AS layout, bin_sorted AS bin,
        |      MIN(n_chars) AS lo, MAX(n_chars) AS hi
        |    FROM binned GROUP BY bin_sorted),
        |ov AS (SELECT z.layout, z.bin,
        |    CAST(SUM(CASE WHEN z2.bin IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ovl
        |  FROM z LEFT JOIN z AS z2
        |    ON z.layout = z2.layout AND z.bin <> z2.bin
        |      AND z.lo <= z2.hi AND z.hi >= z2.lo
        |  GROUP BY z.layout, z.bin)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(ovl) AS BIGINT) AS total_overlaps,
        |  CAST(MAX(ovl) AS BIGINT) AS max_overlap,
        |  CAST(SUM(ovl) AS DOUBLE) / COUNT(*) AS avg_overlap
        |FROM ov GROUP BY layout ORDER BY layout""".stripMargin,

    "q_fairness_audit" ->
      """WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pass
        |  FROM documents GROUP BY lang),
        |r AS (SELECT lang, n, n_pass,
        |    CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) AS pass_rate
        |  FROM g),
        |mx AS (SELECT MAX(pass_rate) AS max_rate FROM r)
        |SELECT lang, n, n_pass, pass_rate,
        |  pass_rate / max_rate AS di_ratio,
        |  pass_rate / max_rate < 0.8 AS flagged
        |FROM r CROSS JOIN mx ORDER BY lang""".stripMargin)
}
