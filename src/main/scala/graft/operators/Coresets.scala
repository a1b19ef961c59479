package graft.operators

import graft.QueryModule
import graft.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data SELECTION loops (round 13): the greedy set-function
  * maximizers a curation team runs when the token budget is smaller
  * than the corpus — facility-location/max-coverage selection over
  * shingles ("which k docs cover the most distinct content") and
  * farthest-point k-center seeding over embeddings ("which k docs are
  * maximally spread in representation space"). Both are the classic
  * 1-1/e greedy approximations from the submodular-selection
  * literature, spelled as the house iterative pattern (q_bpe_train,
  * Dedup.clusterLoop): per round ONE distributed aggregate + ONE
  * TakeOrdered argmax whose single decision row reaches the driver,
  * with localCheckpoint truncating the growing state lineage. State is
  * O(covered grams) / O(k centers) — never a corpus-sized driver
  * structure — and every per-round relation shuffles on its natural
  * key, so the loop's shape survives 100 TB (the argmax is a
  * per-partition heap merge, the anti-join is broadcast-able: covered
  * grams ≪ corpus).
  *
  * Determinism: gains and distances are exact int64 (distinct-gram
  * counts; 2^20 fixed-point squared L2 — elements < 2^21, squares
  * < 2^42, 64-dim sums < 2^48), ties break on min id. Oracles are
  * UNROLLED k-round CTE chains (the recursive-CTE spelling needs the
  * accumulated state each level, but a recursive term only sees the
  * previous iteration's rows — carrying the full covered-set forward
  * would re-emit it k times; the unrolled chain states each round
  * explicitly and stays OracleCteHygieneSpec-clean).
  */
object Coresets extends QueryModule {

  private val CoverageRounds = 5
  private val CenterRounds = 5

  /** 2^20 fixed-point elements (the Similarity module's quantization
    * rule — floor of a power-of-two scale is exact on both engines).
    */
  private def quant(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(1048576.0))
      .cast("long"))

  private val qSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) " +
      "* 1048576.0) AS BIGINT))"

  // 3-token shingle list, per-doc distinct — the ngramPairCte spelling
  private val shSql =
    """list_distinct(list_transform(
      |          range(1, greatest(len(tk) - 2, 0) + 1),
      |          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- greedy max-coverage selection (facility location): k rounds,
    // each picking the doc with the most shingles NOT yet covered.
    // Round relation = the (doc, gram) universe anti-joined against
    // the covered-gram set (skinny, broadcast-able), then a count
    // aggregate and a TakeOrdered top-1. The anti-join leg is exactly
    // how a fleet-scale selector prunes: covered grams grow with k,
    // not with the corpus. ---
    "q_select_coverage" -> ((s, d) => {
      val ex = table(s, d, "documents")
        .select(col("doc_id"),
          explode(TextPipeline.shingles(TextPipeline.toks)).as("sg"))
        .localCheckpoint()
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var covered: DataFrame = null
      var total = 0L
      var k = 1
      var exhausted = false
      while (k <= CoverageRounds && !exhausted) {
        val cand =
          if (covered == null) ex
          else ex.join(broadcast(covered), Seq("sg"), "left_anti")
        val top = cand.groupBy("doc_id")
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val docId = top(0).getLong(0)
          val gain = top(0).getLong(1)
          total += gain
          picks += ((k.toLong, docId, gain, total))
          val newCov = ex.filter(col("doc_id") === docId).select("sg")
          covered = (if (covered == null) newCov
            else covered.union(newCov).distinct()).localCheckpoint()
          k += 1
        }
      }
      import s.implicits._
      picks.toSeq.toDF("step", "doc_id", "gain", "covered_total")
        .orderBy("step")
    }),

    // --- farthest-point k-center seeding over embeddings: seed = min
    // vec_id, then k-1 rounds each picking the point with the LARGEST
    // min-distance to the chosen centers (the 2-approximation for
    // k-center, and the standard diversity-seeding pass — kmeans++'s
    // deterministic cousin). Per round: candidates x centers is a
    // BROADCAST of <= k rows, the min-distance aggregate shuffles on
    // vec_id, the argmax is a TakeOrdered top-1. Distances are exact
    // int64 squared L2 on the 2^20 fixed-point grid — no float
    // accumulation, no sqrt. ---
    "q_kcenter_seed" -> ((s, d) => {
      val pts = table(s, d, "embeddings")
        .select(col("vec_id"), quant(col("embedding")).as("qv"))
        .localCheckpoint()
      val seed = pts.orderBy("vec_id").limit(1).collect()(0)
      val picks = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      picks += ((1L, seed.getLong(0), 0L))
      var centers = pts.filter(col("vec_id") === seed.getLong(0))
        .select(col("vec_id").as("c_id"), col("qv").as("cq"))
        .localCheckpoint()
      val d2 = expr("aggregate(zip_with(qv, cq, (x, y) -> " +
        "(x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
      for (k <- 2 to CenterRounds) {
        val top = pts.crossJoin(broadcast(centers))
          .select(col("vec_id"), d2.as("dd"))
          .groupBy("vec_id").agg(min("dd").as("mind2"))
          .orderBy(col("mind2").desc, col("vec_id")).limit(1)
          .collect()(0)
        picks += ((k.toLong, top.getLong(0), top.getLong(1)))
        centers = centers.union(
          pts.filter(col("vec_id") === top.getLong(0))
            .select(col("vec_id").as("c_id"), col("qv").as("cq")))
          .localCheckpoint()
      }
      import s.implicits._
      picks.toSeq.toDF("step", "vec_id", "mind2").orderBy("step")
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_select_coverage" -> {
      // unrolled k-round chain: p_k = the round's argmax, c_k = the
      // covered-gram set after it; gains recompute per round against
      // the previous round's cover
      val rounds = (2 to CoverageRounds).map { k =>
        s"""r$k AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
           |  FROM e LEFT JOIN c${k - 1} cc ON cc.sg = e.sg
           |  WHERE cc.sg IS NULL GROUP BY e.doc_id),
           |p$k AS (SELECT doc_id, gain FROM r$k
           |  ORDER BY gain DESC, doc_id LIMIT 1),
           |c$k AS (SELECT sg FROM c${k - 1}
           |  UNION SELECT e.sg FROM e JOIN p$k USING (doc_id))"""
          .stripMargin
      }.mkString(",\n")
      val unions = (2 to CoverageRounds).map(k =>
        s"UNION ALL SELECT CAST($k AS BIGINT), doc_id, gain FROM p$k")
        .mkString("\n")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
         |           FROM documents),
         |sh AS (SELECT doc_id, $shSql AS sg0 FROM t),
         |e AS (SELECT doc_id, unnest(sg0) AS sg FROM sh),
         |p1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM e GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
         |c1 AS (SELECT e.sg FROM e JOIN p1 USING (doc_id)),
         |$rounds,
         |sel AS (SELECT CAST(1 AS BIGINT) AS step, doc_id, gain FROM p1
         |$unions)
         |SELECT step, doc_id, gain,
         |  CAST(SUM(gain) OVER (ORDER BY step) AS BIGINT)
         |    AS covered_total
         |FROM sel ORDER BY step""".stripMargin
    },

    "q_kcenter_seed" -> {
      val rounds = (2 to CenterRounds).map { k =>
        s"""m$k AS (SELECT dd.vec_id, MIN(dd.d2) AS mind2 FROM (
           |    SELECT a.vec_id, b.vec_id AS cid,
           |      SUM((a.v - b.v) * (a.v - b.v)) AS d2
           |    FROM x a JOIN x b ON a.i = b.i
           |    JOIN cs${k - 1} c ON c.vec_id = b.vec_id
           |    GROUP BY a.vec_id, b.vec_id) dd
           |  GROUP BY dd.vec_id),
           |s$k AS (SELECT vec_id, CAST(mind2 AS BIGINT) AS mind2
           |  FROM m$k ORDER BY mind2 DESC, vec_id LIMIT 1),
           |cs$k AS (SELECT vec_id FROM cs${k - 1}
           |  UNION SELECT vec_id FROM s$k)""".stripMargin
      }.mkString(",\n")
      val unions = (2 to CenterRounds).map(k =>
        s"UNION ALL SELECT CAST($k AS BIGINT), vec_id, mind2 FROM s$k")
        .mkString("\n")
      s"""WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |             unnest($qSql) AS v FROM embeddings),
         |s1 AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1),
         |cs1 AS (SELECT vec_id FROM s1)
         |,$rounds
         |SELECT CAST(1 AS BIGINT) AS step, vec_id,
         |  CAST(0 AS BIGINT) AS mind2 FROM s1
         |$unions
         |ORDER BY step""".stripMargin
    }
  )
}
