package graft.operators

/** DuckDB oracles for the string-sketch signatures (q_dedup_minhash,
  * q_dedup_simhash) — round-11 ask #1, enabled by the [[
  * graft.functions.Md5Long]] hash rebase: gram/token strings hash
  * through `md5-prefix-64 -> XXH64.hashLong` chains, every stage of
  * which [[XxhSql]] reproduces bit-exactly in HUGEINT SQL. The oracles
  * rebuild the SIGNATURES themselves (band keys / sign bits), not just
  * hash-independent summaries.
  *
  * q_dedup_minhash: the emulation covers base gram hash -> 32 re-seeded
  * minima (signed-long MIN, matching the Scala comparison) -> 4-step
  * band folds -> bucket posting-list pairs -> exact-Jaccard verify.
  * Docs with <3 tokens (no grams) are omitted: their minima are all
  * Long.MaxValue, so they can only pair with each other, and such
  * pairs have 0/0 Jaccard — NULL here (filtered by `jac >= 0.5`) and
  * NaN in Spark, where the nan-safe compare would PASS the filter; the
  * Spark side therefore carries an explicit `!isnan(jac)` guard
  * (Dedup.scala q_dedup_minhash) so omission is output-equivalent on
  * every corpus, not just gram-rich ones.
  *
  * q_dedup_simhash: per-token sign contributions ride the distinct
  * token relation weighted by per-doc occurrence counts; bit i of the
  * signature is `sum > 0`, packed in exact HUGEINT arithmetic.
  */
private[graft] object SigOracle {
  import XxhSql._

  /** q_dedup_minhash twin: MinHashBandKeys(toks, 3, 32, 8) ->
    * postingPairs -> distinct -> exact Jaccard >= 0.5.
    */
  val minhashSql: String = minhashSqlWhere("TRUE")

  /** q_minhash_delta twin: the SAME signature emulation with the
    * bucket-collision pairs restricted by `pairCond` (over x.doc_id /
    * y.doc_id) — the delta query is from-scratch minhash minus the
    * base×base pairs, which is exactly a pair-level predicate.
    */
  def minhashSqlWhere(pairCond: String): String =
    minhashChain(pairCond) + s"""
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1),
       |ix AS (SELECT p.a_id, p.b_id, COUNT(*) AS ni
       |  FROM pr p
       |  JOIN dg da ON da.doc_id = p.a_id
       |  JOIN dg db ON db.doc_id = p.b_id AND db.gram = da.gram
       |  GROUP BY 1, 2),
       |jj AS (SELECT p.a_id, p.b_id,
       |    CAST(COALESCE(ix.ni, 0) AS DOUBLE) /
       |      (sa.n + sb.n - COALESCE(ix.ni, 0)) AS jac
       |  FROM pr p
       |  JOIN sz sa ON sa.doc_id = p.a_id
       |  JOIN sz sb ON sb.doc_id = p.b_id
       |  LEFT JOIN ix ON ix.a_id = p.a_id AND ix.b_id = p.b_id)
       |SELECT a_id, b_id, jac FROM jj WHERE jac >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  /** Candidate pairs ONLY (no Jaccard verify) — the oracle of the
    * streaming band-index twin, whose drained emissions are exactly
    * the distinct bucket-collision pairs.
    */
  val minhashCandidatesSql: String =
    minhashChain("TRUE").dropRight(1) + "\n" +
      "SELECT a_id, b_id FROM pr ORDER BY a_id, b_id"

  /** The shared signature-emulation CTE chain, ending at the distinct
    * candidate-pair relation `pr` (terminated with a trailing comma
    * for the Jaccard tail; candidates-only callers drop it).
    */
  private def minhashChain(pairCond: String): String = {
    // the four sequential band-fold steps acc_{k+1} = hashLong(mv_k, acc_k)
    val folds = (0 until 4).map { k =>
      val src =
        if (k == 0)
          s"""f0i AS (SELECT doc_id, band, ${u64("mv")} AS u,
             |    ${h0("42")} AS h0 FROM mn WHERE k = 0)""".stripMargin
        else
          s"""f${k}i AS (SELECT m.doc_id, m.band, ${u64("m.mv")} AS u,
             |    ${h0(s"c${k - 1}.h")} AS h0
             |  FROM mn m JOIN c${k - 1} USING (doc_id, band)
             |  WHERE m.k = $k)""".stripMargin
      src + ",\n" + hashLong(s"c$k", s"f${k}i", Seq("doc_id", "band"))
    }.mkString(",\n")
    s"""WITH tl AS (SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents),
       |gr AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
       |  FROM tl, LATERAL (SELECT unnest(generate_series(1, len(t) - 2))
       |    AS i) ii
       |  WHERE len(t) >= 3),
       |dg AS (SELECT DISTINCT doc_id, gram FROM gr),
       |vg AS (SELECT DISTINCT gram FROM dg),
       |g0 AS (SELECT gram, ${md5u("gram")} AS u, ${h0("42")} AS h0
       |  FROM vg),
       |${hashLong("gc", "g0", Seq("gram"))},
       |j0 AS (SELECT gram, j, h AS u, ${h0("j")} AS h0
       |  FROM gc CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j)
       |    js),
       |${hashLong("jc", "j0", Seq("gram", "j"))},
       |hs AS (SELECT gram, j, ${signed("h")} AS v FROM jc),
       |mn AS (SELECT d.doc_id, CAST(j//4 AS BIGINT) AS band, j%4 AS k,
       |    MIN(v) AS mv
       |  FROM dg d JOIN hs USING (gram) GROUP BY 1, 2, 3),
       |$folds,
       |pp AS (SELECT band, h AS bkey, doc_id FROM c3),
       |pr AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM pp x JOIN pp y
       |  ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.doc_id < y.doc_id
       |  WHERE $pairCond),""".stripMargin
  }

  /** q_dedup_simhash twin: SimHash64(split(text, ' ')) + the four
    * 16-bit bands.
    */
  val simhashSql: String =
    s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |dt AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM tk GROUP BY 1, 2),
       |vt AS (SELECT DISTINCT tok FROM dt),
       |t0 AS (SELECT tok, ${md5u("tok")} AS u, ${h0("42")} AS h0
       |  FROM vt),
       |${hashLong("tc", "t0", Seq("tok"))},
       |tb AS (SELECT tok, b,
       |    CASE WHEN (h // (CAST(1 AS HUGEINT) << b)) % 2 = 1
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM tc CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
       |    bs),
       |cb AS (SELECT d.doc_id, t.b, SUM(d.cnt * t.sgn) AS c
       |  FROM dt d JOIN tb t USING (tok) GROUP BY 1, 2),
       |sg AS (SELECT doc_id,
       |    SUM(CASE WHEN c > 0 THEN CAST(1 AS HUGEINT) << b
       |      ELSE CAST(0 AS HUGEINT) END) AS us
       |  FROM cb GROUP BY 1)
       |SELECT doc_id, CAST(${signed("us")} AS BIGINT) AS simhash,
       |  CAST(us % 65536 AS BIGINT) AS band0,
       |  CAST((us // 65536) % 65536 AS BIGINT) AS band1,
       |  CAST((us // 4294967296) % 65536 AS BIGINT) AS band2,
       |  CAST((us // 281474976710656) % 65536 AS BIGINT) AS band3
       |FROM sg ORDER BY doc_id""".stripMargin
}
