package graft.operators

/** DuckDB oracle for the HyperLogLog family (q_agg_hll, q_hll_rollup,
  * q_streaming_hll) — flips the round-10 `no_oracle` rows to full
  * rows+schema+hash checks (round-11 ask #1) by rebuilding the 4096
  * registers bit-exactly and reproducing the ESTIMATE deterministically:
  *
  *   - registers: one [[XxhSql]] seed-42 `hashLong` chain per distinct
  *     key; `idx = h >> 52`; rank = 64 - (highest set bit of
  *     `(h mod 2^52)*2^12 + 2^11`) — the sentinel-OR'd
  *     leading-zeros rule of [[graft.functions.HyperLogLog]], in exact
  *     HUGEINT arithmetic (the highest bit via a 11..63 series join,
  *     never a float log2).
  *   - estimate: N = sum_j 2^(53-M_j) held exactly in HUGEINT, its
  *     double image built from two exactly-representable halves
  *     (`N>>12` <= 2^53 and `N&4095`) with a single rounding add —
  *     mirroring `estimateRegisters`; then ONE division by the embedded
  *     exact-decimal image of `Alpha*m^2*2^53`, and the linear-counting
  *     branch `floor(4096*ln(4096/V)+0.5)`, which HllOracleSpec proves
  *     rounds identically to Java's `Math.round(4096*Math.log(...))`
  *     for every V in 1..4096.
  *
  * Merge-vs-direct equivalence makes the rollup oracle trivial: a
  * register is the max rank over the keys hashing there, so the merged
  * ALL sketch equals a direct pass over the globally-distinct key set.
  */
private[graft] object HllOracle {
  import XxhSql._

  // exact decimal image of the Scala-side double constant — same bits
  private val RawNumLit =
    new java.math.BigDecimal(graft.functions.HyperLogLog.RawNum)
      .toPlainString

  /** CTE pipeline from `src(g, v)` (v: signed 64-bit key) to
    * `<p>est(g, approx)`. Emits only CTE bodies — caller wraps in WITH.
    */
  private def estPipeline(p: String, src: String): String =
    s"""${p}i0 AS (SELECT g, ${u64("v")} AS u, ${h0("42")} AS h0
       |  FROM $src),
       |${hashLong(s"${p}hc", s"${p}i0", Seq("g"))},
       |${p}pk AS (SELECT g, CAST(h//4503599627370496 AS BIGINT) AS idx,
       |    64 - MAX(b) AS r
       |  FROM ${p}hc, (SELECT unnest(generate_series(11, 63)) AS b) bt
       |  WHERE (CAST(1 AS HUGEINT) << b) <=
       |    (h % 4503599627370496) * 4096 + 2048
       |  GROUP BY g, h),
       |${p}rg AS (SELECT g, idx, MAX(r) AS r FROM ${p}pk GROUP BY 1, 2),
       |${p}ag AS (SELECT g, COUNT(*) AS nreg,
       |    SUM(CASE WHEN r <= 41 THEN CAST(1 AS HUGEINT) << (41 - r)
       |        ELSE CAST(0 AS HUGEINT) END) AS hi,
       |    SUM(CASE WHEN r >= 42 THEN CAST(1 AS HUGEINT) << (53 - r)
       |        ELSE CAST(0 AS HUGEINT) END) AS lo
       |  FROM ${p}rg GROUP BY g),
       |${p}e0 AS (SELECT g, 4096 - nreg AS zeros,
       |    hi + (CAST(4096 - nreg AS HUGEINT) << 41) AS hi2, lo
       |  FROM ${p}ag),
       |${p}e1 AS (SELECT g, zeros,
       |    CAST(CAST(hi2 + lo//4096 AS BIGINT) AS DOUBLE) * 4096.0 +
       |      CAST(CAST(lo%4096 AS BIGINT) AS DOUBLE) AS nd
       |  FROM ${p}e0),
       |${p}est AS (SELECT g, CAST(CASE
       |    WHEN CAST('$RawNumLit' AS DOUBLE) / nd <= 10240.0
       |      AND zeros > 0
       |    THEN floor(4096.0 * ln(4096.0 / CAST(zeros AS DOUBLE)) + 0.5)
       |    ELSE floor(CAST('$RawNumLit' AS DOUBLE) / nd + 0.5)
       |    END AS BIGINT) AS approx
       |  FROM ${p}e1)""".stripMargin

  val aggHllSql: String =
    s"""WITH dk AS (SELECT DISTINCT o_orderpriority AS g, o_custkey AS v
       |  FROM orders),
       |${estPipeline("q", "dk")},
       |ex AS (SELECT o_orderpriority AS g,
       |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
       |  FROM orders GROUP BY 1)
       |SELECT g AS o_orderpriority, approx AS approx_custs, exact_custs
       |FROM qest JOIN ex USING (g) ORDER BY o_orderpriority""".stripMargin

  val hllRollupSql: String =
    s"""WITH dk AS (SELECT DISTINCT o_orderpriority AS g, o_custkey AS v
       |    FROM orders
       |  UNION ALL
       |  SELECT 'ALL' AS g, v
       |    FROM (SELECT DISTINCT o_custkey AS v FROM orders)),
       |${estPipeline("q", "dk")},
       |ex AS (SELECT o_orderpriority AS g,
       |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
       |  FROM orders GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
       |  FROM orders)
       |SELECT g AS o_orderpriority, approx AS approx_custs, exact_custs
       |FROM qest JOIN ex USING (g) ORDER BY o_orderpriority""".stripMargin

  /** The streamed twin replays events.parquet plus one `user_id = -1`
    * sentinel; the query filters that sentinel, so the batch relation
    * under the same filter is an exact mirror of the drained state.
    */
  val streamingHllSql: String =
    s"""WITH dk AS (SELECT DISTINCT event_type AS g, user_id AS v
       |  FROM events WHERE user_id <> -1),
       |${estPipeline("q", "dk")},
       |ex AS (SELECT event_type AS g,
       |    CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM events WHERE user_id <> -1 GROUP BY 1)
       |SELECT g AS event_type, approx AS approx_users, n_events
       |FROM qest JOIN ex USING (g) ORDER BY event_type""".stripMargin
}
