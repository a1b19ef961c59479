package graft.operators

/** DuckDB oracle for the Count-Min queries (q_agg_cms /
  * q_streaming_cms): rebuilds the 4x2048 counter table BIT-EXACTLY by
  * emulating Spark's `XXH64.hashLong(key, seed)` in pure SQL, then
  * answers the same top-10 probes with the same min-over-rows rule.
  *
  * 64-bit wrapping arithmetic does not exist in DuckDB (BIGINT ops
  * raise on overflow), so every step runs in HUGEINT (int128) with an
  * explicit `% 2^64`:
  *   - wrapping multiply: 32-bit limb split — `(ah*bl + al*bh) << 32 +
  *     al*bl (mod 2^64)`; every partial stays under 2^97, inside
  *     HUGEINT (a direct 64x64 product can reach 2^128 and overflows).
  *   - rotl(x,r): `(x*2^r mod 2^64) + x div 2^(64-r)` — the two halves
  *     occupy disjoint bits, so `+` is `|`.
  *   - logical shift right: integer division by 2^n (values are
  *     kept nonnegative).
  *   - xor: native, via UBIGINT casts.
  * The chain below is XXH64's single-long path: seed init, one 8-byte
  * round (k1 = rotl(u*P2,31)*P1; h = rotl(h^k1,27)*P1+P4), then the
  * avalanche (h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32).
  * Verified bit-equal to `XxHash64Function.hash(v, LongType, 42+r)`
  * for boundary values (0, -1, +/-Long.Max/Min) and live keys; the
  * counter index is `hash % 2048`, DuckDB's nonnegative remainder
  * matching Spark's `h & 2047` on the unsigned reinterpretation.
  *
  * One hash chain per DISTINCT key (not per event row): the counter
  * for (r, idx) is the sum of per-key exact counts hashing there —
  * identical to per-row increments, at vocabulary cost.
  */
private[graft] object CmsOracle {
  private val M = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261" // 0x27D4EB2F165667C5

  private def mul(a: String, b: String): String =
    s"(((($a)//4294967296)*(($b)%4294967296)+(($a)%4294967296)*" +
      s"(($b)//4294967296))%$M*4294967296+(($a)%4294967296)*" +
      s"(($b)%4294967296))%$M"
  private def rot(x: String, r: Int): String =
    s"((($x)*${1L << r}%$M)+(($x)//${1L << (64 - r)}))"
  private def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** Probe oracle shared by the batch and streamed spellings (the
    * streamed sketch is pinned bit-identical to the batch aggregate
    * over the same rows, so one SQL serves both).
    */
  val sql: String =
    s"""WITH us AS (SELECT u.user_id, r.r,
       |    ((CAST(u.user_id AS HUGEINT)%$M)+$M)%$M AS u,
       |    (CAST(42+r.r AS HUGEINT)+$P5+8)%$M AS h0
       |  FROM (SELECT DISTINCT user_id FROM events) u
       |  CROSS JOIN (SELECT unnest([0,1,2,3]) AS r) r),
       |s2 AS (SELECT *, ${mul("u", P2)} AS k1a FROM us),
       |s3 AS (SELECT *, ${rot("k1a", 31)} AS k1b FROM s2),
       |s4 AS (SELECT *, ${mul("k1b", P1)} AS k1 FROM s3),
       |s5 AS (SELECT *, ${xor("h0", "k1")} AS h1 FROM s4),
       |s6 AS (SELECT *, (${mul(rot("h1", 27), P1)}+$P4)%$M AS h2 FROM s5),
       |s7 AS (SELECT *, ${xor("h2", "h2//8589934592")} AS h3 FROM s6),
       |s8 AS (SELECT *, ${mul("h3", P2)} AS h4 FROM s7),
       |s9 AS (SELECT *, ${xor("h4", "h4//536870912")} AS h5 FROM s8),
       |sa AS (SELECT *, ${mul("h5", P3)} AS h6 FROM s9),
       |sb AS (SELECT user_id, r,
       |    CAST(${xor("h6", "h6//4294967296")}%2048 AS BIGINT) AS idx
       |  FROM sa),
       |cnt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |counters AS (SELECT r, idx, CAST(SUM(n) AS BIGINT) AS c
       |  FROM sb JOIN cnt USING (user_id) GROUP BY r, idx),
       |top10 AS (SELECT user_id, n AS exact_n FROM cnt
       |  ORDER BY n DESC, user_id LIMIT 10)
       |SELECT t.user_id, t.exact_n, CAST(MIN(c.c) AS BIGINT) AS est_n
       |FROM top10 t JOIN sb USING (user_id) JOIN counters c USING (r, idx)
       |GROUP BY 1, 2 ORDER BY exact_n DESC, user_id""".stripMargin

  /** KMV (k-minimum-values) distinct-sketch oracle (q_kmv_distinct):
    * the same seed-42 XXH64 chain, kept at FULL 64-bit width (no %2048)
    * over the distinct (event_type, user_id) relation; the k smallest
    * unsigned values per type give the kth-min order statistic and the
    * classic (k-1)·2^64/h_(k) estimator, all in exact HUGEINT
    * arithmetic (the estimate is an integral division — no doubles
    * cross the engine boundary).
    */
  def kmvSql(k: Int): String = {
    val num = (BigInt(k - 1) * BigInt(M)).toString
    s"""WITH us AS (SELECT du.event_type, du.user_id,
       |    ((CAST(du.user_id AS HUGEINT)%$M)+$M)%$M AS u,
       |    (CAST(42 AS HUGEINT)+$P5+8)%$M AS h0
       |  FROM (SELECT DISTINCT event_type, user_id FROM events) du),
       |s2 AS (SELECT *, ${mul("u", P2)} AS k1a FROM us),
       |s3 AS (SELECT *, ${rot("k1a", 31)} AS k1b FROM s2),
       |s4 AS (SELECT *, ${mul("k1b", P1)} AS k1 FROM s3),
       |s5 AS (SELECT *, ${xor("h0", "k1")} AS h1 FROM s4),
       |s6 AS (SELECT *, (${mul(rot("h1", 27), P1)}+$P4)%$M AS h2 FROM s5),
       |s7 AS (SELECT *, ${xor("h2", "h2//8589934592")} AS h3 FROM s6),
       |s8 AS (SELECT *, ${mul("h3", P2)} AS h4 FROM s7),
       |s9 AS (SELECT *, ${xor("h4", "h4//536870912")} AS h5 FROM s8),
       |sa AS (SELECT *, ${mul("h5", P3)} AS h6 FROM s9),
       |sb AS (SELECT event_type, user_id,
       |    ${xor("h6", "h6//4294967296")} AS h
       |  FROM sa),
       |rk AS (SELECT event_type, h,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM sb),
       |km AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
       |    MAX(h) AS kth
       |  FROM rk WHERE rn <= $k GROUP BY 1),
       |ex AS (SELECT event_type,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_exact
       |  FROM events GROUP BY 1)
       |SELECT km.event_type, ex.ndv_exact, km.m,
       |  CAST(kth // 4294967296 AS BIGINT) AS kth_hi,
       |  CAST(kth % 4294967296 AS BIGINT) AS kth_lo,
       |  CAST(CASE WHEN km.m < $k THEN km.m
       |    ELSE (CAST('$num' AS HUGEINT)) // kth END AS BIGINT) AS est_ndv
       |FROM km JOIN ex USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  /** KMV set-operation oracle (q_kmv_setops): one UNION sketch over
    * click∪view users, membership flags riding each hash, the same
    * integral estimators as the engine.
    */
  def kmvSetopsSql(k: Int): String = {
    val num = (BigInt(k - 1) * BigInt(M)).toString
    s"""WITH mem AS (SELECT user_id,
       |    CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS in_a,
       |    CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS in_b
       |  FROM events WHERE event_type IN ('click', 'view')
       |  GROUP BY 1),
       |us AS (SELECT user_id, in_a, in_b,
       |    ((CAST(user_id AS HUGEINT)%$M)+$M)%$M AS u,
       |    (CAST(42 AS HUGEINT)+$P5+8)%$M AS h0
       |  FROM mem),
       |s2 AS (SELECT *, ${mul("u", P2)} AS k1a FROM us),
       |s3 AS (SELECT *, ${rot("k1a", 31)} AS k1b FROM s2),
       |s4 AS (SELECT *, ${mul("k1b", P1)} AS k1 FROM s3),
       |s5 AS (SELECT *, ${xor("h0", "k1")} AS h1 FROM s4),
       |s6 AS (SELECT *, (${mul(rot("h1", 27), P1)}+$P4)%$M AS h2 FROM s5),
       |s7 AS (SELECT *, ${xor("h2", "h2//8589934592")} AS h3 FROM s6),
       |s8 AS (SELECT *, ${mul("h3", P2)} AS h4 FROM s7),
       |s9 AS (SELECT *, ${xor("h4", "h4//536870912")} AS h5 FROM s8),
       |sa AS (SELECT *, ${mul("h5", P3)} AS h6 FROM s9),
       |sb AS (SELECT user_id, in_a, in_b,
       |    ${xor("h6", "h6//4294967296")} AS h
       |  FROM sa),
       |rk AS (SELECT *, row_number() OVER (ORDER BY h) AS rn FROM sb),
       |ku AS (SELECT * FROM rk WHERE rn <= $k),
       |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS kth,
       |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS jac_cnt
       |  FROM ku),
       |ex AS (SELECT CAST(SUM(in_a) AS BIGINT) AS ndv_a,
       |    CAST(SUM(in_b) AS BIGINT) AS ndv_b,
       |    CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS exact_inter,
       |    CAST(COUNT(*) AS BIGINT) AS exact_union
       |  FROM mem),
       |eu AS (SELECT agg.*, ex.*,
       |    CAST(CASE WHEN m < $k THEN m
       |      ELSE (CAST('$num' AS HUGEINT)) // kth END AS BIGINT)
       |      AS est_union
       |  FROM agg CROSS JOIN ex)
       |SELECT ndv_a, ndv_b, exact_inter, exact_union, m, jac_cnt,
       |  est_union,
       |  CAST(jac_cnt AS DOUBLE) / CAST(m AS DOUBLE) AS est_jac,
       |  CAST((jac_cnt * est_union) // m AS BIGINT) AS est_inter
       |FROM eu""".stripMargin
  }
}
