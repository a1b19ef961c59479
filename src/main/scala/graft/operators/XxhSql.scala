package graft.operators

/** Shared DuckDB emulation of Spark's `XXH64.hashLong(value, seed)` —
  * the single-long XXH64 path — in pure HUGEINT SQL, factored out of
  * [[CmsOracle]] (round 10) for the round-11 sketch oracles (HLL /
  * MinHash / SimHash).
  *
  * 64-bit wrapping arithmetic does not exist in DuckDB (BIGINT ops
  * raise on overflow), so every step runs in HUGEINT (int128) with an
  * explicit `% 2^64`:
  *   - wrapping multiply: 32-bit limb split — `(ah*bl + al*bh) << 32 +
  *     al*bl (mod 2^64)`; every partial stays under 2^97, inside
  *     HUGEINT (a direct 64x64 product can reach 2^128 and overflows).
  *   - rotl(x,r): `(x*2^r mod 2^64) + x div 2^(64-r)` — the two halves
  *     occupy disjoint bits, so `+` is `|`.
  *   - logical shift right: integer division by 2^n (values are kept
  *     nonnegative).
  *   - xor: native, via UBIGINT casts.
  * The chain is XXH64's single-long path: seed init, one 8-byte round
  * (k1 = rotl(u*P2,31)*P1; h = rotl(h^k1,27)*P1+P4), then the avalanche
  * (h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32). Verified
  * bit-equal to `XxHash64Function.hash(v, LongType, seed)` for boundary
  * values and live keys (CmsOracle round 10; HllOracleSpec round 11).
  */
private[graft] object XxhSql {
  val M = "18446744073709551616" // 2^64
  val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  val P3 = "1609587929392839161" // 0x165667B19E3779F9
  val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  val P5 = "2870177450012600261" // 0x27D4EB2F165667C5

  def mul(a: String, b: String): String =
    s"(((($a)//4294967296)*(($b)%4294967296)+(($a)%4294967296)*" +
      s"(($b)//4294967296))%$M*4294967296+(($a)%4294967296)*" +
      s"(($b)%4294967296))%$M"
  def rot(x: String, r: Int): String =
    s"((($x)*${1L << r}%$M)+(($x)//${1L << (64 - r)}))"
  def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** Unsigned (mod 2^64) image of a signed 64-bit SQL expression. */
  def u64(v: String): String = s"((CAST($v AS HUGEINT)%$M)+$M)%$M"

  /** Seed-init `h0 = seed + P5 + 8 (mod 2^64)`; `seed` may be any
    * HUGEINT expression (signed and unsigned images agree mod 2^64).
    */
  def h0(seed: String): String = s"((CAST($seed AS HUGEINT))+$P5+8+$M)%$M"

  /** Signed-long image of an unsigned (mod 2^64) HUGEINT expression. */
  def signed(h: String): String =
    s"(CASE WHEN ($h) >= 9223372036854775808 THEN ($h) - $M ELSE ($h) END)"

  /** First 8 md5 bytes of a string expression as an UNSIGNED 64-bit
    * HUGEINT — the DuckDB image of [[graft.functions.Md5Long.hash64]]
    * (whose signed bit pattern this is).
    */
  def md5u(s: String): String =
    s"CAST(CAST(concat('0x', substr(md5($s), 1, 16)) AS UBIGINT) AS HUGEINT)"

  /** CTE pipeline computing `hashLong`: reads CTE `src`, which must
    * expose `u` (unsigned value mod 2^64) and `h0` (seed init, see
    * [[h0]]) plus the carry columns in `keep`; emits stages
    * `<p>2`..`<p>a` and a final CTE named `<p>` with the `keep` columns
    * plus `h` — the UNSIGNED hash. Prefixes keep multiple chains in one
    * statement disjoint.
    */
  def hashLong(p: String, src: String, keep: Seq[String]): String = {
    val kc = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    s"""${p}2 AS (SELECT ${kc}h0, ${mul("u", P2)} AS k1a FROM $src),
       |${p}3 AS (SELECT ${kc}h0, ${rot("k1a", 31)} AS k1b FROM ${p}2),
       |${p}4 AS (SELECT ${kc}h0, ${mul("k1b", P1)} AS k1 FROM ${p}3),
       |${p}5 AS (SELECT ${kc}${xor("h0", "k1")} AS h1 FROM ${p}4),
       |${p}6 AS (SELECT ${kc}(${mul(rot("h1", 27), P1)}+$P4)%$M AS h2
       |  FROM ${p}5),
       |${p}7 AS (SELECT ${kc}${xor("h2", "h2//8589934592")} AS h3
       |  FROM ${p}6),
       |${p}8 AS (SELECT ${kc}${mul("h3", P2)} AS h4 FROM ${p}7),
       |${p}9 AS (SELECT ${kc}${xor("h4", "h4//536870912")} AS h5
       |  FROM ${p}8),
       |${p}a AS (SELECT ${kc}${mul("h5", P3)} AS h6 FROM ${p}9),
       |$p AS (SELECT ${kc}${xor("h6", "h6//4294967296")} AS h
       |  FROM ${p}a)""".stripMargin
  }
}
