package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static oracle hygiene (round-12 ask #2a): no assembled oracle SQL
  * may contain duplicate top-level CTE names. The round-11
  * q_blocking_eval regression shipped exactly this class of bug — a
  * shared CTE block (TextPipeline.ngramPairCte) introduced a name
  * (`g`) that a downstream splice already used, and DuckDB failed at
  * parse time only when the driver ran the oracle. This spec catches
  * it at `sbt test` time, before a driver round.
  *
  * Parsing is deliberately dumb string work: strip quoted literals,
  * then scan for `name AS (` occurrences at paren depth 0 — inside a
  * WITH clause those are exactly the top-level CTE definitions
  * (subqueries, lambdas and casts inside CTE bodies sit at depth > 0).
  */
class OracleCteHygieneSpec extends AnyFunSuite {

  private val cteRe = "(?is)\\b([a-z_][a-z0-9_]*)\\s+AS\\s*\\(".r

  private[graft] def cteNames(sql: String): Seq[String] = {
    // string literals can contain unbalanced parens — blank them first.
    // Doubled-quote aware: a literal containing an SQL-escaped quote
    // ('it''s (') must be consumed as ONE literal, or the tail after
    // the '' would leak into the paren-depth scan.
    val noStr = sql.replaceAll("'(?:[^']|'')*'", "''")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var idx = 0
    for (m <- cteRe.findAllMatchIn(noStr)) {
      while (idx < m.start) {
        val ch = noStr.charAt(idx)
        if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
        idx += 1
      }
      if (depth == 0) names += m.group(1).toLowerCase
    }
    names.toSeq
  }

  test("parser sanity: finds top-level CTEs, ignores nested ones") {
    val sql =
      """WITH a AS (SELECT 1 FROM (SELECT 2) AS inner_q),
        |b AS (SELECT x, CAST(y AS DOUBLE) FROM t WHERE s = '(((')
        |SELECT * FROM a JOIN b USING (x)""".stripMargin
    assert(cteNames(sql) == Seq("a", "b"))
  }

  test("parser sanity: SQL-escaped quotes inside literals don't corrupt " +
      "the paren-depth scan") {
    // the literal contains both a doubled quote AND an unbalanced
    // paren — the pre-fix blanking split it at the wrong boundary
    val sql =
      """WITH a AS (SELECT 1 FROM t WHERE s = 'it''s ('),
        |b AS (SELECT 2)
        |SELECT * FROM a JOIN b ON true""".stripMargin
    assert(cteNames(sql) == Seq("a", "b"))
  }

  test("parser sanity: detects a duplicate") {
    val sql = "WITH g AS (SELECT 1), g AS (SELECT 2) SELECT * FROM g"
    assert(cteNames(sql) == Seq("g", "g"))
  }

  test("no oracle SQL has duplicate top-level CTE names") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) =>
        val ns = cteNames(sql)
        val dups =
          ns.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
        if (dups.nonEmpty) Some(s"$q: ${dups.toSeq.sorted.mkString(",")}")
        else None
    }
    assert(bad.isEmpty, s"duplicate CTE names in oracles:\n${bad.mkString("\n")}")
  }
}
