package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.OracleSql

/** The oracle-SQL MATERIALIZED post-pass: a pure string transform, so
  * the evaluation-strategy pin is spec-locked at the string level (the
  * full-registry DuckDB gate re-validates row identity end-to-end). */
class OracleSqlSpec extends AnyFunSuite {

  test("plain CTE gets MATERIALIZED") {
    val in = "WITH a AS (SELECT 1 AS x) SELECT * FROM a"
    assert(OracleSql.materializeCtes(in) ===
      "WITH a AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM a")
  }

  test("recursive CTE left plain, scaffold still marked") {
    val in = "WITH RECURSIVE s AS (SELECT 1 AS i), " +
      "r AS (SELECT i FROM s UNION ALL SELECT i + 1 FROM r WHERE i < 3) " +
      "SELECT * FROM r"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("s AS MATERIALIZED (SELECT 1 AS i)"))
    assert(out.contains("r AS (SELECT i FROM s"))
    assert(!out.contains("r AS MATERIALIZED"))
  }

  test("WINDOW definition untouched; nested CTEs qualify") {
    val in = "WITH a AS (SELECT x, sum(x) OVER w AS s FROM " +
      "(WITH b AS (SELECT 1 AS x) SELECT * FROM b) t WINDOW w AS " +
      "(PARTITION BY x)) SELECT * FROM a"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("WINDOW w AS (PARTITION BY x)"))
    assert(out.contains("b AS MATERIALIZED (SELECT 1 AS x)"))
    assert(out.contains("a AS MATERIALIZED (SELECT x,"))
  }

  test("already-materialized text is a fixed point") {
    val in = "WITH a AS MATERIALIZED (SELECT 1 AS x) SELECT * FROM a"
    assert(OracleSql.materializeCtes(in) === in)
  }

  test("name-collision with own column stays plain (conservative)") {
    val in = "WITH a AS (SELECT 1 AS a) SELECT * FROM a"
    assert(OracleSql.materializeCtes(in) === in)
  }

  test("string literal with parens doesn't derail the body scan") {
    val in = "WITH a AS (SELECT replace(x, '(', '') AS y FROM t), " +
      "b AS (SELECT y FROM a) SELECT * FROM b"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("a AS MATERIALIZED (SELECT replace"))
    assert(out.contains("b AS MATERIALIZED (SELECT y FROM a)"))
  }

  test("registry-wide: transform only inserts MATERIALIZED keywords") {
    // the transform must differ from the authored text ONLY by
    // `AS MATERIALIZED (` insertions (the DuckDB gate does the full
    // row-identity validation)
    def strip(s: String) = s.replace(" AS MATERIALIZED (", " AS (")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("MATERIALIZED MATERIALIZED"), name)
    }
    val mat = SparkEntry.oracleSql
    val plain = SparkEntry.rawOracleSql
    plain.foreach { case (name, raw) =>
      assert(strip(mat(name)) === strip(raw), name)
    }
  }
}
