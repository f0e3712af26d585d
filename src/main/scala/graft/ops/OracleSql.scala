package graft.ops

/** Oracle-SQL post-pass: mark every non-recursive CTE body
  * `MATERIALIZED`.
  *
  * DuckDB inlines plain CTEs into each reference, so an oracle whose
  * scaffold is consumed from several branches — or worse, from inside
  * a recursive term — re-executes the whole upstream chain per
  * reference (the pinned-HMM oracles re-ran a window function once per
  * recursion step). Measured at sf0.01 on the worst offenders:
  * q_d_lsh_e2e 28.6 → 0.3 s, q_compare_backtest 67 → 34 s,
  * q_candidate_pack 9 → 3.6 s — with row-identical results (the
  * keyword only pins evaluation strategy, never semantics). Applied
  * uniformly at the [[graft.SparkEntry.oracleSql]] seam so authored
  * builders stay plain ANSI and the driver's DuckDB gate gets the
  * evaluation-stable text; the full-registry hash gate re-validates
  * every transformed string.
  *
  * The rewrite is conservative: only `name AS (` where the body starts
  * with SELECT (skips WINDOW definitions) and never mentions its own
  * name (skips recursive CTEs, which cannot be materialized; a CTE
  * whose name collides with one of its own column names is merely left
  * plain). */
object OracleSql {

  private val CteOpen =
    java.util.regex.Pattern.compile("\\b([A-Za-z_][A-Za-z_0-9]*)\\s+AS\\s*\\(")
  private val SelectStart =
    java.util.regex.Pattern.compile("(?is)^\\s*select\\b")

  /** Index of the ')' matching the '(' at `open` — skipping parens
    * inside single-quoted SQL string literals ('' is the escape) and
    * `--` line comments, either of which would otherwise unbalance the
    * scan (several oracles carry literal parens in replace/regexp
    * arguments). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var j = open
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\'') { // string literal: advance past it ('' = escape)
        j += 1
        while (j < s.length &&
            !(s.charAt(j) == '\'' &&
              (j + 1 >= s.length || s.charAt(j + 1) != '\''))) {
          if (s.charAt(j) == '\'' && j + 1 < s.length &&
              s.charAt(j + 1) == '\'') j += 1
          j += 1
        }
      } else if (c == '-' && j + 1 < s.length && s.charAt(j + 1) == '-') {
        while (j < s.length && s.charAt(j) != '\n') j += 1
        j -= 1
      } else if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return j
      }
      j += 1
    }
    s.length - 1
  }

  def materializeCtes(sql: String): String = {
    // a name defined in more than one (nested) scope shadows when
    // inlined but collides once hoisted by MATERIALIZED (DuckDB:
    // "Duplicate alias" — q_grid_sanity's per-combo sub-WITH blocks);
    // leave every definition of such a name plain
    val defCounts = {
      val c = scala.collection.mutable.Map.empty[String, Int]
      val dm = CteOpen.matcher(sql)
      while (dm.find()) c.update(dm.group(1),
        c.getOrElse(dm.group(1), 0) + 1)
      c
    }
    val sb = new StringBuilder
    var i = 0
    val m = CteOpen.matcher(sql)
    while (m.find(i)) {
      val name = m.group(1)
      if (defCounts.getOrElse(name, 0) > 1) {
        sb.append(sql.substring(i, m.end))
        i = m.end
      } else {
      val open = m.end - 1
      val close = matchParen(sql, open)
      val body = sql.substring(open + 1, close)
      val noComments = body.replaceAll("--[^\\n]*", " ")
      val isCte = SelectStart.matcher(noComments).find()
      val selfRef = java.util.regex.Pattern
        .compile("\\b" + java.util.regex.Pattern.quote(name) + "\\b")
        .matcher(body).find()
      sb.append(sql.substring(i, m.start))
      if (isCte && !selfRef) sb.append(name).append(" AS MATERIALIZED (")
      else sb.append(sql.substring(m.start, m.end))
      i = m.end // keep scanning inside the body: nested CTEs qualify too
      }
    }
    sb.append(sql.substring(i))
    sb.toString
  }
}
