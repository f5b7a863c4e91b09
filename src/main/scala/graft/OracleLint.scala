package graft

/** Oracle type-lint — the standing defense for the q160 incident class.
  *
  * DuckDB widens aggregates silently: SUM(BIGINT) → HUGEINT (decimal128,
  * which the driver's arrow→pandas bridge renders differently from
  * Spark's long), AVG/QUANTILE → DOUBLE (accumulation-order-sensitive).
  * An oracle whose FINAL output column carries such a widened type —
  * directly, or smuggled through a CTE alias — hash-mismatches a Spark
  * result that is value-identical. The repo convention is therefore a
  * terminal CAST (or the rounded-float `round(CAST(… AS DOUBLE), k)`
  * convention) on every widened output, and this lint enforces it
  * mechanically: [[Verify]] fails the whole run on any violation, so a
  * new un-CAST window SUM can never reach the driver's gate.
  *
  * The check is syntactic, tuned to this repo's oracle dialect:
  *  - every SELECT list in the statement is parsed (paren-depth scan;
  *    CTE bodies and subqueries included);
  *  - an item is STABLE if its outermost construct is an explicit
  *    CAST (to anything but HUGEINT), a `round(…)` call, a boolean
  *    (depth-0 comparison), the reviewed `/ nullif(0, 0)` NULL
  *    sentinel (F16's SAFE_DIVIDE fixture — constant-NULL output), or
  *    if every widening aggregate inside it is already enclosed in a
  *    CAST (explicitly-typed intermediate arithmetic);
  *  - unstable items in inner SELECTs taint their alias; the final
  *    (minimum-depth) SELECT lists may neither contain an unstable
  *    item nor pass a tainted alias through bare.
  */
object OracleLint {

  private val Widen =
    ("(?i)\\b(sum|avg|product|median|quantile(?:_cont|_disc)?|corr" +
      "|covar_(?:pop|samp)|stddev(?:_pop|_samp)?|var_(?:pop|samp)" +
      "|variance)\\s*\\(").r
  private val TrailingAlias =
    "(?is)\\s+AS\\s+\"?([A-Za-z_][A-Za-z0-9_]*)\"?\\s*$".r
  private val BareRef =
    "(?s)^\\s*(?:[A-Za-z_][A-Za-z0-9_]*\\.)?([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val HugeintTerminal = "(?is)AS\\s+HUGEINT\\s*\\)\\s*$".r
  private val NullSentinel = "(?is)/\\s*nullif\\s*\\(\\s*0\\s*,\\s*0\\s*\\)".r

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Positions (offset, parenDepth) of every SELECT keyword. */
  private def selectPositions(sql: String): Seq[(Int, Int)] = {
    val u = sql.toUpperCase
    val out = Seq.newBuilder[(Int, Int)]
    var depth = 0
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (u.startsWith("SELECT", i) &&
          (i == 0 || !isWordChar(u(i - 1))) &&
          (i + 6 >= u.length || !isWordChar(u(i + 6))))
        out += ((i, depth))
      i += 1
    }
    out.result()
  }

  /** The select-list text after a SELECT at (start, d): up to FROM at
    * the same depth, a close-paren dropping below d, or end of input.
    */
  private def selectList(sql: String, start: Int, d: Int): String = {
    val u = sql.toUpperCase
    var depth = d
    var j = start + 6
    var end = sql.length
    var done = false
    while (j < sql.length && !done) {
      val c = sql(j)
      if (c == '(') depth += 1
      else if (c == ')') {
        depth -= 1
        if (depth < d) { end = j; done = true }
      }
      if (!done && depth == d && u.startsWith("FROM", j) &&
          !isWordChar(u(j - 1)) &&
          (j + 4 >= u.length || !isWordChar(u(j + 4)))) {
        end = j; done = true
      }
      j += 1
    }
    sql.substring(start + 6, end)
  }

  /** Split a select list on depth-0 commas. */
  private def splitItems(list: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    list.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      if (c == ',' && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** (expression, alias) with a trailing `AS alias` stripped. */
  private def stripAlias(item: String): (String, Option[String]) =
    TrailingAlias.findFirstMatchIn(item) match {
      case Some(m) => (item.substring(0, m.start).trim, Some(m.group(1)))
      case None    => (item.trim, None)
    }

  /** Does `name(` span the whole expression (matching close at end)? */
  private def outermostCall(expr: String, name: String): Boolean = {
    val m = s"(?is)^$name\\s*\\(".r.findPrefixMatchOf(expr)
    m.exists { pm =>
      var depth = 0
      var i = pm.end - 1 // at the opening paren
      var closeAt = -1
      while (i < expr.length && closeAt < 0) {
        if (expr(i) == '(') depth += 1
        else if (expr(i) == ')') { depth -= 1; if (depth == 0) closeAt = i }
        i += 1
      }
      closeAt >= 0 && expr.substring(closeAt + 1).trim.isEmpty
    }
  }

  /** Is some widening aggregate present OUTSIDE any enclosing CAST? */
  private def uncastWiden(expr: String): Boolean =
    Widen.findAllMatchIn(expr).exists { m =>
      // walk the prefix, tracking open-paren contexts and whether each
      // belongs to a CAST call
      var castDepth = 0 // open CAST contexts currently enclosing
      val stack = scala.collection.mutable.Stack[Boolean]()
      var i = 0
      while (i < m.start) {
        val c = expr(i)
        if (c == '(') {
          // identifier immediately before this paren
          var j = i - 1
          while (j >= 0 && expr(j).isWhitespace) j -= 1
          val e = j
          while (j >= 0 && isWordChar(expr(j))) j -= 1
          val name = expr.substring(j + 1, e + 1).toLowerCase
          val isCast = name == "cast"
          stack.push(isCast)
          if (isCast) castDepth += 1
        } else if (c == ')') {
          if (stack.nonEmpty && stack.pop()) castDepth -= 1
        }
        i += 1
      }
      castDepth == 0
    }

  /** Depth-0 comparison chars ⇒ boolean output (stable). */
  private def isBoolean(expr: String): Boolean = {
    var depth = 0
    expr.exists { c =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      depth == 0 && (c == '<' || c == '>' || c == '=')
    }
  }

  /** The stable-output-type predicate (see object doc). */
  private[graft] def stable(expr: String): Boolean =
    if (outermostCall(expr, "cast"))
      HugeintTerminal.findFirstIn(expr).isEmpty
    else if (outermostCall(expr, "round")) true
    else if (isBoolean(expr)) true
    else if (NullSentinel.findFirstIn(expr).isDefined) true
    else !uncastWiden(expr)

  /** Violations for one oracle; empty = clean. */
  def lint(name: String, sql: String): Seq[String] = {
    val sels = selectPositions(sql)
    if (sels.isEmpty) return Seq(s"$name: no SELECT found")
    val lists = sels.map { case (p, d) => (d, selectList(sql, p, d)) }
    val minDepth = lists.map(_._1).min
    val tainted = lists.collect { case (d, l) if d > minDepth => l }
      .flatMap(splitItems).flatMap { item =>
        val (expr, alias) = stripAlias(item)
        if (!stable(expr)) alias else None
      }.map(_.toLowerCase).toSet
    lists.collect { case (d, l) if d == minDepth => l }
      .flatMap(splitItems).flatMap { item =>
        val (expr, _) = stripAlias(item)
        if (!stable(expr))
          Some(s"$name: final output is a widened aggregate without a " +
            s"terminal CAST: ${expr.take(80)}")
        else BareRef.findFirstMatchIn(expr)
          .filter(m => tainted(m.group(1).toLowerCase))
          .map(m => s"$name: final output passes widened CTE alias " +
            s"'${m.group(1)}' through without a terminal CAST")
      }
  }

  /** Lint the whole oracle surface; empty = clean. */
  def lintAll(oracles: Map[String, String]): Seq[String] =
    oracles.toSeq.sortBy(_._1).flatMap { case (n, s) => lint(n, s) }
}
