package graft.sources

/** Mechanical T-SQL → ANSI transpile for [[SqlServerDialect]]'s generated
  * text, used by the DSv2 source's JDBC mode when the endpoint speaks
  * ANSI (embedded Derby in this environment) rather than T-SQL.
  *
  * The transform is deliberately SHALLOW — substitute the DECLARE binds
  * with literals, `TOP (n)` → `FETCH FIRST n ROWS ONLY`, strip lock
  * hints, `[x]` → `"x"`, quote the `__$`/`__` system identifiers, inline
  * the one CTE — so the query STRUCTURE the dialect reasons about (the
  * seek-friendly UNION/branch decomposition, keyset predicates, ordering)
  * executes exactly as generated. A SQL Server deployment skips this
  * entirely and prepares the T-SQL with its `?` binds as-is.
  *
  * LSN/seqval literals arrive as fixed-width hex CHAR(20) (see
  * [[AnsiTranspile.hex20]]), whose lexicographic order equals the binary
  * order — the property the reference relies on for its hex-rendered LSNs
  * (`cdc_kafka/tracked_tables.py:71-77`).
  */
object AnsiTranspile {

  /** Fixed-width hex rendering for a signed long carried in a CHAR(20)
    * column: zero-padded two's complement, so unsigned-lexicographic
    * string order equals signed numeric order for the non-negative
    * domain the staged feed uses. */
  def hex20(n: Long): String = f"$n%020x"

  def parseHex20(s: String): Long = java.lang.Long.parseUnsignedLong(s.trim, 16)

  /** Render a string as a SQL literal (quotes doubled). */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Substitute each declared @var (declaration order) with the matching
    * literal, then normalize the T-SQL-only surface to ANSI. */
  def apply(tsql: String, binds: Seq[String]): String = {
    val semi = tsql.indexOf("\n;")
    val (decl, body0) =
      if (tsql.startsWith("DECLARE")) (tsql.substring(0, semi), tsql.substring(semi + 2))
      else ("", tsql)
    val names = "@[A-Z0-9_]+".r.findAllIn(decl).toSeq.distinct
      .filter(n => !n.exists(_.isLower))
    require(names.size == binds.size, s"binds ${binds.size} != vars $names")
    // Longest names first so @K1 never clobbers the prefix of @K10.
    var body = body0
    names.zip(binds).sortBy(-_._1.length).foreach { case (n, v) =>
      body = body.replace(n, v)
    }
    var top: Option[String] = None
    body = "TOP \\((\\d+)\\)".r.replaceAllIn(body, m => { top = Some(m.group(1)); "" })
    val ansi = body
      .replace("WITH (NOLOCK, FORCESEEK)", "")
      .replace("WITH (NOLOCK)", "")
      .replace("GETDATE()", "CURRENT_TIMESTAMP")
      // Derby rejects untyped NULL in a select list; the type is opaque
      // to the structural semantics (only null-ness matters).
      .replaceAll("(?<![A-Za-z_])NULL AS", "CAST(NULL AS VARCHAR(20)) AS")
      .replace("[", "\"").replace("]", "\"")
    // Quote the bare __$-prefixed system columns and __-prefixed aliases
    // ($ and leading _ are not legal in ANSI regular identifiers).
    val quoted = "(?<![\\w\"$])(__\\$?[a-z_]+)".r
      .replaceAllIn(ansi, m =>
        java.util.regex.Matcher.quoteReplacement("\"" + m.group(1) + "\""))
    // Derby has no CTE support: inline `WITH ct AS (...) SELECT ... FROM
    // ct` as a derived table — same plan shape, same branch structure.
    val noCte =
      if (quoted.trim.startsWith("WITH ct AS (")) {
        val close = quoted.indexOf("\n)\nSELECT")
        val cteBody = quoted.substring(quoted.indexOf("(") + 1, close)
        quoted.substring(close + 3)
          .replace("FROM ct\n", s"FROM (\n$cteBody\n) ct\n")
      } else quoted
    top.fold(noCte)(n => noCte + s"\nFETCH FIRST $n ROWS ONLY")
  }
}
