package graft.sources

import graft.model.TrackedFieldMeta

/** T-SQL text generation for the SQL Server CDC source.
  *
  * These are the queries a JDBC-backed deployment sends to the database.
  * The *shapes* matter operationally and are kept deliberately (behavior
  * of `cdc_kafka/sql_queries.py:218-309,312-367`, re-derived here):
  *
  *   - the composite change-index lower bound is decomposed into three
  *     UNION ALL branches so SQL Server index-SEEKs the CDC index instead
  *     of scanning it (a single OR-chain defeats the seek);
  *   - parameters pass through a DECLARE indirection: reusing one `?`
  *     placeholder value in several comparisons makes SQL Server treat
  *     them as distinct values and destabilizes descending-keyset plans;
  *   - keyset pagination (never OFFSET) for snapshots: O(log n) page
  *     starts, stateless between pages;
  *   - `WITH (NOLOCK)` everywhere — dirty reads are acceptable on CDC
  *     tables and never block the OLTP writer; FORCESEEK on the
  *     lsn_time_mapping join.
  *
  * Catalyst never sees these strings; they live below the source
  * boundary, exactly like the reference keeps them below its operator
  * layer (SURVEY §4).
  */
object SqlServerDialect {

  private def q(name: String): String = s"[${name.replace("]", "]]")}]"

  def fqChangeTable(captureInstance: String): String =
    s"[cdc].${q(captureInstance + "_CT")}"

  /** A1: incremental change scan in (lsn, command_id, seqval, operation)
    * order, strictly after (@LSN, @COMMAND_ID, @SEQ), at most @MAX_LSN.
    * Bind order: LSN, COMMAND_ID, SEQ, MAX_LSN. */
  def changeQuery(captureInstance: String, valueFields: Seq[String],
      batchSize: Int): String = {
    val ct = fqChangeTable(captureInstance)
    val cols = valueFields.map(f => s"ct.${q(f)}").mkString("\n    , ")
    s"""DECLARE
       |    @LSN BINARY(10) = ?
       |    , @COMMAND_ID INT = ?
       |    , @SEQ BINARY(10) = ?
       |    , @MAX_LSN BINARY(10) = ?
       |;
       |WITH ct AS (
       |    SELECT * FROM $ct AS ct WITH (NOLOCK)
       |    WHERE ct.__$$start_lsn = @LSN AND ct.__$$command_id = @COMMAND_ID
       |      AND ct.__$$seqval > @SEQ AND ct.__$$start_lsn <= @MAX_LSN
       |    UNION ALL
       |    SELECT * FROM $ct AS ct WITH (NOLOCK)
       |    WHERE ct.__$$start_lsn = @LSN AND ct.__$$command_id > @COMMAND_ID
       |      AND ct.__$$start_lsn <= @MAX_LSN
       |    UNION ALL
       |    SELECT * FROM $ct AS ct WITH (NOLOCK)
       |    WHERE ct.__$$start_lsn > @LSN AND ct.__$$start_lsn <= @MAX_LSN
       |)
       |SELECT TOP ($batchSize)
       |    ct.__$$operation AS __operation
       |    , ltm.tran_end_time AS __event_time
       |    , ct.__$$start_lsn AS __log_lsn
       |    , ct.__$$command_id AS __command_id
       |    , ct.__$$seqval AS __log_seqval
       |    , ct.__$$update_mask AS __updated_fields
       |    , $cols
       |FROM ct
       |INNER JOIN [cdc].[lsn_time_mapping] AS ltm WITH (NOLOCK, FORCESEEK)
       |    ON (ct.__$$start_lsn = ltm.start_lsn)
       |WHERE ct.__$$operation = 1 OR ct.__$$operation = 2 OR ct.__$$operation = 4
       |ORDER BY ct.__$$start_lsn, ct.__$$command_id, ct.__$$seqval, ct.__$$operation""".stripMargin
  }

  /** Keyset WHERE over a composite PK: for key (a, b, c) and comparator
    * `<` produces
    *   (a < @K0) OR (a = @K0 AND b < @K1) OR (a = @K0 AND b = @K1 AND c < @K2)
    * — the row-value `<` expanded so every branch is an index seek.
    * Returns (declarations, whereClause); @Ki bind in pk order. */
  def keysetPredicate(pkFields: Seq[TrackedFieldMeta],
      comparator: String): (String, String) = {
    val decls = pkFields.zipWithIndex.map { case (f, i) =>
      s"@K$i ${sqlTypeDecl(f)} = ?"
    }.mkString(", ")
    val branches = pkFields.indices.map { i =>
      val equalities = (0 until i).map(j => s"${q(pkFields(j).name)} = @K$j")
      val bound = s"${q(pkFields(i).name)} $comparator @K$i"
      (equalities :+ bound).mkString("(", " AND ", ")")
    }
    (decls, branches.mkString("\n   OR "))
  }

  private def sqlTypeDecl(f: TrackedFieldMeta): String = f.sqlTypeName.toLowerCase match {
    case t if t.contains("char") => s"$t(${math.max(f.decimalPrecision, 1)})"
    case "decimal" | "numeric" => s"${f.sqlTypeName}(${f.decimalPrecision}, ${f.decimalScale})"
    case t => t
  }

  /** A2: snapshot page — reverse keyset walk from the current position;
    * first page is unbounded (WHERE 1=1). Dropped columns surface as
    * `NULL AS [col]` so the snapshot schema matches the capture schema. */
  def snapshotQuery(schemaName: String, tableName: String,
      fields: Seq[String], removedFields: Set[String],
      pkFields: Seq[TrackedFieldMeta], firstRead: Boolean,
      batchSize: Int): String = {
    val cols = fields.map { f =>
      if (removedFields.contains(f)) s"NULL AS ${q(f)}" else q(f)
    }.mkString("\n    , ")
    val (decls, where) =
      if (firstRead) ("@K0 INT = 0", "1=1")
      else keysetPredicate(pkFields, "<")
    val order = pkFields.map(f => s"${q(f.name)} DESC").mkString(", ")
    s"""DECLARE
       |    $decls
       |;
       |SELECT TOP ($batchSize)
       |    0 AS __operation
       |    , GETDATE() AS __event_time
       |    , NULL AS __log_lsn
       |    , 1 AS __command_id
       |    , NULL AS __log_seqval
       |    , NULL AS __updated_fields
       |    , $cols
       |FROM ${q(schemaName)}.${q(tableName)}
       |WHERE $where
       |ORDER BY $order""".stripMargin
  }

  /** Row-value comparison `(cols) op (params)` expanded to the
    * index-seekable branch form (the same expansion [[keysetPredicate]]
    * uses, over caller-rendered column/parameter texts):
    * for `op = ">="` and cols (a, b) produces
    * `(a > @P0) OR (a = @P0 AND b >= @P1)`. `cols` arrive already
    * qualified/quoted by the caller. */
  def compositeCompare(cols: Seq[String], params: Seq[String],
      op: String): String = {
    require(cols.size == params.size && cols.nonEmpty)
    val strict = op.take(1) // ">=" -> ">", "<=" -> "<"
    val last = cols.size - 1
    val branches = cols.indices.map { i =>
      val equalities = (0 until i).map(j => s"${cols(j)} = ${params(j)}")
      val cmp = if (i == last) op else strict
      (equalities :+ s"${cols(i)} $cmp ${params(i)}").mkString("(", " AND ", ")")
    }
    branches.mkString("(", "\n   OR ", ")")
  }

  private def ctIndexCols(alias: String): Seq[String] = Seq(
    s"$alias.__$$start_lsn", s"$alias.__$$command_id",
    s"$alias.__$$seqval", s"$alias.__$$operation")

  private val ctIndexOrder =
    "ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation"

  /** DSv2 JDBC mode, driver-side change boundary probe: the TOP(batchSize)
    * change-index keys strictly after the 4-component cursor, in index
    * order — the client streams the result and keeps only the LAST row
    * (the next window's end key), so the probe ships batchSize narrow
    * key tuples and nothing else. Binds: @SL, @SC, @SS, @SO. */
  def changeBoundaryQuery(captureInstance: String, batchSize: Int): String = {
    val ct = fqChangeTable(captureInstance)
    val after = compositeCompare(ctIndexCols("ct"),
      Seq("@SL", "@SC", "@SS", "@SO"), ">")
    s"""DECLARE
       |    @SL BINARY(10) = ?
       |    , @SC INT = ?
       |    , @SS BINARY(10) = ?
       |    , @SO INT = ?
       |;
       |SELECT TOP ($batchSize)
       |    ct.__$$start_lsn, ct.__$$command_id, ct.__$$seqval, ct.__$$operation
       |FROM $ct AS ct WITH (NOLOCK)
       |WHERE $after
       |ORDER BY $ctIndexOrder""".stripMargin
  }

  /** DSv2 JDBC mode, executor-side change-window read: every row with
    * start < (lsn, command_id, seqval, operation) <= end — the same
    * predicate the parquet-path partition reader applies, so the two
    * backends are row-for-row identical (no TOP: the window was already
    * sized by the boundary probe, and replay re-reads exactly the
    * committed range). Binds: @SL, @SC, @SS, @SO, @EL, @EC, @ES, @EO. */
  def changeWindowQuery(captureInstance: String,
      valueFields: Seq[String]): String = {
    val ct = fqChangeTable(captureInstance)
    val cols = valueFields.map(f => s"ct.${q(f)}").mkString("\n    , ")
    val after = compositeCompare(ctIndexCols("ct"),
      Seq("@SL", "@SC", "@SS", "@SO"), ">")
    val upTo = compositeCompare(ctIndexCols("ct"),
      Seq("@EL", "@EC", "@ES", "@EO"), "<=")
    s"""DECLARE
       |    @SL BINARY(10) = ?
       |    , @SC INT = ?
       |    , @SS BINARY(10) = ?
       |    , @SO INT = ?
       |    , @EL BINARY(10) = ?
       |    , @EC INT = ?
       |    , @ES BINARY(10) = ?
       |    , @EO INT = ?
       |;
       |SELECT
       |    ct.__$$start_lsn
       |    , ct.__$$command_id
       |    , ct.__$$seqval
       |    , ct.__$$operation
       |    , $cols
       |FROM $ct AS ct WITH (NOLOCK)
       |WHERE $after
       |  AND $upTo
       |ORDER BY $ctIndexOrder""".stripMargin
  }

  /** DSv2 JDBC mode, driver-side snapshot page probe: the TOP(batchSize)
    * composite PK tuples strictly below the cursor (unbounded on the
    * first page), descending — the client keeps only the LAST row, the
    * page's MIN key (A2's reverse-keyset walk reduced to its boundary).
    * Binds: @Ki per pk field, none on the first page. */
  def snapshotBoundaryQuery(schemaName: String, tableName: String,
      pkFields: Seq[TrackedFieldMeta], firstRead: Boolean,
      batchSize: Int): String = {
    val pkCols = pkFields.map(f => q(f.name)).mkString(", ")
    val (decls, where) =
      if (firstRead) ("@K0 INT = 0", "1=1")
      else keysetPredicate(pkFields, "<")
    val order = pkFields.map(f => s"${q(f.name)} DESC").mkString(", ")
    s"""DECLARE
       |    $decls
       |;
       |SELECT TOP ($batchSize)
       |    $pkCols
       |FROM ${q(schemaName)}.${q(tableName)}
       |WHERE $where
       |ORDER BY $order""".stripMargin
  }

  /** DSv2 JDBC mode, executor-side snapshot page read: every row with
    * lower <= (pk) and, when `boundedAbove`, (pk) < upper — the page the
    * two boundary probes bracketed. No TOP, no ORDER BY: the range is
    * exact and the engine re-orders downstream. Binds: @LOi per pk
    * field, then @HIi per pk field when bounded. */
  def snapshotWindowQuery(schemaName: String, tableName: String,
      fields: Seq[String], removedFields: Set[String],
      pkFields: Seq[TrackedFieldMeta], boundedAbove: Boolean): String = {
    val cols = fields.map { f =>
      if (removedFields.contains(f)) s"NULL AS ${q(f)}" else q(f)
    }.mkString("\n    , ")
    val loDecls = pkFields.zipWithIndex
      .map { case (f, i) => s"@LO$i ${sqlTypeDecl(f)} = ?" }
    val hiDecls = if (!boundedAbove) Seq.empty
      else pkFields.zipWithIndex.map { case (f, i) => s"@HI$i ${sqlTypeDecl(f)} = ?" }
    val pkCols = pkFields.map(f => q(f.name))
    val loPred = compositeCompare(pkCols,
      pkFields.indices.map(i => s"@LO$i"), ">=")
    val hiPred = if (!boundedAbove) "1=1"
      else compositeCompare(pkCols, pkFields.indices.map(i => s"@HI$i"), "<")
    s"""DECLARE
       |    ${(loDecls ++ hiDecls).mkString(", ")}
       |;
       |SELECT
       |    $cols
       |FROM ${q(schemaName)}.${q(tableName)}
       |WHERE $loPred
       |  AND $hiPred""".stripMargin
  }

  /** A5: global read ceiling for a poll cycle. */
  val maxLsnQuery: String = "SELECT sys.fn_cdc_get_max_lsn()"

  /** Per-table ceiling: the MAX change index currently in the change
    * table (descending TOP 1 over the CDC index — a backward seek, the
    * table half of the reference's `get_max_lsn_for_change_table`,
    * `sql_queries.py:200-216`; the `fn_cdc_increment_lsn` branch is the
    * caller's concern). Drives `startPoint=latest` for newly-followed
    * tables: everything at or below this index is skipped
    * (`options.py:156-166`). */
  def maxChangeIndexQuery(captureInstance: String): String = {
    val ct = fqChangeTable(captureInstance)
    s"""SELECT TOP (1)
       |    ct.__$$start_lsn, ct.__$$command_id, ct.__$$seqval, ct.__$$operation
       |FROM $ct AS ct WITH (NOLOCK)
       |ORDER BY ct.__$$start_lsn DESC, ct.__$$command_id DESC, ct.__$$seqval DESC, ct.__$$operation DESC""".stripMargin
  }

  /** G6 runtime half: the LATEST (by create_date) capture instance live
    * for the same source table as `@CI` (the instance this stream
    * follows). The caller fires the instance-change reaction iff the
    * answer differs from `@CI` — an OLDER coexisting instance (we
    * already migrated past it) must not fire. The reference polls this
    * periodically and terminates for supervisor restart under
    * `--terminate-on-capture-instance-change` (`main.py:358-409`,
    * option `options.py:264-273`). DECLARE indirection: the one bound
    * instance name is used twice. start_lsn DESC tiebreak: SQL Server
    * create_date has ~3ms precision, so an instance created in the same
    * instant as the followed one could otherwise tie and TOP(1) would
    * pick nondeterministically — returning the followed instance forever
    * and permanently missing the switch (the dates never change after
    * creation). The newer instance necessarily has the higher start_lsn. */
  val latestCaptureInstanceQuery: String =
    """DECLARE
      |    @CI VARCHAR(128) = ?
      |;
      |SELECT TOP (1) ct.capture_instance
      |FROM [cdc].[change_tables] AS ct WITH (NOLOCK)
      |WHERE ct.source_object_id = (
      |    SELECT source_object_id FROM [cdc].[change_tables]
      |    WHERE capture_instance = @CI)
      |ORDER BY ct.create_date DESC, ct.start_lsn DESC""".stripMargin

  /** A4/C2: the metadata catalog join discovering tracked tables, columns,
    * types, and PK ordinals (inner join + two left joins). */
  def metadataQuery: String =
    """SELECT
      |    OBJECT_SCHEMA_NAME(ct.source_object_id) AS schema_name
      |    , OBJECT_NAME(ct.source_object_id) AS table_name
      |    , ct.capture_instance
      |    , ct.start_lsn
      |    , cc.column_name
      |    , cc.column_id
      |    , cc.column_type
      |    , cc.column_ordinal
      |    , ic.index_ordinal AS pk_ordinal
      |    , sc.precision
      |    , sc.scale
      |    , sc.is_computed
      |FROM [cdc].[change_tables] AS ct WITH (NOLOCK)
      |INNER JOIN [cdc].[captured_columns] AS cc WITH (NOLOCK)
      |    ON ct.object_id = cc.object_id
      |LEFT JOIN [cdc].[index_columns] AS ic WITH (NOLOCK)
      |    ON cc.object_id = ic.object_id AND cc.column_id = ic.column_id
      |LEFT JOIN sys.columns AS sc WITH (NOLOCK)
      |    ON sc.object_id = ct.source_object_id AND sc.column_id = cc.column_id
      |ORDER BY ct.capture_instance, cc.column_ordinal""".stripMargin
}
