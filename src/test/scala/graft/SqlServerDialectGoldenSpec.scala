package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TrackedFieldMeta
import graft.sources.SqlServerDialect._

/** GOLDEN-FILE pins of the native T-SQL the dialect emits (VERDICT r6
  * #2): the Derby-transpiled path proves the SEMANTICS row-for-row
  * (`SqlServerDialectExecSpec` / `CdcSourceJdbcSpec`), but the exact
  * text a real SQL Server receives was previously unpinned. These
  * asserts fail on ANY textual drift of the SQL Server branch — the
  * shapes are operationally load-bearing (the reference iterated to
  * keep them index-SEEK-only: `sql_queries.py:218-223` warns against
  * "simplifying" them, and `sql_queries.py:320-329` explains the
  * DECLARE indirection pyodbc forces for plan stability).
  *
  * If a change here is INTENTIONAL, re-derive the golden with the same
  * construction and update it together with an EXPLAIN-shaped
  * justification in the commit message.
  */
class SqlServerDialectGoldenSpec extends AnyFunSuite {

  // A composite PK exercising int, datetime2, and length-carrying
  // varchar type declarations.
  private val pkC = Seq(
    TrackedFieldMeta("CustomerId", "int", 1, 1),
    TrackedFieldMeta("OrderDate", "datetime2", 2, 2),
    TrackedFieldMeta("Code", "varchar", 3, 3, decimalPrecision = 20))

  test("golden: A1 change scan: 3-branch UNION ALL seek shape, DECLARE indirection, FORCESEEK ltm join (sql_queries.py:218-267)") {
    val got = changeQuery("dbo_Orders", Seq("OrderId", "Amount", "Odd]Col"), 2000)
    val want =
      """DECLARE
    @LSN BINARY(10) = ?
    , @COMMAND_ID INT = ?
    , @SEQ BINARY(10) = ?
    , @MAX_LSN BINARY(10) = ?
;
WITH ct AS (
    SELECT * FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
    WHERE ct.__$start_lsn = @LSN AND ct.__$command_id = @COMMAND_ID
      AND ct.__$seqval > @SEQ AND ct.__$start_lsn <= @MAX_LSN
    UNION ALL
    SELECT * FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
    WHERE ct.__$start_lsn = @LSN AND ct.__$command_id > @COMMAND_ID
      AND ct.__$start_lsn <= @MAX_LSN
    UNION ALL
    SELECT * FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
    WHERE ct.__$start_lsn > @LSN AND ct.__$start_lsn <= @MAX_LSN
)
SELECT TOP (2000)
    ct.__$operation AS __operation
    , ltm.tran_end_time AS __event_time
    , ct.__$start_lsn AS __log_lsn
    , ct.__$command_id AS __command_id
    , ct.__$seqval AS __log_seqval
    , ct.__$update_mask AS __updated_fields
    , ct.[OrderId]
    , ct.[Amount]
    , ct.[Odd]]Col]
FROM ct
INNER JOIN [cdc].[lsn_time_mapping] AS ltm WITH (NOLOCK, FORCESEEK)
    ON (ct.__$start_lsn = ltm.start_lsn)
WHERE ct.__$operation = 1 OR ct.__$operation = 2 OR ct.__$operation = 4
ORDER BY ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation"""
    assert(got === want)
  }

  test("golden: A2 snapshot first page: unbounded reverse walk, dropped column as NULL (sql_queries.py:270-309)") {
    val got = snapshotQuery("dbo", "Orders", Seq("OrderId", "Amount", "Legacy"), Set("Legacy"), pkC, firstRead = true, batchSize = 2000)
    val want =
      """DECLARE
    @K0 INT = 0
;
SELECT TOP (2000)
    0 AS __operation
    , GETDATE() AS __event_time
    , NULL AS __log_lsn
    , 1 AS __command_id
    , NULL AS __log_seqval
    , NULL AS __updated_fields
    , [OrderId]
    , [Amount]
    , NULL AS [Legacy]
FROM [dbo].[Orders]
WHERE 1=1
ORDER BY [CustomerId] DESC, [OrderDate] DESC, [Code] DESC"""
    assert(got === want)
  }

  test("golden: A2 snapshot keyset page: composite-PK expansion with typed DECLARE indirection (sql_queries.py:312-367)") {
    val got = snapshotQuery("dbo", "Orders", Seq("CustomerId", "OrderDate", "Code", "Amount"), Set.empty, pkC, firstRead = false, batchSize = 2000)
    val want =
      """DECLARE
    @K0 int = ?, @K1 datetime2 = ?, @K2 varchar(20) = ?
;
SELECT TOP (2000)
    0 AS __operation
    , GETDATE() AS __event_time
    , NULL AS __log_lsn
    , 1 AS __command_id
    , NULL AS __log_seqval
    , NULL AS __updated_fields
    , [CustomerId]
    , [OrderDate]
    , [Code]
    , [Amount]
FROM [dbo].[Orders]
WHERE ([CustomerId] < @K0)
   OR ([CustomerId] = @K0 AND [OrderDate] < @K1)
   OR ([CustomerId] = @K0 AND [OrderDate] = @K1 AND [Code] < @K2)
ORDER BY [CustomerId] DESC, [OrderDate] DESC, [Code] DESC"""
    assert(got === want)
  }

  test("golden: DSv2 change boundary probe: 4-component composite > expansion, key columns only") {
    val got = changeBoundaryQuery("dbo_Orders", 2000)
    val want =
      """DECLARE
    @SL BINARY(10) = ?
    , @SC INT = ?
    , @SS BINARY(10) = ?
    , @SO INT = ?
;
SELECT TOP (2000)
    ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation
FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
WHERE ((ct.__$start_lsn > @SL)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id > @SC)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id = @SC AND ct.__$seqval > @SS)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id = @SC AND ct.__$seqval = @SS AND ct.__$operation > @SO))
ORDER BY ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation"""
    assert(got === want)
  }

  test("golden: DSv2 change window read: (start, end] bracket, both bounds seek-expanded") {
    val got = changeWindowQuery("dbo_Orders", Seq("OrderId", "Amount"))
    val want =
      """DECLARE
    @SL BINARY(10) = ?
    , @SC INT = ?
    , @SS BINARY(10) = ?
    , @SO INT = ?
    , @EL BINARY(10) = ?
    , @EC INT = ?
    , @ES BINARY(10) = ?
    , @EO INT = ?
;
SELECT
    ct.__$start_lsn
    , ct.__$command_id
    , ct.__$seqval
    , ct.__$operation
    , ct.[OrderId]
    , ct.[Amount]
FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
WHERE ((ct.__$start_lsn > @SL)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id > @SC)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id = @SC AND ct.__$seqval > @SS)
   OR (ct.__$start_lsn = @SL AND ct.__$command_id = @SC AND ct.__$seqval = @SS AND ct.__$operation > @SO))
  AND ((ct.__$start_lsn < @EL)
   OR (ct.__$start_lsn = @EL AND ct.__$command_id < @EC)
   OR (ct.__$start_lsn = @EL AND ct.__$command_id = @EC AND ct.__$seqval < @ES)
   OR (ct.__$start_lsn = @EL AND ct.__$command_id = @EC AND ct.__$seqval = @ES AND ct.__$operation <= @EO))
ORDER BY ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation"""
    assert(got === want)
  }

  test("golden: latest capture instance probe (terminateOnCaptureInstanceChange watch)") {
    val got = latestCaptureInstanceQuery
    val want =
      """DECLARE
    @CI VARCHAR(128) = ?
;
SELECT TOP (1) ct.capture_instance
FROM [cdc].[change_tables] AS ct WITH (NOLOCK)
WHERE ct.source_object_id = (
    SELECT source_object_id FROM [cdc].[change_tables]
    WHERE capture_instance = @CI)
ORDER BY ct.create_date DESC, ct.start_lsn DESC"""
    assert(got === want)
  }

  test("golden: per-table max change index probe (startPoint=latest, backward seek)") {
    val got = maxChangeIndexQuery("dbo_Orders")
    val want =
      """SELECT TOP (1)
    ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation
FROM [cdc].[dbo_Orders_CT] AS ct WITH (NOLOCK)
ORDER BY ct.__$start_lsn DESC, ct.__$command_id DESC, ct.__$seqval DESC, ct.__$operation DESC"""
    assert(got === want)
  }

  test("golden: DSv2 snapshot boundary probe: PK tuples below the cursor, descending") {
    val got = snapshotBoundaryQuery("dbo", "Orders", pkC, firstRead = false, batchSize = 2000)
    val want =
      """DECLARE
    @K0 int = ?, @K1 datetime2 = ?, @K2 varchar(20) = ?
;
SELECT TOP (2000)
    [CustomerId], [OrderDate], [Code]
FROM [dbo].[Orders]
WHERE ([CustomerId] < @K0)
   OR ([CustomerId] = @K0 AND [OrderDate] < @K1)
   OR ([CustomerId] = @K0 AND [OrderDate] = @K1 AND [Code] < @K2)
ORDER BY [CustomerId] DESC, [OrderDate] DESC, [Code] DESC"""
    assert(got === want)
  }

  test("golden: DSv2 snapshot window read: [lo, hi) bracket over the composite PK") {
    val got = snapshotWindowQuery("dbo", "Orders", Seq("CustomerId", "OrderDate", "Code", "Amount"), Set.empty, pkC, boundedAbove = true)
    val want =
      """DECLARE
    @LO0 int = ?, @LO1 datetime2 = ?, @LO2 varchar(20) = ?, @HI0 int = ?, @HI1 datetime2 = ?, @HI2 varchar(20) = ?
;
SELECT
    [CustomerId]
    , [OrderDate]
    , [Code]
    , [Amount]
FROM [dbo].[Orders]
WHERE (([CustomerId] > @LO0)
   OR ([CustomerId] = @LO0 AND [OrderDate] > @LO1)
   OR ([CustomerId] = @LO0 AND [OrderDate] = @LO1 AND [Code] >= @LO2))
  AND (([CustomerId] < @HI0)
   OR ([CustomerId] = @HI0 AND [OrderDate] < @HI1)
   OR ([CustomerId] = @HI0 AND [OrderDate] = @HI1 AND [Code] < @HI2))"""
    assert(got === want)
  }

}
