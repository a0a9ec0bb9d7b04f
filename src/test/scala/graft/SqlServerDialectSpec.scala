package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ChangeIndex, TrackedFieldMeta}
import graft.sources.{CdcOffset, SnapshotAt, SnapshotDone, SnapshotNotStarted, SqlServerDialect, TablePosition}

/** Shape assertions for the T-SQL generators (SURVEY §4: the seek-only
  * access-path decomposition, DECLARE indirection, and keyset pagination
  * must survive in the source's query builder) and roundtrips for the
  * two-dimensional offset codec. */
class SqlServerDialectSpec extends AnyFunSuite {

  private val pk2 = Seq(
    TrackedFieldMeta("order_id", "bigint", 1, primaryKeyOrdinal = 1),
    TrackedFieldMeta("line_no", "int", 2, primaryKeyOrdinal = 2))

  test("change query decomposes the composite bound into 3 seek branches") {
    val sql = SqlServerDialect.changeQuery("dbo_orders", Seq("id", "total"), 2000)
    assert(sql.split("UNION ALL").length == 3)
    // Every branch carries the LSN ceiling → all branches can seek.
    assert(sql.split("UNION ALL").forall(_.contains("__$start_lsn <= @MAX_LSN")))
    // Parameters go through DECLARE indirection, bound exactly once each.
    assert(sql.count(_ == '?') == 4)
    assert(sql.contains("DECLARE"))
    // Pre-update images never leave the database.
    assert(sql.contains("__$operation = 1 OR ct.__$operation = 2 OR ct.__$operation = 4"))
    // Ordered by the full change index; FORCESEEK on the time mapping.
    assert(sql.contains("ORDER BY ct.__$start_lsn, ct.__$command_id, ct.__$seqval, ct.__$operation"))
    assert(sql.contains("FORCESEEK"))
    assert(sql.contains("NOLOCK"))
    assert(sql.contains(s"TOP (2000)"))
  }

  test("keyset predicate expands the row-value comparison per PK column") {
    val (decls, where) = SqlServerDialect.keysetPredicate(pk2, "<")
    assert(decls == "@K0 bigint = ?, @K1 int = ?")
    assert(where ==
      "([order_id] < @K0)\n   OR ([order_id] = @K0 AND [line_no] < @K1)")
  }

  test("snapshot query: reverse keyset walk, dropped columns as NULL") {
    val sql = SqlServerDialect.snapshotQuery("dbo", "orders",
      Seq("order_id", "line_no", "gone_col", "total"), Set("gone_col"),
      pk2, firstRead = false, batchSize = 500)
    assert(sql.contains("NULL AS [gone_col]"))
    assert(sql.contains("ORDER BY [order_id] DESC, [line_no] DESC"))
    assert(sql.contains("([order_id] < @K0)"))
    assert(sql.contains("TOP (500)"))
    // Snapshot rows carry the envelope with null LSN (operation 0).
    assert(sql.contains("0 AS __operation"))
    assert(sql.contains("NULL AS __log_lsn"))

    val first = SqlServerDialect.snapshotQuery("dbo", "orders",
      Seq("order_id"), Set.empty, pk2, firstRead = true, batchSize = 500)
    assert(first.contains("WHERE 1=1"))
  }

  test("metadata query joins change_tables ⋈ captured_columns ⟕ index_columns ⟕ sys.columns") {
    val sql = SqlServerDialect.metadataQuery
    assert(sql.contains("INNER JOIN [cdc].[captured_columns]"))
    assert(sql.split("LEFT JOIN").length == 3)
  }

  test("offset JSON roundtrip across all snapshot states") {
    val off = CdcOffset(Map(
      "dbo.orders" -> TablePosition(
        ChangeIndex(ChangeIndex.lsnFromLong(0xabcdefL), 2,
          ChangeIndex.lsnFromLong(77), 4), SnapshotDone),
      "dbo.line\"items" -> TablePosition(
        ChangeIndex(ChangeIndex.lsnFromLong(1), 0,
          ChangeIndex.lsnFromLong(0), 1), SnapshotAt("00ff10")),
      "dbo.events" -> TablePosition(
        ChangeIndex.Lowest, SnapshotNotStarted)))
    val back = CdcOffset.fromJson(off.json)
    assert(back == off)
    // Deterministic rendering (sorted by table) for offset-log equality.
    assert(off.json == CdcOffset.fromJson(off.json).json)
  }

  test("offset JSON roundtrips control characters in table names") {
    // \uXXXX-escaped control chars must decode on the way back in —
    // otherwise the table's position is silently dropped from the offset.
    val off = CdcOffset(Map(
      "dbo.tab\tle" -> TablePosition(
        ChangeIndex(ChangeIndex.lsnFromLong(5), 1,
          ChangeIndex.lsnFromLong(2), 2), SnapshotDone),
      "dbo.nl\nname" -> TablePosition(ChangeIndex.Lowest, SnapshotAt("0a"))))
    assert(off.json.contains("\\u0009") || off.json.contains("\\t"))
    assert(CdcOffset.fromJson(off.json) == off)
  }

  test("quoted identifiers escape closing brackets") {
    val sql = SqlServerDialect.snapshotQuery("dbo", "we]ird",
      Seq("a"), Set.empty,
      Seq(TrackedFieldMeta("a", "int", 1, primaryKeyOrdinal = 1)),
      firstRead = true, batchSize = 1)
    assert(sql.contains("[we]]ird]"))
  }
}
