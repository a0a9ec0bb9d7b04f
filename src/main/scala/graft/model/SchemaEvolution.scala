package graft.model

/** Schema-evolution policy (SURVEY §2 G6): when a new capture instance
  * appears, decide whether the table must be re-snapshotted, from a
  * column-level diff plus cheap runtime probes. Pure function — the
  * caller (source startup) supplies the probe results; behavior of
  * `cdc_kafka/build_startup_state.py:235-383`.
  *
  * A Structured Streaming query cannot change schema mid-run, so a
  * positive decision (or any capture-instance change) terminates the
  * query for supervisor restart — the reference's own answer
  * (`main.py:358-409`).
  */
object SchemaEvolution {

  final case class ColumnInfo(
      sqlTypeName: String,
      decimalPrecision: Int = 0,
      decimalScale: Int = 0,
      isComputed: Boolean = false,
      isNullable: Boolean = true)

  /** Everything the decision needs, gathered by the caller:
    * @param oldInstanceAvailable the prior capture instance still exists
    * @param tableIsSmall bounded row count < the small-table threshold
    * @param leadingIndexedCols columns leading an enabled, unfiltered index
    * @param colHasNonNull direct probe: does the column contain any
    *        non-null value (only consulted when cheap: small table or
    *        indexed column)
    * @param recentlyAddedCols columns whose ALTER TABLE ... ADD appears in
    *        recent DDL history (young enough to presume still all-NULL) */
  final case class Probes(
      oldInstanceAvailable: Boolean,
      tableIsSmall: Boolean,
      leadingIndexedCols: Set[String] = Set.empty,
      colHasNonNull: String => Boolean = _ => false,
      recentlyAddedCols: Set[String] = Set.empty)

  final case class Decision(resnapshot: Boolean, reason: String)

  /** Small-table threshold and DDL-recency window (reference
    * `constants.py:15-16`). */
  val SmallTableThreshold = 5000000L
  val MaxAgeToPresumeAddedColIsNullSeconds = 3600L

  def requiresNewSnapshot(
      oldCols: Map[String, ColumnInfo],
      newCols: Map[String, ColumnInfo],
      probes: Probes,
      resnapshotForColumnDrops: Boolean = true): Decision = {

    if (!probes.oldInstanceAvailable)
      return Decision(resnapshot = true,
        "prior capture instance no longer available to diff against")

    val added = newCols.keySet -- oldCols.keySet
    val removed = oldCols.keySet -- newCols.keySet
    val changed = newCols.keySet.intersect(oldCols.keySet)
      .filter(k => oldCols(k) != newCols(k))

    if (removed.nonEmpty && resnapshotForColumnDrops)
      return Decision(resnapshot = true,
        s"new capture instance removes column(s): ${removed.toSeq.sorted.mkString(", ")}")

    changed.toSeq.sorted.foreach { c =>
      val (o, n) = (oldCols(c), newCols(c))
      if (o.isComputed != n.isComputed)
        return Decision(resnapshot = true, s"is_computed changed for column $c")
      // A DB type change only matters if the SERIALIZATION type changes:
      // e.g. smallint→int both serialize as 32-bit int → no re-snapshot.
      // The reference compares Avro field schemas; we compare the Spark
      // types the engine serializes with — the same equivalence classes.
      val oldSpark = TrackedFieldMeta(c, o.sqlTypeName, 0, 0,
        o.decimalPrecision, o.decimalScale).sparkType
      val newSpark = TrackedFieldMeta(c, n.sqlTypeName, 0, 0,
        n.decimalPrecision, n.decimalScale).sparkType
      if (oldSpark != newSpark)
        return Decision(resnapshot = true,
          s"serialized type changes for column $c: $oldSpark -> $newSpark")
    }

    added.toSeq.sorted.foreach { c =>
      if (!newCols(c).isNullable)
        return Decision(resnapshot = true, s"newly-captured column $c is NOT NULL")
    }

    // SQL Server identifiers are case-insensitive by default; probe sets
    // are matched case-insensitively so callers need not pre-normalize.
    val indexedLower = probes.leadingIndexedCols.map(_.toLowerCase)
    val recentLower = probes.recentlyAddedCols.map(_.toLowerCase)
    added.toSeq.sorted.foreach { c =>
      val cheapToProbe = probes.tableIsSmall || indexedLower.contains(c.toLowerCase)
      if (cheapToProbe) {
        if (probes.colHasNonNull(c))
          return Decision(resnapshot = true,
            s"direct scan found non-null values in newly-tracked column $c")
      } else if (!recentLower.contains(c.toLowerCase)) {
        return Decision(resnapshot = true,
          s"newly-tracked column $c was added too long ago to presume all-NULL")
      }
    }

    Decision(resnapshot = false, "no change requires a new snapshot")
  }

  /** G6 composed with the REGISTRY's compatibility gate (F4): even when
    * the column-level diff clears the evolution, the registry's
    * configured level (BACKWARD/FORWARD/FULL — a deployment policy this
    * engine does not control) may reject the evolved value schema; that
    * rejection must drive the same terminate-for-restart / re-snapshot
    * reaction as a disqualifying column diff (the reference surfaces the
    * registry error the same way, `serializers/avro.py:270-343`).
    *
    * @param columnDecision the [[requiresNewSnapshot]] verdict
    * @param registerEvolved attempts the registry registration of the
    *        evolved schema; only invoked when the column diff clears
    */
  def decideWithRegistry(columnDecision: Decision,
      registerEvolved: () => Int): Decision =
    if (columnDecision.resnapshot) columnDecision
    else
      try { registerEvolved(); columnDecision }
      catch {
        case e: graft.serde.IncompatibleSchemaException =>
          Decision(resnapshot = true,
            s"registry compatibility gate rejected the evolved schema: ${e.getMessage}")
      }
}
