package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ChangeIndex, GraftConfig, InstanceSwitch, Policies}
import graft.model.InstanceSwitch._
import graft.sources.SchemaInference
import graft.sources.SchemaInference.CatalogRow

/** G7 capture-instance switch ladder: version-strategy selection
  * (create_date | regex), the newly-followed-table start point
  * (earliest | latest), the new-instance snapshot/overlap handling, and
  * the gap disambiguation at the switch — each against the reference's
  * decision table (`build_startup_state.py:76-233,396-449`,
  * `tracked_tables.py:126-154`, `options.py:109-209`). */
class InstanceSwitchSpec extends AnyFunSuite {

  private def lsn(v: Long) = ChangeIndex.lsnFromLong(v)
  private def idx(l: Long, c: Int = 0, s: Long = 0, o: Int = 0) =
    ChangeIndex(lsn(l), c, ChangeIndex.lsnFromLong(s), o)

  // ---- capture-instance version strategies ---------------------------

  test("create_date strategy picks the newest instance; start LSN breaks missing dates") {
    val dated = Seq(
      ("dbo_Orders", "2024-01-01T00:00:00", "0a"),
      ("dbo_Orders_v2", "2025-06-01T00:00:00", "05")) // older LSN, newer date
    assert(SchemaInference.selectInstance(ByCreateDate, dated) === "dbo_Orders_v2")
    val undated = Seq(("dbo_Orders", "", "0a"), ("dbo_Orders_v2", "", "1b"))
    assert(SchemaInference.selectInstance(ByCreateDate, undated) === "dbo_Orders_v2")
    // MIXED catalog (ADVICE r7): an undated-but-newer instance must not
    // lose to a dated older one just because "" sorts below every ISO
    // date — the whole group falls back to LSN order for consistency.
    val mixed = Seq(
      ("dbo_Orders", "2024-01-01T00:00:00", "0a"),
      ("dbo_Orders_v2", "", "1b")) // undated, newer by LSN
    assert(SchemaInference.selectInstance(ByCreateDate, mixed) === "dbo_Orders_v2")
  }

  test("regex strategy orders by the first captured group; non-matching names lose") {
    val insts = Seq(
      ("dbo_Orders_v2", "2026-01-01T00:00:00", "ff"), // newest by date — must NOT win
      ("dbo_Orders_v3", "2024-01-01T00:00:00", "01"),
      ("legacy_unversioned", "2026-02-01T00:00:00", "fe")) // no match → ""
    assert(SchemaInference.selectInstance(
      ByRegex("""dbo_Orders_v(\d+)"""), insts) === "dbo_Orders_v3")
    // Anchored like Python's re.match: the v3 embedded mid-name does not
    // count under a start-anchored pattern, so only the name BEGINNING
    // with v<digits> carries a version key and wins.
    assert(SchemaInference.selectInstance(
      ByRegex("""v(\d+)"""), insts :+ (("v9_fresh", "", "00"))) === "v9_fresh")
  }

  test("regex strategy without a pattern is refused (build_startup_state.py:398-401)") {
    val ex = intercept[IllegalArgumentException] { ByRegex("") }
    assert(ex.getMessage.contains("capture_instance_version_regex"))
  }

  test("fromCatalogRows follows the regex-selected instance's column set end-to-end") {
    def row(ci: String, col: String, ord: Int, created: String) = CatalogRow(
      "dbo", "Orders", ci, "0a", col, "int", ord, 0, 0, 0, created)
    val rows = Seq(
      row("dbo_Orders_v1", "Id", 1, "2024-01-01"),
      row("dbo_Orders_v1", "Amount", 2, "2024-01-01"),
      row("dbo_Orders_v2", "Id", 1, "2023-01-01"), // older create date!
      row("dbo_Orders_v2", "Amount", 2, "2023-01-01"),
      row("dbo_Orders_v2", "NewCol", 3, "2023-01-01"))
    // create_date strategy would pick v1; the regex strategy must pick v2.
    val byDate = SchemaInference.fromCatalogRows(rows)
    assert(byDate.head.captureInstanceName === "dbo_Orders_v1")
    val byRegex = SchemaInference.fromCatalogRows(rows,
      instanceStrategy = ByRegex("""dbo_Orders_v(\d+)"""))
    assert(byRegex.head.captureInstanceName === "dbo_Orders_v2")
    assert(byRegex.head.fields.map(_.name) === Seq("Id", "Amount", "NewCol"))
  }

  // ---- --new-follow-start-point --------------------------------------

  test("newFollowStartIndex: earliest = LOWEST; latest = lowest index at the db max LSN") {
    assert(newFollowStartIndex(FollowEarliest, lsn(999)) === ChangeIndex.Lowest)
    val latest = newFollowStartIndex(FollowLatest, lsn(999))
    assert(java.util.Arrays.equals(latest.lsn, lsn(999)))
    assert(latest.commandId === 0 && latest.operation === 0)
    assert(java.util.Arrays.equals(latest.seqval, ChangeIndex.Lowest.seqval))
    // `latest` skips everything already in the change table (strictly-
    // after semantics) but admits the next committed row.
    assert(idx(999, 0, 5, 2) > latest)
    assert(idx(998, 9, 9, 4) < latest)
  }

  // ---- snapshot handling at the switch -------------------------------

  test("snapshotOnInstanceChange decision table, DDL ladder evaluated lazily") {
    assert(snapshotOnInstanceChange(instanceChanged = false,
      redoSnapshotForNewInstance = true,
      ddlRequiresNewSnapshot = sys.error("must not evaluate")) === KeepSnapshotProgress)
    assert(snapshotOnInstanceChange(instanceChanged = true,
      redoSnapshotForNewInstance = false,
      ddlRequiresNewSnapshot = sys.error("must not evaluate")) === ContinueFromPriorKey)
    assert(snapshotOnInstanceChange(instanceChanged = true,
      redoSnapshotForNewInstance = true,
      ddlRequiresNewSnapshot = true) === StartNewSnapshot)
    assert(snapshotOnInstanceChange(instanceChanged = true,
      redoSnapshotForNewInstance = true,
      ddlRequiresNewSnapshot = false) === ContinueFromPriorKey)
  }

  // ---- overlap handling at the switch --------------------------------

  test("changeStartOnInstanceChange: pickup keeps stored progress, republish restarts") {
    val stored = idx(500, 1, 7, 2)
    val follow = newFollowStartIndex(FollowLatest, lsn(900))
    // Default (start_from_prior_progress): overlap region is skipped.
    assert(changeStartOnInstanceChange(instanceChanged = true,
      publishDuplicates = false, Some(stored), follow) === stored)
    // republish_from_new_instance: progress discarded.
    assert(changeStartOnInstanceChange(instanceChanged = true,
      publishDuplicates = true, Some(stored), follow) === follow)
    // No switch: flag is irrelevant.
    assert(changeStartOnInstanceChange(instanceChanged = false,
      publishDuplicates = true, Some(stored), follow) === stored)
    // No stored progress at all: the follow start point applies.
    assert(changeStartOnInstanceChange(instanceChanged = false,
      publishDuplicates = false, None, follow) === follow)
  }

  test("onInstanceSwitchGap: no-gap, fast-forward, and real-gap outcomes") {
    val newMin = lsn(1000)
    // Progress at/above the new floor: nothing to do.
    assert(onInstanceSwitchGap(idx(1000), newMin, None, Policies.FailOnGap) === NoGap)
    assert(onInstanceSwitchGap(idx(2000), newMin, None, Policies.FailOnGap) === NoGap)
    // A from-the-beginning follow is not a gap (tracked_tables.py:137).
    assert(onInstanceSwitchGap(ChangeIndex.Lowest, newMin, None,
      Policies.FailOnGap) === NoGap)
    // Stored below the floor, but the prior instance holds nothing newer
    // than the stored progress: nothing was lost → fast-forward to the
    // new instance's floor (tracked_tables.py:142-147).
    onInstanceSwitchGap(idx(500, 1, 7, 2), newMin,
      Some(idx(500, 1, 7, 2)), Policies.FailOnGap) match {
      case FastForward(to) =>
        assert(java.util.Arrays.equals(to.lsn, newMin))
        assert(to.commandId === 0 && to.operation === 0)
      case other => fail(s"expected FastForward, got $other")
    }
    // The prior instance had newer rows than the stored progress: a real
    // gap, resolved by the configured G5 strategy.
    assert(onInstanceSwitchGap(idx(500), newMin, Some(idx(700)),
      Policies.ResnapshotOnGap) === Gap(Policies.ResnapshotOnGap))
    // Prior change table already dropped: cannot prove no-loss → gap.
    assert(onInstanceSwitchGap(idx(500), newMin, None,
      Policies.FailOnGap) === Gap(Policies.FailOnGap))
  }

  // ---- config surface -------------------------------------------------

  test("GraftConfig wires the four options and derives the switch booleans") {
    val c = GraftConfig()
    assert(c.captureInstanceStrategyTyped === ByCreateDate)
    assert(c.newFollowStartPointTyped === FollowLatest)
    assert(c.redoSnapshotForNewInstance) // begin_new_snapshot is the default
    assert(!c.publishDuplicateChangesFromNewInstance) // pickup is the default
    val c2 = GraftConfig(
      captureInstanceVersionStrategy = "regex",
      captureInstanceVersionRegex = Some("""v(\d+)"""),
      newFollowStartPoint = "earliest",
      newCaptureInstanceSnapshotHandling = "ignore",
      newCaptureInstanceOverlapHandling = "republish_from_new_instance")
    assert(c2.captureInstanceStrategyTyped === ByRegex("""v(\d+)"""))
    assert(c2.newFollowStartPointTyped === FollowEarliest)
    assert(!c2.redoSnapshotForNewInstance)
    assert(c2.publishDuplicateChangesFromNewInstance)
    val ex = intercept[IllegalArgumentException] {
      GraftConfig(captureInstanceVersionStrategy = "regex")
    }
    assert(ex.getMessage.contains("captureInstanceVersionRegex"))
  }

  test("GraftConfig covers the reference's full option surface with its defaults (options.py:37-316)") {
    val c = GraftConfig()
    // Control-plane topic names and their defaults.
    assert(c.progressTopicName === "_cdc_to_kafka_progress") // options.py:126-127
    assert(c.snapshotLoggingTopicName.isEmpty)
    // Topic sizing: unset = auto (rate-derived partitions, broker-default
    // replication), mirroring the reference's None handling.
    assert(c.partitionCount.isEmpty && c.replicationFactor.isEmpty)
    // Client/topic config passthroughs arrive as maps (JSON in the
    // reference), empty by default.
    assert(c.extraKafkaProducerConfig.isEmpty && c.extraKafkaConsumerConfig.isEmpty
      && c.extraTopicConfig.isEmpty)
    // Pluggable serializer / reporters resolve by class name; defaults
    // point at this engine's own implementations.
    assert(c.messageSerializer === "graft.serde.AvroSerde")
    assert(c.metricsReporters === Seq("graft.metrics.StdoutReporter"))
    // Runtime-behavior booleans default off, like the reference.
    assert(!c.terminateOnCaptureInstanceChange && !c.runValidations
      && !c.reportProgressOnly)
    // Identity/connection options are optional for batch-only usage.
    assert(c.dbConnString.isEmpty && c.kafkaBootstrapServers.isEmpty
      && c.kafkaTransactionalId.isEmpty && c.processHostname.isEmpty)
  }
}
