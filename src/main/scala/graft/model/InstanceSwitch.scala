package graft.model

/** G7: the capture-instance SWITCH ladder — everything that happens when
  * a newer capture instance takes over a followed table, plus the start
  * point for a table followed for the first time. Pure functions; the
  * source startup supplies the probe results (behavior of
  * `cdc_kafka/build_startup_state.py:76-233` and
  * `cdc_kafka/tracked_tables.py:126-154`; option surface
  * `cdc_kafka/options.py:156-209`).
  */
object InstanceSwitch {

  // ---- --capture-instance-version-strategy (options.py:109-124) ------

  /** Which of several coexisting capture instances for one source table
    * to follow (selection itself:
    * `graft.sources.SchemaInference.selectInstance`,
    * `build_startup_state.py:416-449`). */
  sealed trait CaptureInstanceStrategy
  /** The default: the most recently created instance. Catalog reads that
    * omit `create_date` fall back to the start LSN — creation order and
    * start-LSN order coincide for CDC capture instances. */
  case object ByCreateDate extends CaptureInstanceStrategy
  /** Match `pattern` against each instance NAME; the first capture
    * group is the version key and the greatest key wins (a user
    * migrating `dbo_Orders_v2` → `dbo_Orders_v3` pins
    * `.*_v(\d+)`-style names). Instances whose name does not match
    * contribute an empty key and so lose to any match
    * (`build_startup_state.py:430-434,441-443`). */
  final case class ByRegex(pattern: String) extends CaptureInstanceStrategy {
    require(pattern.nonEmpty,
      "Please provide a capture_instance_version_regex when specifying " +
        "the `regex` capture_instance_version_strategy") // build_startup_state.py:398-401
  }

  // ---- --new-follow-start-point (options.py:156-166) -----------------

  sealed trait NewFollowStartPoint
  /** Pull all existing rows from the change table. */
  case object FollowEarliest extends NewFollowStartPoint
  /** Only changes recorded after the follow begins (the default). */
  case object FollowLatest extends NewFollowStartPoint

  /** Start index for a table with NO prior progress
    * (`build_startup_state.py:196-199`): `earliest` starts from the
    * LOWEST sentinel; `latest` starts from the lowest index AT the
    * database's current max LSN — existing change rows are skipped but
    * anything committed after this instant publishes. */
  def newFollowStartIndex(point: NewFollowStartPoint,
      dbMaxLsn: Array[Byte]): ChangeIndex = point match {
    case FollowEarliest => ChangeIndex.Lowest
    case FollowLatest => ChangeIndex.Lowest.copy(lsn = dbMaxLsn)
  }

  // ---- --new-capture-instance-snapshot-handling (options.py:183-195) --

  sealed trait SnapshotCarryover
  /** `begin_new_snapshot` and the DDL diff demands it: reset snapshot
    * progress and walk the table again from the top key. */
  case object StartNewSnapshot extends SnapshotCarryover
  /** Instance changed but no new snapshot is needed (strategy `ignore`,
    * or `begin_new_snapshot` with a benign DDL diff): an in-flight
    * snapshot continues from its prior key — now reading the new
    * instance's column set — and a finished one stays finished (the
    * completion sentinel is re-recorded either way,
    * `build_startup_state.py:157-176`). */
  case object ContinueFromPriorKey extends SnapshotCarryover
  /** Same capture instance: prior snapshot progress applies unchanged. */
  case object KeepSnapshotProgress extends SnapshotCarryover

  /** @param ddlRequiresNewSnapshot by-name: the
    *        [[SchemaEvolution.requiresNewSnapshot]] ladder runs only when
    *        the strategy asks for it, exactly as the reference only runs
    *        `ddl_change_requires_new_snapshot` under `begin_new_snapshot`. */
  def snapshotOnInstanceChange(instanceChanged: Boolean,
      redoSnapshotForNewInstance: Boolean,
      ddlRequiresNewSnapshot: => Boolean): SnapshotCarryover =
    if (!instanceChanged) KeepSnapshotProgress
    else if (redoSnapshotForNewInstance && ddlRequiresNewSnapshot) StartNewSnapshot
    else ContinueFromPriorKey

  // ---- --new-capture-instance-overlap-handling (options.py:197-209) ---

  /** Change-stream start across the switch
    * (`build_startup_state.py:177-195`): the old and new change tables
    * OVERLAP on the LSN range both captured. `start_from_prior_progress`
    * (default, `publishDuplicates = false`) keeps the stored index — the
    * overlap region is skipped in the new table, no duplicates.
    * `republish_from_new_instance` discards progress and starts from
    * `newFollowStart` — every row of the new instance publishes
    * (including the overlap), maximizing data for newly-added columns at
    * the cost of duplicate messages. */
  def changeStartOnInstanceChange(instanceChanged: Boolean,
      publishDuplicates: Boolean, stored: Option[ChangeIndex],
      newFollowStart: ChangeIndex): ChangeIndex =
    if (instanceChanged && publishDuplicates) newFollowStart
    else stored.getOrElse(newFollowStart)

  // ---- gap disambiguation at the switch (tracked_tables.py:137-154) ---

  sealed trait SwitchGapOutcome
  /** Stored progress is within the new instance's retained range. */
  case object NoGap extends SwitchGapOutcome
  /** Stored progress predates the new instance's min LSN, but the PRIOR
    * instance's change table holds nothing newer than the stored
    * progress — no data was lost; fast-forward progress to the new
    * instance's floor and proceed. */
  final case class FastForward(to: ChangeIndex) extends SwitchGapOutcome
  /** A real gap: rows may exist that neither instance can replay.
    * Resolve per the configured G5 strategy. */
  final case class Gap(action: Policies.LsnGapAction) extends SwitchGapOutcome

  def onInstanceSwitchGap(stored: ChangeIndex, newInstanceMinLsn: Array[Byte],
      priorInstanceMaxIndex: Option[ChangeIndex],
      strategy: Policies.LsnGapAction): SwitchGapOutcome = {
    val floor = ChangeIndex.Lowest.copy(lsn = newInstanceMinLsn)
    // Potential gap iff LOWEST < stored.lsn < newInstanceMinLsn
    // (tracked_tables.py:137): a from-the-beginning follow is not a gap,
    // and progress at/above the floor needs nothing.
    val potentialGap =
      ChangeIndex.compareUnsigned(stored.lsn, ChangeIndex.Lowest.lsn) > 0 &&
        ChangeIndex.compareUnsigned(stored.lsn, newInstanceMinLsn) < 0
    if (!potentialGap) NoGap
    else priorInstanceMaxIndex match {
      case Some(priorMax) if priorMax <= stored => FastForward(floor)
      case _ => Gap(strategy)
    }
  }
}
