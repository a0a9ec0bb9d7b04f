package graft.model

/** G7: the engine's configuration surface — the reference's ~30 CLI/env
  * options (`cdc_kafka/options.py:37-316`) restated as a typed config.
  * In a Spark deployment these arrive as `spark.graft.*` conf keys;
  * defaults mirror the reference's.
  */
final case class GraftConfig(
    // routing (B3)
    tableIncludeRegex: Option[String] = None,
    tableExcludeRegex: Option[String] = None,
    snapshotTableIncludeRegex: Option[String] = None,
    snapshotTableExcludeRegex: Option[String] = None,
    topicNameTemplate: String = "{schema}_{table}_cdc",
    // pacing / batching (E6/E7, §6)
    dbRowBatchSize: Int = 2000,
    minPollIntervalSeconds: Int = Policies.MinPollIntervalSeconds,
    maxPollIntervalSeconds: Int = Policies.MaxPollIntervalSeconds,
    // behavior toggles
    publishDuplicateChangesFromMultipleInstances: Boolean = false,
    emitDeletionTombstones: Boolean = true,           // G4
    lsnGapHandling: Policies.LsnGapAction = Policies.FailOnGap, // G5
    resnapshotForColumnDrops: Boolean = true,         // G6
    reportProgressOnly: Boolean = false,              // dry-run
    // serialization (F4, B6)
    alwaysUseAvroLongs: Boolean = false,
    truncateFieldsAfterBytes: Map[String, Long] = Map.empty,
    avroSchemaNamespace: String = "graft.cdc",
    // unified topics (E1)
    unifiedTopics: Map[String, String] = Map.empty, // topic -> table-include regex
    // metrics (A12/D7)
    metricsNamespace: String = "graft",
    metricsReportingIntervalSeconds: Int = 20) {

  def sparkConfEntries: Map[String, String] = Map(
    "spark.graft.topicNameTemplate" -> topicNameTemplate,
    "spark.graft.dbRowBatchSize" -> dbRowBatchSize.toString,
    "spark.graft.emitDeletionTombstones" -> emitDeletionTombstones.toString,
    "spark.graft.metricsNamespace" -> metricsNamespace)
}

object GraftConfig {
  val default: GraftConfig = GraftConfig()
}
