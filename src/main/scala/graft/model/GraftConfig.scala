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
    emitDeletionTombstones: Boolean = true,           // G4
    lsnGapHandling: Policies.LsnGapAction = Policies.FailOnGap, // G5
    resnapshotForColumnDrops: Boolean = true,         // G6
    reportProgressOnly: Boolean = false,              // dry-run
    // capture-instance selection + switch ladder (G7; options.py:109-124,
    // 156-166, 183-209). captureInstanceVersionRegex is required iff the
    // strategy is "regex" — validated below, as `main.py:40-43` derives
    // its booleans from the same two choice options.
    captureInstanceVersionStrategy: String = "create_date", // | "regex"
    captureInstanceVersionRegex: Option[String] = None,
    newFollowStartPoint: String = "latest",           // | "earliest"
    newCaptureInstanceSnapshotHandling: String = "begin_new_snapshot", // | "ignore"
    newCaptureInstanceOverlapHandling: String = "start_from_prior_progress", // | "republish_from_new_instance"
    // serialization (F4, B6)
    alwaysUseAvroLongs: Boolean = false,
    truncateFieldsAfterBytes: Map[String, Long] = Map.empty,
    avroSchemaNamespace: String = "graft.cdc",
    // unified topics (E1)
    unifiedTopics: Map[String, String] = Map.empty, // topic -> table-include regex
    // metrics (A12/D7)
    metricsNamespace: String = "graft",
    metricsReportingIntervalSeconds: Int = 20,
    // Kafka OAUTHBEARER passthrough (`kafka_oauth/__init__.py:34-40`):
    // fully-qualified provider class, resolved by the producer adapter
    // (see contrib/kafka-producer KafkaOauth.resolveProvider), plus the
    // MSK provider's own options (`kafka_oauth/aws_msk.py:45-56`).
    kafkaOauthProvider: Option[String] = None,
    mskClusterAwsRegion: Option[String] = None,
    mskClusterAccessRoleArn: Option[String] = None,
    // connection + identity (`options.py:37-59,235-239`). dbConnString is
    // the source's jdbcUrl; transactionalId seeds the per-(batch,
    // partition) ids the sink derives (BrokerSink/KafkaRecordProducer) —
    // both REQUIRED at runtime in the reference (`main.py:36-38`), kept
    // optional here because batch-only usage needs neither.
    dbConnString: Option[String] = None,
    kafkaBootstrapServers: Option[String] = None,
    kafkaTransactionalId: Option[String] = None,
    processHostname: Option[String] = None, // None = local FQDN at runtime
    // client/topic passthroughs (`options.py:61-76`): merged verbatim
    // into the adapter's clientProps / topic creation configs.
    extraKafkaConsumerConfig: Map[String, String] = Map.empty,
    extraKafkaProducerConfig: Map[String, String] = Map.empty,
    extraTopicConfig: Map[String, String] = Map.empty,
    // control-plane topics (`options.py:126-138`).
    progressTopicName: String = "_cdc_to_kafka_progress",
    snapshotLoggingTopicName: Option[String] = None,
    // topic sizing (`options.py:240-254`): None = auto (partitions from
    // the change rate via Policies.partitionCount; replication from the
    // broker default).
    partitionCount: Option[Int] = None,
    replicationFactor: Option[Int] = None,
    // pluggable serializer / metric reporters (`options.py:217-228`),
    // class names resolved like the reference's <module>.<class> strings.
    messageSerializer: String = "graft.serde.AvroSerde",
    metricsReporters: Seq[String] = Seq("graft.metrics.StdoutReporter"),
    // G6 runtime reaction (`options.py:264-273`): terminate for
    // supervisor restart when the followed capture instance changes.
    terminateOnCaptureInstanceChange: Boolean = false,
    runValidations: Boolean = false) {

  // Choice options validate at CONSTRUCTION (the reference's argparse
  // `choices=` does the same at startup): a typo must fail loudly, not
  // silently select the default branch — `newFollowStartPoint =
  // "earlist"` silently skipping every existing row would be data loss.
  private def choice(name: String, v: String, allowed: String*): Unit =
    require(allowed.contains(v),
      s"$name must be one of ${allowed.mkString(", ")}; got '$v'")
  choice("captureInstanceVersionStrategy", captureInstanceVersionStrategy,
    "create_date", "regex")
  choice("newFollowStartPoint", newFollowStartPoint, "earliest", "latest")
  choice("newCaptureInstanceSnapshotHandling", newCaptureInstanceSnapshotHandling,
    "begin_new_snapshot", "ignore")
  choice("newCaptureInstanceOverlapHandling", newCaptureInstanceOverlapHandling,
    "start_from_prior_progress", "republish_from_new_instance")

  require(captureInstanceVersionStrategy != "regex" ||
    captureInstanceVersionRegex.exists(_.nonEmpty),
    "captureInstanceVersionRegex is required with the `regex` " +
      "captureInstanceVersionStrategy") // build_startup_state.py:398-401

  /** The typed strategy [[graft.sources.SchemaInference.fromCatalogRows]]
    * consumes — kept as strings in the config surface to mirror the
    * reference's choice options. */
  def captureInstanceStrategyTyped: InstanceSwitch.CaptureInstanceStrategy =
    captureInstanceVersionStrategy match {
      case "regex" => InstanceSwitch.ByRegex(captureInstanceVersionRegex.get)
      case _ => InstanceSwitch.ByCreateDate
    }

  def newFollowStartPointTyped: InstanceSwitch.NewFollowStartPoint =
    if (newFollowStartPoint == "earliest") InstanceSwitch.FollowEarliest
    else InstanceSwitch.FollowLatest

  /** `main.py:40-43`: the two switch booleans derived from the choices. */
  def redoSnapshotForNewInstance: Boolean =
    newCaptureInstanceSnapshotHandling == "begin_new_snapshot"
  def publishDuplicateChangesFromNewInstance: Boolean =
    newCaptureInstanceOverlapHandling == "republish_from_new_instance"

  def sparkConfEntries: Map[String, String] = Map(
    "spark.graft.topicNameTemplate" -> topicNameTemplate,
    "spark.graft.dbRowBatchSize" -> dbRowBatchSize.toString,
    "spark.graft.emitDeletionTombstones" -> emitDeletionTombstones.toString,
    "spark.graft.metricsNamespace" -> metricsNamespace)
}

object GraftConfig {
  val default: GraftConfig = GraftConfig()
}
