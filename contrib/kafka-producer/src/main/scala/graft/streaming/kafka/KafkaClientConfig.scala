package graft.streaming.kafka

import java.util.Properties

import graft.model.GraftConfig

/** Assembles the kafka client `Properties` a deployment hands to
  * [[KafkaRecordProducer]] from the typed [[graft.model.GraftConfig]] —
  * the glue between the reference's option surface and its client
  * construction (`options.py:61-72` extra-config JSON merged into every
  * client, `kafka_oauth/__init__.py:43-56` provider applied to every
  * client it builds).
  *
  * Precedence: the OAUTHBEARER SASL block (when a provider is
  * configured) first, then the extra-config passthrough — explicit
  * per-deployment entries override the derived auth block, matching the
  * reference where the extra JSON is applied last onto the base config
  * dict. */
object KafkaClientConfig {

  def forProducer(c: GraftConfig): Properties =
    assemble(c.extraKafkaProducerConfig, c)

  def forConsumer(c: GraftConfig): Properties =
    assemble(c.extraKafkaConsumerConfig, c)

  private def assemble(extra: Map[String, String], c: GraftConfig): Properties = {
    val p = new Properties()
    c.kafkaOauthProvider.foreach { providerClass =>
      val sasl = KafkaOauth.saslOauthProps(providerClass)
      sasl.stringPropertyNames().forEach(k => p.put(k, sasl.getProperty(k)))
    }
    extra.foreach { case (k, v) => p.put(k, v) }
    p
  }
}
