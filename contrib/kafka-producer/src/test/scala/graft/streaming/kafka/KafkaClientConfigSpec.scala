package graft.streaming.kafka

import org.scalatest.funsuite.AnyFunSuite

import graft.model.GraftConfig

/** Config → client-properties assembly: the extra-config passthrough,
  * the OAUTHBEARER block, and their precedence. */
class KafkaClientConfigSpec extends AnyFunSuite {

  test("no oauth, no extras: empty properties") {
    assert(KafkaClientConfig.forProducer(GraftConfig()).isEmpty)
    assert(KafkaClientConfig.forConsumer(GraftConfig()).isEmpty)
  }

  test("oauth provider adds the SASL block to both client kinds") {
    val c = GraftConfig(kafkaOauthProvider = Some("example.MskHandler"))
    val p = KafkaClientConfig.forProducer(c)
    assert(p.getProperty("sasl.mechanism") === "OAUTHBEARER")
    assert(p.getProperty("security.protocol") === "SASL_SSL")
    assert(p.getProperty("sasl.login.callback.handler.class") === "example.MskHandler")
    assert(KafkaClientConfig.forConsumer(c).getProperty("sasl.mechanism") === "OAUTHBEARER")
  }

  test("extra config passes through per client kind and overrides the derived block") {
    val c = GraftConfig(
      kafkaOauthProvider = Some("example.MskHandler"),
      extraKafkaProducerConfig = Map(
        "linger.ms" -> "50", "security.protocol" -> "SASL_PLAINTEXT"),
      extraKafkaConsumerConfig = Map("fetch.min.bytes" -> "1024"))
    val prod = KafkaClientConfig.forProducer(c)
    assert(prod.getProperty("linger.ms") === "50")
    // Explicit deployment entries win over the derived auth block.
    assert(prod.getProperty("security.protocol") === "SASL_PLAINTEXT")
    val cons = KafkaClientConfig.forConsumer(c)
    assert(cons.getProperty("fetch.min.bytes") === "1024")
    assert(cons.getProperty("linger.ms") === null,
      "producer extras must not leak into the consumer")
  }
}
