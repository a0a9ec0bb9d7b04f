package graft.streaming.kafka

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite

import KafkaOauth._

/** Token refresh/expiry math of the MSK OAUTHBEARER provider — the
  * reference's is pure logic (`cdc_kafka/kafka_oauth/aws_msk.py:17-43`),
  * so it tests without any AWS signer: cache until expiry, regenerate
  * after, ms→s conversion at the callback boundary, region requirement,
  * role-ARN passthrough. */
class KafkaOauthSpec extends AnyFunSuite {

  private final class FakeSigner(lifetimeMs: Long, now: () => Long) extends TokenSigner {
    val generatedWith = mutable.Buffer[(String, Option[String])]()
    override def generate(region: String, roleArn: Option[String]): Token = {
      generatedWith += ((region, roleArn))
      Token(s"tok-${generatedWith.size}", now() + lifetimeMs)
    }
  }

  test("token is generated lazily, cached until expiry, regenerated after") {
    var clock = 1_000_000L
    val signer = new FakeSigner(lifetimeMs = 900_000L, now = () => clock)
    val p = new AwsMskOauthProvider("us-east-1", None, signer, () => clock)
    assert(signer.generatedWith.isEmpty, "no token before the first callback")

    val (t1, e1) = p.producerOauthCb()
    assert(t1 === "tok-1")
    // Expiry crosses the callback boundary in SECONDS (aws_msk.py:41).
    assert(e1 === (clock + 900_000L) / 1000.0)

    // Before expiry: cached, across ALL callback kinds (shared cache).
    clock += 899_999L
    assert(p.consumerOauthCb()._1 === "tok-1")
    assert(p.adminOauthCb()._1 === "tok-1")
    assert(p.producerOauthCb()._1 === "tok-1")
    assert(p.generations === 1)

    // Past expiry: exactly one regeneration.
    clock += 2L
    assert(p.producerOauthCb()._1 === "tok-2")
    assert(p.generations === 2)
  }

  test("exactly at the expiry instant the cached token is still valid (now > expiry refreshes, not >=)") {
    var clock = 500_000L
    val signer = new FakeSigner(lifetimeMs = 100_000L, now = () => clock)
    val p = new AwsMskOauthProvider("eu-west-1", None, signer, () => clock)
    p.producerOauthCb()
    clock += 100_000L // now == expiry: aws_msk.py refreshes only on strict >
    assert(p.producerOauthCb()._1 === "tok-1")
    clock += 1L
    assert(p.producerOauthCb()._1 === "tok-2")
  }

  test("role ARN flows to the signer; region is mandatory") {
    var clock = 0L
    val signer = new FakeSigner(1000L, () => clock)
    val p = new AwsMskOauthProvider(
      "ap-south-1", Some("arn:aws:iam::123:role/msk"), signer, () => clock)
    p.producerOauthCb()
    assert(signer.generatedWith.toSeq ===
      Seq(("ap-south-1", Some("arn:aws:iam::123:role/msk"))))

    val ex = intercept[IllegalArgumentException] {
      new AwsMskOauthProvider("", None, signer, () => clock)
    }
    assert(ex.getMessage.contains("MSK_CLUSTER_AWS_REGION")) // aws_msk.py:60-62
  }

  test("provider resolution mirrors get_kafka_oauth_provider: None when unset, constructed when named") {
    val built = mutable.Buffer[String]()
    def construct(name: String): Provider = {
      built += name
      new AwsMskOauthProvider("us-east-1", None, new FakeSigner(1L, () => 0L), () => 0L)
    }
    assert(resolveProvider(None, construct).isEmpty)
    assert(resolveProvider(Some(""), construct).isEmpty)
    assert(resolveProvider(Some("graft.MskProvider"), construct).isDefined)
    assert(built.toSeq === Seq("graft.MskProvider"))
  }

  test("saslOauthProps carries the full OAUTHBEARER client config") {
    val p = saslOauthProps("com.example.Handler")
    assert(p.getProperty("security.protocol") === "SASL_SSL")
    assert(p.getProperty("sasl.mechanism") === "OAUTHBEARER")
    assert(p.getProperty("sasl.login.callback.handler.class") === "com.example.Handler")
    assert(p.getProperty("sasl.jaas.config").contains("OAuthBearerLoginModule required"))
  }
}
