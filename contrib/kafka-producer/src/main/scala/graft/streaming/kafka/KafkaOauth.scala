package graft.streaming.kafka

import java.util.Properties

/** OAUTHBEARER auth passthrough for the producer/consumer config path —
  * the analog of the reference's pluggable OAuth provider surface
  * (`cdc_kafka/kafka_oauth/__init__.py`: an abstract provider resolved
  * from a `<module>.<class>` option string) and its AWS MSK
  * implementation (`cdc_kafka/kafka_oauth/aws_msk.py`: IAM-signed token,
  * cached until expiry, regenerated via an optional assumed role).
  *
  * The token SIGNING itself is delegated, exactly as the reference
  * delegates to `aws_msk_iam_sasl_signer.MSKAuthTokenProvider`: no AWS
  * SDK exists in this environment, so [[TokenSigner]] is the seam a
  * deployment binds to its signer library. Everything the reference
  * implements itself — the cache-until-expiry logic, the expiry
  * unit conversion, the region requirement, the role-ARN branch, the
  * provider-by-class-name resolution — is implemented and unit-tested
  * here (`KafkaOauthSpec`).
  */
object KafkaOauth {

  /** A signed token: the SASL/OAUTHBEARER value plus its absolute expiry
    * in epoch MILLISECONDS (the signer's unit, `aws_msk.py:38-41` —
    * the reference converts to seconds at the callback boundary). */
  final case class Token(value: String, expiryEpochMs: Long)

  /** The signing seam (the reference's `MSKAuthTokenProvider`): given a
    * region and an optional role to assume, produce a fresh token. */
  trait TokenSigner {
    def generate(awsRegion: String, roleArn: Option[String]): Token
  }

  /** Provider abstraction (`kafka_oauth/__init__.py:11-31`): one
    * callback per client kind; all three share the cached token in the
    * MSK implementation, as in the reference. The callback returns
    * `(token, expiryEpochSeconds)` — the reference's tuple shape. */
  trait Provider {
    def consumerOauthCb(): (String, Double)
    def producerOauthCb(): (String, Double)
    def adminOauthCb(): (String, Double)
  }

  /** AWS MSK OAUTHBEARER provider (`aws_msk.py:17-43`): lazily
    * generates a token and caches it until its expiry passes; every
    * callback kind shares one cache. `nowMs` is injected for the
    * refresh/expiry unit tests (the reference reads the UTC wall
    * clock). Thread-safe: callbacks can fire from any client thread;
    * a race regenerates at worst one extra token. */
  final class AwsMskOauthProvider(
      awsRegion: String,
      roleArn: Option[String],
      signer: TokenSigner,
      nowMs: () => Long = () => System.currentTimeMillis()) extends Provider {
    require(awsRegion != null && awsRegion.nonEmpty,
      "AwsMskOauthProvider cannot be used without specifying a value for " +
        "MSK_CLUSTER_AWS_REGION") // aws_msk.py:60-62

    @volatile private var cached: Token = Token("", nowMs())

    /** Count of signer invocations — observable refresh math. */
    @volatile private[kafka] var generations: Int = 0

    private def commonCb(): (String, Double) = {
      val t0 = cached
      // Refresh iff no token yet or the clock passed expiry
      // (aws_msk.py:35: `if not token or now > expiry_ts`).
      val t =
        if (t0.value.nonEmpty && nowMs() <= t0.expiryEpochMs) t0
        else {
          val fresh = signer.generate(awsRegion, roleArn)
          cached = fresh
          generations += 1
          fresh
        }
      (t.value, t.expiryEpochMs / 1000.0) // ms → s, aws_msk.py:41
    }

    override def consumerOauthCb(): (String, Double) = commonCb()
    override def producerOauthCb(): (String, Double) = commonCb()
    override def adminOauthCb(): (String, Double) = commonCb()
  }

  /** Provider resolution by class name (`kafka_oauth/__init__.py:43-56`:
    * `--kafka-oauth-provider <module>.<class>` via importlib; here
    * `Class.forName` + a no-arg or (region, roleArn, signer) refusal is
    * the deployment's job — graft resolves only what it can construct).
    * `None` when unset, like the reference's `get_kafka_oauth_provider`. */
  def resolveProvider(className: Option[String],
      construct: String => Provider): Option[Provider] =
    className.filter(_.nonEmpty).map(construct)

  /** Client properties for SASL/OAUTHBEARER against MSK — merged into
    * [[KafkaRecordProducer]]'s `clientProps` (both the producer and the
    * control-topic consumer authenticate, mirroring the reference
    * passing its oauth_cb to every client it builds). The login
    * callback handler class is the deployment's binding of [[Provider]]
    * to the Java client's callback interface. */
  def saslOauthProps(loginCallbackHandlerClass: String): Properties = {
    val p = new Properties()
    p.put("security.protocol", "SASL_SSL")
    p.put("sasl.mechanism", "OAUTHBEARER")
    p.put("sasl.jaas.config",
      "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required;")
    p.put("sasl.login.callback.handler.class", loginCallbackHandlerClass)
    p
  }
}
