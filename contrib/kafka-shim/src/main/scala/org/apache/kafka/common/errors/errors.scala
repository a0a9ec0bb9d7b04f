// Compile-only shim — see ../common.scala for the contract.
package org.apache.kafka.common.errors

import org.apache.kafka.common.KafkaException

/** Mirror of `org.apache.kafka.common.errors.ApiException`. */
class ApiException(message: String, cause: Throwable)
    extends KafkaException(message, cause) {
  def this(message: String) = this(message, null)
  def this() = this(null, null)
}

/** Mirror of `org.apache.kafka.common.errors.ProducerFencedException`:
  * thrown when another producer with the same `transactional.id` and a
  * newer epoch has fenced this one. */
class ProducerFencedException(message: String) extends ApiException(message)

/** Mirror of `org.apache.kafka.common.errors.TimeoutException`. */
class TimeoutException(message: String) extends ApiException(message) {
  def this() = this(null)
}
