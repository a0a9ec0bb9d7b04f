package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE session-scoped memo for cross-query shared relations (the
  * r12 verdict's #2 ask generalized): each memoized value is keyed by
  * (live-session key, tag) and built at most once per session, so a
  * catalog pass that serves `ann_nsw_topk` standalone and then again
  * inside `ann_recall_report` pays the serve ONCE — production evaluates
  * recall from materialized index outputs, never by re-serving.
  *
  * Contract for DataFrame values: producers MUST materialize through
  * [[PinnedStages.sharedCheckpoint]] (never a bare `pinned()`): Bench
  * sweeps transient checkpoint blocks between queries, and a swept
  * localCheckpoint cannot recompute (lineage is truncated) — a memoized
  * transient pin would hand later consumers a dead relation.
  *
  * Eviction (ADVICE r12): entries whose SparkContext has stopped are
  * dropped on every access, so stopped test sessions cannot accumulate
  * stale DataFrames (and their shared-checkpoint references) in a
  * long-lived JVM. Within ONE session the memo is keyed by tag only:
  * a caller that rewrites the data under the same path (e.g. a test
  * regenerating fixtures) must call [[clear]] — the memo cannot see
  * filesystem writes.
  *
  * Bench seam: [[clear]] runs between timed passes (with
  * `PinnedStages.releaseShared`) so every pass re-pays each producer's
  * real cost and the per-query min never underclaims.
  */
object SessionMemo {

  private final case class Entry(spark: SparkSession, value: Any)
  private val memo = scala.collection.mutable.Map[(String, String), Entry]()

  private def sessionKey(spark: SparkSession): String =
    spark.sparkContext.applicationId + "/" + spark.sparkContext.startTime

  def cached[T](spark: SparkSession, tag: String)(build: => T): T =
    synchronized {
      memo.filterInPlace((_, e) => !e.spark.sparkContext.isStopped)
      memo.getOrElseUpdate((sessionKey(spark), tag), Entry(spark, build))
        .value.asInstanceOf[T]
    }

  def clear(): Unit = synchronized(memo.clear())

  private[graft] def size: Int = synchronized(memo.size)
}
