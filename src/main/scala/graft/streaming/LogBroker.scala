package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

/** An in-JVM keyed-record broker that models the Kafka contract the
  * reference engine depends on (`cdc_kafka/kafka.py:87-342`): partitioned
  * append-only logs, transactional produce with begin/commit/abort and
  * producer-epoch zombie fencing, `read_committed` consumer isolation, and
  * log compaction (last record per key; null value = tombstone → key
  * removed).
  *
  * This is the TEST TRANSPORT: no Kafka broker ships in this environment,
  * so the exactly-once specs run against this model instead. The semantics
  * modeled here are exactly the ones `org.apache.kafka.clients.producer
  * .KafkaProducer` provides with `transactional.id` set:
  *
  *   - `initTransactions(txnId)` registers a stable producer id for the
  *     transactional id and BUMPS ITS EPOCH; any transaction left open by
  *     the previous epoch is aborted. A surviving "zombie" handle from the
  *     old epoch gets [[ProducerFenced]] on its next send/commit — this is
  *     Kafka's fencing guarantee that makes crash/restart safe.
  *   - data records appended inside a transaction stay in the log but are
  *     INVISIBLE to `read_committed` readers until a commit control marker
  *     for that (producerId, epoch) follows them; an abort marker makes
  *     them permanently invisible (they are never removed — exactly like
  *     Kafka, visibility is a read-side filter over control markers).
  *   - compaction is modeled as a read-side view: last visible record per
  *     key, tombstoned keys dropped.
  *
  * A production deployment swaps this for the real client behind the SAME
  * [[CdcPipeline.RecordProducer]] seam (see [[BrokerSink]] for the
  * adapter that binds this broker to [[CdcPipeline.KeyedRecordSink]]);
  * no query or pipeline code changes.
  *
  * Thread safety: one lock per partition log; local[N] executor threads
  * land on the shared JVM-global registry ([[LogBroker.get]]), which is
  * what a broker endpoint is to real executors.
  */
final class LogBroker {

  /** One appended log entry. Data entries carry the producer (pid, epoch)
    * that wrote them and whether they were transactional; control entries
    * (commit/abort markers) end a transaction for a pid. */
  sealed trait Entry
  final case class DataRecord(offset: Long, key: Array[Byte],
      value: Array[Byte], pid: Long, epoch: Int, transactional: Boolean)
    extends Entry
  final case class ControlMarker(offset: Long, pid: Long, epoch: Int,
      commit: Boolean) extends Entry

  final class ProducerFenced(msg: String) extends RuntimeException(msg)
  final class IllegalTxnState(msg: String) extends RuntimeException(msg)

  private final class PartitionLog {
    val entries = new ArrayBuffer[Entry]()
    def append(f: Long => Entry): Entry = this.synchronized {
      val e = f(entries.length.toLong); entries += e; e
    }
    def snapshot(): Vector[Entry] = this.synchronized(entries.toVector)
  }

  // topic -> partition logs. The log array is the SINGLE source of truth
  // for a topic's partition count (fixed at first touch; default 1 like
  // the reference's single-partition unified topics, README.md options).
  private val topics = new ConcurrentHashMap[String, Array[PartitionLog]]()

  // transactional.id -> (producerId, currentEpoch)
  private val txnRegistry = new ConcurrentHashMap[String, (Long, Int)]()
  private val nextPid = new java.util.concurrent.atomic.AtomicLong(0L)
  // transactional.ids that have COMMITTED at least one transaction. This
  // is the broker half of replay-safety: the reference commits its
  // progress record in the SAME transaction as the data
  // (`kafka.py:87-101`), so a restart can tell "this unit of work already
  // committed" and skip it. With one transaction per transactional.id
  // (the (batch, partition) naming scheme), membership here means exactly
  // that — see [[initTransactionsUnlessCommitted]]. Grows one small
  // string per committed (batch, partition) for the broker's lifetime —
  // the same retention question as a real control topic; a deployment
  // compacts it past the replay horizon (only the latest few batches can
  // ever replay), which this in-JVM test transport doesn't bother with.
  private val committedTxns = ConcurrentHashMap.newKeySet[String]()
  // pid -> open transaction's (epoch, touched partitions)
  private val openTxns =
    new ConcurrentHashMap[Long, (Int, ArrayBuffer[(String, Int)])]()
  // pid -> monitor serializing that producer's txn-state transitions
  // (send/commit/abort vs a re-init's fencing) — see initTransactions.
  private val pidLocks = new ConcurrentHashMap[Long, Object]()
  private def lockFor(pid: Long): Object =
    pidLocks.computeIfAbsent(pid, _ => new Object)

  /** Create a topic with an explicit partition count. Creating a topic
    * that already exists (explicitly, or implicitly via a first send /
    * read) with a DIFFERENT partition count fails loudly — a topic's
    * layout is immutable once materialized, as on a real broker. */
  def createTopic(name: String, partitions: Int = 1): Unit = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    topics.compute(name, (_, cur) =>
      if (cur == null) Array.fill(partitions)(new PartitionLog)
      else if (cur.length == partitions) cur
      else throw new IllegalStateException(
        s"topic $name already exists with ${cur.length} partition(s); " +
          s"cannot recreate with $partitions"))
  }

  private def logs(topic: String): Array[PartitionLog] =
    topics.computeIfAbsent(topic, _ => Array.fill(1)(new PartitionLog))

  private def partitionFor(topic: String, key: Array[Byte]): Int = {
    val n = logs(topic).length
    if (n == 1) 0
    else (java.util.Arrays.hashCode(key) % n + n) % n
  }

  /** A transactional producer handle bound to one (pid, epoch). Mirrors
    * KafkaProducer's transactional API surface. */
  final class TxnProducerHandle private[LogBroker] (
      val transactionalId: String, val pid: Long, val epoch: Int) {
    private var inTxn = false

    private def checkFenced(): Unit = {
      val (curPid, curEpoch) = txnRegistry.get(transactionalId)
      if (curPid != pid || curEpoch != epoch)
        throw new ProducerFenced(
          s"producer (pid=$pid, epoch=$epoch) fenced by epoch $curEpoch " +
            s"for transactional.id=$transactionalId")
    }

    def beginTransaction(): Unit = lockFor(pid).synchronized {
      checkFenced()
      if (inTxn) throw new IllegalTxnState("transaction already open")
      inTxn = true
      openTxns.put(pid, (epoch, new ArrayBuffer[(String, Int)]()))
    }

    def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
      lockFor(pid).synchronized {
        checkFenced()
        if (!inTxn) throw new IllegalTxnState("send outside a transaction")
        // Re-validate the open-txn entry under the lock: a concurrent
        // initTransactions (new epoch) may have removed it between our
        // caller's last call and now — that is fencing, not an NPE.
        val open = openTxns.get(pid)
        if (open == null || open._1 != epoch)
          throw new ProducerFenced(
            s"producer (pid=$pid, epoch=$epoch) transaction aborted by a " +
              s"newer epoch for transactional.id=$transactionalId")
        val p = partitionFor(topic, key)
        logs(topic)(p).append(off =>
          DataRecord(off, key, value, pid, epoch, transactional = true))
        if (!open._2.contains((topic, p))) open._2 += ((topic, p))
      }

    private def endTxn(commit: Boolean): Unit = lockFor(pid).synchronized {
      checkFenced()
      if (!inTxn) throw new IllegalTxnState("no open transaction")
      val open = openTxns.remove(pid)
      if (open == null || open._1 != epoch)
        throw new ProducerFenced(
          s"producer (pid=$pid, epoch=$epoch) transaction aborted by a " +
            s"newer epoch for transactional.id=$transactionalId")
      open._2.foreach { case (t, p) =>
        logs(t)(p).append(off => ControlMarker(off, pid, epoch, commit))
      }
      // Record the commit under the pid lock, so the check in
      // initTransactionsUnlessCommitted (same lock) can never interleave
      // between our markers and this registration.
      if (commit) committedTxns.add(transactionalId)
      inTxn = false
    }
    def commitTransaction(): Unit = endTxn(commit = true)
    def abortTransaction(): Unit = endTxn(commit = false)
  }

  /** Register (or re-register) a transactional id: allocates its stable
    * pid, bumps the epoch, and aborts any transaction the previous epoch
    * left open — Kafka's `initTransactions()`. */
  def initTransactions(transactionalId: String): TxnProducerHandle = {
    val (pid, epoch) = txnRegistry.compute(transactionalId, (_, cur) =>
      if (cur == null) (nextPid.getAndIncrement(), 0)
      else (cur._1, cur._2 + 1))
    // Abort the previous epoch's dangling transaction under the pid lock:
    // the epoch bump above already fences new zombie calls; the lock
    // ensures an IN-FLIGHT zombie send/endTxn either completed before the
    // abort markers (and is aborted with the txn) or observes the bumped
    // epoch and surfaces as ProducerFenced — never a torn interleave.
    lockFor(pid).synchronized {
      val dangling = openTxns.remove(pid)
      if (dangling != null) {
        val (oldEpoch, touched) = dangling
        touched.foreach { case (t, p) =>
          logs(t)(p).append(off => ControlMarker(off, pid, oldEpoch, commit = false))
        }
      }
    }
    new TxnProducerHandle(transactionalId, pid, epoch)
  }

  /** Has this transactional id ever committed a transaction? */
  def hasCommitted(transactionalId: String): Boolean =
    committedTxns.contains(transactionalId)

  /** Replay-safe registration for ONE-TRANSACTION-PER-ID producers (the
    * (batch, partition) naming scheme): atomically, if the id has already
    * committed, return None — the unit of work is durably published and a
    * replay must NOT produce it again — otherwise register/fence exactly
    * like [[initTransactions]].
    *
    * The check and the epoch bump share the pid lock with
    * commit/abort/send, closing the zombie race: a slow first attempt
    * either commits BEFORE the check (replay sees committed → skips) or
    * is fenced by the bump (its commit throws, its records are aborted) —
    * in no interleaving do both attempts' records become visible. */
  def initTransactionsUnlessCommitted(
      transactionalId: String): Option[TxnProducerHandle] = {
    // Resolve (or allocate) the pid WITHOUT bumping the epoch: a skipped
    // replay must not fence anything.
    val pid = txnRegistry.computeIfAbsent(transactionalId,
      _ => (nextPid.getAndIncrement(), -1))._1
    lockFor(pid).synchronized {
      if (committedTxns.contains(transactionalId)) None
      else {
        val (p, epoch) = txnRegistry.compute(transactionalId,
          (_, cur) => (cur._1, cur._2 + 1))
        val dangling = openTxns.remove(p)
        if (dangling != null) {
          val (oldEpoch, touched) = dangling
          touched.foreach { case (t, part) =>
            logs(t)(part).append(off =>
              ControlMarker(off, p, oldEpoch, commit = false))
          }
        }
        Some(new TxnProducerHandle(transactionalId, p, epoch))
      }
    }
  }

  /** `read_committed` scan of one partition: transactional data records are
    * visible iff a commit marker for their (pid, epoch) follows them in the
    * log; aborted or still-open transactions are filtered out. */
  def readCommitted(topic: String, partition: Int = 0): Vector[DataRecord] = {
    val snap = logs(topic)(partition).snapshot()
    // For each (pid, epoch), the decision (commit/abort) per txn segment:
    // walk once, buffering each producer's open segment until its marker.
    val open = scala.collection.mutable.Map[(Long, Int), ArrayBuffer[DataRecord]]()
    val out = ArrayBuffer[DataRecord]()
    snap.foreach {
      case d: DataRecord if !d.transactional => out += d
      case d: DataRecord =>
        open.getOrElseUpdate((d.pid, d.epoch), ArrayBuffer()) += d
      case m: ControlMarker =>
        open.remove((m.pid, m.epoch)).foreach { buf =>
          if (m.commit) out ++= buf // aborted buffers are dropped
        }
    }
    out.sortBy(_.offset).toVector
  }

  /** All committed records of a topic across partitions, offset order per
    * partition (Kafka's only ordering guarantee). */
  def readCommittedAll(topic: String): Vector[(Int, DataRecord)] = {
    val n = logs(topic).length
    (0 until n).flatMap(p => readCommitted(topic, p).map((p, _))).toVector
  }

  /** Compacted view: the last committed record per key; keys whose last
    * record is a tombstone (null value) are removed — Kafka log compaction
    * as the state-recovery consumer observes it (A7). */
  def compactedView(topic: String): Vector[DataRecord] = {
    val last = scala.collection.mutable.LinkedHashMap[Seq[Byte], DataRecord]()
    readCommittedAll(topic).foreach { case (_, d) =>
      last(d.key.toSeq) = d
    }
    last.values.filter(_.value != null).toVector
  }

  def uncommittedCount(topic: String, partition: Int = 0): Int = {
    val committed = readCommitted(topic, partition).map(_.offset).toSet
    logs(topic)(partition).snapshot().count {
      case d: DataRecord => !committed.contains(d.offset)
      case _ => false
    }
  }
}

/** JVM-global broker registry: local-mode executor threads and the driver
  * reach the same broker by name, the way real executors reach a broker by
  * bootstrap address. Tests allocate a fresh name per scenario. */
object LogBroker {
  private val registry = new ConcurrentHashMap[String, LogBroker]()
  def get(name: String): LogBroker =
    registry.computeIfAbsent(name, _ => new LogBroker)
  def drop(name: String): Unit = registry.remove(name)
}
