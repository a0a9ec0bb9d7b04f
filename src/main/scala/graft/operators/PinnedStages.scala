package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Registry for `localCheckpoint` block hygiene across a multi-query
  * session (the 91-query Verify/Bench sweeps, or a production session
  * running many pipeline stages back to back).
  *
  * Why it exists: `localCheckpoint` pins its blocks in executor storage
  * memory and the blocks are only reclaimed by the ContextCleaner when
  * the JVM garbage-collects the RDD reference — on a large heap that can
  * be *never* within a session's lifetime. Round 7's bench measured the
  * consequence: with ~90 queries' worth of pinned stages accumulated,
  * unrelated queries slowed 4-5x (storage pressure steals the unified
  * memory region execution would use, and pass 2 ran *slower* than pass
  * 1). On a real cluster the same leak evicts hot cached data and forces
  * shuffle spill. The fix is explicit: every checkpoint a query pins is
  * swept as soon as the query's action completes, EXCEPT stages
  * deliberately shared across queries (the dedup signature/pair/cluster
  * memos), which are registered here and survive until the memos
  * themselves are dropped.
  *
  * Safety rule: a locally-checkpointed RDD cannot recompute after its
  * blocks are removed (the checkpoint truncates lineage), so the sweep
  * must only run at a point where no un-registered checkpointed Dataset
  * will be referenced again — i.e. between queries, which is the only
  * place Bench/Verify call it. Cached-but-not-checkpointed RDDs caught
  * by the sweep merely recompute.
  */
object PinnedStages {
  private val shared = scala.collection.mutable.Set[Int]()

  /** `localCheckpoint` that registers the resulting blocks as SHARED so
    * [[sweepTransient]] leaves them alone. Registration works by diffing
    * the context's persistent-RDD set around the checkpoint call (the
    * checkpointed internal RDD's id is not reachable through a public
    * Dataset API). Single-writer assumption: concurrent *unregistered*
    * checkpoints during this call would be misclassified as shared —
    * acceptable here because memo producers run serially inside query
    * evaluation. */
  def sharedCheckpoint[T](ds: Dataset[T]): Dataset[T] = synchronized {
    val sc = ds.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Pin.pin(ds) // reliable mode registers no persistent RDDs → no-op diff
    shared ++= sc.getPersistentRDDs.keySet.diff(before)
    out
  }

  /** Unpersist every persistent RDD not registered as shared. Call only
    * between queries (see class doc for why mid-query is unsafe). */
  def sweepTransient(spark: SparkSession): Unit = synchronized {
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!shared.contains(id)) rdd.unpersist(blocking = false)
    }
  }

  /** Unpersist the shared pins too and forget them — pair with dropping
    * the memos that reference them (e.g. between bench passes). */
  def releaseShared(spark: SparkSession): Unit = synchronized {
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (shared.contains(id)) rdd.unpersist(blocking = false)
    }
    shared.clear()
  }

  private[graft] def sharedCount: Int = synchronized(shared.size)
}
