package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted BUCKETED tables — the co-located-join layout the scale notes
  * across this repo keep invoking ("at production the edge table is
  * bucketed by src"), made concrete: `bucketBy(n, key)` + `sortBy(key)`
  * via `saveAsTable` persists the hash partitioning INTO the table
  * metadata, so every later equi-join or aggregation on that key reads
  * the partitioning straight from the catalog and plans ZERO exchanges —
  * the shuffle is paid once at write time, then amortized over every
  * consumer. This is the difference between "repartition before the
  * join" (per-query shuffle) and a storage layout decision (no per-query
  * shuffle at all); at 100 TB the former moves the fact table over the
  * network on every run.
  *
  * `BucketedJoinSpec` proves the claim from the physical plan: the
  * bucketed-by-join-key self/two-table joins contain NO
  * ShuffleExchangeExec, the same joins over plain parquet contain two,
  * and results are row-identical.
  */
object BucketedStore {

  /** Persist `df` as a bucketed+sorted managed table (overwriting). The
    * bucket count is a layout constant: it must match across tables that
    * will join, and production sizes it so one bucket ≈ one task's
    * memory budget. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key — plans with no
    * exchange when both sides are bucketed on `key` with equal bucket
    * counts. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
