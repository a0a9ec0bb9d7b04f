package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The PHYSICAL half of `pipe_zorder`: actually lay a table out on disk
  * clustered by the Morton code — `partitionBy` on the z-range bucket —
  * and serve multi-dimensional point lookups that PRUNE FILES, not just
  * promise to. `pipe_zorder` emits the zone-map witness (per-bucket
  * extents); this tool writes those buckets as partition directories, so
  * a (partkey, suppkey) probe computes its own z-bucket and Spark's
  * partition pruning reads exactly one directory of the `Buckets` (64)
  * partition directories — `ZorderStoreSpec` asserts it from
  * `df.inputFiles`, the observable a claim about I/O must produce.
  *
  * The z-domain normalizer (max z) is persisted next to the data — a
  * probe must bucket with the SAME divisor the writer used or it reads
  * the wrong directory; the store is self-describing the way
  * IncrementalDedup's claim stores are (meta + format version).
  *
  * Scale shape (100 TB): the write is ONE repartition by the bucket
  * column feeding `partitionBy` (the range exchange any clustered layout
  * pays); lookups read one partition directory regardless of table
  * size; 2-D range queries enumerate the candidate buckets from the
  * same meta (the pipe_zorder extent table is exactly the zone map for
  * that enumeration). */
object ZorderStore {

  val Buckets = 64
  private val FormatVersion = 1

  /** 16-bit Morton interleave — the same spread chain pipe_zorder
    * compiles to SQL, as driver-side Scala for probe-time bucketing. */
  def morton(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      val v = v0 & 0xffffL
      val s1 = (v | (v << 8)) & 0x00ff00ffL
      val s2 = (s1 | (s1 << 4)) & 0x0f0f0f0fL
      val s3 = (s2 | (s2 << 2)) & 0x33333333L
      (s3 | (s3 << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Write `lineitem` clustered by z-bucket; returns the bucket count
    * actually produced. */
  def write(spark: SparkSession, lineitemDir: String, storeDir: String): Long = {
    spark.read.parquet(s"$lineitemDir/lineitem.parquet")
      .createOrReplaceTempView("zs_lineitem_t")
    // Compute the true max z once via SQL (same spelling as pipe_zorder).
    val zdf = spark.sql(zSelect("zs_lineitem_t"))
    zdf.createOrReplaceTempView("zs_coded_t")
    val maxZ = spark.sql("SELECT max(z) FROM zs_coded_t").head().getLong(0)
    spark.sql(
      s"""SELECT *, z * $Buckets div (${maxZ} + 1) AS zb FROM zs_coded_t""")
      .repartition(8)
      .write.mode(SaveMode.Overwrite).partitionBy("zb").parquet(s"$storeDir/data")
    // Per-bucket extent zone map, computed from what's actually on disk —
    // the ≤Buckets-row sidecar that 2-D RANGE queries enumerate candidate
    // partition directories from (pipe_zorder's extent table made part of
    // the store). Written BEFORE the META marker so a reader that sees the
    // marker always finds the zone map.
    spark.read.parquet(s"$storeDir/data")
      .groupBy("zb")
      .agg(org.apache.spark.sql.functions.expr("min(l_partkey)").as("pmin"),
        org.apache.spark.sql.functions.expr("max(l_partkey)").as("pmax"),
        org.apache.spark.sql.functions.expr("min(l_suppkey)").as("smin"),
        org.apache.spark.sql.functions.expr("max(l_suppkey)").as("smax"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/extents")
    Files.writeString(Paths.get(s"$storeDir/META"),
      s"v$FormatVersion maxZ=$maxZ buckets=$Buckets")
    spark.read.parquet(s"$storeDir/data").select("zb").distinct().count()
  }

  private def zSelect(table: String): String = {
    def spread(v: String): String = {
      val s1 = s"(($v | shiftleft($v, 8)) & 16711935)"
      val s2 = s"(($s1 | shiftleft($s1, 4)) & 252645135)"
      val s3 = s"(($s2 | shiftleft($s2, 2)) & 858993459)"
      s"(($s3 | shiftleft($s3, 1)) & 1431655765)"
    }
    s"""SELECT t.*, CAST(${spread("(CAST(l_partkey AS BIGINT) & 65535)")}
       | | shiftleft(${spread("(CAST(l_suppkey AS BIGINT) & 65535)")}, 1)
       | AS BIGINT) AS z
       |FROM $table t""".stripMargin
  }

  private def readMaxZ(storeDir: String): Long = {
    val meta = Files.readString(Paths.get(s"$storeDir/META")).trim
    require(meta.startsWith(s"v$FormatVersion "),
      s"zorder store format mismatch: $meta")
    meta.split(' ').find(_.startsWith("maxZ="))
      .map(_.drop(5).toLong)
      .getOrElse(sys.error(s"no maxZ in store meta: $meta"))
  }

  /** Multi-dimensional point lookup: computes the probe's z-bucket with
    * the writer's persisted normalizer and reads ONLY that partition
    * directory (plus the exact-match residual filter). */
  def lookup(spark: SparkSession, storeDir: String,
      partKey: Long, suppKey: Long): DataFrame = {
    val maxZ = readMaxZ(storeDir)
    val z = morton(partKey & 0xffffL, suppKey & 0xffffL)
    val zb = z * Buckets / (maxZ + 1)
    spark.read.parquet(s"$storeDir/data")
      .where(s"zb = $zb AND l_partkey = $partKey AND l_suppkey = $suppKey")
  }

  /** 2-D RANGE query (pLo ≤ l_partkey ≤ pHi, sLo ≤ l_suppkey ≤ sHi):
    * enumerates candidate z-buckets from the persisted extent zone map
    * (a ≤[[Buckets]]-row sidecar — bounded metadata, not a data-path
    * collect) and reads ONLY those partition directories, with the exact
    * rectangle as the residual filter. The z-layout is what makes the
    * zone map selective on BOTH dimensions at once: insertion order
    * leaves every bucket full-width in the non-sort dimension, so the
    * same enumeration would keep every file. */
  def rangeQuery(spark: SparkSession, storeDir: String,
      pLo: Long, pHi: Long, sLo: Long, sHi: Long): DataFrame = {
    readMaxZ(storeDir) // format check; the zone map itself drives pruning
    val candidates = spark.read.parquet(s"$storeDir/extents")
      .where(s"pmax >= $pLo AND pmin <= $pHi AND smax >= $sLo AND smin <= $sHi")
      .selectExpr("CAST(zb AS BIGINT)").collect().map(_.getLong(0)).sorted
    val data = spark.read.parquet(s"$storeDir/data")
    if (candidates.isEmpty) data.where("1 = 0")
    else data.where(
      s"""zb IN (${candidates.mkString(",")})
         | AND l_partkey BETWEEN $pLo AND $pHi
         | AND l_suppkey BETWEEN $sLo AND $sHi""".stripMargin)
  }
}
