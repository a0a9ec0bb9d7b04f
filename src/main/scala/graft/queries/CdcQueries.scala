package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fixtures.SyntheticCdc

/** SURVEY §2 groups A/B/C/E — scans, predicates, projections, joins, merge
  * and window operators over the synthetic CDC fixture. Each entry returns
  * a deterministic DataFrame whose rows a DuckDB oracle reproduces with
  * [[oracle]]'s SQL (same column names; driver hash-compares).
  */
object CdcQueries {

  private val cr = SyntheticCdc.changeRowsSql
  private val ltm = SyntheticCdc.lsnTimeMappingSql
  private val ocr = SyntheticCdc.ordersChangeRowsSql

  /** Composite change-index columns in order (B2). */
  private def idxCols = Seq(col("lsn_num"), col("command_id"), col("seqval_num"), col("operation"))

  // A1 ★ incremental change-table scan: composite > lower bound, <= LSN
  // ceiling, ordered, TOP(batch). Reference `sql_queries.py:218-267`. The
  // composite `>` is one struct comparison — Catalyst turns it into the
  // same seek-friendly conjunction the reference hand-builds.
  def a1ChangeScan(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .filter(struct(idxCols: _*) > struct(lit(30L).as("lsn_num"), lit(1).as("command_id"),
        lit(245L).as("seqval_num"), lit(2).as("operation")) &&
        col("lsn_num") <= 800L)
      .orderBy(idxCols.map(_.asc): _*)
      .limit(2000)
      .select(col("lsn_hex"), col("command_id"), col("seqval_num"),
        col("operation"), col("event_id"))

  val a1Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT lsn_hex, command_id, seqval_num, operation, event_id
       |FROM change_rows
       |WHERE (lsn_num > 30 OR (lsn_num = 30 AND command_id > 1)
       |       OR (lsn_num = 30 AND command_id = 1 AND seqval_num > 245)
       |       OR (lsn_num = 30 AND command_id = 1 AND seqval_num = 245 AND operation > 2))
       |  AND lsn_num <= 800
       |ORDER BY lsn_num, command_id, seqval_num, operation
       |LIMIT 2000""".stripMargin

  // A2 ★ snapshot scan: reverse keyset pagination from a key bound
  // (`sql_queries.py:270-309`).
  def a2SnapshotKeyset(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") < 1200L)
      .orderBy(col("o_orderkey").desc)
      .limit(500)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))

  val a2Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
      |FROM orders WHERE o_orderkey < 1200
      |ORDER BY o_orderkey DESC LIMIT 500""".stripMargin

  // A2 composite-key variant: the multi-column keyset WHERE builder
  // (`sql_queries.py:312-367`) — row-value `<` over (l_orderkey, l_linenumber).
  def a2CompositeKeyset(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(struct(col("l_orderkey"), col("l_linenumber")) <
        struct(lit(800L).as("l_orderkey"), lit(3).as("l_linenumber")))
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc)
      .limit(1000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val a2cSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_orderkey < 800 OR (l_orderkey = 800 AND l_linenumber < 3)
      |ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 1000""".stripMargin

  // A3 ★ max/min key probe (`sql_queries.py:148-167`).
  def a3KeyProbe(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .agg(max(col("o_orderkey")).as("max_key"), min(col("o_orderkey")).as("min_key"))

  val a3Sql: String =
    "SELECT max(o_orderkey) AS max_key, min(o_orderkey) AS min_key FROM orders"

  // B1 ★ operation filter: drop PreUpdate rows (`sql_queries.py:265`).
  def b1OperationFilter(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .filter(col("operation").isin(1, 2, 4))
      .select(col("event_id"), col("operation"), col("lsn_hex"))

  val b1Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT event_id, operation, lsn_hex FROM change_rows
       |WHERE operation IN (1, 2, 4)""".stripMargin

  // B4 ★ column projection with __-rename (`sql_queries.py:255-262`).
  def b4Projection(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .select(col("operation").as("__operation"), col("lsn_hex").as("__log_lsn"),
        col("command_id").as("__command_id"), col("seqval_hex").as("__log_seqval"),
        col("event_id"), col("user_id"), col("event_type"))

  val b4Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT operation AS "__operation", lsn_hex AS "__log_lsn",
       |       command_id AS "__command_id", seqval_hex AS "__log_seqval",
       |       event_id, user_id, event_type
       |FROM change_rows""".stripMargin

  // B5 ★ dropped-column NULL projection (`sql_queries.py:274-280`).
  def b5DroppedColumn(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), lit(null).cast("string").as("o_comment"),
        col("o_orderstatus"))

  val b5Sql: String =
    """SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_comment, o_orderstatus
      |FROM orders""".stripMargin

  // C1 ★ change ⋈ lsn_time_mapping — small dimension side broadcast
  // (reference hints FORCESEEK, `sql_queries.py:263-264`; Spark analog =
  // broadcast hash join, no shuffle of the big side).
  def c1LsnTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
    // Format ON THE DIMENSION SIDE, before the broadcast: the rendered
    // string is a function of the mapping row alone, so formatting per
    // dimension row (|mapping| = |changes|/8 here; tiny in general)
    // instead of per joined row keeps the per-row probe loop allocation-
    // free — the fix for the r2 wall-time regression, which was formatter
    // cost on every fact row, not join shape (the plan was and stays a
    // broadcast hash join with no shuffle of the fact side).
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .select(col("lsn_num"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS")
          .as("__event_time"))
    changes.join(broadcast(mapping), Seq("lsn_num"), "inner")
      .select(col("event_id"), col("__event_time"), col("operation"))
  }

  val c1Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm)
       |SELECT c.event_id,
       |       strftime(l.tran_end_time, '%Y-%m-%dT%H:%M:%S.%g') AS "__event_time",
       |       c.operation
       |FROM change_rows c JOIN lsn_time l USING (lsn_num)""".stripMargin

  // C3 ★ delete anti-application (`replayer.py:372-379`): rows surviving a
  // batch of keyed deletes = target ANTI JOIN deletes.
  def c3DeleteAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val target = spark.read.parquet(s"$dir/orders.parquet")
    val deletes = target.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"))
    target.join(deletes, Seq("o_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
  }

  val c3Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)""".stripMargin

  // C4 ★ upsert MERGE reconstructed with a full outer join + coalesce
  // (`replayer.py:387-416`): batch rows win over target rows; inserts
  // appear; untouched target rows survive.
  def c4MergeFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val target = spark.read.parquet(s"$dir/orders.parquet")
    // Synthetic upsert batch: every 5th order re-priced (update arm) plus
    // shifted new keys (insert arm); deterministic arithmetic only.
    val updates = target.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit("U").as("o_orderstatus"))
    val inserts = target.filter(col("o_orderkey") % 500 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_totalprice"), lit("N").as("o_orderstatus"))
    val batch = updates.unionByName(inserts)
    target.as("t").join(batch.as("s"), Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("s.o_totalprice"), col("t.o_totalprice")).as("o_totalprice"),
        coalesce(col("s.o_orderstatus"), col("t.o_orderstatus")).as("o_orderstatus"))
  }

  val c4Sql: String =
    """WITH batch AS (
      |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, 'N' AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 500 = 0)
      |SELECT o_orderkey,
      |       coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
      |       coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus
      |FROM orders t FULL OUTER JOIN batch s USING (o_orderkey)""".stripMargin

  // E1 ★ k-way ordered merge: union of two change streams in global
  // change-index order, with the min-ceiling barrier (`main.py:299-350`).
  // The global rank makes the merge order itself oracle-checkable; it is
  // computed with the TeraSort-style range-partitioned rank
  // ([[graft.operators.GlobalOrder]]) — NOT a single-reducer window.
  def e1GlobalMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = SyntheticCdc.changeRows(spark, dir)
      .select(lit("events").as("src"), col("lsn_hex"), col("command_id"),
        col("seqval_num"), col("operation"))
    val or = SyntheticCdc.ordersChangeRows(spark, dir)
      .select(lit("orders").as("src"), col("lsn_hex"), col("command_id"),
        col("seqval_num").cast("long").as("seqval_num"), col("operation"))
    val ceiling = 700L // common_lsn_limit barrier: min of per-table maxima
    val merged = ev.unionByName(or)
      .filter(col("lsn_hex") <= lpad(lower(hex(lit(ceiling))), 20, "0"))
    graft.operators.GlobalOrder.withGlobalRank(merged,
      Seq(col("lsn_hex"), col("command_id"), col("seqval_num"),
        col("operation"), col("src")), "global_rank")
  }

  val e1Sql: String =
    s"""WITH ev AS ($cr), oc AS ($ocr),
       |merged AS (
       |  SELECT 'events' AS src, lsn_hex, command_id, seqval_num, operation FROM ev
       |  UNION ALL
       |  SELECT 'orders' AS src, lsn_hex, command_id, CAST(seqval_num AS BIGINT), operation FROM oc)
       |SELECT src, lsn_hex, command_id, seqval_num, operation,
       |       CAST(row_number() OVER (ORDER BY lsn_hex, command_id, seqval_num, operation, src) AS BIGINT) AS global_rank
       |FROM merged
       |WHERE lsn_hex <= lpad(lower(to_hex(700)), 20, '0')""".stripMargin

  // E2 ★ top-k by change index (TakeOrderedAndProject — no global sort).
  def e2TopK(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .orderBy(idxCols.map(_.desc): _*)
      .limit(100)
      .select(col("lsn_hex"), col("command_id"), col("seqval_num"), col("operation"))

  val e2Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT lsn_hex, command_id, seqval_num, operation FROM change_rows
       |ORDER BY lsn_num DESC, command_id DESC, seqval_num DESC, operation DESC
       |LIMIT 100""".stripMargin

  // E3 ★ last-wins dedup by key (`progress_tracking.py:236-246`,
  // `replayer.py:519`): latest change per key via a ranked window.
  def e3LastWinsDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("lsn_num").desc, col("command_id").desc,
        col("seqval_num").desc, col("operation").desc)
    SyntheticCdc.changeRows(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("seqval_num").as("last_seqval"),
        col("operation").as("last_operation"))
  }

  val e3Sql: String =
    s"""WITH change_rows AS ($cr), ranked AS (
       |  SELECT user_id, seqval_num, operation,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY lsn_num DESC, command_id DESC, seqval_num DESC, operation DESC) AS rn
       |  FROM change_rows)
       |SELECT user_id, seqval_num AS last_seqval, operation AS last_operation
       |FROM ranked WHERE rn = 1""".stripMargin

  // C10 (r7) — AS-OF state reconstruction ("time travel" over the CDC
  // log): the tracked table's state at an arbitrary LSN bound — latest
  // surviving change per key at lsn <= T, keys whose latest bounded
  // change is a delete dropped. This is the point-in-time form of the
  // A7/E3 compaction fold (`progress_tracking.py:235-258`) and exactly
  // what a consumer replaying a topic "to a position" materializes
  // (the replayer's bounded apply, `replayer.py:429-533`).
  //
  // Scale shape: the bound is a plain predicate on the scan (pushed to
  // parquet row groups — at 100 TB the log is partitioned/sorted by LSN,
  // so the bound prunes files), then one window partitioned by key; no
  // global sort, no single reducer.
  private val timeTravelLsn = 60L

  def c10TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("lsn_num").desc, col("command_id").desc,
        col("seqval_num").desc, col("operation").desc)
    SyntheticCdc.changeRows(spark, dir)
      .filter(col("lsn_num") <= timeTravelLsn && col("operation") =!= 3)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("operation") =!= 1)
      .select(col("user_id"), col("event_type").as("state_event_type"),
        col("value").as("state_value"), col("seqval_num").as("as_of_seqval"))
  }

  val c10Sql: String =
    s"""WITH change_rows AS ($cr), bounded AS (
       |  SELECT * FROM change_rows
       |  WHERE lsn_num <= $timeTravelLsn AND operation <> 3),
       |ranked AS (
       |  SELECT user_id, event_type, value, seqval_num, operation,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY lsn_num DESC, command_id DESC, seqval_num DESC, operation DESC) AS rn
       |  FROM bounded)
       |SELECT user_id, event_type AS state_event_type, value AS state_value,
       |       seqval_num AS as_of_seqval
       |FROM ranked WHERE rn = 1 AND operation <> 1""".stripMargin

  // C11 (r7) — checkpoint-DELTA audit: per-key change summary between
  // two LSN bounds ("what happened between these two progress
  // positions") — counts by operation plus the first/last change of the
  // window per key. The question every incident review of a CDC
  // pipeline asks, and the per-key form of the reference's count
  // validation (`validation.py` count reconciliation, bounded).
  //
  // Scale shape: both bounds are scan predicates (file/row-group
  // pruning on an LSN-partitioned log) feeding ONE map-side-combined
  // aggregate — no window, no join.
  private val deltaLoLsn = 30L
  private val deltaHiLsn = 60L

  def c11ChangesBetween(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .filter(col("lsn_num") > deltaLoLsn && col("lsn_num") <= deltaHiLsn &&
        col("operation") =!= 3)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_changes"),
        sum(when(col("operation") === 1, 1L).otherwise(0L)).as("n_deletes"),
        sum(when(col("operation") === 2, 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("operation") === 4, 1L).otherwise(0L)).as("n_updates"),
        min(col("seqval_num")).as("first_seqval"),
        max(col("seqval_num")).as("last_seqval"))

  val c11Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes,
       |       CAST(sum(CASE WHEN operation = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       |       CAST(sum(CASE WHEN operation = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       |       CAST(sum(CASE WHEN operation = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
       |       min(seqval_num) AS first_seqval,
       |       max(seqval_num) AS last_seqval
       |FROM change_rows
       |WHERE lsn_num > $deltaLoLsn AND lsn_num <= $deltaHiLsn AND operation <> 3
       |GROUP BY user_id""".stripMargin

  // E4 ★ ordering-regression detection via lag window
  // (`validation.py:148-160`): a deterministically permuted read order
  // stands in for Kafka partition offsets.
  def e4OrderingRegressions(spark: SparkSession, dir: String): DataFrame = {
    val permuted = SyntheticCdc.changeRows(spark, dir)
      .withColumn("part", (col("event_id") % 4).cast("int"))
      .withColumn("offset", (col("event_id") * 7919) % 104729)
    val w = Window.partitionBy(col("part")).orderBy(col("offset"))
    permuted
      .withColumn("prev_seqval", lag(col("seqval_num"), 1).over(w))
      .filter(col("prev_seqval") > col("seqval_num"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("regressions"))
  }

  val e4Sql: String =
    s"""WITH change_rows AS ($cr), permuted AS (
       |  SELECT CAST(event_id % 4 AS INT) AS part,
       |         (event_id * 7919) % 104729 AS "offset", seqval_num
       |  FROM change_rows), lagged AS (
       |  SELECT part, seqval_num,
       |         lag(seqval_num) OVER (PARTITION BY part ORDER BY "offset") AS prev_seqval
       |  FROM permuted)
       |SELECT part, count(*) AS regressions FROM lagged
       |WHERE prev_seqval > seqval_num GROUP BY part""".stripMargin

  // E5 ★ offset-gap detection (`validation.py:123-127`): sum of holes in a
  // per-partition offset sequence.
  def e5OffsetGaps(spark: SparkSession, dir: String): DataFrame = {
    val sparse = SyntheticCdc.changeRows(spark, dir)
      .filter(col("event_id") % 10 < 7) // deterministic holes
      .withColumn("part", (col("event_id") % 4).cast("int"))
      .withColumn("offset", col("event_id"))
    val w = Window.partitionBy(col("part")).orderBy(col("offset"))
    sparse
      .withColumn("prev_offset", lag(col("offset"), 1).over(w))
      .groupBy(col("part"))
      .agg(sum(when(col("prev_offset").isNotNull,
        ((col("offset") - col("prev_offset")) / 4).cast("long") - 1)
        .otherwise(0L)).as("missing"))
  }

  val e5Sql: String =
    s"""WITH change_rows AS ($cr), sparse AS (
       |  SELECT CAST(event_id % 4 AS INT) AS part, event_id AS "offset"
       |  FROM change_rows WHERE event_id % 10 < 7), lagged AS (
       |  SELECT part, "offset",
       |         lag("offset") OVER (PARTITION BY part ORDER BY "offset") AS prev_offset
       |  FROM sparse)
       |SELECT part, CAST(sum(CASE WHEN prev_offset IS NOT NULL
       |       THEN ("offset" - prev_offset) // 4 - 1 ELSE 0 END) AS BIGINT) AS missing
       |FROM lagged GROUP BY part""".stripMargin

  // C7 ★ whole-relation AS-OF join (time⟷LSN generalized,
  // `sql_queries.py:128-145`): every change row picks up the LAST
  // lsn_time_mapping entry at or before its LSN. The mapping is thinned
  // (every 3rd LSN, none before 30) so matches genuinely look backward
  // across rows and buckets, and the earliest rows exercise the
  // no-match NULL path. Runs through [[graft.operators.AsOfJoin]] — the
  // bucketed carry-in plan, not a nested-loop or global sort; DuckDB
  // checks it with its native ASOF LEFT JOIN.
  def c7AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"), col("lsn_num"), col("operation"))
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .filter(col("lsn_num") % 3 === 0 && col("lsn_num") >= 30)
      .select(col("lsn_num").as("map_lsn"), col("tran_end_time"))
    graft.operators.AsOfJoin.asOf(changes, mapping,
        leftKey = "lsn_num", rightKey = "map_lsn",
        payload = Seq("map_lsn", "tran_end_time"), bucketWidth = 64L)
      .select(col("event_id"), col("lsn_num"), col("map_lsn"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("__map_time"),
        col("operation"))
  }

  val c7Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm),
       |m AS (SELECT lsn_num AS map_lsn, tran_end_time
       |      FROM lsn_time WHERE lsn_num % 3 = 0 AND lsn_num >= 30)
       |SELECT c.event_id, c.lsn_num, m.map_lsn,
       |       strftime(m.tran_end_time, '%Y-%m-%dT%H:%M:%S.%g') AS "__map_time",
       |       c.operation
       |FROM change_rows c ASOF LEFT JOIN m ON c.lsn_num >= m.map_lsn""".stripMargin

  // C16 ★ (r11) — TOLERANCE as-of join (pandas merge_asof's `tolerance`,
  // kdb's wj window bound): the backward as-of match is DISCARDED —
  // nulled, keeping the left row — when it lies farther back than the
  // tolerance. The operational guard every as-of deployment needs: a
  // stale checkpoint (here: mapping entries every 25 LSN, tolerance 10 —
  // distances 11..24 really occur, so the guard bites on this fixture)
  // silently attributing far-past state to a current row is worse than
  // an honest NULL. Same bucketed AsOfJoin plan; the tolerance is one
  // projection.
  val AsofTolerance = 10L

  def c16AsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"), col("lsn_num"), col("operation"))
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .filter(col("lsn_num") % 25 === 0)
      .select(col("lsn_num").as("map_lsn"), col("tran_end_time"))
    graft.operators.AsOfJoin.asOf(changes, mapping,
        leftKey = "lsn_num", rightKey = "map_lsn",
        payload = Seq("map_lsn"), bucketWidth = 64L)
      .selectExpr("event_id", "lsn_num",
        s"CASE WHEN lsn_num - map_lsn <= $AsofTolerance THEN map_lsn END AS map_lsn",
        s"CASE WHEN lsn_num - map_lsn <= $AsofTolerance THEN lsn_num - map_lsn END AS asof_dist",
        "operation")
  }

  val c16Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm),
       |m AS (SELECT lsn_num AS map_lsn FROM lsn_time WHERE lsn_num % 25 = 0),
       |j AS (SELECT c.event_id, c.lsn_num, m.map_lsn, c.operation
       |      FROM change_rows c ASOF LEFT JOIN m ON c.lsn_num >= m.map_lsn)
       |SELECT event_id, lsn_num,
       |       CASE WHEN lsn_num - map_lsn <= $AsofTolerance
       |            THEN map_lsn END AS map_lsn,
       |       CASE WHEN lsn_num - map_lsn <= $AsofTolerance
       |            THEN lsn_num - map_lsn END AS asof_dist,
       |       operation
       |FROM j""".stripMargin

  // C14 ★ (r11) — FORWARD as-of join: for every change row, the EARLIEST
  // mapping entry at-or-after its LSN — "which upcoming checkpoint will
  // first cover this change", the mirror of c7's "which past checkpoint
  // last preceded it" (pandas merge_asof direction='forward'). Runs
  // through [[graft.operators.AsOfJoin.asOfForward]], which reduces to
  // the backward operator on negated keys — same bucketed scale shape,
  // no new machinery. Oracle: DuckDB's native ASOF LEFT JOIN with the
  // <= comparison.
  def c14AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"), col("lsn_num"), col("operation"))
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .filter(col("lsn_num") % 3 === 0 && col("lsn_num") >= 30)
      .select(col("lsn_num").as("map_lsn"), col("tran_end_time"))
    graft.operators.AsOfJoin.asOfForward(changes, mapping,
        leftKey = "lsn_num", rightKey = "map_lsn",
        payload = Seq("map_lsn", "tran_end_time"), bucketWidth = 64L)
      .select(col("event_id"), col("lsn_num"), col("map_lsn"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("__map_time"),
        col("operation"))
  }

  val c14Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm),
       |m AS (SELECT lsn_num AS map_lsn, tran_end_time
       |      FROM lsn_time WHERE lsn_num % 3 = 0 AND lsn_num >= 30)
       |SELECT c.event_id, c.lsn_num, m.map_lsn,
       |       strftime(m.tran_end_time, '%Y-%m-%dT%H:%M:%S.%g') AS "__map_time",
       |       c.operation
       |FROM change_rows c ASOF LEFT JOIN m ON c.lsn_num <= m.map_lsn""".stripMargin

  // C15 ★ (r11) — NEAREST as-of join: for every change row, the mapping
  // entry with the smallest absolute LSN distance, ties backward (pandas
  // merge_asof direction='nearest') — "which checkpoint best anchors
  // this change", completing the as-of family (backward c7, forward c14,
  // nearest here). Composed from one backward + one forward bucketed
  // pass joined on the unique event id; the oracle composes DuckDB's two
  // native ASOF directions with the same tie rule.
  def c15AsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"), col("lsn_num"), col("operation"))
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .filter(col("lsn_num") % 3 === 0 && col("lsn_num") >= 30)
      .select(col("lsn_num").as("map_lsn"), col("tran_end_time"))
    graft.operators.AsOfJoin.asOfNearest(changes, mapping,
        leftKey = "lsn_num", rightKey = "map_lsn",
        payload = Seq("tran_end_time"), bucketWidth = 64L,
        leftId = "event_id")
      .select(col("event_id"), col("lsn_num"), col("map_lsn"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("__map_time"),
        col("operation"))
  }

  val c15Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm),
       |m AS (SELECT lsn_num AS map_lsn, tran_end_time
       |      FROM lsn_time WHERE lsn_num % 3 = 0 AND lsn_num >= 30),
       |b AS (SELECT c.event_id, c.lsn_num, c.operation, m.map_lsn, m.tran_end_time
       |      FROM change_rows c ASOF LEFT JOIN m ON c.lsn_num >= m.map_lsn),
       |f AS (SELECT c.event_id, m.map_lsn, m.tran_end_time
       |      FROM change_rows c ASOF LEFT JOIN m ON c.lsn_num <= m.map_lsn)
       |SELECT b.event_id, b.lsn_num,
       |       CASE WHEN b.map_lsn IS NOT NULL AND (f.map_lsn IS NULL
       |                  OR (b.lsn_num - b.map_lsn) <= (f.map_lsn - b.lsn_num))
       |            THEN b.map_lsn ELSE f.map_lsn END AS map_lsn,
       |       strftime(CASE WHEN b.map_lsn IS NOT NULL AND (f.map_lsn IS NULL
       |                  OR (b.lsn_num - b.map_lsn) <= (f.map_lsn - b.lsn_num))
       |            THEN b.tran_end_time ELSE f.tran_end_time END,
       |            '%Y-%m-%dT%H:%M:%S.%g') AS "__map_time",
       |       b.operation
       |FROM b JOIN f ON b.event_id = f.event_id""".stripMargin

  // C8 ★ range (point-in-interval) join: audit which "LSN hot windows"
  // (overlapping intervals derived from sparse orders keys) each change
  // row falls into, aggregated per window. Overlapping intervals mean a
  // point can hit several windows — the shape AsOfJoin cannot express.
  // Runs through [[graft.operators.RangeJoin]]: interval bucketing makes
  // the join EQUI (hash-partitioned) with containment as a residual
  // filter; the naive inequality join would be a nested loop. The oracle
  // is the naive inequality join — fine at oracle scale, and exactly the
  // semantics the bucketed plan must reproduce.
  def c8RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val points = SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"))
    val intervals = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("interval_id"),
        (col("o_orderkey") * 4).as("lo"),
        (col("o_orderkey") * 4 + 300).as("hi"))
    graft.operators.RangeJoin.pointInInterval(points, intervals,
        pointKey = "event_id", lo = "lo", hi = "hi", bucketWidth = 256L)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_points"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
  }

  val c8Sql: String =
    s"""WITH change_rows AS ($cr),
       |iv AS (SELECT o_orderkey AS interval_id, o_orderkey * 4 AS lo,
       |              o_orderkey * 4 + 300 AS hi
       |       FROM orders WHERE o_orderkey % 97 = 0)
       |SELECT iv.interval_id, count(*) AS n_points,
       |       min(c.event_id) AS min_event, max(c.event_id) AS max_event
       |FROM change_rows c JOIN iv
       |  ON c.event_id >= iv.lo AND c.event_id < iv.hi
       |GROUP BY iv.interval_id""".stripMargin

  // C9 ★ interval-overlap join: "LSN hot windows" (orders-derived, as C8)
  // against lineitem-derived "maintenance windows" — which audit windows
  // collide with which maintenance spans, counted per audit window. The
  // validity-overlap join every temporal system needs; Spark's naive plan
  // is a nested loop. [[graft.operators.RangeJoin.intervalOverlap]]
  // buckets BOTH interval sets and dedups by the overlap-start bucket.
  def c9IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val audits = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("audit_id"),
        (col("o_orderkey") * 4).as("a_lo"),
        (col("o_orderkey") * 4 + 300).as("a_hi"))
    val maint = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey")).distinct()
      .filter(col("l_orderkey") % 89 === 0)
      .select(col("l_orderkey").as("maint_id"),
        (col("l_orderkey") * 3).as("m_lo"),
        (col("l_orderkey") * 3 + 500).as("m_hi"))
    graft.operators.RangeJoin.intervalOverlap(audits, maint,
        llo = "a_lo", lhi = "a_hi", rlo = "m_lo", rhi = "m_hi",
        bucketWidth = 512L)
      .groupBy(col("audit_id"))
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("maint_id")).as("first_maint"),
        max(col("maint_id")).as("last_maint"))
  }

  val c9Sql: String =
    """WITH audits AS (
      |  SELECT o_orderkey AS audit_id, o_orderkey * 4 AS a_lo,
      |         o_orderkey * 4 + 300 AS a_hi
      |  FROM orders WHERE o_orderkey % 97 = 0),
      |maint AS (
      |  SELECT l_orderkey AS maint_id, l_orderkey * 3 AS m_lo,
      |         l_orderkey * 3 + 500 AS m_hi
      |  FROM (SELECT DISTINCT l_orderkey FROM lineitem)
      |  WHERE l_orderkey % 89 = 0)
      |SELECT a.audit_id, count(*) AS n_overlaps,
      |       min(m.maint_id) AS first_maint, max(m.maint_id) AS last_maint
      |FROM audits a JOIN maint m
      |  ON a.a_lo < m.m_hi AND m.m_lo < a.a_hi
      |GROUP BY a.audit_id""".stripMargin

  // E9 ★ gap-based sessionization: split each user's event stream into
  // sessions wherever the inter-event gap exceeds 20,000 s, and profile
  // each session. The canonical behavioral-analytics window op (and the
  // batch analog of Structured Streaming's `session_window`). Shape: two
  // windows + one aggregate, ALL partitioned by user_id — high
  // cardinality ⇒ fully parallel, no global stage. Time axis is integer
  // MICROSECONDS on both engines (`unix_micros` ↔ `epoch_us`) — the
  // proven parity path for this nanos-typed column; session boundaries,
  // ids, and durations are all integer arithmetic.
  def e9Sessionize(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH e AS (
        |  SELECT user_id, event_id, unix_micros(ts) AS t_us FROM events_t),
        |gaps AS (
        |  SELECT user_id, event_id, t_us,
        |         CASE WHEN lag(t_us) OVER w IS NULL
        |                OR t_us - lag(t_us) OVER w > 20000000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, t_us,
        |         sum(new_session) OVER (PARTITION BY user_id
        |           ORDER BY t_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM gaps)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       count(*) AS events,
        |       CAST((max(t_us) - min(t_us)) div 1000 AS BIGINT) AS duration_ms,
        |       min(event_id) AS first_event, max(event_id) AS last_event
        |FROM sess GROUP BY user_id, session_id""".stripMargin)
  }

  val e9Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
      |gaps AS (
      |  SELECT user_id, event_id, t_us,
      |         CASE WHEN lag(t_us) OVER w IS NULL
      |                OR t_us - lag(t_us) OVER w > 20000000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      |sess AS (
      |  SELECT user_id, event_id, t_us,
      |         sum(new_session) OVER (PARTITION BY user_id
      |           ORDER BY t_us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM gaps)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS events,
      |       CAST((max(t_us) - min(t_us)) // 1000 AS BIGINT) AS duration_ms,
      |       min(event_id) AS first_event, max(event_id) AS last_event
      |FROM sess GROUP BY user_id, session_id""".stripMargin

  // E10 ★ strict ordered funnel over the event stream: signup → first
  // view AFTER the signup → first purchase AFTER that view, per user —
  // the canonical behavioral conversion analysis (and an ordered-
  // sequence pattern SQL gets wrong without the stage-anchored joins:
  // min(purchase) alone would count purchases that happened before the
  // user ever viewed). Times ride the proven integer-microsecond axis
  // (unix_micros ↔ epoch_us, the e9 parity path). Shape: three
  // map-side-combined per-user MIN aggregates chained by equi-joins on
  // user_id (each with a one-sided time residual) — high-cardinality
  // keys, no windows, no all-pairs; users: 150 at sf0.01, millions at
  // production, all parallel.
  def e10Funnel(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, unix_micros(ts) AS t FROM events_t),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.t > s1.t1
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.t) AS t3
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.t > s2.t2
        |       GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t1 AS signup_us, s2.t2 AS first_view_us,
        |       s3.t3 AS first_purchase_us,
        |       CASE WHEN s3.t3 IS NOT NULL THEN 3
        |            WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage_reached,
        |       CASE WHEN s3.t3 IS NOT NULL
        |            THEN CAST((s3.t3 - s1.t1) div 1000 AS BIGINT) END AS ms_to_convert
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin)
  }

  val e10Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |s1 AS (SELECT user_id, min(t) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.t) AS t2
      |       FROM e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'view' AND e.t > s1.t1
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.t) AS t3
      |       FROM e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.t > s2.t2
      |       GROUP BY e.user_id)
      |SELECT s1.user_id, s1.t1 AS signup_us, s2.t2 AS first_view_us,
      |       s3.t3 AS first_purchase_us,
      |       CASE WHEN s3.t3 IS NOT NULL THEN 3
      |            WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage_reached,
      |       CASE WHEN s3.t3 IS NOT NULL
      |            THEN CAST((s3.t3 - s1.t1) // 1000 AS BIGINT) END AS ms_to_convert
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin

  // E11 ★ weekly cohort retention: users grouped by first-seen week, the
  // classic "of the week-w cohort, how many came back in week w+k"
  // triangle every growth/engagement report is built from. Integer
  // microsecond axis; week index = t div 604800e6 relative to the
  // corpus epoch — all integer arithmetic, both engines bit-equal.
  // Shape: one per-user MIN (first seen), one distinct (user, week)
  // reduction, one equi-join on user_id, one (cohort, offset) count —
  // every stage map-side-combined on high-cardinality or bounded keys.
  def e11Retention(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH e AS (
        |  SELECT user_id, unix_micros(ts) div 604800000000 AS wk FROM events_t),
        |epoch0 AS (SELECT min(wk) AS w0 FROM e),
        |firsts AS (SELECT user_id, min(wk) AS first_wk FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT CAST(f.first_wk - x.w0 AS BIGINT) AS cohort_week,
        |       CAST(a.wk - f.first_wk AS BIGINT) AS week_offset,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
        |FROM active a JOIN firsts f ON a.user_id = f.user_id
        |CROSS JOIN epoch0 x
        |GROUP BY f.first_wk - x.w0, a.wk - f.first_wk""".stripMargin)
  }

  val e11Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
      |epoch0 AS (SELECT min(wk) AS w0 FROM e),
      |firsts AS (SELECT user_id, min(wk) AS first_wk FROM e GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT CAST(f.first_wk - x.w0 AS BIGINT) AS cohort_week,
      |       CAST(a.wk - f.first_wk AS BIGINT) AS week_offset,
      |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
      |FROM active a JOIN firsts f ON a.user_id = f.user_id
      |CROSS JOIN epoch0 x
      |GROUP BY f.first_wk - x.w0, a.wk - f.first_wk""".stripMargin

  // C12 (r11) ★ SCD Type-2 history build: fold the CDC change log into a
  // slowly-changing-dimension version table — the canonical "turn a change
  // stream into a queryable history" materialization every warehouse
  // downstream of the reference's topics builds (the reference emits the
  // stream, `parsed_row.py`'s operation alphabet; SCD2 is its table form).
  // Per business key (user_id): after-image changes (Insert=2,
  // PostUpdate=4) open versions; ANY next event on the key — including a
  // Delete=1 — closes the previous one. Validity rides BOTH coordinates:
  // the transaction axis (lsn) and the strict per-change axis (seqval,
  // unique ⇒ tie-free versioning within a transaction).
  // Shape: ONE repartition-by-key + in-partition sort (the single window
  // lead()), no self-join, no all-pairs — at 100 TB this is exactly one
  // shuffle of the change log keyed by the dimension key; key cardinality
  // is users (high), so all reducers parallel.
  // Shared builder: graft.tools.Scd2Maintain.build — the incremental
  // maintenance tool applies new change batches to this exact shape.
  def c12Scd2(spark: SparkSession, dir: String): DataFrame =
    graft.tools.Scd2Maintain.build(SyntheticCdc.changeRows(spark, dir))

  val c12Sql: String =
    s"""WITH change_rows AS ($cr), ev AS (
       |  SELECT user_id, seqval_num, lsn_num, operation, event_type, value
       |  FROM change_rows WHERE operation IN (1, 2, 4)),
       |led AS (
       |  SELECT user_id, seqval_num, lsn_num, operation, event_type, value,
       |         lead(seqval_num) OVER w AS next_seq,
       |         lead(lsn_num) OVER w AS next_lsn,
       |         lead(operation) OVER w AS next_op
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY seqval_num))
       |SELECT user_id, seqval_num AS version_seq, event_type, value,
       |       lsn_num AS valid_from_lsn, next_lsn AS valid_to_lsn,
       |       next_seq AS valid_to_seq,
       |       coalesce(next_op = 1, FALSE) AS closed_by_delete,
       |       (next_seq IS NULL) AS is_current
       |FROM led WHERE operation <> 1""".stripMargin

  // C13 (r11) ★ point-in-time (PIT) probe join against the C12 history:
  // "what did each user's row look like at time T" — the lookup shape
  // every feature-store / training-label join uses (probe at label time
  // against the dimension history, never at read time). Probes: each
  // user at the 25/50/75% marks of the strict seqval axis (deterministic,
  // corpus-derived). Matching version: valid_from_seq <= t < valid_to_seq
  // (open versions unbounded above); a probe landing in a post-delete gap
  // or before first insert finds no row — inner join drops it, exactly
  // the "key did not exist at T" semantics.
  // Shape: equi-join on user_id with a range residual — per-key version
  // chains are bounded by that key's change count, so reducers stay
  // balanced; the 1-row max-seq scalar broadcasts. No all-pairs anywhere.
  def c13PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val versions = c12Scd2(spark, dir)
      .select(col("user_id"), col("version_seq"), col("event_type"),
        col("value"), col("valid_to_seq"))
    val changes = SyntheticCdc.changeRows(spark, dir)
    val maxSeq = changes.agg(max(col("seqval_num")).as("max_seq"))
    val probes = changes.select(col("user_id")).distinct()
      .crossJoin(broadcast(maxSeq))
      .withColumn("q", explode(array(lit(1L), lit(2L), lit(3L))))
      .select(col("user_id"),
        expr("CAST(q * max_seq div 4 AS BIGINT)").as("as_of_seq"))
    probes.join(versions,
        probes("user_id") === versions("user_id") &&
          versions("version_seq") <= probes("as_of_seq") &&
          (versions("valid_to_seq").isNull ||
            versions("valid_to_seq") > probes("as_of_seq")))
      .select(probes("user_id"), col("as_of_seq"), col("version_seq"),
        col("event_type"), col("value"))
  }

  val c13Sql: String =
    s"""WITH change_rows AS ($cr), ev AS (
       |  SELECT user_id, seqval_num, lsn_num, operation, event_type, value
       |  FROM change_rows WHERE operation IN (1, 2, 4)),
       |led AS (
       |  SELECT user_id, seqval_num, operation, event_type, value,
       |         lead(seqval_num) OVER w AS next_seq
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY seqval_num)),
       |versions AS (
       |  SELECT user_id, seqval_num AS version_seq, event_type, value,
       |         next_seq AS valid_to_seq
       |  FROM led WHERE operation <> 1),
       |mx AS (SELECT max(seqval_num) AS max_seq FROM change_rows),
       |probes AS (
       |  SELECT u.user_id,
       |         CAST(q.q * mx.max_seq // 4 AS BIGINT) AS as_of_seq
       |  FROM (SELECT DISTINCT user_id FROM change_rows) u
       |  CROSS JOIN mx
       |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS q) q)
       |SELECT p.user_id, p.as_of_seq, v.version_seq, v.event_type, v.value
       |FROM probes p JOIN versions v
       |  ON p.user_id = v.user_id
       | AND v.version_seq <= p.as_of_seq
       | AND (v.valid_to_seq IS NULL OR v.valid_to_seq > p.as_of_seq)""".stripMargin

  // E12 ★ (r11) — rate-anomaly detection over the event stream: per
  // (event_type, hour), flag buckets whose arrival rate spikes above the
  // trailing 3-bucket baseline — the monitoring question ("is this feed
  // suddenly hot?") every CDC operator alerts on. Integer micro-unit
  // ratio (n·1e6·baseline_buckets div baseline_sum) — no float averaging,
  // both engines bit-equal; the first buckets of each series (empty
  // baseline) emit NULL ratio rather than a fake signal.
  // Shape: aggregate FIRST (one map-side-combined (type, bucket) count),
  // THEN window over the aggregated series — the window's partition is
  // the event type and its length is the time span in hours, never the
  // raw event count; at 100 TB the windowed relation is already tiny.
  def e12RateAnomaly(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH buckets AS (
        |  SELECT event_type, unix_micros(ts) div 3600000000 AS hr,
        |         count(*) AS n
        |  FROM events_t GROUP BY event_type, unix_micros(ts) div 3600000000),
        |based AS (
        |  SELECT event_type, hr, n,
        |         sum(n) OVER w AS base_sum,
        |         count(n) OVER w AS base_cnt
        |  FROM buckets
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hr, n,
        |       CAST(coalesce(base_sum, 0) AS BIGINT) AS base_sum,
        |       CAST(base_cnt AS BIGINT) AS base_cnt,
        |       CASE WHEN base_sum > 0
        |            THEN CAST(n * 1000000 * base_cnt div base_sum AS BIGINT)
        |       END AS spike_ratio_micro,
        |       coalesce(n * 1000000 * base_cnt div base_sum > 2000000, false)
        |         AS is_spike
        |FROM based""".stripMargin)
  }

  val e12Sql: String =
    """WITH buckets AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |         count(*) AS n
      |  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000),
      |based AS (
      |  SELECT event_type, hr, n,
      |         sum(n) OVER w AS base_sum,
      |         count(n) OVER w AS base_cnt
      |  FROM buckets
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hr, n,
      |       CAST(coalesce(base_sum, 0) AS BIGINT) AS base_sum,
      |       CAST(base_cnt AS BIGINT) AS base_cnt,
      |       CASE WHEN base_sum > 0
      |            THEN CAST(n * 1000000 * base_cnt // base_sum AS BIGINT)
      |       END AS spike_ratio_micro,
      |       coalesce(n * 1000000 * base_cnt // base_sum > 2000000, false)
      |         AS is_spike
      |FROM based""".stripMargin

  // E13 ★ (r11) — behavioral SEQUENCE mining: the per-user event-type
  // transition matrix (first-order Markov counts) plus the transition
  // probability in integer micro-units — "after a view, what do users do
  // next?" — the model behind next-action prediction, funnel design, and
  // bot detection (impossible transition rates). Self-loops kept: their
  // rate is the repetition signal.
  // Shape: ONE window (lag) partitioned by user_id — high-cardinality
  // key, parallel — then one map-side-combined (from, to) count; the
  // matrix is |event_types|² rows regardless of corpus size. The strict
  // (ts, event_id) composite order makes the sequence engine-unambiguous.
  def e13Transitions(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY unix_micros(ts), event_id) AS prev_type
        |  FROM events_t),
        |pairs AS (
        |  SELECT prev_type AS from_type, event_type AS to_type,
        |         count(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type),
        |outs AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS out_total
        |  FROM pairs GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n,
        |       o.out_total,
        |       CAST(p.n * 1000000 div o.out_total AS BIGINT) AS p_micro
        |FROM pairs p JOIN outs o ON p.from_type = o.from_type""".stripMargin)
  }

  val e13Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events),
      |pairs AS (
      |  SELECT prev_type AS from_type, event_type AS to_type,
      |         count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, event_type),
      |outs AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS out_total
      |  FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, p.n,
      |       o.out_total,
      |       CAST(p.n * 1000000 // o.out_total AS BIGINT) AS p_micro
      |FROM pairs p JOIN outs o ON p.from_type = o.from_type""".stripMargin

  // E14 ★ (r11) — RFM segmentation: per-user Recency (hours since last
  // event, against the corpus ceiling), Frequency (event count), and
  // Monetary (Σ value in integer micro-units — round(value·1e6) per row,
  // the emb_pq_encode micro-unit discipline, so the sum is an exact
  // BIGINT, never a float accumulation) → 1-5 scores by equal-width
  // integer buckets against the corpus maxima (the quantile-bucket
  // variant needs a distribution pass; equal-width is the
  // scale-degenerate form — one aggregate, zero extra shuffles) and the
  // classic RFM segment code. The behavioral-segmentation report every
  // growth team keys campaigns on.
  // Shape: ONE map-side-combined per-user aggregate + a 1-row corpus
  // maxima broadcast; output is one row per user, all integers.
  def e14Rfm(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH per_user AS (
        |  SELECT user_id,
        |         max(unix_micros(ts)) AS last_us,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |           AS monetary_micro
        |  FROM events_t GROUP BY user_id),
        |tops AS (
        |  SELECT max(last_us) AS ceil_us, max(frequency) AS max_f,
        |         max(monetary_micro) AS max_m
        |  FROM per_user),
        |scored AS (
        |  SELECT u.user_id,
        |         CAST((t.ceil_us - u.last_us) div 3600000000 AS BIGINT)
        |           AS recency_hours,
        |         u.frequency, u.monetary_micro,
        |         CAST(5 - least(CAST(4 AS BIGINT),
        |           (t.ceil_us - u.last_us) div 3600000000 * 5
        |             div (greatest((t.ceil_us - (SELECT min(last_us) FROM per_user))
        |                  div 3600000000, CAST(1 AS BIGINT)) + 1)) AS INT) AS r_score,
        |         CAST(1 + least(CAST(4 AS BIGINT),
        |           u.frequency * 5 div (t.max_f + 1)) AS INT) AS f_score,
        |         CAST(1 + least(CAST(4 AS BIGINT),
        |           u.monetary_micro * 5 div (t.max_m + 1)) AS INT) AS m_score
        |  FROM per_user u CROSS JOIN tops t)
        |SELECT user_id, recency_hours, frequency, monetary_micro,
        |       r_score, f_score, m_score,
        |       r_score * 100 + f_score * 10 + m_score AS rfm_segment
        |FROM scored""".stripMargin)
  }

  val e14Sql: String =
    """WITH per_user AS (
      |  SELECT user_id,
      |         max(epoch_us(ts)) AS last_us,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
      |           AS monetary_micro
      |  FROM events GROUP BY user_id),
      |tops AS (
      |  SELECT max(last_us) AS ceil_us, max(frequency) AS max_f,
      |         max(monetary_micro) AS max_m
      |  FROM per_user),
      |scored AS (
      |  SELECT u.user_id,
      |         CAST((t.ceil_us - u.last_us) // 3600000000 AS BIGINT)
      |           AS recency_hours,
      |         u.frequency, u.monetary_micro,
      |         CAST(5 - least(CAST(4 AS BIGINT),
      |           (t.ceil_us - u.last_us) // 3600000000 * 5
      |             // (greatest((t.ceil_us - (SELECT min(last_us) FROM per_user))
      |                  // 3600000000, CAST(1 AS BIGINT)) + 1)) AS INT) AS r_score,
      |         CAST(1 + least(CAST(4 AS BIGINT),
      |           u.frequency * 5 // (t.max_f + 1)) AS INT) AS f_score,
      |         CAST(1 + least(CAST(4 AS BIGINT),
      |           u.monetary_micro * 5 // (t.max_m + 1)) AS INT) AS m_score
      |  FROM per_user u CROSS JOIN tops t)
      |SELECT user_id, recency_hours, frequency, monetary_micro,
      |       r_score, f_score, m_score,
      |       r_score * 100 + f_score * 10 + m_score AS rfm_segment
      |FROM scored""".stripMargin

  // E15 ★ (r11) — multi-touch ATTRIBUTION: for every purchase, the
  // first and last marketing touch (click / view / signup) that preceded
  // it in the user's event history, then the (first_touch, last_touch)
  // attribution report with purchase counts, revenue (integer cents —
  // round(value·100) per row, so the sum is an exact BIGINT) and distinct
  // buyers; purchases with no prior touch attribute to 'organic'. The
  // report every growth/ads pipeline keys spend decisions on, and the
  // IGNORE NULLS running first/last window exercise the catalog lacked.
  //
  // Scale shape: ONE window pass partitioned by user (user histories are
  // bounded; no global sort) + a map-side-combined 16-row aggregate.
  // Ties broken by (ts, event_id) — total order, engine-identical.
  def e15Attribution(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
        |         last(CASE WHEN event_type IN ('click','view','signup')
        |                   THEN event_type END) IGNORE NULLS
        |           OVER (PARTITION BY user_id ORDER BY unix_micros(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_touch,
        |         first(CASE WHEN event_type IN ('click','view','signup')
        |                    THEN event_type END) IGNORE NULLS
        |           OVER (PARTITION BY user_id ORDER BY unix_micros(ts), event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS first_touch
        |  FROM events_t)
        |SELECT coalesce(first_touch, 'organic') AS first_touch,
        |       coalesce(last_touch, 'organic') AS last_touch,
        |       CAST(count(*) AS BIGINT) AS purchases,
        |       CAST(sum(value_cents) AS BIGINT) AS revenue_cents,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM seq WHERE event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin)
  }

  val e15Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
      |         last_value(CASE WHEN event_type IN ('click','view','signup')
      |                         THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS last_touch,
      |         first_value(CASE WHEN event_type IN ('click','view','signup')
      |                          THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS first_touch
      |  FROM events)
      |SELECT coalesce(first_touch, 'organic') AS first_touch,
      |       coalesce(last_touch, 'organic') AS last_touch,
      |       CAST(count(*) AS BIGINT) AS purchases,
      |       CAST(sum(value_cents) AS BIGINT) AS revenue_cents,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |FROM seq WHERE event_type = 'purchase'
      |GROUP BY 1, 2""".stripMargin

  // E16 ★ (r11) — behavioral PATH mining: the top-20 length-3 event-type
  // paths across all user histories, with each path's share of all
  // length-3 windows in integer micro-units. e13's Markov matrix answers
  // "what follows X"; paths answer "what JOURNEYS dominate" — the
  // sequence-level view funnel design and anomaly triage start from
  // (PrefixSpan's k=3 slice, which at this depth is exactly expressible
  // as two stacked lags — no candidate generation needed).
  //
  // Scale shape: one window pass partitioned by user (two lag() reads of
  // the same ordered frame — Spark evaluates both in a single Window
  // operator), a map-side-combined ≤|types|³ aggregate, and a top-20.
  // Ties total-ordered by the path itself so the cut is deterministic.
  def e16PathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH seq AS (
        |  SELECT user_id, event_type AS step3,
        |         lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY unix_micros(ts), event_id) AS step2,
        |         lag(event_type, 2) OVER (PARTITION BY user_id
        |           ORDER BY unix_micros(ts), event_id) AS step1
        |  FROM events_t),
        |paths AS (
        |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE step1 IS NOT NULL
        |  GROUP BY step1, step2, step3),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
        |SELECT p.step1, p.step2, p.step3, p.n,
        |       CAST(p.n * 1000000 div t.total AS BIGINT) AS share_micro
        |FROM paths p CROSS JOIN tot t
        |ORDER BY p.n DESC, p.step1, p.step2, p.step3 LIMIT 20""".stripMargin)
  }

  val e16Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS step3,
      |         lag(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS step2,
      |         lag(event_type, 2) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS step1
      |  FROM events),
      |paths AS (
      |  SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE step1 IS NOT NULL
      |  GROUP BY step1, step2, step3),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
      |SELECT p.step1, p.step2, p.step3, p.n,
      |       CAST(p.n * 1000000 // t.total AS BIGINT) AS share_micro
      |FROM paths p CROSS JOIN tot t
      |ORDER BY p.n DESC, p.step1, p.step2, p.step3 LIMIT 20""".stripMargin

  // ── e18_sliding_window ★ (r12) — RANGE-frame sliding aggregation:
  // each user's peak 7-CALENDAR-DAY activity burst. The frame is RANGE
  // BETWEEN 6 PRECEDING AND CURRENT ROW over the integer day index —
  // on SPARSE per-user series this is semantically different from the
  // ROWS frames the rest of the catalog uses: RANGE spans the calendar
  // (gaps shrink the window's row count), ROWS would span 7 *active*
  // days regardless of gaps. The burst-detection / rate-limiting
  // primitive every engagement pipeline ships; ties break toward the
  // earliest peak day. Engine-exact: integer day floor-divisions,
  // BIGINT sums, and a deterministic per-user rank.
  //
  // Scale shape (100 TB): the day series is ONE map-side-combined
  // (user, day) count — the corpus collapses before any window; both
  // windows are PARTITION BY user_id (parallel, bounded by a user's
  // active-day count); the peak pick is a per-user rank, not a sort.
  private def e18Body(idiv: String, usExpr: String, table: String): String =
    s"""bounds AS (SELECT min($usExpr) AS t0 FROM $table),
       |days AS (
       |  SELECT user_id,
       |         CAST(($usExpr - b.t0) $idiv 86400000000 AS BIGINT) AS day,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $table CROSS JOIN bounds b
       |  GROUP BY user_id, ($usExpr - b.t0) $idiv 86400000000),
       |slid AS (
       |  SELECT user_id, day, c,
       |         CAST(sum(c) OVER (PARTITION BY user_id ORDER BY day
       |           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
       |           AS w7
       |  FROM days),
       |ranked AS (
       |  SELECT user_id, day, w7,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY w7 DESC, day) AS rk,
       |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
       |           AS n_days_active
       |  FROM slid)
       |SELECT user_id, n_days_active, day AS peak_end_day, w7 AS peak_7d
       |FROM ranked WHERE rk = 1""".stripMargin

  def e18SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql("WITH " + e18Body("div", "unix_micros(ts)", "events_t"))
  }

  val e18Sql: String =
    "WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),\n" +
      e18Body("//", "us", "ev")

  // ── e17_lifecycle ★ (r11) — growth accounting: per calendar week,
  // how many users are NEW (first-ever activity), RETAINED (also active
  // the immediately preceding week), RESURRECTED (active after a gap),
  // and CHURNED (active last week, silent this week) — the canonical
  // product-analytics ledger whose identity
  // active_w = new_w + retained_w + resurrected_w (and
  // churned_{w+1} = active_w − retained_{w+1}) downstream dashboards
  // reconcile against. All integer week buckets; churn is emitted only
  // up to the last observed week (no phantom churn past the horizon).
  //
  // Scale shape (100 TB): one (user, week) distinct, one user-
  // partitioned lag/lead window, one ≤weeks×4-row final agg. The only
  // scalars (epoch, horizon) ride broadcasts.
  /** private[graft]: LifecycleSpec drives the same body over crafted
    * (user, week) layouts — the fixture's users never lapse, so the
    * churned/resurrected branches are only reachable in the spec. */
  private[graft] def lifecycleBody(idiv: String): String =
    s"""epoch0 AS (SELECT min(wk) AS w0 FROM e),
       |horizon AS (SELECT max(wk) AS mw FROM e),
       |active AS (SELECT DISTINCT user_id, wk FROM e),
       |hist AS (
       |  SELECT user_id, wk,
       |         min(wk) OVER (PARTITION BY user_id) AS first_wk,
       |         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
       |         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
       |  FROM active),
       |states AS (
       |  SELECT user_id, wk,
       |         CASE WHEN wk = first_wk THEN 'new'
       |              WHEN prev_wk = wk - 1 THEN 'retained'
       |              ELSE 'resurrected' END AS state
       |  FROM hist
       |  UNION ALL
       |  SELECT h.user_id, h.wk + 1 AS wk, 'churned' AS state
       |  FROM hist h CROSS JOIN horizon m
       |  WHERE (h.next_wk IS NULL OR h.next_wk > h.wk + 1)
       |    AND h.wk + 1 <= m.mw)
       |SELECT CAST(s.wk - x.w0 AS BIGINT) AS week, s.state,
       |       CAST(count(*) AS BIGINT) AS users
       |FROM states s CROSS JOIN epoch0 x
       |GROUP BY s.wk - x.w0, s.state""".stripMargin

  def e17Lifecycle(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      s"""WITH e AS (
         |  SELECT user_id, unix_micros(ts) div 604800000000 AS wk
         |  FROM events_t),
         |${lifecycleBody("div")}""".stripMargin)
  }

  val e17Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
       |${lifecycleBody("//")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e18_sliding_window" -> (e18SlidingWindow _),
    "e17_lifecycle" -> (e17Lifecycle _),
    "e16_path_trigrams" -> (e16PathTrigrams _),
    "e15_attribution" -> (e15Attribution _),
    "e14_rfm" -> (e14Rfm _),
    "e13_transitions" -> (e13Transitions _),
    "e12_rate_anomaly" -> (e12RateAnomaly _),
    "c12_scd2" -> (c12Scd2 _),
    "c13_point_in_time" -> (c13PointInTime _),
    "e11_retention" -> (e11Retention _),
    "e10_funnel" -> (e10Funnel _),
    "a1_change_scan" -> (a1ChangeScan _),
    "c7_asof_join" -> (c7AsofJoin _),
    "c14_asof_forward" -> (c14AsofForward _),
    "c15_asof_nearest" -> (c15AsofNearest _),
    "c16_asof_tolerance" -> (c16AsofTolerance _),
    "c8_range_join" -> (c8RangeJoin _),
    "c9_interval_overlap" -> (c9IntervalOverlap _),
    "e9_sessionize" -> (e9Sessionize _),
    "a2_snapshot_keyset" -> (a2SnapshotKeyset _),
    "a2_composite_keyset" -> (a2CompositeKeyset _),
    "a3_key_probe" -> (a3KeyProbe _),
    "b1_operation_filter" -> (b1OperationFilter _),
    "b4_projection" -> (b4Projection _),
    "b5_dropped_column" -> (b5DroppedColumn _),
    "c1_lsn_time_join" -> (c1LsnTimeJoin _),
    "c3_delete_anti_join" -> (c3DeleteAntiJoin _),
    "c4_merge_full_outer" -> (c4MergeFullOuter _),
    "e1_global_merge" -> (e1GlobalMerge _),
    "e2_topk" -> (e2TopK _),
    "e3_last_wins_dedup" -> (e3LastWinsDedup _),
    "c10_time_travel" -> (c10TimeTravel _),
    "c11_changes_between" -> (c11ChangesBetween _),
    "e4_ordering_regressions" -> (e4OrderingRegressions _),
    "e5_offset_gaps" -> (e5OffsetGaps _))

  val oracle: Map[String, String] = Map(
    "e18_sliding_window" -> e18Sql,
    "e17_lifecycle" -> e17Sql,
    "e16_path_trigrams" -> e16Sql,
    "e15_attribution" -> e15Sql,
    "e14_rfm" -> e14Sql,
    "e13_transitions" -> e13Sql,
    "e12_rate_anomaly" -> e12Sql,
    "c12_scd2" -> c12Sql,
    "c13_point_in_time" -> c13Sql,
    "e11_retention" -> e11Sql,
    "e10_funnel" -> e10Sql,
    "a1_change_scan" -> a1Sql,
    "c7_asof_join" -> c7Sql,
    "c14_asof_forward" -> c14Sql,
    "c15_asof_nearest" -> c15Sql,
    "c16_asof_tolerance" -> c16Sql,
    "c8_range_join" -> c8Sql,
    "c9_interval_overlap" -> c9Sql,
    "e9_sessionize" -> e9Sql,
    "a2_snapshot_keyset" -> a2Sql,
    "a2_composite_keyset" -> a2cSql,
    "a3_key_probe" -> a3Sql,
    "b1_operation_filter" -> b1Sql,
    "b4_projection" -> b4Sql,
    "b5_dropped_column" -> b5Sql,
    "c1_lsn_time_join" -> c1Sql,
    "c3_delete_anti_join" -> c3Sql,
    "c4_merge_full_outer" -> c4Sql,
    "e1_global_merge" -> e1Sql,
    "e2_topk" -> e2Sql,
    "e3_last_wins_dedup" -> e3Sql,
    "c10_time_travel" -> c10Sql,
    "c11_changes_between" -> c11Sql,
    "e4_ordering_regressions" -> e4Sql,
    "e5_offset_gaps" -> e5Sql)
}
