package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.SyntheticCdc

/** SURVEY §2 group D — the aggregation inventory (count-by-operation,
  * bounded counts, keyed range counts, schema checksums, rates, the topic
  * summary multi-aggregate, and the max_by snapshot-history fold). All
  * map-side-combinable `groupBy().agg()` plans — partial aggregation
  * before the shuffle is what keeps these linear at 100 TB.
  */
object AggQueries {

  private val cr = SyntheticCdc.changeRowsSql

  // D1 ★ count by operation below a change-index ceiling
  // (`sql_queries.py:170-192`).
  def d1CountByOperation(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .filter(col("lsn_num") <= 400L)
      .groupBy(col("operation"))
      .agg(count(lit(1)).as("cnt"))

  val d1Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT operation, count(*) AS cnt FROM change_rows
       |WHERE lsn_num <= 400 GROUP BY operation""".stripMargin

  // D2 ★ bounded existence/size probe: COUNT over TOP(n)
  // (`sql_queries.py:136-145`).
  def d2BoundedCount(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .limit(5000)
      .agg(count(lit(1)).as("cnt"))

  val d2Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT count(*) AS cnt FROM (SELECT * FROM change_rows LIMIT 5000)""".stripMargin

  // D3 ★ keyed range count between composite PK bounds
  // (`sql_queries.py:120-133`).
  def d3KeyedRangeCount(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(
        struct(col("l_orderkey"), col("l_linenumber")) >=
          struct(lit(100L).as("l_orderkey"), lit(2).as("l_linenumber")) &&
        struct(col("l_orderkey"), col("l_linenumber")) <=
          struct(lit(900L).as("l_orderkey"), lit(3).as("l_linenumber")))
      .agg(count(lit(1)).as("cnt"))

  val d3Sql: String =
    """SELECT count(*) AS cnt FROM lineitem
      |WHERE (l_orderkey > 100 OR (l_orderkey = 100 AND l_linenumber >= 2))
      |  AND (l_orderkey < 900 OR (l_orderkey = 900 AND l_linenumber <= 3))""".stripMargin

  // D4 ★ order-insensitive schema checksum: commutative SUM of a per-row
  // arithmetic hash, the shape of `CHECKSUM_AGG(CHECKSUM(...))`
  // (`sql_queries.py:20-25`).
  def d4ChecksumAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
      .groupBy(col("p_brand"))
      .agg(sum(col("p_partkey") * 31L + length(col("p_name")) * 7L + col("p_size"))
        .as("schema_checksum"))

  val d4Sql: String =
    """SELECT p_brand,
      |       CAST(sum(p_partkey * 31 + length(p_name) * 7 + p_size) AS BIGINT) AS schema_checksum
      |FROM part GROUP BY p_brand""".stripMargin

  // D5 ★ rows-per-second rate: COUNT / DATEDIFF(second, MIN, MAX)
  // (`sql_queries.py:68-74`; feeds the topic-partition sizing rule
  // `build_startup_state.py:111-119`).
  def d5RowsPerSecond(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.events(spark, dir)
      .agg(count(lit(1)).as("cnt"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("seconds"))
      .select(col("cnt"), col("seconds"),
        (col("cnt").cast("double") / col("seconds")).as("rows_per_sec"))

  val d5Sql: String =
    """SELECT cnt, seconds, CAST(cnt AS DOUBLE) / seconds AS rows_per_sec
      |FROM (SELECT count(*) AS cnt,
      |             date_diff('second', min(ts), max(ts)) AS seconds
      |      FROM events)""".stripMargin

  // D6 ★ topic summary multi-aggregate (`validation.py:56-197`): one pass
  // computing per-"topic" operation counts, exact distinct keys, and
  // change-index extrema. Exact count_distinct matches the reference's
  // Python set; approx_count_distinct is the documented 100 TB variant.
  def d6TopicSummary(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("total_msgs"),
        count(when(col("operation") === 1, 1)).as("deletes"),
        count(when(col("operation") === 2, 1)).as("inserts"),
        count(when(col("operation") === 3, 1)).as("pre_updates"),
        count(when(col("operation") === 4, 1)).as("post_updates"),
        countDistinct(col("user_id")).as("distinct_keys"),
        min(col("seqval_num")).as("min_idx"),
        max(col("seqval_num")).as("max_idx"))

  val d6Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT event_type,
       |       count(*) AS total_msgs,
       |       count(*) FILTER (WHERE operation = 1) AS deletes,
       |       count(*) FILTER (WHERE operation = 2) AS inserts,
       |       count(*) FILTER (WHERE operation = 3) AS pre_updates,
       |       count(*) FILTER (WHERE operation = 4) AS post_updates,
       |       count(DISTINCT user_id) AS distinct_keys,
       |       min(seqval_num) AS min_idx,
       |       max(seqval_num) AS max_idx
       |FROM change_rows GROUP BY event_type""".stripMargin

  // D8 ★ snapshot-history fold: latest value per group via max_by
  // (`show_snapshot_history.py:32-128`, `find_truncation_opportunities
  // .py:28-66`).
  def d8LatestPerKey(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), col("seqval_num")).as("last_event_type"),
        max(col("seqval_num")).as("last_seqval"))

  val d8Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT user_id, arg_max(event_type, seqval_num) AS last_event_type,
       |       max(seqval_num) AS last_seqval
       |FROM change_rows GROUP BY user_id""".stripMargin

  // D9 ★ (r11) — multi-dimensional CUBE aggregate: the OLAP rollup every
  // monitoring/BI consumer runs over a change feed ("counts by
  // (event_type, operation), by each alone, and in total" in ONE pass).
  // GROUPING SETS/CUBE expand map-side — each input row feeds its 4
  // grouping combinations before the shuffle, so the plan stays one
  // map-side-combined aggregate (no four separate scans, no union of
  // four GROUP BYs — the naive spelling at 100 TB). Explicit grouping()
  // flags disambiguate "NULL group value" from "aggregated-over" (the
  // classic CUBE output pitfall).
  def d9Cube(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.changeRows(spark, dir).createOrReplaceTempView("change_rows_t")
    spark.sql(
      """SELECT event_type, operation,
        |       CAST(grouping(event_type) AS INT) AS g_event_type,
        |       CAST(grouping(operation) AS INT) AS g_operation,
        |       count(*) AS n,
        |       CAST(sum(mask_int) AS BIGINT) AS sum_mask,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_keys
        |FROM change_rows_t
        |GROUP BY CUBE(event_type, operation)""".stripMargin)
  }

  val d9Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT event_type, operation,
       |       CAST(grouping(event_type) AS INT) AS g_event_type,
       |       CAST(grouping(operation) AS INT) AS g_operation,
       |       count(*) AS n,
       |       CAST(sum(mask_int) AS BIGINT) AS sum_mask,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_keys
       |FROM change_rows
       |GROUP BY CUBE(event_type, operation)""".stripMargin

  // ── d11_rollup ★ (r11) — hierarchical ROLLUP totals (the subtotal
  // report CUBE's power set is overkill for): per (returnflag, status)
  // cells, per-returnflag subtotals, and the grand total in ONE pass —
  // Spark expands grouping sets before the agg, so the three levels
  // share a single map-side-combined shuffle instead of three scans.
  // grouping() flags disambiguate NULL-as-subtotal from NULL data, same
  // discipline as d9_cube.
  def d11Rollup(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem_t")
    spark.sql(d11Body("lineitem_t"))
  }

  private def d11Body(table: String): String =
    s"""SELECT l_returnflag, l_linestatus,
       |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       |       CAST(grouping(l_linestatus) AS INT) AS g_status,
       |       count(*) AS n,
       |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
       |FROM $table
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  val d11Sql: String = d11Body("lineitem")

  /** Support floor for d10: pairs must co-occur in at least this many
    * baskets before a rule is scored (Agrawal's minsup — below it lift
    * is noise). */
  val MinPairOrders = 3

  // ── d10_basket_rules ★ (r11) — pairwise ASSOCIATION-RULE mining over
  // order baskets (the Apriori/market-basket classic the aggregation
  // family lacked): support, directional confidence, and lift for every
  // part pair co-purchased in ≥ [[MinPairOrders]] orders, top-20 by
  // lift. Exact integer micro-units throughout: conf(a→b) =
  // s(ab)·1e6 div s(a), lift = s(ab)·1e6·N div (s(a)·s(b)) — no float
  // ever, so the ranking is engine-exact (bounds: s(ab)·1e6·N ≲ 2e13 at
  // sf1, far inside BIGINT).
  //
  // Scale shape (100 TB): the basket relation is one DISTINCT; the pair
  // build is the same self-equi-join-on-basket as graph_triangles' pair
  // stage (fan-out Σ|basket|², bounded by basket size not corpus — the
  // Apriori candidate bound); supports are map-side-combined aggs; the
  // 1-row basket-count scalar broadcasts (allowlisted); final selection
  // is TakeOrderedAndProject.
  private def d10Body(idiv: String): String =
    s"""b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM b),
       |item AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY p),
       |pair AS (
       |  SELECT a.p AS pa, c.p AS pb, CAST(count(*) AS BIGINT) AS sab
       |  FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
       |  GROUP BY a.p, c.p
       |  HAVING count(*) >= $MinPairOrders),
       |dir AS (
       |  SELECT pa AS item_a, pb AS item_b, sab FROM pair
       |  UNION ALL
       |  SELECT pb AS item_a, pa AS item_b, sab FROM pair),
       |scored AS (
       |  SELECT d.item_a, d.item_b, d.sab,
       |         CAST(d.sab * 1000000 $idiv ia.s AS BIGINT) AS conf_micro,
       |         CAST(d.sab * 1000000 * n.n $idiv (ia.s * ib.s) AS BIGINT)
       |           AS lift_micro
       |  FROM dir d
       |  JOIN item ia ON ia.p = d.item_a
       |  JOIN item ib ON ib.p = d.item_b
       |  CROSS JOIN n)
       |SELECT item_a, item_b, sab AS pair_orders, conf_micro, lift_micro
       |FROM scored
       |ORDER BY lift_micro DESC, conf_micro DESC, item_a, item_b
       |LIMIT 20""".stripMargin

  def d10BasketRules(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    spark.sql(s"WITH ${d10Body("div")}")
  }

  val d10Sql: String = s"WITH ${d10Body("//")}"

  // ── d12_grouping_sets ★ (r12) — CUSTOM sparse grouping sets, the
  // third member of the multi-level-aggregate trio (d9 CUBE = power set,
  // d11 ROLLUP = hierarchy): a hand-picked set list a reporting layer
  // actually asks for — (flag, status) operational cells, (flag, year)
  // trend cells, per-year totals, and the grand total — WITHOUT paying
  // for the unwanted combinations CUBE would add. One scan, one
  // map-side-combined shuffle: Spark expands the sets before the
  // aggregate exactly like CUBE/ROLLUP, so cost is (number of sets) ×
  // the combine width, not extra passes. grouping() flags disambiguate
  // NULL-as-subtotal, the d9/d11 discipline; the ship YEAR keeps raw
  // timestamps out of the compared output.
  private def d12Body(table: String): String =
    s"""SELECT l_returnflag, l_linestatus,
       |       CAST(year(l_shipdate) AS INT) AS ship_year,
       |       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       |       CAST(grouping(l_linestatus) AS INT) AS g_status,
       |       CAST(grouping(year(l_shipdate)) AS INT) AS g_year,
       |       count(*) AS n,
       |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |FROM $table
       |GROUP BY GROUPING SETS (
       |  (l_returnflag, l_linestatus),
       |  (l_returnflag, year(l_shipdate)),
       |  (year(l_shipdate)),
       |  ())""".stripMargin

  def d12GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(s"$dir/lineitem.parquet")
      .createOrReplaceTempView("lineitem_t")
    spark.sql(d12Body("lineitem_t"))
  }

  val d12Sql: String = d12Body("lineitem")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d12_grouping_sets" -> (d12GroupingSets _),
    "d10_basket_rules" -> (d10BasketRules _),
    "d9_cube" -> (d9Cube _),
    "d11_rollup" -> (d11Rollup _),
    "d1_count_by_operation" -> (d1CountByOperation _),
    "d2_bounded_count" -> (d2BoundedCount _),
    "d3_keyed_range_count" -> (d3KeyedRangeCount _),
    "d4_checksum_agg" -> (d4ChecksumAgg _),
    "d5_rows_per_second" -> (d5RowsPerSecond _),
    "d6_topic_summary" -> (d6TopicSummary _),
    "d8_latest_per_key" -> (d8LatestPerKey _))

  val oracle: Map[String, String] = Map(
    "d12_grouping_sets" -> d12Sql,
    "d10_basket_rules" -> d10Sql,
    "d9_cube" -> d9Sql,
    "d11_rollup" -> d11Sql,
    "d1_count_by_operation" -> d1Sql,
    "d2_bounded_count" -> d2Sql,
    "d3_keyed_range_count" -> d3Sql,
    "d4_checksum_agg" -> d4Sql,
    "d5_rows_per_second" -> d5Sql,
    "d6_topic_summary" -> d6Sql,
    "d8_latest_per_key" -> d8Sql)
}
