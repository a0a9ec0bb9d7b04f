package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.SyntheticCdc

/** SURVEY §2 group C joins + §5 validation suite — the metadata catalog
  * join, count reconciliation, and the ordered row-by-row differential
  * (the reference's runtime self-validation tooling restated as batch
  * DataFrame queries).
  */
object ValidationQueries {

  private val cr = SyntheticCdc.changeRowsSql

  // C2 ★ metadata 4-way join (`sql_queries.py:48-53`): inner join plus two
  // left joins assembling column/PK/type info. Dimension sides broadcast —
  // at scale the fact side never shuffles.
  def c2MetadataJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "inner")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"), "left")
      .join(broadcast(supplier), col("s_suppkey") === col("c_custkey"), "left")
      .select(col("c_custkey"), col("n_name"), col("r_name"), col("s_name"))
  }

  val c2Sql: String =
    """SELECT c_custkey, n_name, r_name, s_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |LEFT JOIN supplier ON s_suppkey = c_custkey""".stripMargin

  // C5 ★ validation count reconciliation (`validation.py:253-344`): two
  // aggregated sides joined on the group key; report rows where counts
  // disagree. The "topic" side deterministically drops every 97th row.
  def c5CountReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val db = SyntheticCdc.changeRows(spark, dir)
      .groupBy(col("operation")).agg(count(lit(1)).as("db_cnt"))
    val topic = SyntheticCdc.changeRows(spark, dir)
      .filter(col("event_id") % 97 =!= 13)
      .groupBy(col("operation")).agg(count(lit(1)).as("topic_cnt"))
    db.join(topic, Seq("operation"), "full_outer")
      .select(col("operation"),
        coalesce(col("db_cnt"), lit(0L)).as("db_cnt"),
        coalesce(col("topic_cnt"), lit(0L)).as("topic_cnt"))
      .filter(col("db_cnt") =!= col("topic_cnt"))
  }

  val c5Sql: String =
    s"""WITH change_rows AS ($cr),
       |db AS (SELECT operation, count(*) AS db_cnt FROM change_rows GROUP BY operation),
       |topic AS (SELECT operation, count(*) AS topic_cnt FROM change_rows
       |          WHERE event_id % 97 <> 13 GROUP BY operation)
       |SELECT operation, coalesce(db_cnt, 0) AS db_cnt,
       |       coalesce(topic_cnt, 0) AS topic_cnt
       |FROM db FULL OUTER JOIN topic USING (operation)
       |WHERE coalesce(db_cnt, 0) <> coalesce(topic_cnt, 0)""".stripMargin

  // C6 ★ ordered row-by-row differential (`row_comparison_validator
  // .py:183-351`): expected change list vs. observed stream aligned on the
  // change index; a full outer join surfaces rows present on only one side
  // (the sort-merge comparison, relationally). The observed side both
  // drops rows (every 101st) and contains phantom extras.
  def c6OrderedCompare(spark: SparkSession, dir: String): DataFrame = {
    val expected = SyntheticCdc.changeRows(spark, dir)
      .select(col("seqval_num"), col("operation"))
    val observedBase = SyntheticCdc.changeRows(spark, dir)
      .filter(col("event_id") % 101 =!= 7)
      .select(col("seqval_num"), col("operation"))
    val phantoms = SyntheticCdc.changeRows(spark, dir)
      .filter(col("event_id") % 503 === 11)
      .select((col("seqval_num") + 10000000L).as("seqval_num"), col("operation"))
    val observed = observedBase.unionByName(phantoms)
    expected.as("e")
      .join(observed.as("o"), Seq("seqval_num"), "full_outer")
      .filter(col("e.operation").isNull || col("o.operation").isNull)
      .select(col("seqval_num"),
        when(col("o.operation").isNull, lit("db_only"))
          .otherwise(lit("topic_only")).as("side"))
  }

  val c6Sql: String =
    s"""WITH change_rows AS ($cr),
       |expected AS (SELECT seqval_num, operation FROM change_rows),
       |observed AS (
       |  SELECT seqval_num, operation FROM change_rows WHERE event_id % 101 <> 7
       |  UNION ALL
       |  SELECT seqval_num + 10000000 AS seqval_num, operation FROM change_rows
       |  WHERE event_id % 503 = 11)
       |SELECT coalesce(e.seqval_num, o.seqval_num) AS seqval_num,
       |       CASE WHEN o.operation IS NULL THEN 'db_only' ELSE 'topic_only' END AS side
       |FROM expected e FULL OUTER JOIN observed o ON e.seqval_num = o.seqval_num
       |WHERE e.operation IS NULL OR o.operation IS NULL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c2_metadata_join" -> (c2MetadataJoin _),
    "c5_count_reconciliation" -> (c5CountReconciliation _),
    "c6_ordered_compare" -> (c6OrderedCompare _))

  val oracle: Map[String, String] = Map(
    "c2_metadata_join" -> c2Sql,
    "c5_count_reconciliation" -> c5Sql,
    "c6_ordered_compare" -> c6Sql)
}
