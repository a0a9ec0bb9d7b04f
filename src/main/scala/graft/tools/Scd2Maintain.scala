package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history maintenance: the shared builder behind the batch
  * `c12_scd2` operator plus INCREMENTAL maintenance — "apply today's
  * change batch to yesterday's history table without rebuilding it" (the
  * IncrementalDedup discipline applied to dimension histories). At 100 TB
  * the history table is petabyte-class and append-mostly; rebuilding it
  * from the full change log per day is the anti-pattern this tool
  * removes: the increment touches ONE window over the new batch plus one
  * equi-join against only the OPEN versions (one row per live key, the
  * small hot edge of the table), never the closed majority.
  *
  * Contract (proven by Scd2MaintainSpec): for any split of the change
  * log into seq-monotone batches,
  * `increment(increment(build(b1), b2), b3) == build(b1 ++ b2 ++ b3)`.
  */
object Scd2Maintain {

  /** Version-table schema: user_id, version_seq, event_type, value,
    * valid_from_lsn, valid_to_lsn, valid_to_seq, closed_by_delete,
    * is_current. */
  val Columns: Seq[String] = Seq("user_id", "version_seq", "event_type",
    "value", "valid_from_lsn", "valid_to_lsn", "valid_to_seq",
    "closed_by_delete", "is_current")

  /** Build the SCD2 version table from a change-row batch (columns
    * user_id, seqval_num, lsn_num, operation, event_type, value; ops
    * 1=Delete, 2=Insert, 4=PostUpdate versioned — PreUpdate=3 ignored).
    * One repartition-by-key window, no self-join. */
  def build(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("seqval_num"))
    changes
      .filter(col("operation").isin(1, 2, 4))
      .select(col("user_id"), col("seqval_num"), col("lsn_num"),
        col("operation"), col("event_type"), col("value"))
      .withColumn("next_seq", lead(col("seqval_num"), 1).over(w))
      .withColumn("next_lsn", lead(col("lsn_num"), 1).over(w))
      .withColumn("next_op", lead(col("operation"), 1).over(w))
      .filter(col("operation") =!= 1)
      .select(
        col("user_id"),
        col("seqval_num").as("version_seq"),
        col("event_type"),
        col("value"),
        col("lsn_num").as("valid_from_lsn"),
        col("next_lsn").as("valid_to_lsn"),
        col("next_seq").as("valid_to_seq"),
        coalesce(col("next_op") === 1, lit(false)).as("closed_by_delete"),
        col("next_seq").isNull.as("is_current"))
  }

  /** Apply a NEW change batch (every seqval_num strictly greater than
    * anything in `history` — the CDC monotone-append guarantee) to an
    * existing version table. Closed history rows pass through untouched;
    * each open version whose key has new events closes at the key's FIRST
    * new event; the new batch contributes its own mini version table. */
  def increment(history: DataFrame, newChanges: DataFrame): DataFrame = {
    val mini = build(newChanges)
    // First relevant new event per key: one map-side-combined MIN over
    // the new batch only (seqval is a strict total order, so the struct
    // min is the earliest event).
    val firstNew = newChanges
      .filter(col("operation").isin(1, 2, 4))
      .groupBy(col("user_id"))
      .agg(min(struct(col("seqval_num"), col("lsn_num"), col("operation")))
        .as("f"))
      .select(col("user_id"), col("f.seqval_num").as("f_seq"),
        col("f.lsn_num").as("f_lsn"), col("f.operation").as("f_op"))
    val closedOld = history.filter(!col("is_current"))
    // Equi-join on user_id against ONLY the open edge of the history.
    val openPatched = history.filter(col("is_current"))
      .join(firstNew, Seq("user_id"), "left")
      .select(
        col("user_id"), col("version_seq"), col("event_type"), col("value"),
        col("valid_from_lsn"),
        when(col("f_seq").isNull, col("valid_to_lsn"))
          .otherwise(col("f_lsn")).as("valid_to_lsn"),
        when(col("f_seq").isNull, col("valid_to_seq"))
          .otherwise(col("f_seq")).as("valid_to_seq"),
        when(col("f_seq").isNull, col("closed_by_delete"))
          .otherwise(col("f_op") === 1).as("closed_by_delete"),
        col("f_seq").isNull.as("is_current"))
    closedOld.select(Columns.map(col): _*)
      .unionByName(openPatched.select(Columns.map(col): _*))
      .unionByName(mini.select(Columns.map(col): _*))
  }
}
