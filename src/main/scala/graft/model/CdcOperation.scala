package graft.model

/** CDC operation ids and names (`cdc_kafka/constants.py:50-79`):
  * 0=Snapshot (synthetic), 1=Delete, 2=Insert, 3=PreUpdate, 4=PostUpdate.
  * PreUpdate rows are filtered out of every published stream
  * (`sql_queries.py:265`). */
object CdcOperation {
  val Snapshot = 0
  val Delete = 1
  val Insert = 2
  val PreUpdate = 3
  val PostUpdate = 4

  val names: Map[Int, String] = Map(
    Snapshot -> "Snapshot",
    Delete -> "Delete",
    Insert -> "Insert",
    PreUpdate -> "PreUpdate",
    PostUpdate -> "PostUpdate")

  val ids: Map[String, Int] = names.map(_.swap)

  /** Operations that reach the published stream (B1 filter). */
  val published: Seq[Int] = Seq(Delete, Insert, PostUpdate)
}
