package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.{Policies, TrackedFieldMeta, TrackedTableMeta}

/** A4: metadata-driven schema inference — assemble the tracked-table
  * registry from the rows [[SqlServerDialect.metadataQuery]] returns
  * (behavior of `cdc_kafka/build_startup_state.py:19-73,396-449`).
  *
  * The catalog scan itself is a tiny JDBC read at stream start; this
  * module is pure assembly: group catalog rows by capture instance, map
  * SQL Server types to Spark types (TrackedFieldMeta.sparkType), collect
  * PK ordinals, pick the latest capture instance per source table when
  * several exist, and apply the include/exclude regex routing (B3).
  */
object SchemaInference {

  final case class CatalogRow(
      schemaName: String,
      tableName: String,
      captureInstance: String,
      startLsnHex: String,
      columnName: String,
      columnType: String,
      columnOrdinal: Int,
      pkOrdinal: Int,
      precision: Int,
      scale: Int)

  def fromCatalogRows(rows: Seq[CatalogRow],
      topicTemplate: String = "{schema}_{table}_cdc",
      includeRegex: Option[String] = None,
      excludeRegex: Option[String] = None,
      truncateAfterBytes: Map[String, Long] = Map.empty): Seq[TrackedTableMeta] = {

    val included = rows.filter { r =>
      val fq = s"${r.schemaName}.${r.tableName}"
      includeRegex.forall(p => fq.matches(p)) && !excludeRegex.exists(p => fq.matches(p))
    }

    included.groupBy(r => (r.schemaName, r.tableName)).toSeq.sortBy(_._1).map {
      case ((schema, table), tableRows) =>
        // Several capture instances can coexist during schema evolution;
        // follow the one with the highest start LSN — the newest
        // (`build_startup_state.py:416-449`, 'latest' strategy).
        val instance = tableRows.groupBy(_.captureInstance).toSeq
          .maxBy { case (_, rs) => rs.head.startLsnHex }._1
        val cols = tableRows.filter(_.captureInstance == instance)
          .sortBy(_.columnOrdinal)
        val fields = cols.map { c =>
          TrackedFieldMeta(
            name = c.columnName,
            sqlTypeName = c.columnType,
            changeTableOrdinal = c.columnOrdinal,
            primaryKeyOrdinal = c.pkOrdinal,
            decimalPrecision = c.precision,
            decimalScale = c.scale,
            truncateAfterBytes =
              truncateAfterBytes.getOrElse(s"$schema.$table.${c.columnName}", 0L))
        }
        TrackedTableMeta(schema, table, instance,
          Policies.topicName(schema, table, topicTemplate), fields)
    }
  }

  /** Convenience: run inference directly over a DataFrame with the
    * metadata-query column layout (e.g. a JDBC read of
    * [[SqlServerDialect.metadataQuery]], or a fixture). */
  def fromCatalogDf(df: DataFrame): Seq[TrackedTableMeta] = {
    val rows = df.collect().toSeq.map { (r: Row) =>
      def intAt(name: String): Int =
        if (r.isNullAt(r.fieldIndex(name))) 0
        else r.get(r.fieldIndex(name)).asInstanceOf[Number].intValue()
      CatalogRow(
        r.getAs[String]("schema_name"),
        r.getAs[String]("table_name"),
        r.getAs[String]("capture_instance"),
        Option(r.getAs[Any]("start_lsn")).map {
          case b: Array[Byte] => b.map(x => f"${x & 0xff}%02x").mkString
          case other => other.toString
        }.getOrElse(""),
        r.getAs[String]("column_name"),
        r.getAs[String]("column_type"),
        intAt("column_ordinal"),
        intAt("pk_ordinal"),
        intAt("precision"),
        intAt("scale"))
    }
    fromCatalogRows(rows)
  }
}
