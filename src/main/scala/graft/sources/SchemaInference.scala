package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.{InstanceSwitch, Policies, TrackedFieldMeta, TrackedTableMeta}
import graft.model.InstanceSwitch.{ByCreateDate, ByRegex, CaptureInstanceStrategy}

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
      scale: Int,
      createDate: String = "") // ISO-8601; "" when the catalog read omits it

  /** The instance the configured strategy selects among `instances`,
    * each given as (name, createDate, startLsnHex). */
  private[graft] def selectInstance(strategy: CaptureInstanceStrategy,
      instances: Seq[(String, String, String)]): String = strategy match {
    case ByCreateDate =>
      // A catalog can mix dated and undated rows (older SQL Server
      // versions / partial mirrors omit create_date). "" sorts below
      // every ISO date, so comparing the (date, lsn) tuple would make an
      // undated-but-newer instance lose to ANY dated one. The comparison
      // must be consistent within the group: if any member lacks a date,
      // order the whole group by start LSN (monotone with creation
      // order) instead (ADVICE r7).
      if (instances.exists(_._2.isEmpty)) instances.maxBy(_._3)._1
      else instances.maxBy { case (_, created, lsnHex) => (created, lsnHex) }._1
    case ByRegex(pattern) =>
      val re = pattern.r
      // Python's `re.match` anchors at the START of the name (not full):
      // findPrefixMatchOf is the exact equivalent.
      instances.maxBy { case (name, _, _) =>
        re.findPrefixMatchOf(name)
          .flatMap(m => Option(if (m.groupCount >= 1) m.group(1) else ""))
          .getOrElse("")
      }._1
  }

  def fromCatalogRows(rows: Seq[CatalogRow],
      topicTemplate: String = "{schema}_{table}_cdc",
      includeRegex: Option[String] = None,
      excludeRegex: Option[String] = None,
      truncateAfterBytes: Map[String, Long] = Map.empty,
      instanceStrategy: CaptureInstanceStrategy = ByCreateDate): Seq[TrackedTableMeta] = {

    val included = rows.filter { r =>
      val fq = s"${r.schemaName}.${r.tableName}"
      includeRegex.forall(p => fq.matches(p)) && !excludeRegex.exists(p => fq.matches(p))
    }

    included.groupBy(r => (r.schemaName, r.tableName)).toSeq.sortBy(_._1).map {
      case ((schema, table), tableRows) =>
        // Several capture instances can coexist during schema evolution;
        // the configured strategy picks which to follow
        // (`build_startup_state.py:416-449`).
        val instance = selectInstance(instanceStrategy,
          tableRows.groupBy(_.captureInstance).toSeq
            .map { case (name, rs) => (name, rs.head.createDate, rs.head.startLsnHex) })
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
