package graft.streaming

import org.apache.spark.sql.types._

/**
 * ClickHouse target-table DDL generation from a declared Spark schema.
 *
 * Reference: crates/sinks/src/clickhouse/ddl.rs:17-67 — `upsert` →
 * `ReplacingMergeTree(_version, _deleted) ORDER BY (pk)` vs `changelog` →
 * `MergeTree ORDER BY (pk, _version)`; meta columns `_op LowCardinality,
 * _version UInt64, _deleted UInt8, _source_ts DateTime64(3)` (project.rs:35);
 * type map types.rs:34.
 *
 * The Spark side only generates DDL + inserts (via any JDBC writer);
 * merge-on-read dedup is the engine's job — the same division of labor the
 * reference uses.
 */
object ClickHouseDdl {

  sealed trait Mode
  case object Upsert extends Mode
  case object Changelog extends Mode

  def chType(dt: DataType): String = dt match {
    case BooleanType => "UInt8"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BinaryType => "String"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(3)"
    case ArrayType(et, _) => s"Array(${chType(et)})"
    case MapType(StringType, vt, _) => s"Map(String, ${chType(vt)})"
    case other => throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  /** Nullable wrapper for non-key columns (reference types.rs nullability). */
  private def columnDef(f: StructField, isKey: Boolean): String = {
    val t = chType(f.dataType)
    val wrapped = if (f.nullable && !isKey && !t.startsWith("Array") && !t.startsWith("Map"))
      s"Nullable($t)" else t
    s"`${f.name}` $wrapped"
  }

  def createTable(db: String, table: String, schema: StructType,
                  primaryKey: Seq[String], mode: Mode): String = {
    val cols = schema.fields.map(f => columnDef(f, primaryKey.contains(f.name)))
    val meta = Seq(
      "`_op` LowCardinality(String)",
      "`_version` UInt64",
      "`_deleted` UInt8",
      "`_source_ts` DateTime64(3)")
    val pk = primaryKey.map(c => s"`$c`").mkString(", ")
    val engineAndOrder = mode match {
      case Upsert => s"ENGINE = ReplacingMergeTree(_version, _deleted) ORDER BY ($pk)"
      case Changelog => s"ENGINE = MergeTree ORDER BY ($pk, _version)"
    }
    s"""CREATE TABLE IF NOT EXISTS `$db`.`$table` (
       |  ${(cols ++ meta).mkString(",\n  ")}
       |) $engineAndOrder""".stripMargin
  }

  /** SELECT that reads current state from an upsert table (FINAL-free dedup). */
  def upsertReadQuery(db: String, table: String, schema: StructType, pk: Seq[String]): String = {
    val cols = schema.fieldNames.map(c => s"`$c`").mkString(", ")
    val pkCols = pk.map(c => s"`$c`").mkString(", ")
    s"""SELECT $cols FROM (
       |  SELECT *, row_number() OVER (PARTITION BY $pkCols ORDER BY _version DESC) AS _rn
       |  FROM `$db`.`$table`
       |) WHERE _rn = 1 AND _deleted = 0""".stripMargin
  }
}
