package graft.operators

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/**
 * Avro envelope encoding with Confluent wire framing.
 *
 * Reference: crates/deltaforge-core/src/encoding/avro.rs:347-480 (AvroEncoder,
 * magic-byte framing `[0x00][schema_id:4][avro]` :478-480), schema derivation
 * avro_schema.rs:145-220 (nullable unions, `deltaforge.cdc.*` namespaces),
 * type policies avro_types.rs:22-66 (Decimal → bytes+logical decimal,
 * timestamps → timestamp-millis).
 *
 * Spark-first shape: schema derivation is driver-side (DDL → Avro once per
 * table version, cached); row encoding runs in executors via `mapPartitions`
 * with one reused encoder per partition (the per-batch amortization the
 * reference gets from its writer pool). A pluggable [[SchemaRegistryClient]]
 * supplies ids — in-memory here, Confluent REST in production.
 */
object AvroEncoding {

  /** Minimal schema-registry contract (reference: Confluent SR client). */
  trait SchemaRegistryClient extends Serializable {
    /** register (or look up) schema under subject, return schema id. */
    def register(subject: String, schema: String): Int
  }

  /** Driver/test registry: deterministic ids, subject→id map. */
  class InMemorySchemaRegistry extends SchemaRegistryClient {
    private val ids = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    private val next = new java.util.concurrent.atomic.AtomicInteger(0)
    def register(subject: String, schema: String): Int =
      ids.computeIfAbsent(subject + "|" + schema, _ => next.incrementAndGet())
  }

  /**
   * Confluent-protocol REST registry client with register-and-cache
   * behavior (reference crates/sinks/src/encoding/avro.rs:347-480): POST
   * `/subjects/{subject}-value/versions` with `{"schema": "..."}` JSON,
   * cache the returned id per (subject, schema) so each executor registers
   * a given schema exactly once; ids feed the `[0x00][id:4BE]` wire
   * framing in [[encode]].
   */
  class HttpSchemaRegistryClient(baseUrl: String,
                                 timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends SchemaRegistryClient {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    // ONE client per registry instance (connection reuse), with explicit
    // connect + request timeouts — a hung registry must not pin an
    // executor thread forever
    @transient private lazy val http =
      java.net.http.HttpClient.newBuilder().connectTimeout(timeout).build()

    def register(subject: String, schema: String): Int = {
      val key = subject + "|" + schema
      val cached = cache.get(key)
      if (cached != null) return cached.intValue()
      // the blocking HTTP call happens OUTSIDE computeIfAbsent — holding a
      // CHM segment lock across a network round trip stalls unrelated
      // cache mutations; a rare duplicate register is harmless (the
      // registry returns the same id for an identical schema)
      val body = mapper.createObjectNode()
      body.put("schema", schema)
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$baseUrl/subjects/$subject-value/versions"))
        .timeout(timeout)
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build()
      val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"schema registry ${resp.statusCode()}: ${resp.body().take(200)}")
      val id = mapper.readTree(resp.body()).get("id").asInt()
      val prev = cache.putIfAbsent(key, id)
      if (prev != null) prev.intValue() else id
    }
  }

  /**
   * Spark DDL type → Avro schema (nullable union of [null, T]).
   * Policies per reference avro_types.rs:22-66.
   */
  def avroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      val s = Schema.create(Schema.Type.BYTES)
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(s)
    case DateType =>
      val s = Schema.create(Schema.Type.INT); LogicalTypes.date().addToSchema(s)
    case TimestampType | TimestampNTZType =>
      val s = Schema.create(Schema.Type.LONG); LogicalTypes.timestampMillis().addToSchema(s)
    case ArrayType(et, _) => Schema.createArray(nullable(avroType(et)))
    case MapType(StringType, vt, _) => Schema.createMap(nullable(avroType(vt)))
    case st: StructType => record("nested", st)
    case other => throw new IllegalArgumentException(s"unsupported avro mapping for $other")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)

  // ———————————— MySQL source-type policies (avro_types.rs:22-220) ————————————

  /**
   * The reference's configurable "unsafe" type policies
   * (avro_types.rs:22-66): how to map MySQL BIGINT UNSIGNED (string is the
   * safe default — long overflows ≥ 2^63), ENUM (string default — the enum
   * form breaks schema compatibility when symbols change), and naive
   * timezone-unaware DATETIME (string ISO-8601 default — timestamp-millis
   * is semantically misleading without a zone).
   */
  case class TypePolicies(
      unsignedBigintMode: String = "string", // "string" | "long"
      enumMode: String = "string", // "string" | "enum"
      naiveTimestampMode: String = "string") // "string" | "timestamp"

  /** A MySQL information_schema column description (avro_types.rs:70-95). */
  case class MysqlColumn(name: String, dataType: String, columnType: String = "",
                         nullableCol: Boolean = true, precision: Option[Int] = None,
                         unsigned: Boolean = false)

  /** Parse `enum('a','b','c')` symbol lists (avro_types.rs parse_mysql_enum_values). */
  def parseMysqlEnumValues(columnType: String): Seq[String] = {
    val lower = columnType.toLowerCase
    val start = lower.indexOf("enum(")
    if (start < 0) return Nil
    val end = lower.indexOf(')', start + 5)
    if (end < 0) return Nil
    columnType.substring(start + 5, end).split(',').toSeq
      .map(_.trim.stripPrefix("'").stripSuffix("'")).filter(_.nonEmpty)
  }

  /** MySQL column type → Avro schema, policy-driven (avro_types.rs:100-220). */
  def mysqlAvroType(col: MysqlColumn, p: TypePolicies = TypePolicies()): Schema =
    col.dataType.toLowerCase match {
      case "tinyint" | "smallint" | "mediumint" => Schema.create(Schema.Type.INT)
      case "int" | "integer" =>
        if (col.unsigned) Schema.create(Schema.Type.LONG) // INT UNSIGNED fits in long
        else Schema.create(Schema.Type.INT)
      case "bigint" =>
        if (!col.unsigned) Schema.create(Schema.Type.LONG)
        else if (p.unsignedBigintMode == "long") Schema.create(Schema.Type.LONG) // ≥2^63 fails encoding
        else Schema.create(Schema.Type.STRING) // safe default
      case "float" => Schema.create(Schema.Type.FLOAT)
      case "double" | "real" => Schema.create(Schema.Type.DOUBLE)
      // decimal stays a string through the JSON intermediary (the payload
      // carries "1234.56", not a two's-complement BigInt)
      case "decimal" | "numeric" => Schema.create(Schema.Type.STRING)
      case "varchar" | "char" | "text" | "tinytext" | "mediumtext" | "longtext" =>
        Schema.create(Schema.Type.STRING)
      case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" =>
        Schema.create(Schema.Type.BYTES)
      case "date" =>
        val s = Schema.create(Schema.Type.INT); LogicalTypes.date().addToSchema(s)
      case "datetime" => // naive (no zone): policy
        if (p.naiveTimestampMode == "timestamp") {
          val s = Schema.create(Schema.Type.LONG); LogicalTypes.timestampMillis().addToSchema(s)
        } else Schema.create(Schema.Type.STRING) // ISO-8601
      case "timestamp" => // UTC-anchored
        val s = Schema.create(Schema.Type.LONG); LogicalTypes.timestampMillis().addToSchema(s)
      case "time" =>
        val s = Schema.create(Schema.Type.LONG); LogicalTypes.timeMillis().addToSchema(s)
      case "year" => Schema.create(Schema.Type.INT)
      case "boolean" | "bool" => Schema.create(Schema.Type.BOOLEAN)
      case "bit" if col.precision.contains(1) => Schema.create(Schema.Type.BOOLEAN)
      case "bit" => Schema.create(Schema.Type.BYTES)
      case "json" => Schema.create(Schema.Type.STRING)
      case "enum" =>
        val symbols = parseMysqlEnumValues(col.columnType)
        if (p.enumMode == "enum" && symbols.nonEmpty)
          Schema.createEnum(s"${col.name}_enum".replaceAll("[^A-Za-z0-9_]", "_"),
            null, "graft.cdc", symbols.asJava)
        else Schema.create(Schema.Type.STRING)
      case "set" => Schema.create(Schema.Type.STRING)
      case _ => Schema.create(Schema.Type.STRING) // lossy catch-all
    }

  /** MySQL table DDL → Avro record (nullable unions per column). */
  def mysqlRecord(name: String, cols: Seq[MysqlColumn],
                  p: TypePolicies = TypePolicies()): Schema = {
    val fields = cols.map { c =>
      val t = mysqlAvroType(c, p)
      val fieldSchema = if (c.nullableCol) nullable(t) else t
      if (c.nullableCol)
        new Schema.Field(c.name, fieldSchema, null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(c.name, fieldSchema, null)
    }
    Schema.createRecord(name.replaceAll("[^A-Za-z0-9_]", "_"), null, "graft.cdc", false,
      fields.toList.asJava)
  }

  // ———————————— Postgres source-type policies (avro_types.rs:250-430) ————————————

  /**
   * A PostgreSQL information_schema column description
   * (avro_types.rs ColumnDesc, PG branch): `dataType` is the raw
   * `data_type`/`udt_name` string (normalized here), arrays carry their
   * element type separately (`information_schema` reports `ARRAY`).
   */
  case class PgColumn(name: String, dataType: String, nullableCol: Boolean = true,
                      precision: Option[Int] = None, scale: Option[Int] = None,
                      isArray: Boolean = false, elementType: Option[String] = None)

  /**
   * Normalize PostgreSQL type names to canonical short forms
   * (avro_types.rs normalize_pg_type): strip length/precision suffixes,
   * collapse the SQL-standard verbose spellings.
   */
  def normalizePgType(dataType: String): String = {
    val lower = dataType.toLowerCase.trim
    if (lower.startsWith("character varying")) "varchar"
    else if (lower.startsWith("character(") || lower == "character") "char"
    else if (lower.startsWith("numeric(")) "numeric"
    else if (lower.startsWith("decimal(")) "decimal"
    else if (lower.startsWith("timestamp with time zone") ||
      lower.startsWith("timestamptz")) "timestamptz"
    else if (lower.startsWith("timestamp")) {
      if (lower.contains("with time zone")) "timestamptz" else "timestamp"
    }
    else if (lower.startsWith("time with time zone")) "timetz"
    else if (lower.startsWith("time")) {
      // careful: "timetz" itself must survive; only expand the verbose forms
      if (lower == "timetz") "timetz"
      else if (lower.contains("with time zone")) "timetz"
      else if (lower.startsWith("time(") || lower == "time" ||
        lower.startsWith("time without time zone")) "time"
      else lower.indexOf('(') match {
        case -1 => lower
        case i => lower.substring(0, i).trim
      }
    }
    else if (lower.startsWith("double precision")) "double precision"
    else lower.indexOf('(') match {
      case -1 => lower
      case i => lower.substring(0, i).trim
    }
  }

  /**
   * PostgreSQL scalar type → Avro schema, policy-driven
   * (avro_types.rs:267-365 postgres_scalar_to_avro). Notable vs MySQL:
   * PG timestamps use MICROS logical types; `timestamptz` is always
   * timestamp-micros (zone-anchored) while naive `timestamp` follows the
   * naive-timestamp policy; `timetz` stays a string (time-micros would
   * drop the offset); numeric/decimal stays a string through the JSON
   * intermediary (the reference's TD-003); `hstore` is a string map.
   */
  def pgAvroType(col: PgColumn, p: TypePolicies = TypePolicies()): Schema = {
    if (col.isArray)
      return Schema.createArray(pgAvroType(
        PgColumn(col.name, col.elementType.getOrElse("text"),
          precision = col.precision, scale = col.scale), p))
    normalizePgType(col.dataType) match {
      case "smallint" | "int2" | "smallserial" => Schema.create(Schema.Type.INT)
      case "integer" | "int" | "int4" | "serial" => Schema.create(Schema.Type.INT)
      case "bigint" | "int8" | "bigserial" => Schema.create(Schema.Type.LONG)
      case "real" | "float4" => Schema.create(Schema.Type.FLOAT)
      case "double precision" | "float8" => Schema.create(Schema.Type.DOUBLE)
      case "numeric" | "decimal" => Schema.create(Schema.Type.STRING)
      case "boolean" | "bool" => Schema.create(Schema.Type.BOOLEAN)
      case "text" | "varchar" | "char" | "name" | "citext" | "bpchar" =>
        Schema.create(Schema.Type.STRING)
      case "bytea" => Schema.create(Schema.Type.BYTES)
      case "date" =>
        val s = Schema.create(Schema.Type.INT); LogicalTypes.date().addToSchema(s)
      case "timestamp" => // naive (no zone): policy, like MySQL DATETIME
        if (p.naiveTimestampMode == "timestamp") {
          val s = Schema.create(Schema.Type.LONG)
          LogicalTypes.timestampMicros().addToSchema(s)
        } else Schema.create(Schema.Type.STRING)
      case "timestamptz" =>
        val s = Schema.create(Schema.Type.LONG)
        LogicalTypes.timestampMicros().addToSchema(s)
      case "time" =>
        val s = Schema.create(Schema.Type.LONG)
        LogicalTypes.timeMicros().addToSchema(s)
      case "timetz" => Schema.create(Schema.Type.STRING) // offset would be lost
      case "interval" => Schema.create(Schema.Type.STRING)
      case "uuid" =>
        val s = Schema.create(Schema.Type.STRING)
        LogicalTypes.uuid().addToSchema(s)
      case "json" | "jsonb" => Schema.create(Schema.Type.STRING)
      case "inet" | "cidr" | "macaddr" | "macaddr8" => Schema.create(Schema.Type.STRING)
      case "point" | "line" | "lseg" | "box" | "path" | "polygon" | "circle" =>
        Schema.create(Schema.Type.STRING)
      case "hstore" => Schema.createMap(Schema.create(Schema.Type.STRING))
      case "int4range" | "int8range" | "numrange" | "tsrange" | "tstzrange" |
           "daterange" => Schema.create(Schema.Type.STRING)
      case "money" | "xml" => Schema.create(Schema.Type.STRING)
      case _ => Schema.create(Schema.Type.STRING) // lossy catch-all
    }
  }

  /** PG table description → Avro record (nullable unions per column). */
  def pgRecord(name: String, cols: Seq[PgColumn],
               p: TypePolicies = TypePolicies()): Schema = {
    val fields = cols.map { c =>
      val t = pgAvroType(c, p)
      val fieldSchema = if (c.nullableCol) nullable(t) else t
      if (c.nullableCol)
        new Schema.Field(c.name, fieldSchema, null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(c.name, fieldSchema, null)
    }
    Schema.createRecord(name.replaceAll("[^A-Za-z0-9_]", "_"), null, "graft.cdc", false,
      fields.toList.asJava)
  }

  /** StructType → Avro record, ns `graft.cdc.<name>`, all fields nullable. */
  def record(name: String, st: StructType): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType)), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name.replaceAll("[^A-Za-z0-9_]", "_"), null, "graft.cdc", false,
      fields.toList.asJava)
  }

  private def toAvro(v: Any, schema: Schema): Any = v match {
    case null => null
    case row: Row =>
      val rec = schema.getTypes.asScala.find(_.getType == Schema.Type.RECORD)
        .orElse(Some(schema)).get
      rowToRecord(row, rec)
    case d: java.math.BigDecimal => ByteBuffer.wrap(d.unscaledValue().toByteArray)
    case d: java.sql.Timestamp => d.getTime
    case d: java.time.Instant => d.toEpochMilli
    case d: java.time.LocalDateTime =>
      d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case s: Seq[_] =>
      val el = schema.getTypes.asScala.find(_.getType == Schema.Type.ARRAY)
        .orElse(Some(schema)).get.getElementType
      s.map(toAvro(_, el)).asJava
    case m: Map[_, _] =>
      val vt = schema.getTypes.asScala.find(_.getType == Schema.Type.MAP)
        .orElse(Some(schema)).get.getValueType
      m.map { case (k, mv) => k.toString -> toAvro(mv, vt) }.asJava
    case other => other
  }

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val actual = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType == Schema.Type.RECORD).get else schema
    val rec = new GenericData.Record(actual)
    actual.getFields.asScala.foreach { f =>
      val idx = row.fieldIndex(f.name)
      rec.put(f.name, toAvro(if (row.isNullAt(idx)) null else row.get(idx), f.schema()))
    }
    rec
  }

  /**
   * Encode a DataFrame to Confluent-framed Avro bytes. One encoder per
   * partition; schema registered once on the driver.
   */
  def encode(df: DataFrame, subject: String, registry: SchemaRegistryClient): Dataset[Array[Byte]] = {
    val schema = record(subject.replace('-', '_'), df.schema)
    val schemaJson = schema.toString
    val schemaId = registry.register(subject, schemaJson)
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      val sch = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](sch)
      rows.map { row =>
        val out = new ByteArrayOutputStream()
        out.write(0) // magic byte
        out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        writer.write(rowToRecord(row, sch), enc)
        enc.flush()
        out.toByteArray
      }
    }
  }

  /** Decode one Confluent-framed message (tests / consumers). */
  def decode(bytes: Array[Byte], schemaJson: String): (Int, GenericRecord) = {
    require(bytes(0) == 0, "missing confluent magic byte")
    val id = ByteBuffer.wrap(bytes, 1, 4).getInt
    val sch = new Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](sch)
    val dec: BinaryDecoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
    (id, reader.read(null, dec))
  }
}
