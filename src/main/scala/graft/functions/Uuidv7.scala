package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * UUIDv7 generator expression — time-ordered event ids.
 *
 * Reference: the fast no-syscall UUIDv7 generator at
 * crates/deltaforge-core/src/lib.rs:26-67, bit layout pinned by its test at
 * lib.rs:980-1023: 48-bit unix-millis timestamp, version nibble = 7,
 * RFC 4122 variant bits `10`, remaining 74 bits random. Time-ordering makes
 * ids index- and merge-friendly (the reason the reference prefers v7 over
 * v4 for event_id).
 *
 * Partition-initialized like Spark's own `uuid()`: seeded per (seed,
 * partition) so tasks don't contend, timestamp read per row.
 */
case class Uuidv7(seed: Long) extends LeafExpression with Nondeterministic
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "uuidv7"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed + partitionIndex)

  override protected def evalInternal(input: InternalRow): Any = {
    val ts = System.currentTimeMillis()
    val randA = rng.nextLong() & 0x0FFFL // 12 bits
    val randB = rng.nextLong() & 0x3FFFFFFFFFFFFFFFL // 62 bits
    val msb = (ts << 16) | 0x7000L | randA // 48-bit ts | version 7 | rand_a
    val lsb = 0x8000000000000000L | randB // variant 10 | rand_b
    UTF8String.fromString(new java.util.UUID(msb, lsb).toString)
  }
}

object Uuidv7 {
  def apply(): Column = GraftBridge.column(Uuidv7(scala.util.Random.nextLong()))
  def withSeed(seed: Long): Column = GraftBridge.column(Uuidv7(seed))

  /** Extract the embedded unix-millis timestamp from a v7 uuid string. */
  def timestampMillis(uuid: String): Long =
    java.lang.Long.parseLong(uuid.replace("-", "").substring(0, 12), 16)
}
