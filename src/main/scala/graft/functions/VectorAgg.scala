package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._

/**
 * Element-wise vector-sum aggregate over an `array<float>`/`array<double>`
 * column: the reduction half of distributed centroid math.
 *
 * Why an aggregate and not `posexplode` + `groupBy(pos)`: exploding a
 * dim-length vector multiplies the aggregated row count by dim, and any
 * expression aliased in the same Project as the Generate is re-evaluated
 * once per exploded element (PLANS rule #1). A typed aggregate keeps the
 * plan at one row per input vector, evaluates grouping expressions once
 * per row, and ships only `groups × dim` partial sums through the
 * exchange — the map-side-combine shape that scales to an arbitrary
 * corpus (100 TB in, k×dim doubles shuffled).
 *
 * Nulls are skipped; mixed lengths raise (a corpus with ragged embedding
 * dims is corrupt input, not something to average over silently).
 */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "vector_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum needs array<float>/array<double>, got ${other.simpleString(10)}")
  }

  /** Empty array = "nothing seen yet" (dim is learned from the first row). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.length == 0) new Array[Double](n) else buffer
    require(buf.length == n, s"vector_sum: ragged dims ${buf.length} vs $n")
    var i = 0
    if (elemIsFloat) while (i < n) { buf(i) += arr.getFloat(i); i += 1 }
    else while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    require(b1.length == b2.length, s"vector_sum: ragged dims ${b1.length} vs ${b2.length}")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorAgg {
  /** Element-wise sum of an embedding column (null vectors skipped). */
  def vectorSum(c: Column): Column =
    GraftBridge.column(VectorSumAgg(GraftBridge.expression(c)).toAggregateExpression())
}
