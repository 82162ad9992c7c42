package graft.expr.catalyst

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `top_k_min(struct, k)` — bounded top-k aggregate: keeps the `k`
  * lexicographically-smallest struct values of the group and returns them
  * as an ascending array.
  *
  * This is the partial-aggregation answer to "rank the nearest `k`
  * centroids per vector": the window formulation
  * (`row_number().over(partitionBy(id))`) must shuffle the whole
  * corpus×centroids expansion (n×nlist rows) to sort it per id, while this
  * aggregate combines map-side — each map task ships at most `k` entries
  * per group, so the exchange carries ~n rows however many centroids there
  * are. Encode "best first" orderings by building the key struct so that
  * ascending == preferred (e.g. `struct(0.0 - cos, cell)` for cosine
  * descending, cell-id ascending ties).
  *
  * The buffer is an array of copied struct rows, compacted back to `k`
  * whenever it doubles — O(k) memory per group, O(log k) amortized compare
  * per row. Shuffle format: UnsafeRow bytes, length-prefixed.
  */
case class TopKMin(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]]
    with BinaryLike[Expression] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, _) => v
    case other => other.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case x => throw new IllegalArgumentException(
        s"top_k_min k must be a constant int, got $x")
    }
  }

  /** Analysis-time contract: a non-foldable or non-positive `k` must fail
    * the QUERY'S analysis, not throw from an executor mid-aggregation
    * (where it would surface as a task failure after work was scheduled).
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!child.dataType.isInstanceOf[StructType])
      TypeCheckFailure(
        s"top_k_min value must be a struct, got ${child.dataType.sql}")
    else if (!kExpr.foldable)
      TypeCheckFailure("top_k_min k must be a constant (foldable) integer")
    else kExpr.eval(InternalRow.empty) match {
      case i: Int if i >= 1 => TypeCheckSuccess
      // the runtime k is an Int: a Long beyond Int range would silently
      // truncate (2^32 -> 0), so reject it here
      case l: Long if l >= 1 && l <= Int.MaxValue => TypeCheckSuccess
      case null => TypeCheckFailure("top_k_min k must not be null")
      case x => TypeCheckFailure(
        s"top_k_min k must be a positive Int-range constant, got $x")
    }
  }

  private lazy val elementType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering =
    InterpretedOrdering.forSchema(elementType.map(_.dataType))
  @transient private lazy val toUnsafe = UnsafeProjection.create(elementType)

  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_min"

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty

  /** Sort ascending, drop everything past k. */
  private def compact(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > k) {
      val kept = buf.sortInPlace()(ordering).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow],
      input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[InternalRow].copy()
      if (buf.length >= 2 * math.max(k, 16)) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[InternalRow],
      other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any = {
    val sorted = buf.sortInPlace()(ordering).take(k)
    new GenericArrayData(sorted.toArray)
  }

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    compact(buf)
    val out = new java.io.ByteArrayOutputStream()
    val data = new java.io.DataOutputStream(out)
    data.writeInt(buf.length)
    buf.foreach { row =>
      val unsafe = toUnsafe(row)
      val bytes = unsafe.getBytes
      data.writeInt(bytes.length)
      data.write(bytes)
    }
    data.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(elementType.size)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKMin =
    copy(child = newLeft, kExpr = newRight)
}
