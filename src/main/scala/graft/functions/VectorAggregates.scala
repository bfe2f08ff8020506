package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Elementwise vector SUM / AVG aggregates — pgvector's `sum(vector)` /
  * `avg(vector)` (pgvector src/vector.c `vector_accum`), the missing
  * aggregate pair on the repo's SQL surface. The declarative route
  * (posexplode → groupBy(key, dim) → re-assemble, what
  * `Embedder.poolToDocuments` does for the oracle-replayable pooling
  * gate) blows every row up into `dim` shuffle rows; this is the
  * single-pass shape: ONE buffer per group per partition, map-side
  * partial aggregation, `dim+1` longs shuffled per group — the right
  * cost at 100 TB.
  *
  * Accumulation is EXACT scaled-integer arithmetic: each element is
  * rounded half-up at `scale` decimals and added as a `10^scale`-scaled
  * Long (`Math.addExact` — overflow fails loud rather than wrapping), so
  * sums are order- and partitioning-independent bit-for-bit, and the
  * DuckDB oracle (`sum(CAST(round(v, scale) AS DECIMAL))` over the
  * exploded form) replays them exactly — a float accumulator could
  * never hash-gate. Mixed dimensions in one group fail loud. */
final case class VecSumAgg(child: Expression, scale: Int, returnAvg: Boolean,
                           mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(scale >= 0 && scale <= 9, s"VecSumAgg: scale must be in [0, 9], got $scale")

  // deferred: child.dataType is unresolvable at construction time
  private def isFloatElem: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (returnAvg) "vec_avg" else "vec_sum"

  // buffer layout: [count, sum_0 … sum_{dim-1}]; Array.empty = no rows yet
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def scaledLong(v: Double): Long = {
    require(!v.isNaN && !v.isInfinite, s"VecSumAgg: non-finite element $v")
    java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .movePointRight(scale).longValueExact()
  }

  override def update(buffer: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Long](n + 1)
      else {
        require(buffer.length == n + 1,
          s"VecSumAgg: mixed dimensions in one group (${buffer.length - 1} vs $n)")
        buffer
      }
    buf(0) = Math.addExact(buf(0), 1L)
    val float = isFloatElem
    var i = 0
    while (i < n) {
      val d = if (float) arr.getFloat(i).toDouble else arr.getDouble(i)
      buf(i + 1) = Math.addExact(buf(i + 1), scaledLong(d))
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    require(buffer.length == other.length,
      s"VecSumAgg: mixed dimensions across partitions (${buffer.length - 1} vs ${other.length - 1})")
    var i = 0
    while (i < buffer.length) {
      buffer(i) = Math.addExact(buffer(i), other(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    if (buffer.isEmpty) return null // SQL aggregates over zero rows are NULL
    val count = buffer(0)
    val out = new Array[Any](buffer.length - 1)
    var i = 1
    while (i < buffer.length) {
      val sum = java.math.BigDecimal.valueOf(buffer(i), scale)
      out(i - 1) =
        if (returnAvg)
          sum.divide(java.math.BigDecimal.valueOf(count), scale + 6,
            java.math.RoundingMode.HALF_UP).doubleValue()
        else sum.doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val baos = new ByteArrayOutputStream(8 * (buffer.length + 1))
    val out = new DataOutputStream(baos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

object VectorAggregates {
  /** Elementwise sum of a vector column (pgvector `sum(vector)`). */
  def vecSum(a: Column, scale: Int = 6): Column =
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(a), scale, returnAvg = false).toAggregateExpression())

  /** Elementwise mean of a vector column (pgvector `avg(vector)`). */
  def vecAvg(a: Column, scale: Int = 6): Column =
    ColumnBridge.column(
      VecSumAgg(ColumnBridge.expression(a), scale, returnAvg = true).toAggregateExpression())
}
