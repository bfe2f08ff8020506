package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native pair-expansion GENERATORS for the in-bucket Σ|bucket|² stage
  * of every blocked similarity join (SemDeDup cells, LSH buckets,
  * FastSS variant buckets, banded candidate pairs).
  *
  * Why generators and not the `explode(flatten(transform((x, i) =>
  * transform(slice(rows, i + 2, size), …))))` HOF chain these operators
  * used to inline: Spark higher-order functions are CodegenFallback —
  * every element pays interpreted lambda dispatch — and `slice` COPIES
  * its O(B − i) suffix through `ArrayDataIndexedSeq`/Vector builders on
  * every outer index, so a B-row bucket costs O(B²) boxed element
  * copies *before* any pair is even scored (observed as single-task
  * stragglers minutes long on skewed cells). A generator streams the
  * (i, j < i) pairs straight out of the backing ArrayData: no
  * intermediate pair ARRAY is ever materialized (the HOF chain builds
  * the full B²/2-element array per bucket before explode re-walks it),
  * and per-pair cost is two element reads + one 2-field row.
  *
  * Both generators preserve the exact emission the HOF chains produced
  * (ordered i < j with the array's own element order; A×B in left-major
  * order) — callers' canonicalization/filter stages are unchanged, so
  * results are bit-identical.
  */

/** All ordered pairs (a = arr(i), b = arr(j), i < j) of one array —
  * the self-join expansion. NULL array → no rows (explode semantics);
  * null ELEMENTS are not expected (collect_list never emits them). */
case class PairSelfExpand(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "pair_self_expand"

  private def elemInfo: (DataType, Boolean) = child.dataType match {
    case ArrayType(et, n) => (et, n)
    case _ => (NullType, true)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array input, got $t")
  }

  override def elementSchema: StructType = {
    val (et, n) = elemInfo
    StructType(Seq(StructField("a", et, n), StructField("b", et, n)))
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val (et, _) = elemInfo
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        // element reads are views into the backing array; GenerateExec
        // projects each emitted row before the next one is produced, so
        // views are safe (the explode contract)
        val row = new GenericInternalRow(Array[Any](arr.get(i, et), arr.get(j, et)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All cross pairs (a = left(i), b = right(j)) of two arrays in
  * left-major order — the two-sided (record-linkage) expansion.
  * Either side NULL or empty → no rows. */
case class PairCrossExpand(left: Expression, right: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "pair_cross_expand"

  private def elemInfo(e: Expression): (DataType, Boolean) = e.dataType match {
    case ArrayType(et, n) => (et, n)
    case _ => (NullType, true)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, _), ArrayType(_, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array inputs, got $l / $r")
    }

  override def elementSchema: StructType = {
    val (lt, ln) = elemInfo(left)
    val (rt, rn) = elemInfo(right)
    StructType(Seq(StructField("a", lt, ln), StructField("b", rt, rn)))
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val lv = left.eval(input)
    val rv = right.eval(input)
    if (lv == null || rv == null) return Nil
    val la = lv.asInstanceOf[ArrayData]
    val ra = rv.asInstanceOf[ArrayData]
    val ln = la.numElements()
    val rn = ra.numElements()
    if (ln == 0 || rn == 0) return Nil
    val (lt, _) = elemInfo(left)
    val (rt, _) = elemInfo(right)
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 0
      override def hasNext: Boolean = i < ln
      override def next(): InternalRow = {
        val row = new GenericInternalRow(Array[Any](la.get(i, lt), ra.get(j, rt)))
        j += 1
        if (j >= rn) { i += 1; j = 0 }
        row
      }
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PairExpressions {
  /** Self-pair generator column: use as
    * `df.select(pairSelf(col("rows")).as(Seq("a", "b")), ...)`. */
  def pairSelf(arr: Column): Column =
    ColumnBridge.column(PairSelfExpand(ColumnBridge.expression(arr)))

  /** Cross-pair generator column over two array columns. */
  def pairCross(l: Column, r: Column): Column =
    ColumnBridge.column(PairCrossExpand(ColumnBridge.expression(l), ColumnBridge.expression(r)))
}
