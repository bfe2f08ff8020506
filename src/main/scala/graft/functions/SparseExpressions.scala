package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Sparse dot product `⟨a, b⟩` over (indices ASC, values) array pairs —
  * the scalar kernel of the pgvector-sparsevec surface, as a native
  * codegen'd expression: a two-pointer merge over the SORTED index
  * arrays, O(nnz(a) + nnz(b)) with zero allocation — where the
  * higher-order-function formulation builds a hash map per row and
  * tree-walks interpreted lambdas per element (CodegenFallback), the
  * difference the repo's design rules exist for.
  *
  * CONTRACT: index arrays are strictly ascending (the [[graft.operators.SparseKnn.hashingTf]]
  * output shape, and pgvector's own sparsevec storage invariant) —
  * unsorted input silently underestimates the dot, exactly as pgvector
  * documents for malformed sparsevec. Indices: `array<int|bigint>`;
  * values: `array<float|double>`; math in double. Array ELEMENTS must
  * be non-null: when the static schema already guarantees that
  * (`containsNull=false`, the hashingTf producer shape) the kernel is
  * the bare two-pointer loop; when it cannot (parquet read-back marks
  * elements nullable) the arrays are validated per-row and a null
  * element raises rather than silently scoring as 0/garbage.
  */
case class SparseDotExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparse_dot"

  private def idxType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val idxOk = Seq(first, third).forall(e => e.dataType match {
      case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
      case _ => false
    })
    val valOk = Seq(second, fourth).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (idxOk && valOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<int|bigint>, array<float|double>) × 2, got " +
        s"${first.dataType}/${second.dataType}/${third.dataType}/${fourth.dataType}")
  }

  // containsNull=false on every input → skip per-row element validation
  private lazy val needsNullCheck: Boolean =
    children.exists(_.dataType.asInstanceOf[ArrayType].containsNull)

  private def requireNoNullElements(a: ArrayData, role: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at position $i of the $role array — " +
          "sparse vectors must have non-null indices/values (the hashingTf contract)")
      i += 1
    }
  }

  @inline private def idx(a: ArrayData, isInt: Boolean, i: Int): Long =
    if (isInt) a.getInt(i).toLong else a.getLong(i)
  @inline private def value(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override protected def nullSafeEval(ai: Any, av: Any, bi: Any, bv: Any): Any = {
    val (aIdx, aVal) = (ai.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData])
    val (bIdx, bVal) = (bi.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val aInt = idxType(first) == IntegerType
    val bInt = idxType(third) == IntegerType
    val aF = second.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bF = fourth.dataType.asInstanceOf[ArrayType].elementType == FloatType
    if (needsNullCheck) {
      requireNoNullElements(aIdx, "first-indices"); requireNoNullElements(aVal, "first-values")
      requireNoNullElements(bIdx, "second-indices"); requireNoNullElements(bVal, "second-values")
    }
    val (na, nb) = (aIdx.numElements(), bIdx.numElements())
    // a ragged (indices, values) pair would read past the values array's
    // element region — UnsafeArrayData has no bounds check, so the result
    // would be silent garbage, not an error
    if (na != aVal.numElements()) throw new IllegalArgumentException(
      s"$prettyName: first vector is ragged — $na indices vs ${aVal.numElements()} values")
    if (nb != bVal.numElements()) throw new IllegalArgumentException(
      s"$prettyName: second vector is ragged — $nb indices vs ${bVal.numElements()} values")
    var dot = 0.0
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = idx(aIdx, aInt, i); val y = idx(bIdx, bInt, j)
      if (x == y) { dot += value(aVal, aF, i) * value(bVal, bF, j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ai, av, bi, bv) => {
      val getAIdx = if (idxType(first) == IntegerType) s"(long) $ai.getInt" else s"$ai.getLong"
      val getBIdx = if (idxType(third) == IntegerType) s"(long) $bi.getInt" else s"$bi.getLong"
      val getAVal =
        if (second.dataType.asInstanceOf[ArrayType].elementType == FloatType)
          s"(double) $av.getFloat" else s"$av.getDouble"
      val getBVal =
        if (fourth.dataType.asInstanceOf[ArrayType].elementType == FloatType)
          s"(double) $bv.getFloat" else s"$bv.getDouble"
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val nullChecks = if (!needsNullCheck) "" else {
        val k = ctx.freshName("k")
        Seq(ai -> "first-indices", av -> "first-values",
            bi -> "second-indices", bv -> "second-values").map { case (arr, role) =>
          s"""
             |for (int $k = 0; $k < $arr.numElements(); $k++) {
             |  if ($arr.isNullAt($k)) throw new IllegalArgumentException(
             |    "sparse_dot: null element at position " + $k + " of the $role array — " +
             |    "sparse vectors must have non-null indices/values (the hashingTf contract)");
             |}
           """.stripMargin
        }.mkString("\n")
      }
      s"""
         |$nullChecks
         |int $na = $ai.numElements();
         |int $nb = $bi.numElements();
         |if ($na != $av.numElements()) throw new IllegalArgumentException(
         |  "sparse_dot: first vector is ragged — " + $na + " indices vs " +
         |  $av.numElements() + " values");
         |if ($nb != $bv.numElements()) throw new IllegalArgumentException(
         |  "sparse_dot: second vector is ragged — " + $nb + " indices vs " +
         |  $bv.numElements() + " values");
         |double $dot = 0.0;
         |int $i = 0; int $j = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $getAIdx($i);
         |  long $y = $getBIdx($j);
         |  if ($x == $y) { $dot += $getAVal($i) * $getBVal($j); $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

object SparseExpressions {
  /** Column wrapper over [[SparseDotExpr]]. */
  def sparseDot(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column): Column =
    ExpressionUtils.column(SparseDotExpr(
      ExpressionUtils.expression(aIdx), ExpressionUtils.expression(aVal),
      ExpressionUtils.expression(bIdx), ExpressionUtils.expression(bVal)))
}
