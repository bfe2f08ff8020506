package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE native expression: for each permutation j,
  * min over shingles of md5(shingle ++ "#j"), compared on raw digest
  * bytes (unsigned byte order == lowercase-hex lexicographic order, so
  * results are bit-identical to the SQL formulation
  * `list_min([md5(s || '#' || j) …])` the DuckDB oracle uses).
  *
  * Why an expression and not `transform(seeds, j -> array_min(transform(
  * sh, s -> md5(…))))`: Spark higher-order functions are CodegenFallback
  * and pay per-element interpreted-lambda dispatch; this inner loop runs
  * numPerm × |shingles| times per row, which is exactly the hot path at
  * corpus scale. One MessageDigest reused per task, zero boxing.
  * The digest work itself dominates, so the expression is eval-based
  * (CodegenFallback) — the loop is already native code.
  */
case class MinHashSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** Analysis-time validation — reachable from the SQL surface
    * (`minhash_sig(sh, -4)`), where a bad literal must fail the query
    * plan, not throw NegativeArraySizeException on an executor. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (numPerm <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: numPerm must be positive, got $numPerm")
    else child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string> shingles, got $t")
    }

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(numPerm)(j => ("#" + j).getBytes("UTF-8"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HEX = "0123456789abcdef".toCharArray
  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HEX((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // hash each shingle once per permutation; keep raw digests until the end
    val shingleBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { shingleBytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Any](numPerm)
    var j = 0
    while (j < numPerm) {
      var best: Array[Byte] = null
      i = 0
      while (i < n) {
        md.reset()
        md.update(shingleBytes(i))
        md.update(suffixes(j))
        val d = md.digest()
        if (best == null || unsignedLess(d, best)) best = d
        i += 1
      }
      out(j) = hex(best)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashExpressions {
  def minhashSig(shingles: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numPerm))
}
