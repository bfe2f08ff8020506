package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 of every word k-gram of a token array, as ONE native expression:
  * output(i) = md5hex(words(i) ‖ ' ' ‖ … ‖ words(i+k−1)) for
  * i in 0 .. len−k (empty array when len < k) — bit-identical to the
  * `transform(sequence(0, size − k), i -> md5(concat_ws(' ',
  * slice(words, i + 1, k))))` HOF chain it replaces (same byte stream
  * into the digest, same lowercase-hex encoding).
  *
  * Why: the HOF chain is CodegenFallback with interpreted per-element
  * lambdas, and `slice` COPIES k elements through boxed Vector builders
  * per position, then `concat_ws` allocates the joined string before
  * md5 even starts — this runs once per token of the corpus in the
  * span-dedup inventory (Lee et al. 2022), exactly the hot path. Here
  * each word's bytes are fetched once and streamed straight into a
  * task-reused MessageDigest per position: no slice copies, no joined
  * string, one hex allocation per gram (the output itself).
  * The digest-loop-dominates reasoning of [[MinHashSigExpr]] applies —
  * eval-based (CodegenFallback), the loop is already native code.
  */
case class GramMd5Expr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be >= 1, got $k")
    else child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got $t")
    }

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val SPACE = Array[Byte](' ')

  private val HEX = "0123456789abcdef".getBytes("US-ASCII")
  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HEX((b(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(b(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // fetch each word's bytes once (concat_ws treats null elements as
    // absent, but split() never produces them — read as non-null)
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(SPACE)
        md.update(words(i + j))
        j += 1
      }
      out(i) = hex(md.digest())
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GramExpressions {
  def gramMd5(words: Column, k: Int): Column =
    ColumnBridge.column(GramMd5Expr(ColumnBridge.expression(words), k))
}
