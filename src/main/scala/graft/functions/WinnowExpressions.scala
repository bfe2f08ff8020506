package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme): hash every
  * character k-gram, slide a window of w hashes, keep each window's
  * minimum — a position-robust fingerprint set whose density is
  * guaranteed (one pick per window) regardless of document length.
  *
  * Hashes are md5 (lowercase hex) so the DuckDB oracle can replay the
  * exact pipeline with list comprehensions:
  *   kgrams  = [substr(t, i, k)        for i in 1..len-k+1]
  *   hashes  = [md5(g)                 for g in kgrams]
  *   picks   = [list_min(hashes[j:j+w-1]) for j in 1..n-w+1]
  *   fingerprints = sorted distinct picks
  * Degenerate cases: len < k → [md5(text)]; fewer than w hashes →
  * [min(all hashes)]. Native expression (digest loop — see
  * MinHashSigExpr for why HOFs are wrong here); min-of-window via a
  * monotonic deque, O(n) total.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  private val HEX = "0123456789abcdef".toCharArray
  private def hexOf(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < b.length) { sb.append(HEX((b(i) >> 4) & 0xf)); sb.append(HEX(b(i) & 0xf)); i += 1 }
    sb.toString
  }

  private def md5Hex(s: String): String = {
    md.reset()
    hexOf(md.digest(s.getBytes("UTF-8")))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new java.util.TreeSet[String]()
    if (text.length < k) {
      out.add(md5Hex(text))
    } else {
      val n = text.length - k + 1
      val hashes = new Array[String](n)
      var i = 0
      while (i < n) { hashes(i) = md5Hex(text.substring(i, i + k)); i += 1 }
      if (n < w) {
        out.add(hashes.min)
      } else {
        // monotonic deque of indices; front = min of current window
        val dq = new java.util.ArrayDeque[Int]()
        var j = 0
        while (j < n) {
          while (!dq.isEmpty && hashes(dq.peekLast) >= hashes(j)) dq.pollLast()
          dq.addLast(j)
          if (dq.peekFirst <= j - w) dq.pollFirst()
          if (j >= w - 1) out.add(hashes(dq.peekFirst))
          j += 1
        }
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowExpressions {
  /** Sorted distinct winnowing fingerprints of (canonical) text. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
}
