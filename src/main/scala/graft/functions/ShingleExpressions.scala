package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a (canonical, single-spaced) text —
  * native expression replacing the interpreted
  * `transform(sequence(…), i -> concat_ws(' ', element_at…))` chain.
  * Semantics are identical to splitting on single spaces with trailing
  * fields kept, n-gram join with ' ', first-occurrence distinct; texts
  * shorter than n words yield one whole-text shingle (matches both the
  * HOF formulation and the DuckDB oracle's list-comprehension form).
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (words.length >= n) {
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    } else {
      seen.add(words.mkString(" "))
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleExpressions {
  def wordShingles(canonicalText: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(canonicalText), n))
}
