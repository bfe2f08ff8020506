package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference chunker (TextFunctions.chunkText) as a native expression
  * — replaces the Scala UDF on the ingest path (no ScalaUDF
  * encoder/serialization per row; the split loop runs directly on the
  * row's string). Semantics identical to Function.java:214-245. */
case class ChunkTextExpr(child: Expression, maxLen: Int, lookback: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_text"

  override protected def nullSafeEval(input: Any): Any = {
    val chunks = TextFunctions.chunkText(input.asInstanceOf[UTF8String].toString, maxLen, lookback)
    new GenericArrayData(chunks.map(UTF8String.fromString(_): Any).toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ChunkExpressions {
  def chunkText(c: Column, maxLen: Int = 7500, lookback: Int = 300): Column =
    ColumnBridge.column(ChunkTextExpr(ColumnBridge.expression(c), maxLen, lookback))
}
