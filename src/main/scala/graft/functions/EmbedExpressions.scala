package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The md5 hashing-trick featurizer as ONE row-local native expression:
  * tokenize canonical text on spaces, hash each token (md5, first 4
  * digest bytes as an unsigned 32-bit int — identical to SQL
  * `conv(substr(md5(t),1,8),16,10)` / DuckDB `('0x'||…)::BIGINT`), vote
  * ±1 into bucket `h % dim` with sign from `(h / dim) % 2`, return the
  * per-bucket vote sums.
  *
  * This replaces the explode-tokens → groupBy(doc, bucket) formulation:
  * the votes never leave the row, so the embedding pass carries ZERO
  * shuffles — the difference between a narrow scan and shuffling one row
  * per token at 100 TB. Vote sums are integers, so results are
  * bit-identical to the aggregate formulation and the DuckDB oracle.
  *
  * `dense = false` keeps untouched buckets NULL (the sparse contract:
  * "bucket appears iff a token hashed into it", which the sparse output
  * queries preserve); `dense = true` emits 0.0 instead, for fused
  * vector-kernel math (dot/cosine over the full dim).
  *
  * Digest-bound like MinHashSigExpr, hence eval-based (CodegenFallback):
  * the md5 loop dominates, and it is already native code.
  */
case class Md5EmbedExpr(child: Expression, dim: Int, dense: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = !dense)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_embed"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (dim <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: dim must be positive, got $dim")
    else if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    // split(" ", -1) matches Spark/DuckDB string_split semantics,
    // including the single empty token for empty text
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Double](dim)
    val touched = new Array[Boolean](dim)
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val d = md.digest(tokens(i).getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val b = (h % dim).toInt
      votes(b) += (if (((h / dim) % 2) == 0L) 1.0 else -1.0)
      touched(b) = true
      i += 1
    }
    val out = new Array[Any](dim)
    var b = 0
    while (b < dim) {
      out(b) = if (touched(b) || dense) java.lang.Double.valueOf(votes(b)) else null
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EmbedExpressions {
  /** Per-bucket ±1 vote sums of the md5 hashing-trick featurizer;
    * untouched buckets NULL (`dense = false`) or 0.0 (`dense = true`). */
  def md5EmbedVotes(text: Column, dim: Int, dense: Boolean = false): Column =
    ColumnBridge.column(Md5EmbedExpr(ColumnBridge.expression(text), dim, dense))
}
