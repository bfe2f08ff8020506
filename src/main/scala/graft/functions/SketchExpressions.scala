package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimate of `child` against a pre-built Count-Min sketch —
  * the probe side Spark does not ship (it has only the build aggregate,
  * `count_min_sketch`). Estimates NEVER undercount (CMS increments every
  * (row, hash) cell, so collisions only add), which is what makes a
  * `estimate >= threshold` pre-filter lossless for heavy-hitter
  * detection: sub-threshold keys may survive (false positives, removed
  * by the exact verify), but no above-threshold key is dropped.
  *
  * Key hashing mirrors `CountMinSketchAgg.update` exactly: string keys
  * probe via their UTF-8 bytes, integral keys via their widened long —
  * build and probe agree bit-for-bit.
  *
  * The serialized sketch rides in the expression (depth×width×8 bytes,
  * ~100 KB at eps=1e-3) and is deserialized once per task, like the
  * broadcast BPE vocab; generated code calls back into [[estimate]], so
  * the probe stays inside whole-stage codegen.
  */
case class CmsEstimateExpr(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string/long/int key, got ${t.sql}")
  }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  def estimate(key: UTF8String): Long = sketch.estimateCount(key.getBytes)
  def estimate(key: Long): Long = sketch.estimateCount(java.lang.Long.valueOf(key))

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => estimate(s)
    case l: java.lang.Long => estimate(l.longValue)
    case i: java.lang.Integer => estimate(i.longValue)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimateExpr].getName)
      val key = child.dataType match {
        case IntegerType => s"(long) $v"
        case _ => v // UTF8String or long: overload resolution picks the match
      }
      s"${ev.value} = $self.estimate($key);"
    })

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateExpr =
    copy(child = newChild)
}
