package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * Spark higher-order functions (`zip_with`/`aggregate`/`transform`) so the
  * whole computation stays inside whole-stage codegen — no UDF
  * serialization on the 100 TB hot path.
  *
  * Covers pgvector's public operator surface, which the reference uses for
  * search (`ORDER BY embedding <-> ?::vector` —
  * PDF-Summarizer/src/main/java/com/yoshio3/SSEOpenAIController.java:315):
  *   `<->` → [[l2Distance]], `<=>` → [[cosineDistance]],
  *   `<#>` → [[negInnerProduct]].
  */
object VectorFunctions {

  /** Elementwise dot product: fused single-pass codegen kernel. */
  def innerProduct(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  /** pgvector `<#>` (negative inner product — sorts ascending = most similar first). */
  def negInnerProduct(a: Column, b: Column): Column = -innerProduct(a, b)

  /** Squared L2 distance (cheaper than [[l2Distance]] when only ordering matters). */
  def l2DistanceSq(a: Column, b: Column): Column = VectorExpressions.vecL2Sq(a, b)

  /** pgvector `<->` (Euclidean distance). */
  def l2Distance(a: Column, b: Column): Column = sqrt(l2DistanceSq(a, b))

  /** pgvector 0.7 `<+>` (L1 / Manhattan distance, `vector_l1_ops`). */
  def l1Distance(a: Column, b: Column): Column = VectorExpressions.vecL1(a, b)

  def norm(a: Column): Column = sqrt(innerProduct(a, a))

  /** Cosine similarity — one fused pass computing dot + both norms. */
  def cosineSimilarity(a: Column, b: Column): Column = VectorExpressions.vecCosineSim(a, b)

  /** pgvector `<=>` (cosine distance = 1 - cosine similarity). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** L2-normalize a vector column (unit sphere; the zero vector maps to
    * itself rather than NaN). On the unit sphere cosine and L2 order
    * identically (‖â−b̂‖² = 2·(1−cos)), which is what lets the L2-trained
    * IVF machinery serve cosine workloads over normalized stores —
    * pgvector's `vector_cosine_ops` analogue. The norm subtree appears
    * once per element; codegen's subexpression elimination hoists it. */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => lit(0.0)))
  }
}
