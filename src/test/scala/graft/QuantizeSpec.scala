package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Quantize}

class QuantizeSpec extends SparkSpec {

  private lazy val vecs = Tables.embeddings(spark, sfDir)

  test("codes are in [0,255] and reconstruction error is bounded by half a bucket") {
    val (mn, mx) = Quantize.scalarRange(vecs)
    assert(mx > mn)
    val q = Quantize.quantize(vecs, "embedding", mn, mx)
      .withColumn("recon", Quantize.dequantizeExpr(col("qvec"), mn, mx))
    val bad = q.select(explode(col("qvec")).as("c"))
      .where(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0L)
    // max |x - x̂| over every element <= half bucket width (midpoint recon)
    val halfBucket = (mx - mn) / 256.0 / 2.0
    val maxErr = q.select(
      explode(arrays_zip(col("embedding"), col("qvec"))).as("z"))
      .select(abs(col("z.embedding").cast("double") -
        (lit(mn) + (col("z.qvec").cast("double") + 0.5) * lit((mx - mn) / 256.0))).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(maxErr <= halfBucket + 1e-12, s"maxErr=$maxErr halfBucket=$halfBucket")
  }

  test("KNN over dequantized vectors keeps recall >= 0.9 vs full precision") {
    val (mn, mx) = Quantize.scalarRange(vecs)
    val recon = Quantize.quantize(vecs, "embedding", mn, mx)
      .select(col("vec_id"),
        Quantize.dequantizeExpr(col("qvec"), mn, mx).cast("array<float>").as("embedding"))
    val k = 10
    val queries = (0L until 8L)
    val recalls = queries.map { qid =>
      val exact = Knn.topK(vecs, vecs.where(col("vec_id") === qid), Knn.L2, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = Knn.topK(recon, recon.where(col("vec_id") === qid), Knn.L2, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean over ${queries.size} queries: $recalls")
  }
}
