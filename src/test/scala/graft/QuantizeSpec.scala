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

  test("quantized-scan KNN with rerank keeps recall >= 0.95 vs exact") {
    val (mn, mx) = Quantize.scalarRange(vecs)
    val codes = Quantize.quantize(vecs, "embedding", mn, mx)
      .select(col("vec_id"), col("qvec"))
    val k = 10
    val recalls = (0L until 8L).map { qid =>
      val q = vecs.where(col("vec_id") === qid)
      val exact = Knn.topK(vecs, q, Knn.L2, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = Quantize.topKQuantized(codes, vecs, q, mn, mx, k, overfetch = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact intersect approx).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.95, s"mean recall $mean: $recalls")
  }

  test("store coarse scan reads only the code column; rerank pushes id IN filter") {
    val (mn, mx) = Quantize.scalarRange(vecs)
    val dir = java.nio.file.Files.createTempDirectory("qstore").toString
    Quantize.writeStore(vecs, dir, mn, mx)
    val q = vecs.where(col("vec_id") === 0)

    val coarse = Quantize.coarseCandidates(spark.read.parquet(dir), q, mn, mx, n = 40)
    val coarsePlan = coarse.queryExecution.executedPlan.toString
    // the corpus-wide scan must NOT deserialize the float column — that's
    // the whole 4x-IO point of the codec
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(coarsePlan).toList
    val corpusScans = readSchemas.filter(_.contains("qvec"))
    assert(corpusScans.nonEmpty, coarsePlan.take(3000))
    assert(corpusScans.forall(!_.contains("embedding")),
      s"coarse scan reads float column: $corpusScans")

    val candIds = coarse.collect().map(_.getLong(0))
    val rerank = Quantize.rerankRead(spark.read.parquet(dir), q, candIds, k = 5)
    val rerankPlan = rerank.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*In\\(vec_id".r.findFirstIn(rerankPlan).nonEmpty,
      rerankPlan.take(3000))

    // store path end-to-end equals the inline quantized pipeline
    val viaStore = Quantize.topKStore(spark, dir, q, mn, mx, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val codes = Quantize.quantize(vecs, "embedding", mn, mx).select(col("vec_id"), col("qvec"))
    val inline = Quantize.topKQuantized(codes, vecs, q, mn, mx, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(viaStore == inline)
  }
}
