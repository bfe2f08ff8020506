package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Quantize}
import graft.streaming.VectorStream

class VectorStreamSpec extends SparkSpec {

  test("streamed batches land in the quantized store; searches see them; replay converges") {
    val e = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.train(e, k = 8, iters = 2)
    val (mn, mx) = Quantize.scalarRange(e)
    val store = Files.createTempDirectory("vstream_store").toString
    val in = Files.createTempDirectory("vstream_in").toString
    val ckpt = Files.createTempDirectory("vstream_ckpt").toString

    // init with the first 400 vectors; stream the held-out 100 in
    VectorStream.initQuantizedStore(e.where(col("vec_id") >= 100), model, store, mn, mx)
    e.where(col("vec_id") < 100).write.mode("append").parquet(in)
    val q = VectorStream.startQuantizedIngest(spark, in, store, ckpt, availableNow = true)
    try q.awaitTermination() finally q.stop()

    // streamed vectors are searchable at dist 0 via the standard reader
    val probe = e.where(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding"))
    val hits = IvfIndex.searchIndexQuantized(spark, store, probe, k = 1, nprobe = 8)
      .where(col("vec_id") === col("qid")).collect()
    assert(hits.length == 100 && hits.forall(_.getDouble(2) == 0.0))
    // codes in the store equal a fresh quantization under the sidecar range
    val bad = spark.read.parquet(store)
      .where(col("qvec") =!= Quantize.quantizeExpr(col("embedding"), mn, mx))
    assert(bad.isEmpty)

    // crash replay: re-running a batch id overwrites its own partitions
    // instead of duplicating rows
    val before = spark.read.parquet(store).count()
    val replay = e.where(col("vec_id") < 50).select(col("vec_id"), col("embedding"))
    VectorStream.quantizedIngestBatch(store)(replay, 99L)
    val afterOnce = spark.read.parquet(store).count()
    VectorStream.quantizedIngestBatch(store)(replay, 99L)
    val afterTwice = spark.read.parquet(store).count()
    assert(afterOnce == before + 50)
    assert(afterTwice == afterOnce, "replayed batch must overwrite, not append")
  }
}
