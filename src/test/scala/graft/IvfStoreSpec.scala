package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

class IvfStoreSpec extends SparkSpec {

  test("persisted IVF index: partition-pruned search equals in-memory probing") {
    val path = Files.createTempDirectory("ivf_index").toString
    val e = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.train(e, k = 16, iters = 3)
    IvfIndex.writeIndex(e, model, path)

    // centroid sidecar round-trips
    val back = IvfIndex.readModel(spark, path)
    assert(back.centroids.length == 16)
    assert(back.centroids(0).zip(model.centroids(0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    val q = e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
    val fromDisk = IvfIndex.searchIndex(spark, path, q, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inMem = IvfIndex.topK(e, q, model, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromDisk == inMem)

    // the probed search prunes partitions: the scan's PartitionFilters
    // must be NON-empty (an empty "PartitionFilters: []" would mean a
    // full index scan)
    val plan = IvfIndex.searchIndex(spark, path, q, k = 3, nprobe = 4)
      .queryExecution.executedPlan.toString
    val m = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    assert(m.exists(_.group(1).nonEmpty), plan.take(1500))
  }

  test("appendIndex grows a persisted index; searches see new vectors, pruning survives") {
    val path = Files.createTempDirectory("ivf_index_app").toString
    val e = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.train(e, k = 8, iters = 2)
    IvfIndex.writeIndex(e.where(col("vec_id") >= 10), model, path)

    // the held-out vectors are invisible, then appended, then found —
    // self-search puts each at cos 1.0 rank 1
    val held = e.where(col("vec_id") < 10)
    val q = held.select(col("vec_id").as("qid"), col("embedding"))
    val before = IvfIndex.searchIndex(spark, path, q, k = 1, nprobe = 8)
      .where(col("vec_id") === col("qid"))
    assert(before.isEmpty)
    IvfIndex.appendIndex(spark, path, held)
    val after = IvfIndex.searchIndex(spark, path, q, k = 1, nprobe = 8)
      .where(col("vec_id") === col("qid")).collect()
    assert(after.length == held.count() && after.forall(_.getDouble(2) == 1.0),
      after.mkString("; "))

    // appended rows landed in the cells the model assigns (partition
    // pruning stays truthful) and the probed search still prunes
    val assigned = spark.read.parquet(path)
      .select(col("vec_id"), col("cell"),
        IvfIndex.cellOf(col("embedding"), model).as("want"))
      .where(col("cell") =!= col("want"))
    assert(assigned.isEmpty)
    val plan = IvfIndex.searchIndex(spark, path, q.limit(2), k = 1, nprobe = 2)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pf.exists(_.contains("cell")), plan.take(2000))
  }

  test("cellStats sums to the corpus; skewed appends trip needsRebuild") {
    val path = Files.createTempDirectory("ivf_index_stats").toString
    val e = Tables.embeddings(spark, sfDir)
    val model = IvfIndex.train(e, k = 8, iters = 2)
    IvfIndex.writeIndex(e, model, path)
    val stats = IvfIndex.cellStats(spark, path).collect()
    assert(stats.map(_.getLong(1)).sum == e.count())
    assert(math.abs(stats.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(!IvfIndex.needsRebuild(spark, path, maxSkew = 4.0))
    // pile many copies of ONE vector into its cell — the quantizer is
    // now stale for the grown corpus and the trigger fires
    val one = e.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding")).collect().head
    val copies = spark.range(e.count() * 8).select(
      (col("id") + 1000000).as("vec_id"),
      org.apache.spark.sql.functions.typedlit(one.getSeq[Float](1)).as("embedding"))
    IvfIndex.appendIndex(spark, path, copies)
    // hot cell ≈ 8N + N/8 vs mean 9N/8 → skew ≈ 7.2×
    assert(IvfIndex.needsRebuild(spark, path, maxSkew = 4.0))
  }

  test("streaming dedup drops re-uploaded docs across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocStream.dedupByFingerprint(docs).writeStream
      .format("memory").queryName("dedup_stream_test").outputMode("append").start()
    try {
      input.addData((1L, "alpha beta"), (2L, "gamma delta"))
      q.processAllAvailable()
      input.addData((3L, "alpha beta"), (4L, "epsilon zeta"))  // 3 is a re-upload of 1's content
      q.processAllAvailable()
      val texts = spark.table("dedup_stream_test").select("text")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(texts == Seq("alpha beta", "epsilon zeta", "gamma delta"))
    } finally q.stop()
  }
}
