package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex

class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("a batch of re-crawled copies is found against the persisted index") {
    val tmp = Files.createTempDirectory("graft-dedup-idx").toString
    try {
      DedupIndex.writeIndex(corpus, "t_didx", s"$tmp/idx", numBuckets = 4)
      // planted: 5 exact copies (must match their originals at jaccard 1)
      // + 5 gibberish docs (must match nothing). Deterministic pick
      // (ordered limit) and id offsets far beyond any test-corpus size
      // keep the two batch id spaces disjoint.
      val copies = corpus.where(col("doc_id") % 100 === 0)
        .orderBy(col("doc_id")).limit(5)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val novels = spark.range(5).select((col("id") + 2000000).as("doc_id"),
        concat(md5(col("id").cast("string")), lit(" "),
          md5((col("id") + 99).cast("string"))).as("text"))
      val batch = copies.unionAll(novels).cache()

      val hits = DedupIndex.searchIndex(spark, "t_didx", batch, corpus, 0.8)
        .collect()
      val matchedBatch = hits.map(_.getLong(0)).toSet
      assert(matchedBatch.forall(_ < 2000000), s"gibberish doc matched: $matchedBatch")
      // every copy matches its own original at jaccard 1.0
      val selfHits = hits.filter(r => r.getLong(1) == r.getLong(0) - 1000000)
      assert(selfHits.length == 5 && selfHits.forall(_.getDouble(2) == 1.0),
        hits.mkString("; "))

      val kept = DedupIndex.novel(spark, "t_didx", batch, corpus, 0.8)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == (2000000L to 2000004L).toSet)
      batch.unpersist()
    } finally spark.sql("DROP TABLE IF EXISTS t_didx")
  }

  test("appendIndex makes earlier batches findable by later ones") {
    val tmp = Files.createTempDirectory("graft-dedup-idx-app").toString
    try {
      DedupIndex.writeIndex(corpus, "t_didx_app", s"$tmp/idx", numBuckets = 4)
      val b1 = Seq((5001L, "a genuinely novel sentence about incremental corpus growth and appends"))
        .toDF("doc_id", "text")
      assert(DedupIndex.searchIndex(spark, "t_didx_app", b1, corpus, 0.8).isEmpty)
      DedupIndex.appendIndex(b1, "t_didx_app", numBuckets = 4)
      // batch 2 re-crawls batch 1's doc; verification text now spans
      // corpus + batch 1
      val b2 = b1.select((col("doc_id") + 100).as("doc_id"), col("text"))
      val hits = DedupIndex.searchIndex(spark, "t_didx_app", b2,
        corpus.unionAll(b1), 0.8).collect()
      assert(hits.length == 1 && hits.head.getLong(1) == 5001L &&
        hits.head.getDouble(2) == 1.0, hits.mkString("; "))
    } finally spark.sql("DROP TABLE IF EXISTS t_didx_app")
  }

  test("the candidate join reads the index in place — one exchange, batch side only") {
    val tmp = Files.createTempDirectory("graft-dedup-idx-plan").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      DedupIndex.writeIndex(corpus, "t_didx_plan", s"$tmp/idx", numBuckets = 4)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = DedupIndex.candidates(spark, "t_didx_plan",
          corpus.limit(20)).queryExecution.executedPlan.toString
      val joinExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(bucket_key"))
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      assert(joinExchanges == 1,
        s"expected exactly one bucket_key exchange (batch side), got $joinExchanges:\n" +
          plan.take(1600))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_didx_plan")
    }
  }

  test("verification read prunes: id-bucket partition filter + doc_id pushdown, no semi-join scan") {
    val tmp = Files.createTempDirectory("graft-dedup-idx-prune").toString
    try {
      DedupIndex.writeIndex(corpus, "t_didx_prune", s"$tmp/idx", numBuckets = 4)
      // the incremental-ingest corpus layout: partitioned by id hash-bucket
      corpus.withColumn("id_bucket", DedupIndex.idBucket(col("doc_id"), 8))
        .write.partitionBy("id_bucket").parquet(s"$tmp/bcorpus")
      val bucketed = spark.read.parquet(s"$tmp/bcorpus")
      val batch = corpus.where(col("doc_id") % 100 === 0)
        .orderBy(col("doc_id")).limit(3)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))

      val hits = DedupIndex.searchIndex(spark, "t_didx_prune", batch, bucketed, 0.8,
        idBucketCol = Some(("id_bucket", 8)))
      // same matches as the unpruned path
      val got = hits.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = DedupIndex.searchIndex(spark, "t_didx_prune", batch, corpus, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"got=$got want=$want")
      // the 3 planted copies all self-match at jaccard 1
      assert(Seq(0L, 100L, 200L).forall(id => got.contains((id + 1000000, id, 1.0))), got)

      // the corpus verification scan must carry a STATIC id_bucket
      // partition filter (pruning at file listing) and a pushed In(doc_id)
      // data filter — and the old full-scan semi-join must be gone
      val plan = DedupIndex.searchIndex(spark, "t_didx_prune", batch, bucketed, 0.8,
        idBucketCol = Some(("id_bucket", 8))).queryExecution.executedPlan.toString
      val pfs = "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(pfs.exists(_.contains("id_bucket")), plan.take(3000))
      assert("PushedFilters: \\[[^\\]]*In\\(doc_id".r.findFirstIn(plan).nonEmpty, plan.take(3000))
      assert(!plan.contains("LeftSemi"), plan.take(3000))
    } finally spark.sql("DROP TABLE IF EXISTS t_didx_prune")
  }

  test("boilerplate buckets above maxBucket are dropped at write") {
    val tmp = Files.createTempDirectory("graft-dedup-idx-hot").toString
    try {
      // 20 identical docs: every band bucket holds 20 > maxBucket=5 ids
      val boiler = spark.range(20).select(col("id").as("doc_id"),
        lit("the same boilerplate sentence repeated across every document").as("text"))
      DedupIndex.writeIndex(boiler, "t_didx_hot", s"$tmp/idx",
        numBuckets = 2, maxBucket = 5)
      assert(spark.table("t_didx_hot").isEmpty)
      // an identical probe doc therefore finds nothing — the documented
      // cost of the quadratic-blowup guard
      val probe = Seq((99L, "the same boilerplate sentence repeated across every document"))
        .toDF("doc_id", "text")
      assert(DedupIndex.searchIndex(spark, "t_didx_hot", probe, boiler, 0.8).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS t_didx_hot")
  }
}
