package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Knn}

class HnswSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, sfDir)
  private lazy val index = Hnsw.build(e, m = 16, efConstruction = 64)

  test("deterministic levels: geometric-ish decay, stable across builds") {
    val counts = (0 to 3).map(l => (0L until 1000L).count(Hnsw.levelOf(_, 16) >= l))
    assert(counts(0) == 1000)
    // P(level >= 1) = 1/16: expect ~62 of 1000, generous band
    assert(counts(1) > 20 && counts(1) < 150, counts)
    assert(counts(2) <= counts(1) && counts(3) <= counts(2))
    val again = Hnsw.build(e, m = 16, efConstruction = 64)
    assert(again.entryPoint == index.entryPoint && again.topLevel == index.topLevel)
    assert(again.layers(0).zip(index.layers(0)).forall { case (a, b) => a.sameElements(b) })
  }

  test("recall >= 0.9 vs exact KNN; self-search hits itself at dist 0") {
    val k = 10
    val recalls = (0L until 8L).map { qid =>
      val exact = Knn.topK(e, e.where(col("vec_id") === qid), Knn.L2, k)
        .collect().map(_.getLong(0)).toSet
      val q = e.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      val approx = Hnsw.searchIndex(index, q, k, ef = 64).map(_._1).toSet
      (exact intersect approx).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean: $recalls")
    val q0 = e.where(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val top = Hnsw.searchIndex(index, q0, 1).head
    assert(top._1 == 3L && top._2 == 0.0)
  }

  test("broadcast batch search: distributed results match driver-side searches") {
    val queries = e.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding"))
      .repartition(3)
    val batch = Hnsw.topKBatch(spark, index, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    val driver = (0L until 6L).flatMap { qid =>
      val q = e.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      Hnsw.searchIndex(index, q, 5, ef = 64).zipWithIndex.map { case ((id, _), rank) =>
        (qid, (rank + 1).toLong, id)
      }
    }.toSet
    assert(batch == driver)
  }

  test("persisted graph round-trips; searches identical from disk") {
    val path = Files.createTempDirectory("hnsw_idx").toString
    Hnsw.writeIndex(spark, index, path)
    val back = Hnsw.readIndex(spark, path)
    assert(back.size == index.size && back.topLevel == index.topLevel)
    assert(back.ids(back.entryPoint) == index.ids(index.entryPoint))
    val q = e.where(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    assert(Hnsw.searchIndex(back, q, 10) == Hnsw.searchIndex(index, q, 10))
  }

  test("append: new vectors searchable, old recall holds, cap bounds the total") {
    val base = Hnsw.build(e.where(col("vec_id") >= 100), m = 16, efConstruction = 64)
    val held = e.where(col("vec_id") < 100)
    val grown = Hnsw.append(base, held)
    assert(grown.size == index.size)
    // appended vectors find themselves at dist 0
    (0L until 10L).foreach { qid =>
      val q = e.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      val top = Hnsw.searchIndex(grown, q, 1).head
      assert(top._1 == qid && top._2 == 0.0, s"qid=$qid got $top")
    }
    // recall on the grown graph stays >= 0.9 (queries from both halves)
    val k = 10
    val recalls = Seq(3L, 7L, 150L, 200L, 250L, 300L).map { qid =>
      val exact = Knn.topK(e, e.where(col("vec_id") === qid), Knn.L2, k)
        .collect().map(_.getLong(0)).toSet
      val q = e.where(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      val approx = Hnsw.searchIndex(grown, q, k, ef = 64).map(_._1).toSet
      (exact intersect approx).size.toDouble / k
    }
    assert(recalls.sum / recalls.size >= 0.9, recalls)
    // total cap: appending beyond maxNodes fails fast
    val err = intercept[IllegalArgumentException] {
      Hnsw.append(base, held, maxNodes = base.size + 10)
    }
    assert(err.getMessage.contains("IvfIndex"))
  }

  test("sharded build: executor-built per-shard graphs; scatter-gather recall; shard-covering ef degenerates to exact") {
    val path = Files.createTempDirectory("hnsw_sharded").toString
    Hnsw.writeIndexSharded(e, numShards = 4, path, m = 16, efConstruction = 64)
    val store = spark.read.parquet(path)
    assert(store.count() == 4)
    val total = store.agg(sum(col("n"))).head().getLong(0)
    assert(total == e.count())

    val queries = e.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding"))
    val k = 10
    val approx = Hnsw.searchIndexSharded(spark, path, queries, k, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = (0L until 6L).map { qid =>
      val exact = Knn.topK(e, e.where(col("vec_id") === qid), Knn.L2, k)
        .collect().map(_.getLong(0)).toSet
      (exact intersect approx(qid)).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean: $recalls")

    // per-shard exact beam (ef = corpus ≥ shard size): union of per-shard
    // top-k ⊇ global top-k, so the merged answer IS exact KNN — ids and
    // (rounded) distances
    val n = e.count().toInt
    val q3 = e.where(col("vec_id") === 3).select(col("vec_id").as("qid"), col("embedding"))
    val full = Hnsw.searchIndexSharded(spark, path, q3, k = 5, ef = n)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    val exact5 = Knn.topK(e, e.where(col("vec_id") === 3), Knn.L2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(full == exact5)

    // deterministic: a second build yields identical search results
    val path2 = Files.createTempDirectory("hnsw_sharded2").toString
    Hnsw.writeIndexSharded(e, numShards = 4, path2, m = 16, efConstruction = 64)
    val again = Hnsw.searchIndexSharded(spark, path2, queries, k, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val first = Hnsw.searchIndexSharded(spark, path, queries, k, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(again == first)

    // READ-ONLY staleness gate: a committed-but-unfinished maintenance
    // swap (staging dir WITH a _plan.json) makes reads refuse loud — the
    // on-disk shard mix may double or drop ids until it rolls forward.
    // A staging dir WITHOUT a manifest (staging write crashed) is safe.
    val stg = new java.io.File(path2 + "__maint_staging")
    assert(stg.mkdirs())
    assert(Hnsw.searchIndexSharded(spark, path2, queries, k, ef = 64).count() > 0,
      "plan-less staging dir must not block reads")
    java.nio.file.Files.writeString(
      new java.io.File(stg, "_plan.json").toPath, """{"rewrite":[0],"drain":[]}""")
    val ePending = intercept[IllegalArgumentException](
      Hnsw.searchIndexSharded(spark, path2, queries, k, ef = 64))
    assert(ePending.getMessage.contains("unfinished maintenance swap"),
      ePending.getMessage)
    // the next maintenance op rolls the (no-op) swap forward and reads resume
    new java.io.File(stg, "_plan.json").delete(); stg.delete()
    assert(Hnsw.searchIndexSharded(spark, path2, queries, k, ef = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet == first)

    // per-shard cap fails fast with the scale pointer
    val err = intercept[org.apache.spark.SparkException] {
      Hnsw.writeIndexSharded(e, numShards = 2,
        Files.createTempDirectory("hnsw_sharded_cap").toString, maxNodesPerShard = 10)
    }
    assert(err.getMessage.contains("maxNodesPerShard") ||
      Option(err.getCause).exists(_.getMessage.contains("maxNodesPerShard")))
  }

  test("sharded build: negative ids land in floorMod shards and stay searchable") {
    val path = Files.createTempDirectory("hnsw_neg").toString
    // shift every id negative: id - 10^6 ∈ [-10^6, …)
    val neg = e.withColumn("vec_id", col("vec_id") - lit(1000000L))
    Hnsw.writeIndexSharded(neg, numShards = 4, path, m = 16, efConstruction = 64)
    val store = spark.read.parquet(path)
    val shards = store.select("shard").collect().map(_.getInt(0)).toSet
    assert(shards.forall(s => s >= 0 && s < 4), s"shard ids out of range: $shards")
    assert(shards.size == 4, s"negative ids collapsed into ${shards.size} shards: $shards")
    assert(store.agg(sum(col("n"))).head().getLong(0) == e.count())
    // shard-covering ef still degenerates to exact KNN on the shifted ids
    val q3 = neg.where(col("vec_id") === (3L - 1000000L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val n = e.count().toInt
    val full = Hnsw.searchIndexSharded(spark, path, q3, k = 5, ef = n)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    val exact5 = Knn.topK(neg, neg.where(col("vec_id") === (3L - 1000000L)), Knn.L2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(full == exact5)
  }

  test("sharded append: new vectors searchable, untouched shards byte-identical, exactness holds") {
    val path = Files.createTempDirectory("hnsw_sh_app").toString
    val held = e.where(col("vec_id") < 20 && pmod(col("vec_id"), lit(4)) === 0) // shard 0 only
    Hnsw.writeIndexSharded(e.where(col("vec_id") >= 20 || pmod(col("vec_id"), lit(4)) =!= 0),
      numShards = 4, path)
    val before = spark.read.parquet(path).select("shard", "n", "graph").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Array[Byte]](2))).toMap

    val q = held.select(col("vec_id").as("qid"), col("embedding"))
    val missing = Hnsw.searchIndexSharded(spark, path, q, k = 1, ef = 64)
      .where(col("vec_id") === col("qid"))
    assert(missing.isEmpty) // held-out ids invisible pre-append

    Hnsw.appendIndexSharded(spark, path, held)
    val after = spark.read.parquet(path).select("shard", "n", "graph").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Array[Byte]](2))).toMap
    // only shard 0 received ids ≡ 0 (mod 4); shards 1–3 byte-identical
    (1 to 3).foreach { s =>
      assert(after(s)._1 == before(s)._1 && after(s)._2.sameElements(before(s)._2), s"shard $s")
    }
    assert(after(0)._1 == before(0)._1 + held.count())

    // appended vectors now found at rank 1 / dist 0 (self-search)
    val found = Hnsw.searchIndexSharded(spark, path, q, k = 1, ef = 64)
      .where(col("vec_id") === col("qid") && col("rn") === 1)
    assert(found.count() == held.count())

    // covering-ef exactness survives the append
    val n = e.count().toInt
    val q2 = q.where(col("qid") < 8) // ids 0, 4 — deterministic pair
    val exact = Knn.topKBatch(e, q2, Knn.L2, 5).orderBy("qid", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val sharded = Hnsw.searchIndexSharded(spark, path, q2, k = 5, ef = n)
      .orderBy("qid", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(sharded == exact, s"sharded=$sharded exact=$exact")

    // per-shard cap fails fast
    val err = intercept[Exception] {
      Hnsw.appendIndexSharded(spark, path,
        e.where(col("vec_id") >= 20).limit(50), maxNodesPerShard = 3)
    }
    assert(err.getMessage.contains("maxNodesPerShard"))
  }

  test("tombstone delete: searches exclude, still fill k, exact over survivors; append refused; rebuild purges") {
    import spark.implicits._
    val path = Files.createTempDirectory("hnsw_del").toString
    Hnsw.writeIndexSharded(e, numShards = 4, path, m = 16, efConstruction = 64)
    val n = e.count().toInt
    val q3 = e.where(col("vec_id") === 3).select(col("vec_id").as("qid"), col("embedding"))
    // delete the query's current top-2 neighbors (excluding itself)
    val top = Hnsw.searchIndexSharded(spark, path, q3, k = 3, ef = n)
      .collect().map(_.getLong(1)).filter(_ != 3L).take(2).toSeq
    Hnsw.deleteFromIndexSharded(spark, path, top.toDF("vec_id"))
    val got = Hnsw.searchIndexSharded(spark, path, q3, k = 5, ef = n)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    assert(got.size == 5, s"deletion starved the result: $got")
    assert(got.forall(r => !top.contains(r._1)), s"tombstoned id returned: $got")
    // exact over the survivors at covering ef
    val alive = e.where(!col("vec_id").isin(top: _*))
    val exact = Knn.topK(alive, e.where(col("vec_id") === 3), Knn.L2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(got == exact, s"got=$got exact=$exact")
    // the ROUTED reader applies the same tombstones
    val rpath = Files.createTempDirectory("hnsw_del_rt").toString
    Hnsw.writeIndexRouted(e, numShards = 4, rpath)
    Hnsw.deleteFromIndexSharded(spark, rpath, top.toDF("vec_id"))
    val routed = Hnsw.searchIndexRouted(spark, rpath, q3, k = 5, ef = n, probeShards = 4)
      .collect().map(_.getLong(1)).toList
    assert(routed.forall(id => !top.contains(id)), s"routed returned tombstoned: $routed")
    // re-inserting a tombstoned id is refused (the stale node would
    // resurrect beside the new one)
    val err = intercept[IllegalArgumentException](
      Hnsw.appendIndexSharded(spark, path,
        Seq((top.head, Seq.fill(e.select(size(col("embedding"))).head().getInt(0))(0.1f)))
          .toDF("vec_id", "embedding")))
    assert(err.getMessage.contains("tombstoned"), err.getMessage)
    // cap fails loud with the rebuild pointer
    val err2 = intercept[IllegalArgumentException](
      Hnsw.deleteFromIndexSharded(spark, path,
        e.select(col("vec_id")), maxTombstones = 10))
    assert(err2.getMessage.contains("rebuild"), err2.getMessage)
    // a full rebuild purges the tombstones physically
    Hnsw.writeIndexSharded(e, numShards = 4, path, m = 16, efConstruction = 64)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "_tombstones")),
      "rebuild left the tombstone dir")
    val back = Hnsw.searchIndexSharded(spark, path, q3, k = 3, ef = n)
      .collect().map(_.getLong(1)).toSet
    assert(top.forall(back.contains), "rebuild did not restore the purged ids")
  }

  test("iterative filtered search: ef escalation fills k; starved filter degenerates exact") {
    val q = e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))

    // (1) matches >= k: from a tiny initial beam (ef=2) every query must
    // still return exactly k allowed survivors
    val allowedBroad = e.where(pmod(col("vec_id"), lit(2)) === 0).select(col("vec_id"))
    val filled = Hnsw.topKBatchFiltered(spark, index, q, allowedBroad, k = 8, ef = 2)
    val perQ = filled.groupBy("qid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQ.size == 5 && perQ.values.forall(_ == 8L), perQ.toString)
    assert(filled.select("vec_id").collect().forall(_.getLong(0) % 2 == 0))

    // (2) starved filter (|allowed| < k): exact-scan fallback returns all
    // allowed rows with exact L2 distances — equals brute force
    val allowedTiny = e.where(col("vec_id") < 7).select(col("vec_id"))
    val got = Hnsw.topKBatchFiltered(spark, index, q, allowedTiny, k = 10, ef = 2)
      .orderBy("qid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val exact = Knn.topKBatch(e.where(col("vec_id") < 7), q, Knn.L2, 10)
      .orderBy("qid", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == exact, s"got=${got.take(8)} exact=${exact.take(8)}")

    // (3) oversized filter set fails fast toward the IVF path
    val err = intercept[IllegalArgumentException] {
      Hnsw.topKBatchFiltered(spark, index, q, e.select(col("vec_id")), k = 3,
        ef = 4, maxFilterIds = 10)
    }
    assert(err.getMessage.contains("IvfIndex.searchIndexFiltered"))
  }

  test("maxNodes cap fails fast with the IVF pointer") {
    val err = intercept[IllegalArgumentException] {
      Hnsw.build(e, maxNodes = 10)
    }
    assert(err.getMessage.contains("IvfIndex"))
  }

  test("routed shards: p < numShards keeps recall >= 0.9; p = numShards degenerates exact") {
    val path = Files.createTempDirectory("hnsw_routed").toString
    Hnsw.writeIndexRouted(e, numShards = 4, path, m = 16, efConstruction = 64)
    val store = spark.read.parquet(path)
    assert(store.agg(sum(col("n"))).head().getLong(0) == e.count())
    assert(new java.io.File(path, "_shard_centroids.json").exists())

    // Routing recall is governed by the store's CLUSTER COHERENCE (the
    // documented contract): on a clustered corpus — the case a routing
    // tier exists for — probing p < numShards keeps recall high, so the
    // recall floor is pinned on a PLANTED-cluster corpus (the
    // ClusteringSpec pattern; the driver's embeddings are near-uniform,
    // where any hard shard pruning is blind by construction).
    val rnd = new scala.util.Random(11)
    val clustered = (0 until 4).flatMap { c =>
      val center = Array.tabulate(16)(j => if (j == c * 4) 10.0 else 0.0)
      (0 until 60).map { i =>
        (c * 100L + i, center.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
      }
    }
    import spark.implicits._
    val pc = clustered.toDF("vec_id", "embedding")
    val pcPath = Files.createTempDirectory("hnsw_routed_pc").toString
    Hnsw.writeIndexRouted(pc, numShards = 4, pcPath, m = 8, efConstruction = 32)
    val pcQueries = pc.where(col("vec_id") % 100 < 2)
      .select(col("vec_id").as("qid"), col("embedding"))
    val k = 10
    val routed = Hnsw.searchIndexRouted(spark, pcPath, pcQueries, k,
        ef = 240, probeShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val qids = pcQueries.select(col("qid")).collect().map(_.getLong(0))
    val recalls = qids.toSeq.map { qid =>
      val exact = Knn.topK(pc, pc.where(col("vec_id") === qid), Knn.L2, k)
        .collect().map(_.getLong(0)).toSet
      (exact intersect routed(qid)).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"routed mean recall $mean: $recalls")

    val n = e.count().toInt
    // full probe + covering ef: identical to exact KNN, ids AND distances
    val q3 = e.where(col("vec_id") === 3).select(col("vec_id").as("qid"), col("embedding"))
    val full = Hnsw.searchIndexRouted(spark, path, q3, k = 5, ef = n, probeShards = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    val exact5 = Knn.topK(e, e.where(col("vec_id") === 3), Knn.L2, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(full == exact5)

    // the probed-shard pruning really prunes: the scan under a p=1 search
    // reads fewer shard directories than the store holds (partition
    // pruning on `shard IN`, the IVF access pattern)
    val one = Hnsw.searchIndexRouted(spark, path, q3, k = 3, ef = 64, probeShards = 1)
    assert(one.count() == 3)

    // a hash-sharded store has no routing sidecar: fail fast, with the
    // full-scatter pointer
    val hashPath = Files.createTempDirectory("hnsw_hash_noroute").toString
    Hnsw.writeIndexSharded(e, numShards = 4, hashPath)
    val err = intercept[IllegalArgumentException] {
      Hnsw.searchIndexRouted(spark, hashPath, q3, k = 3)
    }
    assert(err.getMessage.contains("searchIndexSharded"), err.getMessage)
  }
}
