package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Clustering, IvfIndex}

/** DBSCAN semantics (Ester et al. 1996) pinned on a handcrafted pair
  * graph, plus the blocked-pair-generation contracts: full probe is
  * EXHAUSTIVE (== all-pairs), partial probe keeps recall, and the whole
  * labeling is deterministic. */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  private lazy val e = Tables.embeddings(spark, sfDir)

  test("handcrafted graph: core/border/noise roles and deterministic border assignment") {
    // two 4-cliques, never density-bridged; minPts = 4 (count includes
    // self, so core needs >= 3 neighbors):
    //   cluster A: {1,2,3,4} complete -> all core
    //   cluster B: {10,11,12,13} complete -> all core
    //   border of BOTH: 5 touches core 1 (A) and core 10 (B); degree 2
    //     (+self = 3 < 4) keeps it non-core, so it never merges A and B
    //   border: 6 touches core 2 only
    //   noise: 20-21 (degree 1 each, neither adjacent to a core)
    //   isolated: 30 (no pairs at all)
    val points = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L, 13L, 20L, 21L, 30L).toDF("vec_id")
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (1L, 5L), (5L, 10L), (2L, 6L), (20L, 21L))
      .toDF("id1", "id2").withColumn("d", lit(0.1))
    val got = Clustering.dbscanFromPairs(points, pairs, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (1L to 4L).foreach(id => assert(got(id) == (1L, "core"), s"$id: ${got(id)}"))
    (10L to 13L).foreach(id => assert(got(id) == (10L, "core"), s"$id: ${got(id)}"))
    // 5 is adjacent to cores in clusters 1 and 10: deterministic min
    assert(got(5L) == (1L, "border"))
    assert(got(6L) == (1L, "border"))
    assert(got(20L) == (-1L, "noise") && got(21L) == (-1L, "noise"))
    assert(got(30L) == (-1L, "noise"))
  }

  test("isolated core (all neighbors non-core) forms its own singleton cluster") {
    // star: 100 touches 4 leaves (degree 4 + self >= 5 -> core at
    // minPts 5); each leaf has degree 1 -> border of cluster 100
    val points = Seq(100L, 101L, 102L, 103L, 104L).toDF("vec_id")
    val pairs = Seq((100L, 101L), (100L, 102L), (100L, 103L), (100L, 104L))
      .toDF("id1", "id2").withColumn("d", lit(0.1))
    val got = Clustering.dbscanFromPairs(points, pairs, minPts = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(100L) == (100L, "core"))
    (101L to 104L).foreach(id => assert(got(id) == (100L, "border"), s"$id: ${got(id)}"))
  }

  test("full probe pair generation is exhaustive (== all-pairs) and partial probe keeps recall") {
    val model = IvfIndex.train(e, k = 8, iters = 2)
    val exhaustive = e.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .crossJoin(e.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(lit(1.0) - VectorFunctions.cosineSimilarity(col("e1"), col("e2")), 4).as("d"))
      .where(col("d") <= 0.65)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Clustering.epsNeighbors(e, eps = 0.65, model, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exhaustive, s"full=${full.size} exhaustive=${exhaustive.size}")

    val partial = Clustering.epsNeighbors(e, eps = 0.65, model, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partial.subsetOf(exhaustive))
    val recall = partial.size.toDouble / exhaustive.size.max(1)
    assert(recall >= 0.6, s"partial-probe recall $recall")
  }

  test("partial-probe dbscan recovers planted clusters (production-path recall floor)") {
    import spark.implicits._
    // Three tight planted clusters along orthogonal axes (within-cluster
    // cosine distance ≲ 0.01, cross-cluster ≈ 1.0) + isolated noise
    // points along pairwise-distant diagonals — all deterministic.
    val dim = 8
    def unit(axis: Int, jitterAxis: Int, jitter: Double): Seq[Double] = {
      val v = Array.fill(dim)(0.0)
      v(axis) = 1.0
      v(jitterAxis) = jitter
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val clustered = for {
      c <- 0 until 3
      j <- 0 until 20
    } yield (c.toLong * 100 + j, unit(c, 3 + (j % 4), 0.05 * ((j % 5) + 1) / 5.0), c)
    val noise = (0 until 8).map { i =>
      val v = Array.fill(dim)(0.0)
      // distinct axis pairs → pairwise cosine between noise points ≤ 0.5,
      // cosine to any cluster ≈ 0.707 → all beyond eps
      v(i % 4) = 1.0; v(4 + (i + i / 4) % 4) = 1.0
      val n = math.sqrt(2.0)
      (1000L + i, v.map(_ / n).toSeq, -1)
    }
    val pts = (clustered ++ noise).toDF("vec_id", "embedding", "planted")
    val emb = pts.select(col("vec_id"), col("embedding"))
    val model = IvfIndex.train(emb, k = 8, iters = 3)
    val got = Clustering.dbscan(emb, eps = 0.1, minPts = 3, model, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val label = got.map(r => r._1 -> r._2).toMap
    // noise stays noise: no planted-noise point may join a cluster
    noise.foreach { case (id, _, _) => assert(label(id) == -1L, s"noise $id clustered") }
    // co-membership recall over planted within-cluster pairs ≥ 0.9
    val byCluster = clustered.groupBy(_._3).values.toSeq
    val pairs = byCluster.flatMap(g => for {
      a <- g; b <- g if a._1 < b._1
    } yield (a._1, b._1))
    val kept = pairs.count { case (a, b) => label(a) != -1L && label(a) == label(b) }
    val recall = kept.toDouble / pairs.size
    assert(recall >= 0.9, s"planted co-membership recall $recall")
    // no planted cross-cluster pair may merge (the clusters are ~orthogonal)
    val crossMerged = (for {
      g1 <- byCluster; g2 <- byCluster if g1.head._3 < g2.head._3
      a <- g1.map(_._1); b <- g2.map(_._1)
      if label(a) != -1L && label(a) == label(b)
    } yield 1).size
    assert(crossMerged == 0, s"$crossMerged cross-cluster pairs merged")
  }

  test("end-to-end dbscan on embeddings: deterministic, labels consistent with roles") {
    val model = IvfIndex.train(e, k = 8, iters = 2)
    val once = Clustering.dbscan(e, eps = 0.65, minPts = 3, model, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val again = Clustering.dbscan(e, eps = 0.65, minPts = 3, model, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(once == again)
    assert(once.size == e.count())
    // noise <=> cluster -1; core/border always labeled
    assert(once.forall { case (_, c, role) => (role == "noise") == (c == -1L) })
    // every cluster label is the id of one of its own cores
    val coreIds = once.collect { case (id, _, "core") => id }
    val labels = once.collect { case (_, c, role) if role != "noise" => c }
    assert(labels.forall(coreIds.contains), "cluster label must be a member core id")
  }

  test("UNFAVORABLE-end recall frontier: boundary-straddling clusters, pinned per nprobe") {
    // Round 16 (VERDICT r15 #6): the adversarial counterpart of the
    // planted-cluster floor — every cluster sits EXACTLY on a Voronoi
    // bisector of a hand-made 8-centroid model (unit circle, centroids
    // at angles 2πc/8, cluster centers on the π/8-offset bisectors), so
    // each 12-point cluster splits 6/6 across two cells BY
    // CONSTRUCTION. The recall/cost frontier is then exact arithmetic:
    //   nprobe 1 keeps only intra-cell pairs  → 8·(15+15) = 240
    //   nprobe 2 probes the adjacent cell too → ALL 8·66  = 528
    // and the label-level consequence is pinned: split clusters (16) at
    // nprobe 1, the true 8 from nprobe 2 up.
    val k = 8
    val model = IvfIndex.Model(Array.tabulate(k) { c =>
      val a = 2 * math.Pi * c / k
      Array(math.cos(a), math.sin(a))
    })
    val pts = for { c <- 0 until 8; j <- 0 until 12 } yield {
      val a = math.Pi / 8 + (math.Pi / 4) * c + (j - 5.5) * 0.004
      ((c * 12 + j).toLong, Seq(math.cos(a), math.sin(a)))
    }
    val emb2 = pts.toDF("vec_id", "embedding")
    def pairSet(np: Int): Set[(Long, Long)] =
      Clustering.epsNeighbors(emb2, eps = 0.002, model, np)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairSet(1); val p2 = pairSet(2); val p4 = pairSet(4); val p8 = pairSet(8)
    // full probe == brute force (unit vectors: d = 1 − dot, same rounding)
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d = 1.0 - (a._2(0) * b._2(0) + a._2(1) * b._2(1))
      if BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP) <= 0.002
    } yield (a._1, b._1)).toSet
    assert(p8 == brute, s"full probe not exhaustive: ${p8.size} vs ${brute.size}")
    // the pinned frontier: 240 / 528 / 528 / 528 at nprobe 1 / 2 / 4 / 8
    assert(p1.size == 240 && p2.size == 528 && p4.size == 528 && p8.size == 528,
      s"recall frontier drifted: ${p1.size}/${p2.size}/${p4.size}/${p8.size}")
    // probe sets NEST in nprobe, so recall is monotone by containment
    assert(p1.subsetOf(p2) && p2.subsetOf(p4) && p4.subsetOf(p8), "probe nesting")
    // label-level: every straddling cluster splits in two at nprobe 1
    def nClusters(np: Int): Long =
      Clustering.dbscan(emb2, eps = 0.002, minPts = 4, model, np)
        .where(col("cluster") >= 0).select(col("cluster")).distinct().count()
    assert(nClusters(1) == 16, s"nprobe 1: ${nClusters(1)} clusters (want 16 halves)")
    assert(nClusters(2) == 8 && nClusters(8) == 8, "true clusters from nprobe 2 up")
  }
}
