package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("exact dedup collapses duplicated corpus to one canonical row per text") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val doubled = docs.unionAll(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val res = Dedup.exact(doubled).collect()
    assert(res.length == 500)
    assert(res.forall(_.getLong(2) == 2L))   // every group has the 2 copies
    assert(res.forall(_.getLong(1) < 10000)) // canonical id is the original
  }

  test("minhash-LSH finds exactly the high-Jaccard planted pairs (recall = exact)") {
    val docs = Tables.documents(spark, sfDir)
    val lsh = Dedup.minhashLsh(docs, threshold = 0.8).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over all pairs
    val exact = Dedup.jaccardVerify(
        docs.select(col("doc_id").as("id1")).crossJoin(docs.select(col("doc_id").as("id2")))
          .where(col("id1") < col("id2")), docs)
      .where(col("jaccard") >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("prefixJaccardJoin: complete vs brute-force all-pairs; prefix prunes candidates") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // plant one guaranteed near-dup pair on top of the corpus
    val planted = docs.unionAll(docs.where(col("doc_id") === 0)
      .select((col("doc_id") + 90000).as("doc_id"), col("text")))
    val t = 0.3
    val got = Dedup.prefixJaccardJoin(planted, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.contains((0L, 90000L, 1.0)), "planted exact copy must surface at J = 1")
    // brute force over every pair — COMPLETE ground truth
    val ids = planted.select(col("doc_id").as("id1"))
      .crossJoin(planted.select(col("doc_id").as("id2")))
      .where(col("id1") < col("id2"))
    val brute = Dedup.jaccardVerify(ids, planted)
      .where(col("jaccard") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    // the prefix candidate space is a strict subset of all pairs
    val n = planted.count()
    val allPairs = n * (n - 1) / 2
    val toks = planted.select(col("doc_id"),
      graft.functions.ShingleExpressions.wordShingles(col("text"), 3).as("sh"))
    // re-derive the candidate count through the public API by verifying
    // at threshold over an impossible jaccard floor: candidates == rows
    // reaching verification — proxy: prefix pairs at t must be << all
    val cand = Dedup.prefixJaccardJoin(planted, t, scale = 4)
    assert(cand.count() < allPairs, s"no pruning: ${cand.count()} vs $allPairs")
  }

  test("embedding near-dup is symmetric-free (id1 < id2) and thresholded") {
    val res = Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir), 0.4).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(0) < r.getLong(1)))
    assert(res.forall(_.getDouble(2) >= 0.4))
  }

  test("simhash pair generation drops degenerate hot buckets (maxBucket guard)") {
    import graft.operators.SimHash
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 20)
    // a boilerplate cluster: 50 identical docs → one 50-row bucket in
    // every simhash chunk — the case that went quadratic unguarded
    val hotText = base.where(col("doc_id") === 1).select("text").head().getString(0)
    val hot = spark.range(50).select((col("id") + 2000).as("doc_id"), lit(hotText).as("text"))
    val corpus = base.unionAll(hot)
    def pairs(maxBucket: Int): Set[(Long, Long)] =
      SimHash.nearDupPairs(corpus, maxBucket = maxBucket)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = pairs(100000)
    val guarded = pairs(10)
    val hotPairs = unguarded.filter(p => p._1 >= 2000 && p._2 >= 2000)
    assert(hotPairs.size >= 50 * 49 / 2, s"expected the full hot clique, got ${hotPairs.size}")
    // guard drops the degenerate bucket's pairs, output stays bounded
    assert(guarded.forall(p => p._2 < 2000))
    // and pairs outside the hot cluster are untouched
    assert(guarded.filter(_._2 < 2000) == unguarded.filter(_._2 < 2000))
  }

  test("components: chains merge transitively, labels are component minima") {
    import spark.implicits._
    // two components: a chain 5-3-9 (no direct 5~9 edge) and a pair 7-8
    val pairs = Seq((3L, 5L), (3L, 9L), (7L, 8L)).toDF("id1", "id2")
    val got = Dedup.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 7L -> 7L, 8L -> 7L))
    // long path needs multiple propagation rounds; tight maxIters throws
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("id1", "id2")
    val full = Dedup.components(path, maxIters = 12)
      .collect().map(r => r.getLong(1)).distinct
    assert(full.toSeq == Seq(0L))
    intercept[IllegalStateException] { Dedup.components(path, maxIters = 2) }
  }

  test("lsh parameter validation fails fast at plan/analysis time") {
    intercept[IllegalArgumentException] { Dedup.bandKeys(col("sig"), numPerm = 16, bands = 0) }
    intercept[IllegalArgumentException] { Dedup.bandKeys(col("sig"), numPerm = 4, bands = 8) }
    GraftFunctions.register(spark)
    // negative numPerm through the SQL surface must fail analysis, not
    // throw NegativeArraySizeException on an executor at eval time
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(array('a'), -4)").collect()
    }
    assert(ex.getMessage.contains("numPerm") || ex.getMessage.contains("positive"), ex.getMessage)
  }

  test("duplicated-span coverage: k-gram df gate, monotone span merge, filter") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),       // shares 3-gram "a b c" with doc 2
      (2L, "x a b c y z"),
      (3L, "p q r s t u"),       // nothing shared
      (4L, "m n o p2 q2"),       // overlapping shared grams with doc 5:
      (5L, "m n o p2 q2")        //   pos 0,1,2 merge into ONE span of 5
    ).toDF("doc_id", "text")
    val cov = Dedup.duplicatedSpanCoverage(docs, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(cov(1L) == (6L, 1L, 3L, 0.5))     // one 3-token span of 6 words
    assert(cov(2L) == (6L, 1L, 3L, 0.5))
    assert(!cov.contains(3L))
    // docs 4/5: grams at pos 0,1,2 all df=2; covered = 3 + 1 + 1 = 5
    assert(cov(4L) == (5L, 3L, 5L, 1.0))
    assert(cov(5L) == (5L, 3L, 5L, 1.0))
    val kept = Dedup.filterDuplicatedSpans(docs, maxRatio = 0.6, k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))          // the fully-duplicated pair drops
    // materialize=false (recompute the gram inventory instead of
    // checkpointing it) is an execution choice, not a semantic one
    val lazyCov = Dedup.duplicatedSpanCoverage(docs, k = 3, materialize = false)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(lazyCov == cov)
    // real-table hash equality between the two paths
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def digest(materialize: Boolean): String =
      Dedup.duplicatedSpanCoverage(corpus, k = 8, materialize = materialize)
        .orderBy(col("doc_id"))
        .select(md5(concat_ws("|", col("doc_id"), col("n_words"),
          col("dup_positions"), col("covered_tokens"), col("dup_ratio"))).as("h"))
        .agg(md5(concat_ws("", collect_list(col("h")))).as("all"))
        .head().getString(0)
    assert(digest(materialize = true) == digest(materialize = false))
  }

  test("cutDuplicatedSpans removes exactly the covered words, keeps the rest in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),       // "a b c" shared with doc 2 → cut [0,2]
      (2L, "x a b c y z"),       //                           → cut [1,3]
      (3L, "p q r s t u"),       // untouched
      (4L, "m n o p2 q2"),       // fully duplicated with doc 5 → cut all
      (5L, "m n o p2 q2")
    ).toDF("doc_id", "text")
    val clean = Dedup.cutDuplicatedSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == "d e f", clean)
    assert(clean(2L) == "x y z", clean)
    assert(clean(3L) == "p q r s t u", clean)
    assert(clean(4L) == "" && clean(5L) == "", clean)
    // re-running on the cut corpus finds nothing left to cut
    val again = Dedup.duplicatedSpanCoverage(
      Dedup.cutDuplicatedSpans(docs, k = 3).withColumnRenamed("clean_text", "text"), k = 3)
    assert(again.isEmpty)
  }

  test("semantic contamination: blocked variant finds the planted leaks the exact scan reports") {
    import graft.operators.IvfIndex
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val test = e.where(col("vec_id") < 30)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("test_id", "train_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.semanticContamination(test, e, threshold = 0.9999))
    // the planted leaks: every test vector is itself in train
    assert((0L until 30L).map(i => (i, i)).toSet.subsetOf(exact))
    val model = IvfIndex.train(e, k = 8, iters = 2)
    val blocked = pairs(Dedup.semanticContaminationBlocked(test, e, model,
      threshold = 0.9999, k = 3, nprobe = 8))
    // full probing: identical pairs can never be lost (a vector's own
    // cell is always its nearest), and precision is exact by construction
    assert(blocked == exact, s"missing=${exact -- blocked} extra=${blocked -- exact}")
  }

  test("semantic near-dup: cell-blocked pairs are verified-exact; identical pairs never lost") {
    import graft.operators.IvfIndex
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val dup = e.unionAll(e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val model = IvfIndex.train(dup, k = 8, iters = 2)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = pairs(Dedup.semanticNearDup(dup, model, threshold = 0.9999))
    val exact = pairs(Dedup.embeddingNearDup(dup, threshold = 0.9999))
    // precision is exact by construction (cosine-verified) and an
    // identical vector can never land in a different cell than its copy
    assert(sem.subsetOf(exact) && exact.forall { case (a, b) =>
      b - a != 100000L || sem.contains((a, b)) }, s"sem=${sem.size} exact=${exact.size}")
    // dedup keeps exactly one representative per planted pair
    val kept = Dedup.semanticDedup(dup, model, threshold = 0.9999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val plantedDropped = sem.map(_._2)
    assert(kept == dup.select("vec_id").collect().map(_.getLong(0)).toSet -- plantedDropped)
  }

  test("SemDeDup keep policies: one survivor per cluster; farthest/nearest match a driver replay") {
    import graft.operators.IvfIndex
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // every vector duplicated twice → each cluster is a triple
    // {v, v+100k, v+200k} of identical embeddings
    val dup = e.unionAll(e.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      .unionAll(e.select((col("vec_id") + 200000).as("vec_id"), col("embedding")))
    val model = IvfIndex.train(dup, k = 8, iters = 2)
    val n = e.count()

    val byId = Dedup.semanticDedupBy(dup, model, 0.9999, keep = "min_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val far = Dedup.semanticDedupBy(dup, model, 0.9999, keep = "farthest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val near = Dedup.semanticDedupBy(dup, model, 0.9999, keep = "nearest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every policy keeps exactly one representative per triple
    assert(byId.size == n && far.size == n && near.size == n,
      s"n=$n byId=${byId.size} far=${far.size} near=${near.size}")
    // min_id keeps the original ids
    assert(byId == e.collect().map(_.getLong(0)).toSet)
    // identical embeddings ⇒ identical cos-to-centroid ⇒ the (cos, id)
    // tie-break selects the lowest id for BOTH directional policies
    assert(far == byId && near == byId)
    // bad policy fails fast
    intercept[IllegalArgumentException] {
      Dedup.semanticDedupBy(dup, model, 0.9, keep = "random")
    }

    // directional policies actually differ when cluster members are NOT
    // equidistant from the centroid: nudge each duplicate's direction
    val dn = e.unionAll(e.select((col("vec_id") + 100000).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(x * 0.98 + IF(i = 0, 0.12, 0.0) AS FLOAT))")
        .as("embedding")))
    val model2 = IvfIndex.train(dn, k = 8, iters = 2)
    val pairs2 = Dedup.semanticNearDup(dn, model2, 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs2.nonEmpty)
    val far2 = Dedup.semanticDedupBy(dn, model2, 0.98, keep = "farthest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val near2 = Dedup.semanticDedupBy(dn, model2, 0.98, keep = "nearest")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(far2.size == near2.size)
    // driver replay of one clustered pair: expected winner by cos to the
    // member's own cell centroid (round 6, id tie-break)
    val (a, b) = pairs2.head
    val vecs = dn.where(col("vec_id").isin(a, b))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosToCentroid(id: Long): Double = {
      val v = vecs(id)
      val c = model2.centroids(
        (0 until model2.k).minBy(ci => {
          val ctr = model2.centroids(ci)
          v.zip(ctr).map { case (x, y) => (x - y) * (x - y) }.sum
        }))
      val dot = v.zip(c).map { case (x, y) => x * y }.sum
      val norm = math.sqrt(v.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum)
      BigDecimal(dot / norm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val (ca, cb) = (cosToCentroid(a), cosToCentroid(b))
    val expectFar = if (ca < cb || (ca == cb && a < b)) a else b
    val expectNear = if (ca > cb || (ca == cb && a < b)) a else b
    assert(far2.contains(expectFar) && !far2.contains(if (expectFar == a) b else a),
      s"pair=($a,$b) cos=($ca,$cb)")
    assert(near2.contains(expectNear) && !near2.contains(if (expectNear == a) b else a))
  }

  test("prefixJaccardJoin threshold arithmetic is integer-exact at (t*len)-integer boundaries") {
    // The scaled-integer prefix bound must never EXCEED the exact
    // rational ceil(t*len) (a larger ceil = shorter prefix = possible
    // missed pair at J exactly t), and must equal it whenever t is a
    // 6-decimal rational (every practical threshold). The naive double
    // formula fails this at e.g. t=0.55, len=100 (ceil -> 56, not 55).
    def scaledCeil(t: Double, len: Long): Long = {
      val tS = math.floor(t * 1e6).toLong
      (tS * len + 999999L) / 1000000L
    }
    def exactCeil(t: Double, len: Long): Long = {
      val bd = BigDecimal(t.toString) * BigDecimal(len)
      bd.setScale(0, BigDecimal.RoundingMode.CEILING).toLong
    }
    var checkedBoundary = 0
    for (tTenths <- 5 to 95; len <- 1L to 200L) {
      val t = tTenths / 100.0
      assert(scaledCeil(t, len) <= exactCeil(t, len), s"t=$t len=$len")
      assert(scaledCeil(t, len) == exactCeil(t, len), s"t=$t len=$len")
      if ((BigDecimal(t.toString) * BigDecimal(len)).isWhole) checkedBoundary += 1
    }
    assert(checkedBoundary > 100) // the integer-product boundary cases were exercised
    // the documented failing combo specifically
    assert(scaledCeil(0.55, 100) == 55 && math.ceil(0.55 * 100).toLong == 56)
  }

}
