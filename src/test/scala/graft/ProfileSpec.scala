package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  import spark.implicits._

  test("profile reports rows, nulls, distinct and modal value per column") {
    val df = Seq(
      (Some("a"), 1), (Some("a"), 2), (Some("b"), 2),
      (None, 2), (Some("c"), 3))
      .toDF("s", "i")
    val rows = Profile.profile(df, Seq("s", "i")).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = rows("s")
    assert(s.getLong(1) == 5L && s.getLong(2) == 1L && s.getLong(3) == 3L)
    assert(s.getString(4) == "a" && s.getLong(5) == 2L)
    val i = rows("i")
    assert(i.getLong(1) == 5L && i.getLong(2) == 0L && i.getLong(3) == 3L)
    assert(i.getString(4) == "2" && i.getLong(5) == 3L)
  }

  test("modal ties break to the larger value (deterministic)") {
    val df = Seq("x", "x", "y", "y", "z").toDF("c")
    val r = Profile.profile(df, Seq("c")).collect().head
    assert(r.getString(4) == "y" && r.getLong(5) == 2L)
  }

  test("an empty frame profiles to zero counts, not NULLs") {
    val df = Seq.empty[(String, Int)].toDF("s", "i")
    val r = Profile.profile(df, Seq("s")).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("an all-null column profiles without NPE") {
    val df = Seq[Option[String]](None, None).toDF("c")
    val r = Profile.profile(df, Seq("c")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("keySkew surfaces the hot key with exact basis points") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++ (1 to 15).map(i => s"k$i"))
      .toDF("k")
    val top = Profile.keySkew(df, "k", topN = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(top.head == ("hot", 60L, 6000L))   // 60/100 = 6000 bp exactly
    assert(top(1) == ("warm", 25L, 2500L))
    assert(top(2)._2 == 1L)                   // singleton tail, key-tiebroken
    assert(top(2)._1 == "k1")
  }

  test("anomalies: planted outliers flagged, inliers not, exactly at the sigma boundary") {
    import graft.operators.Drift
    // group g: 100 values at 10.0 plus one at 1000.0 — the plant is the
    // only row beyond 3 sigma (a single extreme point dominates sigma,
    // but its OWN deviation is ~sqrt(n) sigma >> 3)
    val df = ((1 to 100).map(_ => ("g", 10.0)) :+ ("g", 1000.0)).toDF("k", "v")
    val flagged = Drift.anomalies(df, "k", "v")
      .where($"anomalous").select($"v").collect().map(_.getDouble(0)).toSeq
    assert(flagged == Seq(1000.0))
    // uniform group: nothing beyond 3 sigma
    val uni = (1 to 100).map(i => ("u", i.toDouble)).toDF("k", "v")
    assert(Drift.anomalies(uni, "k", "v").where($"anomalous").count() == 0)
    // but at 1.5 sigma (kNum=3, kDen=2) the uniform tails flag — the
    // exact boundary: |x-50.5| > 1.5*sigma(=28.866*1.5=43.3) -> x<=7, x>=94
    val tails = Drift.anomalies(uni, "k", "v", kNum = 3, kDen = 2)
      .where($"anomalous").select($"v").collect().map(_.getDouble(0)).toSet
    assert(tails == ((1 to 7) ++ (94 to 100)).map(_.toDouble).toSet, tails.toSeq.sorted)
  }

  test("histogramDrift: integer relative test flags moved and new buckets only") {
    import graft.operators.Drift
    // baseline: uniform 25/25/25/25 over [0,4); snapshot b doubles bucket
    // 2's share, adds overflow mass, keeps buckets 0/1 at par (scaled 2x)
    val a = ((0 until 25).map(_ => 0.5) ++ (0 until 25).map(_ => 1.5) ++
      (0 until 25).map(_ => 2.5) ++ (0 until 25).map(_ => 3.5)).toDF("x")
    val b = ((0 until 50).map(_ => 0.5) ++ (0 until 50).map(_ => 1.5) ++
      (0 until 100).map(_ => 2.5) ++ (0 until 50).map(_ => 3.5) ++
      (0 until 10).map(_ => 99.0)).toDF("x")
    // shares: bucket 2 goes 25% -> 38.5% (+54% rel); buckets 0/1/3 go
    // 25% -> 19.2% (-23% rel); overflow bucket appears from nothing
    val rep = Drift.histogramDrift(a, b, "x", lo = 0, hi = 4, buckets = 4,
        thresholdPct = 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rep(0L) == (25L, 50L, false))   // -23% rel < 30% threshold
    assert(rep(1L)._3 == false && rep(3L)._3 == false)
    assert(rep(2L) == (25L, 100L, true))   // +54% rel share -> drifted
    assert(rep(4L) == (0L, 10L, true))     // new overflow mass
    // at a 20% threshold the -23% buckets flip too — exact boundary math
    val strict = Drift.histogramDrift(a, b, "x", 0, 4, 4, thresholdPct = 20)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(strict(0L) && strict(1L) && strict(3L))
  }
}
