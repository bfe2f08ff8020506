package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String)], maxBucket: Int = 10000) =
    FuzzyJoin.selfJoinDist1(rows.toDF("id", "s"), "id", "s", maxBucket)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("deletion-neighborhood blocking equals the exhaustive quadratic join") {
    val rows = Seq[(Long, String)](
      1L -> "kitten", 2L -> "kittex",   // substitution -> dist 1
      3L -> "kitte",                    // deletion of 1 -> dist 1 to both
      4L -> "kittens",                  // insertion -> dist 1 to 1
      5L -> "ktiten",                   // transposition -> dist 2, excluded
      6L -> "mitten",                   // head substitution (prefix differs)
      7L -> "völlig", 8L -> "vollig",   // unicode substitution
      9L -> "a", 10L -> "",             // boundary lengths
      11L -> "kitten")                  // exact duplicate of 1 -> dist 0
    val blocked = pairsOf(rows)
    val df = rows.toDF("id", "s")
    val exhaustive = df.toDF("a_id", "a_s")
      .crossJoin(df.toDF("b_id", "b_s"))
      .where($"a_id" < $"b_id" && levenshtein($"a_s", $"b_s") <= 1)
      .select($"a_id", $"b_id", levenshtein($"a_s", $"b_s").cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exhaustive.nonEmpty)
    assert(blocked == exhaustive)
    assert(blocked.contains((1L, 11L, 0L)))           // exact dup at dist 0
    assert(!blocked.exists(p => p._1 == 5L || p._2 == 5L)) // transposition out
    assert(blocked.contains((7L, 8L, 1L)))            // unicode-aware
  }

  test("distance-2 blocking equals the exhaustive quadratic join") {
    val rows = Seq[(Long, String)](
      1L -> "kitten", 2L -> "sitten",   // 1 sub
      3L -> "sittin",                   // 2 subs from kitten
      4L -> "kien",                     // 2 deletions from kitten
      5L -> "kittenxy",                 // 2 insertions
      6L -> "ktiten",                   // transposition = dist 2 (in at d2)
      7L -> "smitten",                  // dist 2 to kitten (sub+ins)
      8L -> "zzzzzz",                   // far from everything
      9L -> "a", 10L -> "", 11L -> "ab")
    val blocked = FuzzyJoin.selfJoinDist2(rows.toDF("id", "s"), "id", "s")
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val df = rows.toDF("id", "s")
    val exhaustive = df.toDF("a_id", "a_s")
      .crossJoin(df.toDF("b_id", "b_s"))
      .where($"a_id" < $"b_id" && levenshtein($"a_s", $"b_s") <= 2)
      .select($"a_id", $"b_id", levenshtein($"a_s", $"b_s").cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exhaustive.nonEmpty)
    assert(blocked == exhaustive)
    assert(blocked.contains((1L, 6L, 2L)))    // transposition now found
    assert(!blocked.exists(p => p._1 == 8L || p._2 == 8L))
  }

  test("d=2 neighborhood amplification is bounded by 1 + L + L(L-1)/2") {
    // the guard that keeps the operator honest about its explode factor:
    // per-row variants must never exceed the closed-form neighborhood size
    val rows = Seq[(Long, String)](1L -> "abcdefgh", 2L -> "aaaa", 3L -> "x", 4L -> "")
    val counts = rows.toDF("id", "s")
      .select(col("id"), col("s"), expr(
        """size(array_distinct(concat(
          |  transform(sequence(0, length(s)), i ->
          |    concat(substring(s, 1, i), substring(s, i + 2, 2147483646))),
          |  CASE WHEN length(s) < 2 THEN array() ELSE
          |    flatten(transform(sequence(1, length(s) - 1), i ->
          |      transform(sequence(i + 1, length(s)), j ->
          |        concat(substring(s, 1, i - 1), substring(s, i + 1, j - i - 1),
          |          substring(s, j + 1, 2147483646))))) END)))""".stripMargin).as("n"))
      .collect().map(r => (r.getString(1), r.getInt(2)))
    counts.foreach { case (s, n) =>
      val L = s.length.toLong
      assert(n <= 1 + L + L * (L - 1) / 2, s"'$s' emitted $n variants")
      assert(n >= 1)
    }
    // repeated chars dedupe below the bound: "aaaa" has exactly 3 variants
    assert(counts.toMap.apply("aaaa") == 3) // aaaa, aaa, aa
  }

  test("two-table linkage equals the exhaustive cross join; no within-side pairs") {
    val dirty = Seq[(Long, String)](
      1L -> "kitten", 2L -> "sittin", 3L -> "zzz", 4L -> "mitten").toDF("id", "s")
    val ref = Seq[(Long, String)](
      10L -> "kitten", 11L -> "sitten", 12L -> "mittens", 13L -> "qqq").toDF("id", "s")
    val linked = FuzzyJoin.linkJoin(dirty, ref, "id", "s", "id", "s", maxDist = 2)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exhaustive = dirty.toDF("a_id", "a_s").crossJoin(ref.toDF("b_id", "b_s"))
      .where(levenshtein($"a_s", $"b_s") <= 2)
      .select($"a_id", $"b_id", levenshtein($"a_s", $"b_s").cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exhaustive.nonEmpty)
    assert(linked == exhaustive)
    // a-side ids only ever on the left, b-side only on the right
    assert(linked.forall { case (a, b, _) => a < 10 && b >= 10 })
    // kitten/mitten (both dirty-side, dist 1) must NOT pair
    assert(!linked.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("hot variant bucket fails fast instead of going quadratic") {
    // 60 single-char strings all share the "" deletion variant
    val hot = (1L to 60L).map(i => i -> ("x" + i % 9).take(1))
    val e = intercept[Exception] {
      pairsOf(hot, maxBucket = 50)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("maxBucket")))
  }
}
