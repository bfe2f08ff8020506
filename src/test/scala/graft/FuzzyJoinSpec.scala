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
