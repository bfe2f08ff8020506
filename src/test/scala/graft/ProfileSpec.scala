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
}
