package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val changelog = Seq(
    // key, seq, state — user 1 flips A->B->B->A (the B->B is a no-op)
    (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "B"), (1L, 40L, "A"),
    // user 2 never changes
    (2L, 15L, "X"), (2L, 25L, "X")
  ).toDF("k", "seq", "state")

  test("no-op updates collapse and intervals abut exactly") {
    val h = Scd2.fromChangelog(changelog, "k", Seq("seq"), Seq("state"))
      .orderBy($"k", $"valid_from").collect()
    val rows = h.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (1L, "A", 10L, 20L, false),
      (1L, "B", 20L, 40L, false),   // 30 collapsed into the 20-version
      (1L, "A", 40L, -1L, true),
      (2L, "X", 15L, -1L, true)))   // 25 collapsed
  }

  test("timeline ties resolve to the last change of the instant, no zero-width intervals") {
    val ties = Seq(
      // key, ts, tiebreak, state — two changes at ts=10 (X then Y): only Y
      // was observable; ts=20 repeats Y (no-op after tie-dedupe)
      (1L, 10L, 1L, "X"), (1L, 10L, 2L, "Y"), (1L, 20L, 3L, "Y"),
      // ties that end where they started: A -> (B,A) at ts=30 = still A
      (2L, 10L, 1L, "A"), (2L, 30L, 2L, "B"), (2L, 30L, 3L, "A")
    ).toDF("k", "ts", "ev", "state")
    val h = Scd2.fromChangelog(ties, "k", Seq("ts", "ev"), Seq("state"))
      .orderBy($"k", $"valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      (1L, "Y", 10L, -1L, true),    // X@10 never observable; 20 collapsed
      (2L, "A", 10L, -1L, true)))   // B@30 never observable -> pure no-op
    // strictly increasing valid_from per key == no zero-width intervals
    h.groupBy(_._1).foreach { case (_, vs) =>
      val froms = vs.map(_._3).toSeq
      assert(froms == froms.distinct.sorted)
    }
  }

  test("bucketed build equals the single-window build on a skewed changelog") {
    // hot key 1: 400 changes over a wide ord range (split across many
    // buckets at bucketSize=10), states repeat so runs collapse across
    // bucket boundaries; plus tie instants and sparse keys
    val hot = (0 until 400).map(i => (1L, i.toLong * 3, i.toLong, s"S${(i / 7) % 4}"))
    val ties = Seq((2L, 50L, 1L, "A"), (2L, 50L, 2L, "B"), (2L, 90L, 3L, "B"),
      (2L, 91L, 4L, "C"))
    val sparse = Seq((3L, 5L, 1L, "X"), (3L, 500L, 2L, "X"), (3L, 900L, 3L, "Y"))
    val changelog = (hot ++ ties ++ sparse).toDF("k", "ts", "ev", "state")
      // shuffle input order: operators must not depend on it
      .orderBy(hash($"k", $"ts", $"ev"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"k", $"valid_from").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    val plain = rows(Scd2.fromChangelog(changelog, "k", Seq("ts", "ev"), Seq("state")))
    val bucketed = rows(Scd2.fromChangelogBucketed(
      changelog, "k", Seq("ts", "ev"), Seq("state"), bucketSize = 10))
    assert(plain.nonEmpty && bucketed == plain)
    // and at a bucket size larger than the whole span (degenerates to one
    // bucket = the plain path)
    val oneBucket = rows(Scd2.fromChangelogBucketed(
      changelog, "k", Seq("ts", "ev"), Seq("state"), bucketSize = 1000000))
    assert(oneBucket == plain)
  }

  test("applyChanges folds a batch into the history == full rebuild of the combined changelog") {
    val c1 = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "B"),  // trailing no-op
      (2L, 15L, 4L, "X"),                                           // untouched key
      (3L, 12L, 5L, "P"), (3L, 18L, 6L, "Q")
    ).toDF("k", "ts", "ev", "state")
    val c2 = Seq(
      (1L, 40L, 7L, "A"),                    // state change after the split
      (3L, 50L, 8L, "Q"), (3L, 60L, 9L, "R"), // no-op then change
      (4L, 45L, 10L, "N")                     // brand-new key
    ).toDF("k", "ts", "ev", "state")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"k", $"valid_from").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    val h1 = Scd2.fromChangelog(c1, "k", Seq("ts", "ev"), Seq("state"))
    val folded = rows(Scd2.applyChanges(h1, c2, "k", Seq("ts", "ev"), Seq("state")))
    val full = rows(Scd2.fromChangelog(c1.unionByName(c2), "k", Seq("ts", "ev"), Seq("state")))
    assert(folded == full)
    // untouched key 2 passes through current; new key 4 opens current
    assert(folded.contains((2L, "X", 15L, -1L, true)))
    assert(folded.contains((4L, "N", 45L, -1L, true)))

    // batch change at the exact instant of an existing version start:
    // the batch wins the instant (later knowledge)
    val clash = Seq((1L, 20L, 11L, "Z")).toDF("k", "ts", "ev", "state")
    val clashed = rows(Scd2.applyChanges(h1, clash, "k", Seq("ts", "ev"), Seq("state")))
    assert(clashed.contains((1L, "Z", 20L, -1L, true)))
    assert(!clashed.exists(v => v._1 == 1L && v._2 == "B"))
  }

  test("asOf returns exactly the version live at the probe time") {
    val h = Scd2.fromChangelog(changelog, "k", Seq("seq"), Seq("state"))
    val at35 = Scd2.asOf(h, lit(35L)).select("k", "state").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at35 == Set((1L, "B"), (2L, "X")))
    val at9 = Scd2.asOf(h, lit(9L)).count()
    assert(at9 == 0L) // before any version of key 1; key 2 starts at 15
  }
}
