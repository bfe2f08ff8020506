package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  // planted dirt: one null id, one dup key, one orphan fk, one
  // out-of-range value, one unaccepted status, one null status
  private lazy val child = Seq(
    (Some(1L), 10L, 0.02, "A"),
    (Some(2L), 10L, 0.02, "N"),   // dup key 10 on the parent side below
    (Some(3L), 99L, 0.02, "R"),   // orphan fk 99
    (None,     11L, 0.09, "X"),   // null id + out-of-range + unaccepted
    (Some(5L), 12L, 0.05, null)   // boundary value (NOT a violation) + null status
  ).toDF("id", "fk", "disc", "status")
  private lazy val parent = Seq(10L, 10L, 11L, 12L).toDF("pk")

  test("row checks: one agg pass, per-check violation counts, nulls flagged") {
    val rep = Quality.rowChecks(child, Seq(
        Quality.notNull("id"),
        Quality.inRange("disc", 0.0, 0.05),
        Quality.accepted("status", Seq("A", "N", "R"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rep("not_null(id)") == (5L, 1L, false))
    // 0.09 violates; boundary 0.05 passes
    assert(rep("range(disc,0.0,0.05)") == (5L, 1L, false))
    // "X" and the NULL status both violate (null = can't prove fine)
    assert(rep("accepted(status)") == (5L, 2L, false))
    // one job: the row-check report plans a single scan of the table
    val plan = Quality.rowChecks(child, Seq(Quality.notNull("id"),
      Quality.inRange("disc", 0.0, 0.05))).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(1000)) // unions of one agg, no self-joins
  }

  test("unique and referential checks count planted dirt exactly") {
    val u = Quality.unique(parent.toDF("pk"), Seq("pk")).collect().head
    assert(u.getString(0) == "unique(pk)" && u.getLong(1) == 4L
      && u.getLong(2) == 1L && !u.getBoolean(3))
    val r = Quality.referential(child, "fk", parent, "pk").collect().head
    assert(r.getString(0) == "referential(fk->pk)" && r.getLong(1) == 5L
      && r.getLong(2) == 1L && !r.getBoolean(3))
  }

  test("clean data passes every check; report stacks and orders") {
    val clean = Seq((1L, 10L), (2L, 11L)).toDF("id", "fk")
    val p = Seq(10L, 11L).toDF("pk")
    val rep = Quality.report(Seq(
        Quality.rowChecks(clean, Seq(Quality.notNull("id"))),
        Quality.unique(clean, Seq("id")),
        Quality.referential(clean, "fk", p, "pk")))
      .collect()
    assert(rep.length == 3 && rep.forall(_.getBoolean(3)))
    assert(rep.map(_.getString(0)).toSeq == rep.map(_.getString(0)).toSeq.sorted)
  }
}
