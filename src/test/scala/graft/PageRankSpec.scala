package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val UNIT = 1000000000000L

  test("cycle is rank-uniform; hub beats spokes; mass is conserved up to floor loss") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = PageRank.ranks(cycle, iters = 5).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rc.map(_._2).distinct.length == 1, rc.mkString(","))  // symmetry ⇒ equality

    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L)).toDF("src", "dst")
    val rs = PageRank.ranks(star, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rs(9L) > rs(1L) * 3, rs)                    // hub dominates
    assert(rs.values.toSeq.distinct.length == 2)       // spokes identical
    // dangling hub redistributes: total stays within floor-loss slack
    val total = rs.values.sum
    assert(total > (UNIT * 99) / 100 && total <= UNIT, s"total=$total")
  }

  test("distributed ranks equal a driver-side replay of the exact integer recurrence") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (4L, 3L),
      (5L, 4L), (6L, 5L), (7L, 5L), (7L, 1L), (8L, 9L) // 9 dangling
    )
    val iters = 4
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // reference: same recurrence, plain Scala
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (15L * UNIT) / (100L * n)
    var r = nodes.map(_ -> UNIT / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v =>
        v -> (base + (85L * (inflow.getOrElse(v, 0L) + dangling / n)) / 100L)).toMap
    }
    assert(got == r, s"got=$got\nwant=$r")
  }
}
