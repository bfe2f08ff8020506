package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private def plainJoin(jt: String) = {
    val sel = Tables.orders(spark, sfDir)
      .where(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    (items, sel, items.join(sel, Seq("o_orderkey"), jt))
  }

  test("prunedJoin(inner) returns exactly the plain join's rows") {
    val (items, sel, plain) = plainJoin("inner")
    val pruned = BloomJoin.prunedJoin(items, sel, "o_orderkey", expectedItems = 1 << 14)
    assert(plain.count() > 0)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prunedJoin(left_semi) matches plain left_semi") {
    val (items, sel, plain) = plainJoin("left_semi")
    val pruned = BloomJoin.prunedJoin(items, sel, "o_orderkey",
      expectedItems = 1 << 14, joinType = "left_semi")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom pre-filter prunes most non-matching large rows before the join") {
    val (items, sel, _) = plainJoin("inner")
    val bloom = BloomJoin.buildBloom(sel, col("o_orderkey"), expectedItems = 1 << 14)
    val total = items.count()
    val surviving = items.where(BloomJoin.mightContain(bloom, col("o_orderkey"))).count()
    val matching = items.join(sel, Seq("o_orderkey"), "left_semi").count()
    // survivors = true matches + false positives; fpp 3% keeps FP small
    assert(surviving >= matching)
    assert(surviving <= matching + (0.1 * total).toLong)
    assert(surviving < total / 2) // the filter genuinely prunes
  }

  test("an undersized filter degrades fpp, never correctness") {
    val (items, sel, plain) = plainJoin("inner")
    val pruned = BloomJoin.prunedJoin(items, sel, "o_orderkey", expectedItems = 8)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("prunedAntiJoin matches plain left_anti exactly (incl. undersized filter)") {
    val (items, sel, _) = plainJoin("inner")
    val plain = items.join(sel, Seq("o_orderkey"), "left_anti")
    for (expected <- Seq(1L << 14, 8L)) { // well-sized and fpp-degraded
      val pruned = BloomJoin.prunedAntiJoin(items, sel, "o_orderkey", expected)
      assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    }
    assert(plain.count() > 0)
  }

  test("prunedAntiJoin with empty small side keeps every large row") {
    val (items, sel, _) = plainJoin("inner")
    val res = BloomJoin.prunedAntiJoin(items, sel.where(lit(false)), "o_orderkey", 100)
    assert(res.count() == items.count())
  }

  test("empty small side yields an empty join result") {
    val (items, sel, _) = plainJoin("inner")
    val empty = sel.where(lit(false))
    assert(BloomJoin.buildBloom(empty, col("o_orderkey"), 100) == null)
    assert(BloomJoin.prunedJoin(items, empty, "o_orderkey", 100).isEmpty)
  }

  test("outer joins are rejected (pruning would drop kept rows)") {
    val (items, sel, _) = plainJoin("inner")
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(items, sel, "o_orderkey", 100, joinType = "left_outer")
    }
  }

  test("mismatched key types are rejected (type-sensitive hashes would silently prune)") {
    // int on one side, bigint on the other: the plain join would coerce
    // and match, but XxHash64(int 5) != XxHash64(bigint 5)
    val large = Seq(5L, 6L).toDF("k")
    val small = Seq(5, 7).toDF("k")
    val e1 = intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(large, small, "k", 10)
    }
    assert(e1.getMessage.contains("type-sensitive"), e1.getMessage)
    intercept[IllegalArgumentException] { BloomJoin.prunedAntiJoin(large, small, "k", 10) }
    // equal types pass
    assert(BloomJoin.prunedJoin(large, small.select(col("k").cast("long")), "k", 10)
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("expectedItems above the session bloom-filter cap fails with a named conf") {
    val (items, sel, _) = plainJoin("inner")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(items, sel, "o_orderkey", expectedItems = 1L << 40)
    }
    assert(e.getMessage.contains("maxNumItems"), e.getMessage)
  }
}
