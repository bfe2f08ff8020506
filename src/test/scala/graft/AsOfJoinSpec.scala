package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("as-of join equals the naive join+argmax formulation") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t").withColumn("lid", monotonically_increasing_id())
    val right = Seq((1L, 8L, "a"), (1L, 15L, "b"), (1L, 20L, "c"), (2L, 9L, "d"))
      .toDF("rk", "rt", "v")

    val got = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt")
      .select($"k", $"t", $"v").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // k=1,t=10 → rt=8 "a"; k=1,t=20 → rt=20 "c" (inclusive); k=2,t=5 → none; k=3 → none
    assert(got == Set((1L, 10L, "a"), (1L, 20L, "c")))
  }

  test("as-of join on events/orders matches naive formulation at sf0.001") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000000000").as("sec"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").cast("long").as("osec"),
        col("o_orderkey"))
      .groupBy(col("o_custkey"), col("osec")).agg(max(col("o_orderkey")).as("o_orderkey"))

    val fast = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "sec", "osec")
      .select(col("event_id"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy(col("event_id")).orderBy(col("osec").desc)
    val naive = ev.join(ord, col("user_id") === col("o_custkey") && col("osec") <= col("sec"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(fast == naive, s"fast=${fast.size} naive=${naive.size}")
  }

  test("range-bucketed as-of equals single-window as-of on a skewed key") {
    import spark.implicits._
    // one hot key carrying 80% of rows (the distribution that pins a
    // whole partition in the key-partitioned window), sparse right side
    // so most buckets depend on a carry-in from far-earlier buckets
    val left = spark.range(5000).select(
      when(col("id") % 5 =!= 0, 7L).otherwise(col("id") % 97).as("k"),
      (col("id") * 13 % 100000).as("t"),
      col("id").as("lid"))
    val right = spark.range(40).select(
      when(col("id") % 3 === 0, 7L).otherwise(col("id") % 97).as("rk"),
      (col("id") * 2503 % 100000).as("rt"),
      col("id").as("rid"))
      .groupBy("rk", "rt").agg(max("rid").as("rid"))
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("lid", "rid", "rt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val single = norm(AsOfJoin.asOf(left, right, "k", "rk", "t", "rt"))
    val bucketed = norm(AsOfJoin.asOfBucketed(left, right, "k", "rk", "t", "rt",
      bucketSec = 1000))
    assert(single.nonEmpty)
    assert(bucketed == single, s"bucketed=${bucketed.size} single=${single.size}")
  }

  test("shared column names: rejected without a suffix, disambiguated with one") {
    import spark.implicits._
    val left = Seq((1L, 10L, "L")).toDF("k", "ts", "v")
    val right = Seq((1L, 8L, "R")).toDF("k2", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "k2", "ts", "ts")
    }
    val got = AsOfJoin.asOf(left, right, "k", "k2", "ts", "ts", rightSuffix = "_r")
    assert(got.columns.toSeq == Seq("k", "ts", "v", "k2", "ts_r", "v_r"))
    val row = got.head()
    assert(row.getAs[String]("v") == "L" && row.getAs[String]("v_r") == "R")
    // reserved internal names are rejected up front
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumnRenamed("v", "__tag"), right, "k", "k2", "ts", "ts", "_r")
    }
  }
}
