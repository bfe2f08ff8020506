package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one hot key (90% of rows) + tail
    val big = (Seq.fill(900)(1L) ++ (2L to 101L)).toDF("k")
      .withColumn("payload", monotonically_increasing_id())
    val small = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val salted = SkewJoin.saltedJoin(big, small, "k", salt = 8)
      .groupBy(col("name")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = big.join(small, "k")
      .groupBy(col("name")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(salted("dim_1") == 900L)
  }
}
