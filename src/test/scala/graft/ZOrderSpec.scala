package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("interleave matches the reference Morton encoding") {
    val pts = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == mortonRef(x, y, 4)) }
  }

  test("interleaveN(3 cols) matches the reference encoding and nests dimensions") {
    def ref3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))).sum
    val pts = for (x <- 0L to 7L; y <- 0L to 7L; z <- 0L to 7L) yield (x, y, z)
    val got = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.interleaveN(Seq(col("x"), col("y"), col("z")), 3).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    pts.foreach { case (x, y, z) => assert(got((x, y, z)) == ref3(x, y, z, 3)) }
    // 2-column interleaveN is exactly interleave
    val two = Seq((5L, 9L)).toDF("x", "y")
      .select(ZOrder.interleaveN(Seq(col("x"), col("y")), 4).as("a"),
        ZOrder.interleave(col("x"), col("y"), 4).as("b")).collect().head
    assert(two.getLong(0) == two.getLong(1))
  }

  test("rangeId buckets linearly and clamps out-of-domain values") {
    val got = Seq(-50L, 0L, 511L, 1023L, 5000L).toDF("v")
      .select(ZOrder.rangeId(col("v"), 0, 1023, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 127L, 255L, 255L))
  }

  test("z-order clusters BOTH dimensions; a plain sort clusters only one") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        ZOrder.rangeId(col("n_chars"), 0, 1023, 8).as("x"),
        pmod(col("doc_id"), lit(256)).cast("long").as("y"))

    // avg per-partition value range of a column under a given layout —
    // the proxy for parquet footer min/max pruning power
    def avgSpread(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.withColumn("__p", spark_partition_id())
        .groupBy(col("__p")).agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg(col("r"))).collect().head.getDouble(0)

    val zordered = ZOrder.zorder(docs, col("x"), col("y"), 8, numPartitions = 16)
    val xsorted = docs.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))

    // both layouts cluster x...
    assert(avgSpread(zordered, "x") < 256.0 / 2)
    assert(avgSpread(xsorted, "x") < 256.0 / 2)
    // ...but only the z-order clusters y as well
    val zy = avgSpread(zordered, "y")
    val xy = avgSpread(xsorted, "y")
    assert(zy < xy / 2, s"z-order y-spread $zy should beat x-sort y-spread $xy by 2x+")
  }
}
