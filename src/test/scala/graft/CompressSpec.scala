package graft

import org.apache.spark.sql.functions._
import graft.functions.CompressExpressions

/** deflate_ratio: value pinned against a direct Deflater replay, the
  * repetitive < prose < noise ordering the curation gate relies on,
  * edge cases, and the SQL surface. */
class CompressSpec extends SparkSpec {

  import spark.implicits._

  private def directRatio(s: String): Double = {
    val raw = s.getBytes("UTF-8")
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n.toDouble / raw.length
    } finally d.end()
  }

  test("ratio equals a direct Deflater replay; ordering separates text classes") {
    val repetitive = "ab" * 500
    val prose = ("the quick brown fox jumps over the lazy dog and keeps running " +
      "through fields of green grass while birds sing overhead in the morning ") * 8
    val noise = (0 until 1000).map(i =>
      Integer.toHexString(i * 2654435761L.toInt)).mkString
    val rows = Seq((1L, repetitive), (2L, prose), (3L, noise), (4L, ""))
    val got = rows.toDF("id", "t")
      .select(col("id"), CompressExpressions.deflateRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, t) =>
      assert(math.abs(got(id) - directRatio(t)) < 1e-12, s"id $id differs from replay")
    }
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      s"ordering broken: repetitive=${got(1L)} prose=${got(2L)} noise=${got(3L)}")
    assert(got(1L) < 0.05, s"repetitive text should collapse, got ${got(1L)}")
    assert(got(4L) == 1.0, "empty input is 1.0 by definition")
  }

  test("SQL surface and corpus sanity: every ratio in (0, 1.5], null-safe") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("cr_docs")
    val rs = spark.sql(
      "SELECT doc_id, deflate_ratio(text) AS r FROM cr_docs").collect()
    assert(rs.nonEmpty)
    rs.foreach(r => assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.5,
      s"doc ${r.get(0)}: ratio ${r.getDouble(1)} out of range"))
    val nullRow = Seq((1L, null: String)).toDF("id", "t")
      .select(CompressExpressions.deflateRatio(col("t"))).head()
    assert(nullRow.isNullAt(0), "null text must yield null ratio")
  }
}
