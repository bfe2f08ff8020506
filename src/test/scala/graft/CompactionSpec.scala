package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a sprayed directory; content survives byte-for-byte") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    docs.repartition(40).write.parquet(dir) // the post-streaming spray
    val (filesBefore, bytes) = Compaction.stats(spark, dir)
    assert(filesBefore == 40)

    val report = Compaction.compact(spark, dir, targetBytes = bytes) // → 1 file
    assert(report.filesBefore == 40 && report.filesAfter == 1, report)

    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("partitioned layouts keep their partition dirs through compaction") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), (col("doc_id") % 3).as("batch_id"))
    docs.repartition(10).write.partitionBy("batch_id").parquet(dir) // ≤30 files
    val (before, bytes) = Compaction.stats(spark, dir)

    val report = Compaction.compact(spark, dir, targetBytes = bytes,
      partitionBy = Seq("batch_id"))
    assert(report.filesAfter < before, report)

    val back = spark.read.parquet(dir)
    assert(back.select("batch_id").distinct().as[Long].collect().toSet == Set(0L, 1L, 2L))
    assert(back.count() == docs.count())
    // partition pruning still works on the compacted layout
    val plan = back.where(col("batch_id") === 1)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
    assert(pf.exists(_.group(1).nonEmpty), plan.take(1200))
  }

  test("a sizing target that needs multiple files gets them") {
    val dir = Files.createTempDirectory("graft-compact-n").toString + "/t"
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .repartition(25).write.parquet(dir)
    val (_, bytes) = Compaction.stats(spark, dir)
    val report = Compaction.compact(spark, dir, targetBytes = bytes / 4 + 1)
    assert(report.filesAfter >= 2 && report.filesAfter <= 8, report)
  }
}
