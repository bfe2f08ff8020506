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

  test("skewed partitions get per-partition file counts, not a global average") {
    val dir = Files.createTempDirectory("graft-compact-skew").toString + "/t"
    // partition 0 holds ~10x the rows of partitions 1..9
    val skewed = spark.range(20000).select(
      when(col("id") < 11000, 0L).otherwise(col("id") % 9 + 1).as("part"),
      concat(lit("payload-"), md5(col("id").cast("string"))).as(("text")))
    skewed.repartition(20).write.partitionBy("part").parquet(dir)
    val (_, bytes) = Compaction.stats(spark, dir)

    // target ≈ 1/8 of total bytes: the hot partition (~55% of bytes) needs
    // several files; each small partition needs exactly one
    Compaction.compact(spark, dir, targetBytes = bytes / 8, partitionBy = Seq("part"))
    val fs = new java.io.File(dir)
    def dataFiles(d: java.io.File) =
      d.listFiles.filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val perPart = fs.listFiles.filter(_.getName.startsWith("part="))
      .map(d => d.getName -> dataFiles(d).length).toMap
    assert(perPart("part=0") >= 3, s"hot partition under-split: $perPart")
    assert((1 to 9).forall(i => perPart(s"part=$i") == 1), s"cold partitions over-split: $perPart")
    assert(spark.read.parquet(dir).count() == 20000)
  }

  test("sortBy mode preserves a range-sorted layout through compaction") {
    val dir = Files.createTempDirectory("graft-compact-sort").toString + "/t"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.orderBy("doc_id").write.parquet(dir)
    val (_, bytes) = Compaction.stats(spark, dir)
    val report = Compaction.compact(spark, dir, targetBytes = bytes / 4 + 1,
      sortBy = Seq("doc_id"))
    assert(report.filesAfter >= 2, report)

    // rows are sorted within each file and files cover disjoint key ranges
    val byFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    byFile.values.foreach(v => assert(v == v.sorted, "rows not sorted within a file"))
    val ranges = byFile.values.map(v => (v.min, v.max)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi <= lo, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("a stranded retired dir from a crashed swap is restored, not destroyed") {
    val tmp = Files.createTempDirectory("graft-compact-crash").toString
    val dir = s"$tmp/t"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.repartition(5).write.parquet(dir)
    // simulate a crash between the two renames: dir gone, data only in retired
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__compact_retired")))

    val report = Compaction.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(report.filesBefore == 5 && report.filesAfter == 1, report)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
