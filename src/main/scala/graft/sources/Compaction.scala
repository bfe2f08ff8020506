package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the layout hygiene pass every streaming
  * ingest needs. Micro-batch sinks (foreachBatch parquet appends, file
  * streams) write one-or-more files PER TRIGGER; after a week a
  * directory holds tens of thousands of KB-sized files, and every
  * downstream scan pays per-file open/footer/listing overhead that
  * dwarfs the data read. At 100 TB the file COUNT, not the byte count,
  * is what kills the driver's listing phase and the scheduler's task
  * table.
  *
  * `compact` rewrites a directory to ~`targetBytes` files: read, round-
  * robin repartition to ceil(bytes/target), write to a staging sibling,
  * swap via two renames (the window where `dir` is absent is the two
  * renames — callers that need stronger atomicity should version the
  * directory name instead). Round-robin DESTROYS any sort/cluster
  * layout — for z-ordered or range-sorted data re-run the layout
  * operator ([[graft.operators.ZOrder]]) instead of compacting.
  *
  * Partitioned layouts (e.g. the streaming dedup corpus's `batch_id=N`
  * dirs) pass `partitionBy` so the rewrite preserves the partition
  * columns; sizing is then per-directory-total, not per-partition.
  */
object Compaction {

  /** (file count, total bytes) of all data files under `dir`
    * (dot-files and _SUCCESS markers excluded). */
  def stats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L; var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }

  final case class Report(filesBefore: Long, bytesBefore: Long, filesAfter: Long)

  /** Rewrite `dir` in place to ceil(bytes / targetBytes) files. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
              partitionBy: Seq[String] = Nil): Report = {
    require(targetBytes >= 1, s"compact: targetBytes must be >= 1, got $targetBytes")
    val (filesBefore, bytesBefore) = stats(spark, dir)
    val n = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt

    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + "__compact_staging")
    val retired = new Path(dir + "__compact_retired")
    fs.delete(staging, true); fs.delete(retired, true)

    val df = spark.read.parquet(dir).repartition(n)
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(staging.toString)

    // swap: dir -> retired, staging -> dir, drop retired. The read above
    // is fully materialized by the staging write, so retiring the source
    // afterwards is safe.
    if (!fs.rename(p, retired))
      throw new java.io.IOException(s"compact: could not retire $dir")
    if (!fs.rename(staging, p)) {
      fs.rename(retired, p) // roll back
      throw new java.io.IOException(s"compact: could not promote staging for $dir")
    }
    fs.delete(retired, true)

    val (filesAfter, _) = stats(spark, dir)
    Report(filesBefore, bytesBefore, filesAfter)
  }
}
