package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The ONE file-source → foreachBatch → checkpointed-trigger scaffold
  * of the ingest streams ([[VectorStream]], [[ImageStream]]) — a fix to
  * the trigger cadence, file batching, or checkpointing must not have
  * to find every twin. `AvailableNow` drains the backlog and stops (the
  * batch-test / catch-up mode); the default trigger polls like the
  * reference's blob listener. */
private[streaming] object IngestScaffold {

  def start(spark: SparkSession, inputDir: String, schema: StructType,
            body: (DataFrame, Long) => Unit,
            checkpointDir: String, availableNow: Boolean): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inputDir)
    val writer = raw.writeStream
      .foreachBatch(body)
      .option("checkpointLocation", checkpointDir)
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
