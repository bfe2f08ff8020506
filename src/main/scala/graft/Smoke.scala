package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's entry() smoke check: rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(3, truncate = 60)
    println(s"[smoke] entry rows = $n (schema: ${df.columns.mkString(", ")})")
    assert(n > 0, "entry() must return rows")
    spark.stop()
  }
}
