package graft.tools

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming monitor CLI: watch a directory of events parquet (as written
  * by ParseLogs/StreamLogs), maintain watermarked 5-minute status counts,
  * write them as parquet — the "live dashboard feed" companion to the
  * sessionizer.
  *
  * Usage: StreamStats <eventsDir> <outDir>
  */
object StreamStats {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stream-stats")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // shuffle/state width sized to the micro-batch (env overrides)
    graft.streaming.StreamWidth(spark, "stream-stats", outDir,
      graft.streaming.StreamWidth.estimateParquetDir(spark, inDir, None))

    val schema = spark.read.parquet(inDir).schema
    val events = spark.readStream.schema(schema).parquet(inDir)
      .select(col("timestamp"), col("status"))

    val q = StreamingAnalytics.windowedStatusCounts(events)
      .writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$outDir/status_counts")
      .start()
    q.awaitTermination()
    val n = spark.read.parquet(s"$outDir/status_counts").count()
    println(s"[stream-stats] windows=$n out=$outDir")
    spark.stop()
  }
}
