package graft.tools

import graft.streaming.{StreamWidth, StreamingAnalytics}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MEDIA dedup CLI — continuous near-duplicate admission for
  * binary payload corpora (the multimodal counterpart of
  * [[StreamCorpus]]): watch a directory of parquet files carrying
  * (doc_id, media) rows, fingerprint each payload in one codegen'd map
  * pass, dedup within and across micro-batches against the standing
  * fingerprint index ([[StreamingAnalytics.fingerprintDedupIntake]] —
  * only (id, 64-bit hash) longs ever shuffle, never pixels or
  * samples), and append survivors to `<outDir>/clean` (refusals ride
  * along with a null `sim` — an engine that silently dropped what it
  * cannot decode would be deleting data on decode bugs).
  *
  * Usage: StreamMedia <inputDir> <outDir> [--audio|--video|--image]
  *        [--follow]
  *   --image (default): 64-bit perceptual dHash
  *     ([[graft.functions.ImageExpressions.dhashImage]] — PNG/JPEG/
  *     GIF/BMP via the real `javax.imageio` decode)
  *   --audio: 64-bit loudness-envelope hash
  *     ([[graft.functions.AudioExpressions.audioEnvHash]] — PCM /
  *     G.711 / IMA-ADPCM / AIFF via the real decode dispatch)
  *   --video: 64-bit majority-vote clip signature
  *     ([[graft.functions.VideoExpressions.videoSigHash]] — the real
  *     AVI frame walk + per-frame dHash)
  *   default trigger: Trigger.AvailableNow; --follow: 5-second
  *   micro-batches until killed.
  *
  * Env: SPARK_GRAFT_MAX_FILES_PER_TRIGGER bounds each micro-batch;
  * SPARK_GRAFT_MAX_HAMMING (default 3) sets the near-dup radius;
  * SPARK_GRAFT_FP_INDEX_PATH (default `<outDir>/fp_index`) relocates
  * the standing index; SPARK_GRAFT_COMPACT_EVERY (default 64 batches,
  * 0 = off) folds committed index partitions into one compacted
  * generation at batch start
  * ([[StreamingAnalytics.compactFingerprintIndex]] — the per-batch
  * partition growth is otherwise the small-files tax every later
  * batch's index scan pays). Shuffle/state width defaults to the
  * micro-batch size ([[StreamWidth]]);
  * SPARK_GRAFT_SHUFFLE_PARTITIONS overrides. Per-batch progress lands
  * in `<outDir>/progress.jsonl` ([[StreamMeter]]). */
object StreamMedia {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val outDir = args(1)
    val audio = args.contains("--audio")
    val video = args.contains("--video")
    require(!(audio && video),
      "pass at most one of --audio / --video (image mode is the default)")
    val follow = args.contains("--follow")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stream-media")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxFiles =
      sys.env.get("SPARK_GRAFT_MAX_FILES_PER_TRIGGER").map(_.toInt)
    StreamWidth(spark, "stream-media", outDir,
      StreamWidth.estimateParquetDir(spark, inputDir, maxFiles))
    val indexPath =
      sys.env.getOrElse("SPARK_GRAFT_FP_INDEX_PATH", s"$outDir/fp_index")
    val maxHamming = sys.env.getOrElse("SPARK_GRAFT_MAX_HAMMING", "3").toInt
    val fingerprint =
      if (audio) graft.functions.AudioExpressions.audioEnvHash _
      else if (video) graft.functions.VideoExpressions.videoSigHash _
      else graft.functions.ImageExpressions.dhashImage _
    val mode = if (audio) "audio" else if (video) "video" else "image"

    val done = StreamMeter.attach(spark, "stream-media", outDir)
    val reader = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
    maxFiles.foreach(v => reader.option("maxFilesPerTrigger", v))
    val docs = reader.parquet(inputDir)

    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "64").toInt
    val intake = StreamingAnalytics.fingerprintDedupIntake(indexPath,
      fingerprint, maxHamming = maxHamming,
      sink = (survivors, batchId) => {
        val n = survivors.count()
        val refused = survivors.filter(col("sim").isNull).count()
        survivors.write.mode("append").parquet(s"$outDir/clean")
        println(s"[stream-media] batch=$batchId admitted=${n - refused} " +
          s"refused=$refused")
      })
    // compaction hooks at batch START with belowBatchId = this batch:
    // committed partitions fold; a retried batch's own stays live
    // (the compactIndex discipline)
    val gate: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, batchId) =>
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        StreamingAnalytics.compactFingerprintIndex(spark, indexPath,
          belowBatchId = batchId)
        println(s"[stream-media] batch=$batchId compacted fp_index (< $batchId)")
      }
      intake(batch, batchId)
    }
    val writer = docs.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(gate)
    val q = (if (follow) writer.trigger(Trigger.ProcessingTime("5 seconds"))
             else writer.trigger(Trigger.AvailableNow())).start()
    q.awaitTermination()
    val wallS = done()
    val n = spark.read.parquet(s"$outDir/clean").count()
    println(f"[stream-media] mode=$mode kept=$n wall=$wallS%.1fs out=$outDir")
    spark.stop()
  }
}
