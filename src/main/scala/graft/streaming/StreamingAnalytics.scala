package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming analytics over the live `events` stream — the
  * §2.5 analytic surface applied before events ever land in storage:
  * watermarked tumbling/sliding window aggregation and streaming
  * deduplication. All standard Structured Streaming operators (the
  * sessionizer's custom state lives in [[StreamingSessionize]]; these are
  * the built-in pieces a monitoring pipeline composes around it).
  */
object StreamingAnalytics {

  /** Exact fixed-point sum of a double column (same determinism contract
    * as the batch queries). */
  private def fxSum(c: Column, scale: Long): Column =
    sum(floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")).cast("double") / lit(scale.toDouble)

  /** Windowed per-status counts with an event-time watermark: late data
    * beyond `lateness` is dropped, and in append mode a window emits once
    * the watermark passes its end — the streaming analogue of the
    * time-range GROUP BY the reference delegates to ClickHouse.
    *
    * @param events any dataframe with `timestamp` + `status` columns
    *               (e.g. the sessionizer's output stream)
    */
  def windowedStatusCounts(events: DataFrame,
                           windowLen: String = "5 minutes",
                           slide: Option[String] = None,
                           lateness: String = "10 minutes"): DataFrame = {
    val w = slide.map(s => window(col("timestamp"), windowLen, s))
      .getOrElse(window(col("timestamp"), windowLen))
    events.withWatermark("timestamp", lateness)
      .groupBy(w.as("win"), col("status"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col("status"), col("n_events"))
  }

  /** Streaming exact dedup: keep the first record per content hash within
    * the watermark horizon (state is purged as the watermark advances —
    * bounded memory at any scale; an unbounded-horizon exact dedup is the
    * batch operator's job). */
  def streamingDedup(records: DataFrame, textCol: String,
                     lateness: String = "10 minutes"): DataFrame =
    records
      .withColumn("content_sha", sha2(col(textCol), 256))
      .withWatermark("timestamp", lateness)
      .dropDuplicatesWithinWatermark("content_sha")

  /** Streaming corpus intake — the batch corpus_clean gate applied as
    * documents ARRIVE. The dedup key is the same whitespace-normalized
    * lowercased `fingerprint` the batch gate canonicalizes on
    * ([[graft.operators.TextAnalysis.fingerprintMd5]] via
    * [[graft.operators.TextAnalysis.cleanEnrich]]) — NOT a raw content
    * hash, so case/whitespace near-duplicates gate identically in both
    * modes; the quality/language expressions are the same stateless
    * scan columns (streaming semantics ≡ batch semantics by
    * construction, pinned by the differential test). Differences from
    * batch, by necessity: state is watermark-bounded (an
    * unbounded-horizon dedup is the batch operator's job), and "keep
    * smallest id" becomes "keep first arrival". Documents below
    * `minQuality` are dropped. */
  def corpusIntake(docs: DataFrame, textCol: String = "text",
                   minQuality: Double = 0.5,
                   lateness: String = "10 minutes"): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.cleanEnrich(docs, textCol)
      .withWatermark("timestamp", lateness)
      .dropDuplicatesWithinWatermark("fingerprint")
      .filter(col("quality_score") >= minQuality)
  }
}
