package graft.tools

import graft.operators.{CacheRegistry, Curate, Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of the composed curate pipeline
  * (optimization-round measurement tool — guide §1: measure first).
  * Times each stage in isolation with the noop sink so the numbers
  * attribute compute, not the output write. */
object ProfileCurate {
  private def time(spark: SparkSession, label: String)(f: => DataFrame): Unit = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    CacheRegistry.releaseAll()
    println(f"[profile] $label%-32s $secs%7.3f s")
    spark.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (sp, _, _) = graft.Bench.deriveShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp.toLong)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.queries.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val probes = docs.filter(col("doc_id") < 100)

    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      // stage 1+2: enrich + exact-dup window + quality filter
      time(spark, "s2:enrich+exactdup") {
        val base = Curate.enrich(docs)
        val rn = base.select(col("doc_id"), col("fingerprint"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("fingerprint").orderBy("doc_id")))
          .select("doc_id", "rn")
        base.join(rn, "doc_id").filter(col("rn") === 1 &&
          col("quality_score") >= 0.5)
      }
      // stage 3: decontamination sweep over full docs (approx of s2)
      time(spark, "s3:crossNgramOverlap") {
        Dedup.crossNgramOverlap(docs, probes, "doc_id", "text",
          n = 5, minShared = 3, maxDocFreq = 100)
      }
      // stage 4a: ngram pair kernel over full docs
      time(spark, "s4a:ngramJaccard") {
        Dedup.ngramJaccard(docs, "doc_id", "text",
          n = 3, threshold = 0.5, maxDocFreq = 100)
      }
      // stage 4b: pairs + closure
      time(spark, "s4b:pairs+components") {
        Dedup.connectedComponents(Dedup.ngramJaccard(docs, "doc_id", "text",
          n = 3, threshold = 0.5, maxDocFreq = 100))
      }
      // full manifest
      time(spark, "manifest") {
        Curate.manifest(docs, probes, minQuality = 0.5)
      }
      // full manifest + strip
      time(spark, "manifestWithStrip") {
        Curate.manifestWithStrip(docs, probes, minQuality = 0.5, spanTokens = 20)
      }
      // dupSpans alone over full docs
      time(spark, "dupSpans") {
        Dedup.dupSpans(docs, "doc_id", "text", 20)
      }
    }
    spark.stop()
  }
}
