package graft.tools

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Continuous corpus ingest CLI — the streaming completion of
  * [[CleanCorpus]]: watch a directory for new document parquet
  * (doc_id, text, source, …), gate each micro-batch through
  * [[StreamingAnalytics.nearDedupIntake]] (quality → exact dedup →
  * within-batch near-dedup → near-dedup against the standing signature
  * index), append the survivors to the corpus store, and grow the index.
  *
  * Point `--index` at a [[CleanCorpus]] `nd_index/` output to bootstrap
  * from a batch-built corpus: new crawls then dedupe against everything
  * the batch build admitted, without re-shingling it. Every
  * `--compact-every` batches the index's per-batch partitions are
  * collapsed ([[StreamingAnalytics.compactIndex]]) so scan cost doesn't
  * grow with micro-batch count.
  *
  * Composition + I/O only — semantics live in the spec'd operators.
  *
  * Admitted batches also feed a live HLL source-cardinality cube at
  * `<outDir>/source_cube` (when the schema has a `source` column) —
  * distinct-count observability without rescanning the corpus.
  *
  * With `SPARK_GRAFT_LM_MODEL_PATH` set, each batch is additionally
  * gated by mean bigram-LM likelihood under the persisted model
  * ([[graft.operators.LanguageModel]], loaded once) before the dedup
  * cascade — model-based filtering at ingest, trained offline.
  *
  * With `--curate`, the gate is the INCREMENTAL CURATION MANIFEST
  * ([[StreamingAnalytics.curateIntake]]) instead: every arriving
  * document is labeled with its fate (exact_dup / low_quality /
  * contaminated / near_dup / kept) against standing fingerprint +
  * signature indexes — the batch [[CleanCorpus]] manifest under
  * continuous ingest, without re-pricing the corpus per refresh. The
  * per-batch manifest appends to `<outDir>/manifest`, kept documents
  * land in `<outDir>/clean`, and `SPARK_GRAFT_EVAL_PROBES` (a parquet
  * of (doc_id, text)) enables the decontamination stage. Adding
  * `--substring` to `--curate` appends the SUBSTRING-dedup stage to the
  * manifest ([[graft.operators.Curate.manifestWithStrip]] under
  * continuous ingest): kept docs gain (n_tokens, n_dup_tokens) priced
  * against the standing kept corpus's shingle-count index at
  * `<outDir>/ss_index`, which their own counts then grow.
  *
  * With `--substring`, the gate is the SUBSTRING-dedup intake
  * ([[StreamingAnalytics.substringIntake]]): each batch's duplicated
  * maximal spans (vs the standing shingle-count index + the batch)
  * land replay-idempotently in `<outDir>/dup_spans` partitioned by
  * batch_id, and the batch's counts grow `<outDir>/ss_index`
  * (compacted by [[StreamingAnalytics.compactCountIndex]] on the same
  * cadence).
  *
  * Usage: StreamCorpus <inputDir> <outDir> [--follow] [--curate] [--substring]
  * Env: SPARK_GRAFT_ND_INDEX_PATH (default <outDir>/nd_index),
  * SPARK_GRAFT_MIN_QUALITY (default 0.5), SPARK_GRAFT_ND_THRESHOLD
  * (default 0.7), SPARK_GRAFT_COMPACT_EVERY (default 64 batches, 0 = off),
  * SPARK_GRAFT_LM_MODEL_PATH (off by default),
  * SPARK_GRAFT_MIN_LM_SCORE (default 0.0),
  * SPARK_GRAFT_EVAL_PROBES (curate mode; off by default).
  */
object StreamCorpus {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val outDir = args(1)
    val follow = args.contains("--follow")
    val curate = args.contains("--curate")
    val substring = args.contains("--substring")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stream-corpus")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val indexPath = sys.env.getOrElse("SPARK_GRAFT_ND_INDEX_PATH", s"$outDir/nd_index")
    val minQuality = sys.env.getOrElse("SPARK_GRAFT_MIN_QUALITY", "0.5").toDouble
    val threshold = sys.env.getOrElse("SPARK_GRAFT_ND_THRESHOLD", "0.7").toDouble
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "64").toInt
    val maxFiles =
      sys.env.get("SPARK_GRAFT_MAX_FILES_PER_TRIGGER").map(_.toInt)
    // shuffle/state width sized to the micro-batch (env overrides)
    graft.streaming.StreamWidth(spark, "stream-corpus", outDir,
      graft.streaming.StreamWidth.estimateParquetDir(spark, inputDir, maxFiles))

    val done = StreamMeter.attach(spark, "stream-corpus", outDir)
    val reader = spark.readStream
      .schema(spark.read.parquet(inputDir).schema) // file source needs a fixed schema
    // batch-size sensitivity probes bound each micro-batch's file count
    maxFiles.foreach(v => reader.option("maxFilesPerTrigger", v))
    val docs = reader.parquet(inputDir)

    val inner = StreamingAnalytics.nearDedupIntake(indexPath,
      minQuality = minQuality, threshold = threshold,
      sink = (survivors, batchId) => {
        val n = survivors.count()
        survivors.write.mode("append").parquet(s"$outDir/clean")
        // live ingest observability: a mergeable HLL cube of distinct
        // admitted docs per source — any monitor answers cardinality
        // roll-ups from <outDir>/source_cube without scanning the
        // corpus ([[StreamingAnalytics.sketchCubeIntake]]; set
        // semantics, so sink-side placement is replay-safe)
        if (n > 0 && survivors.columns.contains("source"))
          StreamingAnalytics.sketchCubeIntake(
            s"$outDir/source_cube", Seq("source"), "doc_id")
            .apply(survivors, batchId)
        println(s"[stream-corpus] batch=$batchId admitted=$n")
      })
    // Compact at the START of a batch, never from the sink: a sink-side
    // compaction runs after the index append but before the checkpoint
    // commit, so a crash in that window would replay the batch against
    // an index whose own partition was already folded into batch_id=-1
    // (duplicated signatures). At batch start, everything below batchId
    // has committed and the fold excludes batchId itself, so a retry's
    // dynamic-partition overwrite stays idempotent.
    val lmModelPath = sys.env.get("SPARK_GRAFT_LM_MODEL_PATH")
    val minLmScore = sys.env.getOrElse("SPARK_GRAFT_MIN_LM_SCORE", "0.0").toDouble
    var lmModel: Option[graft.operators.LanguageModel.NgramLm] = None
    import org.apache.spark.sql.functions.{col, lit}
    // curate mode: fate manifest against standing indexes; the sink
    // closes over the batch so kept docs keep their full source schema
    val curateGate: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, batchId) =>
      val probes = sys.env.get("SPARK_GRAFT_EVAL_PROBES")
        .map(spark.read.parquet(_).select("doc_id", "text"))
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.select("doc_id", "text").schema))
      StreamingAnalytics.curateIntake(probes,
        s"$outDir/fp_index", s"$outDir/sig_index",
        minQuality = minQuality, threshold = threshold,
        // --curate --substring: the manifest additionally prices span
        // duplication of each batch's kept docs vs the standing kept
        // corpus (n_tokens / n_dup_tokens columns), and their shingle
        // counts grow <outDir>/ss_index
        substringIndexPath = if (substring) s"$outDir/ss_index" else "",
        sink = (manifest, bid) => {
          // replay-idempotent like the fp/sig indexes one layer down: a
          // retried micro-batch overwrites its own batch_id partition
          // instead of double-appending the same fate rows
          manifest.withColumn("batch_id", lit(bid))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").mode("overwrite")
            .parquet(s"$outDir/manifest")
          val kept = batch.join(
            manifest.filter(col("fate") === "kept").select("doc_id"), "doc_id")
          val n = kept.count()
          // clean/ is an at-least-once stream of admitted docs (plain
          // append, no batch column in the user schema): a replayed
          // batch may re-append rows. Exactly-once readers should join
          // clean/ against the manifest's kept fates, or dedup on
          // doc_id — the manifest is the authoritative ledger.
          if (n > 0) kept.write.mode("append").parquet(s"$outDir/clean")
          println(s"[stream-corpus] batch=$bid curated kept=$n")
        })(batch, batchId)
    }
    // substring mode: span report + count-index growth, both
    // replay-idempotent (dynamic overwrite of the batch's own partition)
    val substringGate: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, batchId) =>
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        StreamingAnalytics.compactCountIndex(spark, s"$outDir/ss_index",
          belowBatchId = batchId)
        println(s"[stream-corpus] batch=$batchId compacted ss_index (< $batchId)")
      }
      StreamingAnalytics.substringIntake(s"$outDir/ss_index",
        sink = (spans, bid) => {
          spans.withColumn("batch_id", lit(bid))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").mode("overwrite")
            .parquet(s"$outDir/dup_spans")
          println(s"[stream-corpus] batch=$bid dup_spans=${spans.count()}")
        })(batch, batchId)
    }
    val gate: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, batchId) =>
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
        StreamingAnalytics.compactIndex(spark, indexPath, belowBatchId = batchId)
        println(s"[stream-corpus] batch=$batchId compacted index (< $batchId)")
      }
      val gated = lmModelPath match {
        case Some(p) =>
          import org.apache.spark.sql.functions.col
          if (lmModel.isEmpty)
            lmModel = Some(graft.operators.LanguageModel.load(spark, p))
          // semi join keeps the batch schema unchanged for the intake;
          // sub-bigram docs are unscorable and drop (the quality gate's
          // min-length floor subsumes them anyway)
          batch.join(graft.operators.LanguageModel
              .scoreMeanLikelihood(batch, "doc_id", "text", lmModel.get)
              .filter(col("lm_score") >= minLmScore)
              .select("doc_id"),
            Seq("doc_id"), "left_semi")
        case None => batch
      }
      inner(gated, batchId)
    }

    // The manifest layout changed (round 14) from unpartitioned append
    // with batch_id as a data column to partitionBy("batch_id") dynamic
    // overwrite. Restarting against a pre-upgrade outDir would mix
    // root-level part files with batch_id=N directories — parquet
    // partition discovery rejects that mid-stream with an opaque error,
    // so detect the legacy layout up front and name the migration.
    // (batch_id is now partition-inferred as int/long from the dir name
    // rather than typed by an explicit lit(); readers should not depend
    // on its exact integral width.)
    if (curate) {
      val manifestDir = new java.io.File(s"$outDir/manifest")
      val entries = Option(manifestDir.listFiles()).getOrElse(Array.empty)
      val legacyData = entries.exists(f =>
        f.isFile && f.getName.startsWith("part-"))
      val partitioned = entries.exists(f =>
        f.isDirectory && f.getName.startsWith("batch_id="))
      require(!legacyData,
        s"$outDir/manifest holds a pre-partitioned (legacy append) " +
          "manifest" + (if (partitioned) " MIXED with batch_id= partitions" else "") +
          "; migrate it first: read the old manifest, write it back " +
          "partitionBy(\"batch_id\"), or point --curate at a fresh outDir")
    }

    val q = docs.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(if (curate) curateGate
        else if (substring) substringGate else gate)
      .trigger(if (follow) Trigger.ProcessingTime("5 seconds")
        else Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wallS = done()
    val nDocs = spark.read.parquet(inputDir).count()
    println(f"[stream-corpus] docs=$nDocs docs_per_s=${nDocs / math.max(wallS, 1e-9)}%.0f")
    spark.stop()
  }
}
