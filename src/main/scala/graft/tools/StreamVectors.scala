package graft.tools

import graft.operators.VectorStore
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Continuous vector-store maintenance CLI — the
  * [[graft.operators.VectorStore]] lifecycle as a drivable surface:
  * watch a directory for new embedding parquet (vec_id, embedding),
  * feed each micro-batch through the generation-aware ingest intake
  * ([[StreamingAnalytics.vectorStoreIngestIntake]] — map-side
  * assign/encode under the live generation's pinned models,
  * batch_id-partitioned replay-idempotent append, drift probing,
  * rollover catch-up when a retrain publishes), optionally letting the
  * drift gate act autonomously (`--retrain`: republish + cutover
  * in-stream, the intake as single writer). Every `--compact-every`
  * batches the live generation's landed partitions fold into its bulk
  * ([[StreamingAnalytics.compactVectorStore]]) so list-scan cost does
  * not grow with micro-batch count.
  *
  * `--bootstrap <parquet>` publishes generation 1 from a bulk corpus
  * when the store is empty — after that the stream owns the lifecycle.
  * Serving runs elsewhere against the same root
  * ([[StreamingAnalytics.vectorStoreServeIntake]]) and follows each
  * rollover at its next micro-batch.
  *
  * Composition + I/O only — semantics live in the spec'd operators.
  *
  * Usage: StreamVectors <inputDir> <storeRoot>
  *          [--pq] [--bootstrap <parquet>] [--follow] [--retrain]
  * Env: SPARK_GRAFT_NLIST (default 16), SPARK_GRAFT_PQ_M (default 16),
  * SPARK_GRAFT_PQ_KSUB (default 256 — [[VectorStore.publish]] clamps
  * ksub/nlist down to what the bootstrap corpus can train, loudly, so
  * defaults work at any scale),
  * SPARK_GRAFT_DRIFT_EVERY (default 8 batches, 0 = off),
  * SPARK_GRAFT_COMPACT_EVERY (default 64 batches, 0 = off),
  * SPARK_GRAFT_MAX_FILES_PER_TRIGGER, SPARK_GRAFT_MASTER,
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS.
  */
object StreamVectors {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val root = args(1)
    val pq = args.contains("--pq")
    val follow = args.contains("--follow")
    val retrain = args.contains("--retrain")
    val bootstrap = args.sliding(2).collectFirst {
      case Array("--bootstrap", p) => p
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stream-vectors")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nlist = sys.env.getOrElse("SPARK_GRAFT_NLIST", "16").toInt
    val pqM = if (pq) sys.env.getOrElse("SPARK_GRAFT_PQ_M", "16").toInt else 0
    val pqKsub = sys.env.getOrElse("SPARK_GRAFT_PQ_KSUB", "256").toInt
    val driftEvery = sys.env.getOrElse("SPARK_GRAFT_DRIFT_EVERY", "8").toLong
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "64").toInt

    if (VectorStore.current(spark, root).isEmpty) {
      val bulk = bootstrap.getOrElse(throw new IllegalArgumentException(
        s"no committed generation at $root — pass --bootstrap <parquet> " +
          "to publish generation 1"))
      val g = VectorStore.publish(spark, root,
        spark.read.parquet(bulk).select("vec_id", "embedding"),
        nlist = nlist, pqM = pqM, pqKsub = pqKsub, highWater = -1L)
      println(s"[stream-vectors] bootstrapped gen=${g.gen} from $bulk")
    }

    val done = StreamMeter.attach(spark, "stream-vectors", root)
    val reader = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
    sys.env.get("SPARK_GRAFT_MAX_FILES_PER_TRIGGER")
      .foreach(v => reader.option("maxFilesPerTrigger", v.toInt))
    val vecs = reader.parquet(inputDir)

    val inner = StreamingAnalytics.vectorStoreIngestIntake(root,
      driftEvery = driftEvery,
      driftSink = (r, b) => println(
        f"[stream-vectors] batch=$b drift sim_drop=${r.sim_drop}%.4f " +
          f"reassign=${r.reassign_fraction}%.4f drifted=${r.drifted}"),
      cutoverSink = (g, ids) => println(
        s"[stream-vectors] cutover to gen=$g replayed=${ids.mkString(",")}"),
      sink = (_, b) => println(s"[stream-vectors] batch=$b ingested"),
      retrainOn = if (retrain) _.drifted else _ => false)
    val gate: (org.apache.spark.sql.DataFrame, Long) => Unit = { (batch, batchId) =>
      // compact at batch START (the StreamCorpus discipline): everything
      // below batchId has committed; the fold can never absorb a
      // partition the checkpoint hasn't blessed
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        StreamingAnalytics.compactVectorStore(spark, root, upTo = batchId - 1)
      inner(batch.select("vec_id", "embedding"), batchId)
    }
    val writer = vecs.writeStream
      .option("checkpointLocation", s"$root/_ingest_checkpoint")
      .foreachBatch(gate)
    val q = (if (follow) writer.trigger(Trigger.ProcessingTime("5 seconds"))
             else writer.trigger(Trigger.AvailableNow())).start()
    q.awaitTermination()
    val wallS = done()
    val g = VectorStore.current(spark, root).get
    val n = spark.read.parquet(g.lists).count()
    println(f"[stream-vectors] gen=${g.gen} index_rows=$n wall=$wallS%.1fs")
    spark.stop()
  }
}
