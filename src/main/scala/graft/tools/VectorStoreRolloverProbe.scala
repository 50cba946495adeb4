package graft.tools

import graft.operators.{Artifacts, Similarity, VectorStore}
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end measurement of the [[graft.operators.VectorStore]]
  * drift → retrain-publish → rollover-under-live-ingest → reclaim cycle
  * at corpus scale — the production question behind the cutover
  * contract: what does a rollover COST, and does serving stay
  * continuous and complete while batches keep landing?
  *
  * Phases (each printed with wall seconds):
  *   1. bulk publish of gen 1 on half the corpus (high water −1);
  *   2. live ingest of 4 batches through the generation-aware intake
  *      (per-batch wall should stay flat — the vectorIngestIntake
  *      property, now through the store lifecycle);
  *   3. a retrain publishes gen 2 from `corpusAsOf(gen 1, HW = batch 1)`
  *      — batches 2..3 land DURING/AFTER the publish window, i.e. they
  *      exist only in gen 1;
  *   4. the next intake batch triggers the cutover: catch-up replays
  *      the in-window batches onto gen 2, then appends its own batch;
  *   5. invariants: gen 2 holds every vector exactly once; serving
  *      gen 2 ≡ a from-scratch prepare of the full corpus under gen 2's
  *      models (10-query top-k, bit-compared); gen 1 still serves until
  *      reclaimed; reclaim removes it and gen 2 survives.
  *
  * Usage: VectorStoreRolloverProbe <sfDir> [--pq]
  */
object VectorStoreRolloverProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pq = args.contains("--pq")
    val mode = if (pq) "pq" else "ivf"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-vstore-rollover-probe")
      .config("spark.sql.shuffle.partitions",
        math.max(32, graft.Bench.inputBytes(sfDir) / (64L << 20)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vstore-probe] $mode $label wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val nTotal = e.count()
    val bulk = e.filter(pmod(col("vec_id"), lit(8)) < 4)
    val liveBatches = (0 until 4).map(i =>
      e.filter(pmod(col("vec_id"), lit(8)) === 4 + i))
    val root = java.nio.file.Files.createTempDirectory("vstore_roll").toString
    val pqM = if (pq) 16 else 0

    // 1. bulk publish (gen 1)
    val g1 = timed("publish_gen1")(VectorStore.publish(spark, root, bulk,
      nlist = 16, pqM = pqM, highWater = -1L))

    // 2. live ingest through the generation-aware intake
    var drift: Similarity.IvfDriftReport = null
    val intake = StreamingAnalytics.vectorStoreIngestIntake(root,
      driftEvery = 2, driftSink = (r, _) => drift = r)
    liveBatches.take(2).zipWithIndex.foreach { case (b, i) =>
      val n = b.count()
      val t0 = System.nanoTime()
      intake(b, i.toLong)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[vstore-probe] $mode ingest batch=$i n=$n wall=$w%.1fs " +
        f"vecs_per_s=${n / w}%.0f")
    }
    println(s"[vstore-probe] $mode drift_probed=${drift != null}")

    // serving starts BEFORE the rollover (pins gen 1) and must follow
    // the cutover with no restart — per-batch wall printed around it
    val q = e.filter(col("vec_id") < 10)
    var servedRows = 0L
    val serveIntake = StreamingAnalytics.vectorStoreServeIntake(root,
      k = 5, nprobe = if (pq) 12 else 4,
      cutoverSink = g => println(s"[vstore-probe] $mode serve_cutover_to_gen=$g"),
      sink = (df, _) => servedRows = df.count())
    timed("serve_batch_gen1")(serveIntake(q, 100L))

    // 3. retrain snapshots as-of batch 1, and batch 2 lands DURING the
    // publish window (it exists only in gen 1 afterwards)
    val snapshot = VectorStore.corpusAsOf(spark, g1, highWater = 1L)
    intake(liveBatches(2), 2L)
    val g2 = timed("publish_gen2")(VectorStore.publish(spark, root, snapshot,
      nlist = 16, pqM = pqM, highWater = 1L))
    // the SAME serve closure's next batch lands on gen 2 (re-pin +
    // AUTO-budget recount included in the wall)
    timed("serve_batch_cutover")(serveIntake(q, 101L))
    println(s"[vstore-probe] $mode serve_rows=$servedRows")

    // 4. the next batch triggers the cutover (catch-up + append)
    var replayed: Seq[Long] = Nil
    val intake2 = StreamingAnalytics.vectorStoreIngestIntake(root,
      cutoverSink = (_, ids) => replayed = ids)
    timed("cutover_catchup_plus_batch3")(intake2(liveBatches(3), 3L))
    println(s"[vstore-probe] $mode replayed_batches=${replayed.mkString(",")}")

    // 5. invariants
    val served = spark.read.parquet(g2.lists)
    val nServed = served.count()
    val nDistinct = served.select("cand_id").distinct().count()
    println(s"[vstore-probe] $mode gen2_rows=$nServed distinct=$nDistinct " +
      s"corpus=$nTotal complete=${nServed == nTotal && nDistinct == nTotal}")
    val m2 = VectorStore.models(spark, g2)
    def rows(df: DataFrame): Seq[String] =
      df.select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.mkString(",")).sorted.toSeq
    val (sGen, sRebuild) = timed("serve_check") {
      if (pq) {
        val probes = Similarity.pqProbes(q, m2.quantizer, m2.codebooks.get,
          nprobe = 12)
        (rows(Similarity.pqTopKFromGeom(served, probes, q, e, k = 5)),
          rows(Similarity.pqTopKFromGeom(
            Similarity.pqPrepare(e, m2.quantizer, m2.codebooks.get),
            probes, q, e, k = 5)))
      } else {
        (rows(Similarity.ivfTopKPrepared(served, q, k = 5, m2.quantizer,
            nprobe = 4)),
          rows(Similarity.ivfTopKPrepared(Similarity.ivfPrepare(e, m2.quantizer),
            q, k = 5, m2.quantizer, nprobe = 4)))
      }
    }
    println(s"[vstore-probe] $mode serve_equal=${sGen == sRebuild} " +
      s"rows=${sGen.length}")
    // a reader still pinned to gen 1 keeps serving until reclaim...
    val g1Alive = spark.read.parquet(g1.lists).count() > 0
    timed("reclaim_gen1")(VectorStore.dropGenerationsBelow(spark, root, g2.gen))
    val g1Gone = !new java.io.File(g1.dir).exists()
    println(s"[vstore-probe] $mode gen1_served_before_reclaim=$g1Alive " +
      s"gen1_reclaimed=$g1Gone " +
      s"gen2_still_current=${VectorStore.current(spark, root).exists(_.gen == g2.gen)}")
    spark.stop()
  }
}
