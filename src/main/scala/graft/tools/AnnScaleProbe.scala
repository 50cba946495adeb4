package graft.tools

import graft.operators.{CacheRegistry, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-budget sweep for the fixed-query-cost ANN families at a
  * given corpus scale — the measurement loop behind the BASELINE.md
  * third-decade recall ladder.
  *
  * The registered gate queries pin ONE configuration (so the DuckDB
  * oracle replays a fixed geometry); this probe answers the deployment
  * question those numbers raise: when a fixed per-query budget's recall
  * decays with corpus growth (LSH's tables×probes×maxBucket candidate
  * cap, PQ's keepR ADC frontier), how much budget buys it back? Ground
  * truth is [[Similarity.bruteForceTopK]] — exact, and cheap even at
  * 2M vectors (it is the ann_cosine_topk query).
  *
  * Usage: AnnScaleProbe <sfDir> — prints one line per configuration:
  * `[ann-probe] <family> <param>=<v> recall@5=<r> wall=<s>s`.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ann-scale-probe")
      .config("spark.sql.shuffle.partitions",
        math.max(32, graft.Bench.inputBytes(sfDir) / (64L << 20)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val k = 5
    val exact = Similarity.bruteForceTopK(q, e, k)
      .select("query_id", "cand_id").persist()
    val nExact = exact.count() // materialize ground truth once

    def recall(ann: DataFrame): Double = {
      val hits = exact.join(ann.select(col("query_id"), col("cand_id"),
          lit(1).as("hit")), Seq("query_id", "cand_id"), "left_outer")
        .agg(count(col("hit"))).head().getLong(0)
      hits.toDouble / nExact
    }
    def timed(label: String, ann: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = recall(ann)
      CacheRegistry.releaseAll()
      println(f"[ann-probe] $label recall@$k=$r%.3f wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    // Focused-run knobs (default = the standing full ladder recipe):
    //   SPARK_GRAFT_ANN_RERANKS="400,800,1600"  PQ sweep points
    //   SPARK_GRAFT_ANN_PROBES="32,512"         LSH sweep points
    //   (an empty string skips that family entirely)
    //   SPARK_GRAFT_ANN_REPEATS=2               timings per point
    def sweep(env: String, default: Seq[Int]): Seq[Int] =
      sys.env.get(env).map(_.split(",").filter(_.nonEmpty).toSeq
        .map(_.trim.toInt)).getOrElse(default)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_ANN_REPEATS", "1").toInt

    // PQ: one shared geometry (default = the gate's 16×256 grid over
    // the shared 16-cell coarse quantizer), swept over the exact-rerank
    // frontier. SPARK_GRAFT_ANN_NLIST / SPARK_GRAFT_ANN_NPROBE override
    // the coarse geometry — the r19 sweep re-validating the 160·k
    // rerank saturation cap on a higher-nlist store shape (the serve
    // intakes apply AUTO to arbitrary geometries; the cap must hold, or
    // be documented per-geometry, where the cell-recall ceiling moves).
    val pqSweep = sweep("SPARK_GRAFT_ANN_RERANKS", Seq(40, 100, 400, 1600))
    val lshSweep = sweep("SPARK_GRAFT_ANN_PROBES", Seq(32, 128, 512))
    val nlist = sys.env.getOrElse("SPARK_GRAFT_ANN_NLIST", "16").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_ANN_NPROBE", "12").toInt
    if (pqSweep.nonEmpty) {
      if (nlist != 16 || nprobe != 12)
        println(s"[ann-probe] pq geometry override: nlist=$nlist nprobe=$nprobe")
      val cents = Similarity.trainCentroids(e, nlist = nlist, trainIters = 2)
      val books = Similarity.trainPqCodebooks(e, m = 16, ksub = 256)
      val pq = Similarity.pqGeomFrames(q, e, cents, books, nprobe = nprobe)
      val lists = pq.lists.persist(); val nCorpus = lists.count()
      val probes = pq.probes.persist(); probes.count()
      val autoRerank = Similarity.autoPqRerank(nCorpus, k)
      for (rerank <- (pqSweep :+ autoRerank).distinct.sorted; _ <- 1 to repeats) {
        val tag = if (rerank == autoRerank) s"$rerank(AUTO)" else rerank.toString
        timed(s"pq rerank=$tag",
          Similarity.pqTopKFromGeom(lists, probes, q, e, k, rerank = rerank))
      }
      lists.unpersist(); probes.unpersist()
    }

    // LSH: the gate's scale-adaptive bucket depth (bitsPerTable=0),
    // swept over the query-side multi-probe budget incl. the
    // scale-aware AUTO width the defaults now derive
    if (lshSweep.nonEmpty) {
      val nCorpus = e.filter(Similarity.vecNorm(col("embedding")) > 0).count()
      val autoProbes = Similarity.autoLshProbes(nCorpus)
      // SPARK_GRAFT_ANN_LSH_INDEX=<path>: measure the STANDING-INDEX
      // serve path — build+save the geometry once (timed separately:
      // that is the 200-290 s per-workload wall the artifact
      // amortizes), then pay only query probes + join/rerank per point.
      sys.env.get("SPARK_GRAFT_ANN_LSH_INDEX").foreach { ipath =>
        if (!Similarity.lshIndexExists(spark, ipath)) {
          val t0 = System.nanoTime()
          Similarity.saveLshIndex(spark, ipath, e,
            tables = 24, bitsPerTable = 0, maxBucket = 64)
          println(f"[ann-probe] lsh index build+save wall=${(System.nanoTime() - t0) / 1e9}%.1fs -> $ipath")
        } else println(s"[ann-probe] lsh index reused at $ipath")
        val idx = Similarity.loadLshIndex(spark, ipath)
        for (p <- (lshSweep :+ autoProbes).distinct.sorted; _ <- 1 to repeats) {
          val tag = if (p == autoProbes) s"$p(AUTO)" else p.toString
          timed(s"lsh-prepared probes=$tag serve",
            Similarity.lshTopKPrepared(idx, q, e, k, probes = p))
        }
      }
      // SPARK_GRAFT_ANN_DECOMPOSE=1: split each point's wall into the
      // corpus-side geometry build (signature explode + block window —
      // probe-count-independent) vs the probe-dependent candidate join
      // + rerank, to locate where a flat-in-probes wall actually lands
      val decompose = sys.env.get("SPARK_GRAFT_ANN_DECOMPOSE").contains("1")
      for (p <- (lshSweep :+ autoProbes).distinct.sorted; _ <- 1 to repeats) {
        val tag = if (p == autoProbes) s"$p(AUTO)" else p.toString
        if (decompose) {
          val t0 = System.nanoTime()
          val f = Similarity.lshProbeFrames(q, e,
            tables = 24, bitsPerTable = 0, maxBucket = 64, probes = p)
          val nSig = f.cBuckets.count() // materialize the persisted geometry
          val tGeom = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val nProbes = f.qProbes.count()
          val tProbes = (System.nanoTime() - t1) / 1e9
          println(f"[ann-probe] lsh probes=$tag geom=$tGeom%.1fs" +
            f" ($nSig sig rows) qprobes=$tProbes%.1fs ($nProbes rows)")
          timed(s"lsh probes=$tag join+rerank",
            Similarity.lshRerankTopK(q, e, f.qProbes, f.cBuckets, k))
        } else {
          val f = Similarity.lshProbeFrames(q, e,
            tables = 24, bitsPerTable = 0, maxBucket = 64, probes = p)
          timed(s"lsh probes=$tag", Similarity.lshRerankTopK(q, e, f.qProbes, f.cBuckets, k))
        }
      }
    }
    exact.unpersist()
    spark.stop()
  }
}
