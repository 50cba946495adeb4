package graft.tools

import graft.operators.{Artifacts, Similarity}
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-throughput probe for the streaming vector-store maintenance
  * path ([[graft.streaming.StreamingAnalytics.vectorIngestIntake]]):
  * slices `<sfDir>/embeddings.parquet` into `nBatches` micro-batches,
  * trains and PINS the coarse quantizer (and, with `--pq`, the 16×256
  * codebooks) on the FIRST batch — the frozen-model contract an
  * append-maintained store lives under — then ingests every batch
  * through the intake (map-side assign/encode, batch_id-partitioned
  * append), printing per-batch wall and vectors/s. The per-batch wall
  * should stay FLAT as the store grows: ingest cost is a pure function
  * of batch size, never of index size — the property that lets the
  * same intake maintain a 100 TB store. Ends with the
  * ingest-then-serve ≡ rebuild-then-serve check on a 10-query probe at
  * the pinned geometry (the spec contract, re-verified at scale).
  *
  * Usage: VectorIngestProbe <sfDir> [nBatches] [--pq]
  */
object VectorIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = args.drop(1).filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(4)
    val pq = args.contains("--pq")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-vector-ingest-probe")
      .config("spark.sql.shuffle.partitions",
        math.max(32, graft.Bench.inputBytes(sfDir) / (64L << 20)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val batches = (0 until nBatches).map(i =>
      e.filter(pmod(col("vec_id"), lit(nBatches)) === i))
    val root = java.nio.file.Files.createTempDirectory("vec_ingest").toString
    val quant = Similarity.trainCentroids(batches(0), nlist = 16, trainIters = 2)
    Artifacts.saveCentroids(spark, s"$root/cents", quant._1, quant._2)
    val books = if (pq) {
      val cb = Similarity.trainPqCodebooks(batches(0), m = 16, ksub = 256)
      Artifacts.savePqCodebooks(spark, s"$root/books", cb)
      cb
    } else null
    val gate = StreamingAnalytics.vectorIngestIntake(s"$root/lists",
      s"$root/cents", codebooksPath = if (pq) s"$root/books" else "")
    batches.zipWithIndex.foreach { case (b, i) =>
      val n = b.count() // materialized OUTSIDE the timed window
      val t0 = System.nanoTime()
      gate(b, i.toLong)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[vec-ingest] mode=${if (pq) "pq" else "ivf"} batch=$i n=$n " +
        f"wall=$w%.1fs vecs_per_s=${n / w}%.0f")
    }
    val q = e.filter(col("vec_id") < 10)
    val lists = spark.read.parquet(s"$root/lists")
    def rows(df: DataFrame): Seq[String] =
      df.select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.mkString(",")).sorted.toSeq
    val (servedIngest, servedRebuild) = if (pq) {
      val probes = Similarity.pqProbes(q, quant, books, nprobe = 12)
      (rows(Similarity.pqTopKFromGeom(lists, probes, q, e, k = 5)),
        rows(Similarity.pqTopKFromGeom(
          Similarity.pqPrepare(e, quant, books), probes, q, e, k = 5)))
    } else {
      (rows(Similarity.ivfTopKPrepared(lists, q, k = 5, quant, nprobe = 4)),
        rows(Similarity.ivfTopKPrepared(
          Similarity.ivfPrepare(e, quant), q, k = 5, quant, nprobe = 4)))
    }
    println(s"[vec-ingest] serve_equal=${servedIngest == servedRebuild} " +
      s"rows=${servedIngest.length}")
    spark.stop()
  }
}
