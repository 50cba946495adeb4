package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generation lifecycle of [[VectorStore]]: publish → ingest-on-top →
  * drift-gated retrain publish → reclaim, with the crash-safety and
  * pinned-generation contracts the scaladoc states. */
class VectorStoreSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  private def serve(lists: DataFrame, quant: (Array[Long], Array[Array[Float]]))
      : Seq[String] =
    Similarity.ivfTopKPrepared(lists, e.filter(col("vec_id") < 6), k = 3,
        quant, nprobe = 2)
      .select("query_id", "cand_id", "sim", "rank").collect()
      .map(_.mkString(",")).sorted.toSeq

  test("publish/ingest/republish lifecycle: immutable generations, marker-gated visibility") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore").toString
    assert(VectorStore.current(spark, root).isEmpty)
    // gen 1: bulk publish on the first two thirds of the corpus
    val c0 = e.filter(col("vec_id") % 3 =!= 0)
    val g1 = VectorStore.publish(spark, root, c0, nlist = 8)
    assert(g1.gen == 1L && VectorStore.current(spark, root).contains(g1))
    val quant1 = Artifacts.loadCentroids(spark, g1.centroids)
    assert(serve(spark.read.parquet(g1.lists), quant1) ==
      serve(Similarity.ivfPrepare(c0, quant1), quant1),
      "published generation must serve like a direct prepare")
    // streaming growth composes: the ingest intake appends its batch on
    // top of the bulk batch_id=-1 partition of the SAME lists dir
    val grown = e.filter(col("vec_id") % 3 === 0)
    graft.streaming.StreamingAnalytics.vectorIngestIntake(
      g1.lists, g1.centroids)(grown, 0L)
    assert(spark.read.parquet(g1.lists)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(-1L, 0L))
    assert(serve(spark.read.parquet(g1.lists), quant1) ==
      serve(Similarity.ivfPrepare(e, quant1), quant1),
      "bulk + ingested batches must serve like a full prepare")
    // a crashed publish (gen dir, NO marker) is invisible to readers
    Similarity.ivfPrepare(c0, quant1).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite")
      .parquet(s"$root/gen=2/lists")
    assert(VectorStore.current(spark, root).contains(g1),
      "a partial generation without its READY marker must not resolve")
    // gen 2: the retrain rollover (drift verdict acted on) — retrained
    // over the FULL corpus; gen 1 stays intact for pinned readers
    val g2 = VectorStore.publish(spark, root, e, nlist = 8)
    assert(g2.gen == 2L && VectorStore.current(spark, root).contains(g2))
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    assert(serve(spark.read.parquet(g2.lists), quant2) ==
      serve(Similarity.ivfPrepare(e, quant2), quant2))
    assert(serve(spark.read.parquet(g1.lists), quant1).nonEmpty,
      "the retired generation must remain readable until reclaimed")
    // reclaim refuses the live generation, removes the retired one
    intercept[IllegalArgumentException] {
      VectorStore.dropGenerationsBelow(spark, root, g2.gen + 1)
    }
    VectorStore.dropGenerationsBelow(spark, root, g2.gen)
    assert(!new java.io.File(s"$root/gen=1").exists())
    assert(VectorStore.current(spark, root).contains(g2))
    assert(serve(spark.read.parquet(g2.lists), quant2).nonEmpty)
  }

  test("PQ generation: publish trains codebooks and serves at the pinned geometry") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-pq").toString
    val g = VectorStore.publish(spark, root, e, nlist = 8, pqM = 4, pqKsub = 16)
    val quant = Artifacts.loadCentroids(spark, g.centroids)
    val books = Artifacts.loadPqCodebooks(spark, g.codebooks)
    val q = e.filter(col("vec_id") < 6)
    def rows(lists: DataFrame): Seq[String] =
      Similarity.pqTopKFromGeom(lists,
          Similarity.pqProbes(q, quant, books, nprobe = 2), q, e,
          k = 3, rerank = 12)
        .select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.mkString(",")).sorted.toSeq
    val got = rows(spark.read.parquet(g.lists))
    assert(got.nonEmpty && got == rows(Similarity.pqPrepare(e, quant, books)))
  }
}
