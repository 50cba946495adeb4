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

  test("rollover under live ingest: batches landing mid-publish survive the cutover") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-roll").toString
    val intake = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(root)
    // thirds of the corpus arrive as a bulk + two live batches
    val bulk = e.filter(col("vec_id") % 4 === 0)
    val b0 = e.filter(col("vec_id") % 4 === 1)
    val b1 = e.filter(col("vec_id") % 4 === 2) // lands DURING the publish
    val b2 = e.filter(col("vec_id") % 4 === 3) // lands AFTER the cutover
    val g1 = VectorStore.publish(spark, root, bulk, nlist = 8, highWater = -1L)
    intake(b0, 0L)
    // the retrain snapshots as-of batch 0 (its high water) ...
    val snapshot = VectorStore.corpusAsOf(spark, g1, highWater = 0L)
    assert(snapshot.count() == bulk.count() + b0.count(),
      "corpusAsOf must cover the bulk plus every batch <= the high water")
    // ... and WHILE it runs, batch 1 lands in gen 1
    intake(b1, 1L)
    val g2 = VectorStore.publish(spark, root, snapshot, nlist = 8, highWater = 0L)
    assert(VectorStore.highWater(spark, g2) == 0L)
    // batch 1 is in gen 1's lists but NOT in gen 2's bulk — the r17 gap
    assert(spark.read.parquet(g2.lists)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(-1L))
    // next arriving batch triggers the cutover: catch-up replays batch 1
    // onto gen 2, then batch 2 appends there
    var observed: (Long, Seq[Long]) = null
    val intake2 = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(
      root, cutoverSink = (gen, ids) => observed = (gen, ids))
    intake2(b2, 2L)
    assert(observed == ((2L, Seq(1L))),
      "cutover must replay exactly the batches above the high water")
    val served = spark.read.parquet(g2.lists)
    // no vector lost, none double-served: gen 2 holds the whole corpus once
    assert(served.count() == e.count())
    assert(served.select("cand_id").distinct().count() == e.count())
    assert(served.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(-1L, 1L, 2L))
    // and the caught-up rows are encoded under gen 2's model: serving
    // the rolled-over store ≡ a from-scratch prepare of the full corpus
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    assert(serve(served, quant2) ==
      serve(Similarity.ivfPrepare(e, quant2), quant2))
    // catch-up replay is idempotent: re-running it rewrites the same rows
    val before = served.orderBy("cand_id").collect().map(_.mkString(",")).toSeq
    assert(VectorStore.catchUp(spark, g1, g2) == Seq(1L))
    val after = spark.read.parquet(g2.lists)
      .orderBy("cand_id").collect().map(_.mkString(",")).toSeq
    assert(after == before)
    // a restart mid-cutover cannot strand the window: a FRESH intake's
    // first batch re-runs the predecessor catch-up (idempotent no-op here)
    val intake3 = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(root)
    intake3(b2, 2L)
    assert(spark.read.parquet(g2.lists).count() == e.count())
  }

  test("generation compaction folds batches into the bulk and keeps the cutover contract") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-compact").toString
    val bulk = e.filter(col("vec_id") % 4 === 0)
    VectorStore.publish(spark, root, bulk, nlist = 8, highWater = -1L)
    val g1 = VectorStore.current(spark, root).get
    val intake = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(root)
    (1 to 3).foreach(i => intake(e.filter(col("vec_id") % 4 === i), (i - 1).toLong))
    graft.streaming.StreamingAnalytics.compactVectorStore(spark, root, upTo = 1L)
    // batches 0 and 1 folded into the bulk; batch 2 still addressable
    assert(spark.read.parquet(g1.lists)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(-1L, 2L))
    assert(VectorStore.highWater(spark, g1) == 1L)
    // the store still serves the complete corpus
    val quant1 = Artifacts.loadCentroids(spark, g1.centroids)
    assert(serve(spark.read.parquet(g1.lists), quant1) ==
      serve(Similarity.ivfPrepare(e, quant1), quant1))
    // and the cutover contract survives: a snapshot at hw=2 is the whole
    // corpus (folded rows via the bulk, batch 2 via the partition
    // filter), the rollover replays NOTHING, and gen 2 is complete
    val snap = VectorStore.corpusAsOf(spark, g1, highWater = 2L)
    assert(snap.count() == e.count())
    val g2 = VectorStore.publish(spark, root, snap, nlist = 8, highWater = 2L)
    assert(VectorStore.catchUp(spark, g1, g2).isEmpty)
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    assert(serve(spark.read.parquet(g2.lists), quant2) ==
      serve(Similarity.ivfPrepare(e, quant2), quant2))
    // compacting an already-folded range is a no-op, not an error
    graft.streaming.StreamingAnalytics.compactVectorStore(spark, root, upTo = 1L)
  }

  test("autonomous drift retrain: the intake republishes and cuts over in-stream") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-auto").toString
    VectorStore.publish(spark, root, e.filter(col("vec_id") % 3 === 0),
      nlist = 8, highWater = -1L)
    var cutovers = List.empty[(Long, Seq[Long])]
    var probed = 0
    // force the verdict: every probed batch "drifts" — the loop must
    // retrain with the generation's own hyperparameters, publish, catch
    // up (nothing to replay: high water = everything landed), and append
    // the arriving batch to the NEW generation
    val intake = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(
      root, driftEvery = 2,
      driftSink = (_, _) => probed += 1,
      cutoverSink = (g, ids) => cutovers ::= (g, ids),
      retrainOn = _ => true)
    intake(e.filter(col("vec_id") % 3 === 1), 0L) // probed -> retrain -> gen 2
    intake(e.filter(col("vec_id") % 3 === 2), 1L) // not probed (driftEvery=2)
    assert(probed == 1)
    assert(cutovers == List((2L, Nil)),
      "the autonomous retrain must publish gen 2 and replay nothing")
    val g2 = VectorStore.current(spark, root).get
    assert(g2.gen == 2L && VectorStore.highWater(spark, g2) == -1L)
    // batches 0 and 1 were appended to gen 2 (batch 0 AFTER its own
    // retrain) — the store is complete and serves like a fresh prepare
    assert(spark.read.parquet(g2.lists)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(-1L, 0L, 1L))
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    assert(spark.read.parquet(g2.lists).count() == e.count())
    assert(serve(spark.read.parquet(g2.lists), quant2) ==
      serve(Similarity.ivfPrepare(e, quant2), quant2))
  }

  test("serve intake follows a rollover WITHOUT a query restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-serve").toString
    val half = e.filter(col("vec_id") % 2 === 0)
    val g1 = VectorStore.publish(spark, root, half, nlist = 8)
    var observedGen: Long = -1L
    var out: Seq[String] = Nil
    val intake = graft.streaming.StreamingAnalytics.vectorStoreServeIntake(
      root, k = 3, nprobe = 2,
      cutoverSink = g => observedGen = g,
      sink = (df, _) => out = df.select("query_id", "cand_id", "sim", "rank")
        .collect().map(_.mkString(",")).sorted.toSeq)
    val q = e.filter(col("vec_id") < 6)
    intake(q, 0L)
    val quant1 = Artifacts.loadCentroids(spark, g1.centroids)
    assert(out.nonEmpty && out == serve(Similarity.ivfPrepare(half, quant1), quant1),
      "first batch must serve the live generation")
    // a retrain publishes gen 2 over the FULL corpus; the SAME closure
    // serves it at the very next batch — no restart
    val g2 = VectorStore.publish(spark, root, e, nlist = 8)
    intake(q, 1L)
    assert(observedGen == g2.gen, "the cutover must be observable")
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    assert(out == serve(Similarity.ivfPrepare(e, quant2), quant2),
      "post-rollover batches must serve the NEW generation's model+lists")
    // PQ store: one serve through the code+float generation layout
    val rootPq = java.nio.file.Files.createTempDirectory("graft-vstore-servepq").toString
    VectorStore.publish(spark, rootPq, e, nlist = 8, pqM = 4, pqKsub = 16)
    var outPq: Seq[String] = Nil
    val intakePq = graft.streaming.StreamingAnalytics.vectorStoreServeIntake(
      rootPq, k = 3, nprobe = 2, rerank = 12,
      sink = (df, _) => outPq = df.select("query_id", "cand_id", "sim", "rank")
        .collect().map(_.mkString(",")).sorted.toSeq)
    intakePq(q, 0L)
    val gPq = VectorStore.current(spark, rootPq).get
    val quantPq = Artifacts.loadCentroids(spark, gPq.centroids)
    val booksPq = Artifacts.loadPqCodebooks(spark, gPq.codebooks)
    val want = Similarity.pqTopKFromGeom(
        Similarity.pqPrepare(e, quantPq, booksPq),
        Similarity.pqProbes(q, quantPq, booksPq, nprobe = 2), q, e,
        k = 3, rerank = 12)
      .select("query_id", "cand_id", "sim", "rank").collect()
      .map(_.mkString(",")).sorted.toSeq
    assert(outPq.nonEmpty && outPq == want,
      "PQ serve through the store must equal a from-scratch prepare")
  }

  test("publish clamps untrainable hyperparameters instead of requiring env surgery") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-clamp").toString
    // a 20-vector bootstrap cannot train the 16/256 defaults: publish
    // must clamp (nlist <= n/8 = 2, ksub <= n/4 = 5), warn, and succeed
    val tiny = e.filter(col("vec_id") < 20)
    val g = VectorStore.publish(spark, root, tiny,
      nlist = 16, pqM = 4, pqKsub = 256)
    val quant = Artifacts.loadCentroids(spark, g.centroids)
    assert(quant._1.length == 2, "nlist must clamp to n/8")
    val books = Artifacts.loadPqCodebooks(spark, g.codebooks)
    assert(books.length == 4 && books.forall(_.length == 5),
      "ksub must clamp to n/4")
    // the clamped store SERVES: codes decode through the clamped LUTs
    val q = tiny.filter(col("vec_id") < 2)
    val served = Similarity.pqTopKFromGeom(
      spark.read.parquet(g.lists),
      Similarity.pqProbes(q, quant, books, nprobe = 2), q, tiny,
      k = 3, rerank = 12)
    assert(served.count() > 0)
    // explicit args the corpus CAN honor are never touched
    val root2 = java.nio.file.Files.createTempDirectory("graft-vstore-noclamp").toString
    val g2 = VectorStore.publish(spark, root2, tiny, nlist = 2, pqM = 4, pqKsub = 4)
    assert(Artifacts.loadCentroids(spark, g2.centroids)._1.length == 2)
    assert(Artifacts.loadPqCodebooks(spark, g2.codebooks).forall(_.length == 4))
  }

  test("concurrent publishers fail loudly instead of blessing an interleaved generation") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-race").toString
    VectorStore.publish(spark, root, e, nlist = 8)
    // a second writer that raced to the same generation number dies on
    // the overwrite=false marker create, not silently "succeeds"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    intercept[java.io.IOException] {
      fs.create(new org.apache.hadoop.fs.Path(root, "_gen_1_READY"),
        /*overwrite=*/ false).close()
    }
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

  test("PQ rollover: catch-up re-encodes from the float sibling under the new codebooks") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstore-pqroll").toString
    val bulk = e.filter(col("vec_id") % 3 =!= 2)
    val b0 = e.filter(col("vec_id") % 3 === 2) // lands during the publish
    val g1 = VectorStore.publish(spark, root, bulk, nlist = 8,
      pqM = 4, pqKsub = 16, highWater = -1L)
    val intake = graft.streaming.StreamingAnalytics.vectorStoreIngestIntake(root)
    intake(b0, 0L)
    // the PQ store maintains BOTH frames per batch — codes and floats
    assert(spark.read.parquet(g1.flists)
      .filter(col("batch_id").cast("long") === 0L).count() == b0.count())
    // retrain publishes gen 2 from the pre-batch snapshot; batch 0 is
    // above its high water and must be re-ENCODED at cutover
    val g2 = VectorStore.publish(spark, root,
      VectorStore.corpusAsOf(spark, g1, highWater = -1L), nlist = 8,
      pqM = 4, pqKsub = 16, highWater = -1L)
    assert(VectorStore.catchUp(spark, g1, g2) == Seq(0L))
    val quant2 = Artifacts.loadCentroids(spark, g2.centroids)
    val books2 = Artifacts.loadPqCodebooks(spark, g2.codebooks)
    val q = e.filter(col("vec_id") < 6)
    def rows(lists: DataFrame): Seq[String] =
      Similarity.pqTopKFromGeom(lists,
          Similarity.pqProbes(q, quant2, books2, nprobe = 2), q, e,
          k = 3, rerank = 12)
        .select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.mkString(",")).sorted.toSeq
    // rolled-over store ≡ from-scratch prepare of the full corpus under
    // gen 2's models — i.e. the caught-up codes are gen-2 codes
    assert(rows(spark.read.parquet(g2.lists)) ==
      rows(Similarity.pqPrepare(e, quant2, books2)))
    assert(spark.read.parquet(g2.flists).count() == e.count())
  }
}
