package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window emits closed windows, drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val name = s"win_${System.nanoTime()}"
    val q = StreamingAnalytics.windowedStatusCounts(
        mem.toDF().toDF("timestamp", "status"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), "sent"), (ts(2), "sent"), (ts(3), "bounced"))
      q.processAllAvailable()
      // advance watermark far past the first window (10-min lateness)
      mem.addData((ts(30), "sent"))
      q.processAllAvailable()
      // a VERY late event for the first window — must be dropped
      mem.addData((ts(1), "sent"))
      q.processAllAvailable()
      mem.addData((ts(59), "sent"))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("window_start", "status", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "sent", 2L)))
      assert(rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "bounced", 1L)))
      // the late (ts(1)) event did NOT bump the closed window
      assert(!rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "sent", 3L)))
    } finally q.stop()
  }

  test("windowed HLL distinct: streaming estimate stays in the batch sketch bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val name = s"hll_${System.nanoTime()}"
    val q = StreamingAnalytics.windowedDistinctUsers(
        mem.toDF().toDF("ts", "event_type", "user_id"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      // 400 distinct users for type a, 70 for type b, split across two
      // micro-batches so cross-batch sketch state must merge
      val batch1 = (0 until 250).map(i => (ts(1), "a", s"u$i")) ++
        (0 until 40).map(i => (ts(2), "b", s"v$i"))
      val batch2 = (150 until 400).map(i => (ts(3), "a", s"u$i")) ++
        (30 until 70).map(i => (ts(2), "b", s"v$i"))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      mem.addData((ts(30), "a", "late")) // close the first window
      q.processAllAvailable()
      val rows = spark.table(name)
        .filter($"window_start" === Timestamp.valueOf("2024-01-01 10:00:00"))
        .select("event_type", "approx_distinct")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(math.abs(rows("a") - 400).toDouble / 400 <= 0.05)
      assert(math.abs(rows("b") - 70).toDouble / 70 <= 0.05)
    } finally q.stop()
  }

  test("sketch cube intake: streamed cube answers in-bound, replay and compaction are harmless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cubePath = java.nio.file.Files.createTempDirectory("cube_intake").toString + "/cube"
    val ckpt = java.nio.file.Files.createTempDirectory("cube_ckpt").toString
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("event_type", "user_id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.sketchCubeIntake(
        cubePath, Seq("event_type"), "user_id", shards = 4))
      .start()
    try {
      // 300 users for "a" across two batches (overlap 100-199), 80 for "b"
      mem.addData((0 until 200).map(u => ("a", s"u$u")): _*)
      q.processAllAvailable()
      mem.addData(((100 until 300).map(u => ("a", s"u$u")) ++
        (0 until 80).map(u => ("b", s"v$u"))): _*)
      q.processAllAvailable()
      def estimates(): Map[String, Long] =
        graft.operators.Sketches.hllRollup(
            spark.read.parquet(cubePath), Seq("event_type"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val live = estimates()
      assert(math.abs(live("a") - 300).toDouble / 300 <= 0.05, s"a=${live("a")}")
      assert(math.abs(live("b") - 80).toDouble / 80 <= 0.05, s"b=${live("b")}")

      // at-least-once REPLAY: re-run batch 1's intake directly — the
      // partition overwrite plus set semantics leave estimates unchanged
      StreamingAnalytics.sketchCubeIntake(cubePath, Seq("event_type"),
        "user_id", shards = 4).apply(
        ((100 until 300).map(u => ("a", s"u$u")) ++
          (0 until 80).map(u => ("b", s"v$u"))).toDF("event_type", "user_id"), 1L)
      assert(estimates() == live, "replayed batch changed the cube's answers")

      // compaction folds batch partitions; answers stay in-bound
      StreamingAnalytics.compactCube(spark, cubePath, Seq("event_type"),
        numFiles = 2, belowBatchId = 2L)
      val folded = spark.read.parquet(cubePath)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(folded == Set(-1L), s"unexpected partitions: $folded")
      val post = estimates()
      assert(math.abs(post("a") - 300).toDouble / 300 <= 0.05, s"a=${post("a")}")
      assert(math.abs(post("b") - 80).toDouble / 80 <= 0.05, s"b=${post("b")}")
    } finally q.stop()
  }

  test("theta cube intake: live audience overlap from the streamed cube; replay and compaction harmless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sketches
    val cubePath = java.nio.file.Files.createTempDirectory("theta_intake").toString + "/cube"
    val ckpt = java.nio.file.Files.createTempDirectory("theta_ckpt").toString
    // audience a = u0..u299, b = u200..u499 → |a|=300 |b|=300 |a∩b|=100,
    // split across two batches with overlap inside and across groups
    val b0 = (0 until 200).map(u => ("a", s"u$u")) ++
      (200 until 350).map(u => ("b", s"u$u"))
    val b1 = (100 until 300).map(u => ("a", s"u$u")) ++
      (300 until 500).map(u => ("b", s"u$u"))
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("event_type", "user_id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.thetaCubeIntake(
        cubePath, Seq("event_type"), "user_id"))
      .start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
      def overlap(): (Long, Long, Long) = {
        val r = Sketches.thetaOverlap(
          Sketches.thetaRollup(spark.read.parquet(cubePath), Seq("event_type")),
          "event_type").collect().head
        (r.getLong(2), r.getLong(3), r.getLong(4)) // n_a, n_b, n_intersect
      }
      val (na, nb, ni) = overlap()
      assert(math.abs(na - 300.0) / 300 <= 0.05, s"n_a=$na")
      assert(math.abs(nb - 300.0) / 300 <= 0.05, s"n_b=$nb")
      assert(math.abs(ni - 100.0) / 100 <= 0.15, s"n_intersect=$ni")
      // replay batch 1 directly: set semantics + deterministic hashing
      // leave every estimate unchanged
      StreamingAnalytics.thetaCubeIntake(cubePath, Seq("event_type"),
        "user_id").apply(b1.toDF("event_type", "user_id"), 1L)
      assert(overlap() == ((na, nb, ni)), "replay changed the cube's answers")
      // compaction folds the batch partitions; answers unchanged
      StreamingAnalytics.compactThetaCube(spark, cubePath, Seq("event_type"),
        numFiles = 2, belowBatchId = 2L)
      val folded = spark.read.parquet(cubePath)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(folded == Set(-1L), s"unexpected partitions: $folded")
      assert(overlap() == ((na, nb, ni)), "compaction changed the cube's answers")
    } finally q.stop()
  }

  test("kll cube intake: streamed quantiles in rank bound, replay idempotent, compaction safe between batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cubePath = java.nio.file.Files.createTempDirectory("kll_intake").toString + "/cube"
    val ckpt = java.nio.file.Files.createTempDirectory("kll_ckpt").toString
    // two batches of values 0..999 per key; exact p50 = 499 or 500
    val b0 = (0 until 500).map(v => ("a", v.toDouble))
    val b1 = (500 until 1000).map(v => ("a", v.toDouble))
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("event_type", "value")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.kllCubeIntake(
        cubePath, Seq("event_type"), "value", shards = 4))
      .start()
    try {
      mem.addData(b0: _*)
      q.processAllAvailable()
      mem.addData(b1: _*)
      q.processAllAvailable()
      def p50(): Double =
        graft.operators.Sketches.kllRollup(
            spark.read.parquet(cubePath), Seq("event_type"), Seq(0.5))
          .collect().head.getDouble(1)
      // KLL rank error ~1.65% at k=200: value at p50 must lie between
      // the exact 45th and 55th percentile values (generous bracket)
      val live = p50()
      assert(live >= 450 && live <= 550, s"p50=$live")
      // at-least-once REPLAY of batch 1: partition overwrite replaces
      // the batch's sketches with a re-sketch of the SAME multiset — no
      // double-weighting, but KLL's randomized compaction means the new
      // sketch is a different in-bound approximation, so assert the
      // bound, not bit-equality (contrast the HLL cube test above)
      StreamingAnalytics.kllCubeIntake(cubePath, Seq("event_type"),
        "value", shards = 4).apply(b1.toDF("event_type", "value"), 1L)
      val replayed = p50()
      assert(replayed >= 450 && replayed <= 550,
        s"replayed-batch p50=$replayed outside the rank bound")
      val nAfterReplay = spark.read.parquet(cubePath)
        .filter(col("batch_id") === 1L).count()
      assert(nAfterReplay ==
        spark.read.parquet(cubePath).filter(col("batch_id") === 1L)
          .select("event_type", "_shard").distinct().count(),
        "replay duplicated (dims, shard) sketch rows in the partition")
      // compaction between batches (belowBatchId = next batch id)
      StreamingAnalytics.compactKllCube(spark, cubePath, Seq("event_type"),
        numFiles = 2, belowBatchId = 2L)
      val folded = spark.read.parquet(cubePath)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(folded == Set(-1L), s"unexpected partitions: $folded")
      val post = p50()
      assert(post >= 450 && post <= 550, s"post-compaction p50=$post")
    } finally q.stop()
  }

  test("lm score intake: persisted model gates the stream; scores equal the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LanguageModel
    val corpus = Seq(
      1L -> "the cat sat on the mat", 2L -> "the cat ate the fish",
      3L -> "dogs chase the cat")
    val modelPath = java.nio.file.Files.createTempDirectory("lm_model").toString + "/m"
    LanguageModel.save(spark, modelPath,
      LanguageModel.train(corpus.toDF("doc_id", "text"), "text"))
    val ckpt = java.nio.file.Files.createTempDirectory("lm_ckpt").toString
    val got = scala.collection.mutable.Map.empty[Long, Double]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.lmScoreIntake(
        modelPath, minScore = 0.2,
        sink = (df, _) => df.select("doc_id", "lm_score").collect()
          .foreach(r => got.synchronized { got(r.getLong(0)) = r.getDouble(1) })))
      .start()
    try {
      // model-like doc, alien doc, and a 1-token (unscorable) doc
      mem.addData(10L -> "the cat sat on the mat",
        11L -> "zebra quantum flux vortex", 12L -> "word")
      q.processAllAvailable()
      mem.addData(13L -> "the cat ate the fish")
      q.processAllAvailable()
    } finally q.stop()
    // batch reference: same model, same score
    val model = LanguageModel.load(spark, modelPath)
    val want = LanguageModel.scoreMeanLikelihood(
        Seq(10L -> "the cat sat on the mat", 11L -> "zebra quantum flux vortex",
          12L -> "word", 13L -> "the cat ate the fish").toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet === Set(10L, 13L), s"got $got") // alien + short dropped
    assert(want(11L) < 0.2, "alien doc should score below the gate")
    assert(got(10L) === want(10L) && got(13L) === want(13L),
      "streamed scores differ from the batch operator")
  }

  test("nb route intake: streamed labels equal the batch classifier bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextClassifier
    val train = Seq(
      (1L, "en", "the cat sat on the mat"), (2L, "en", "a dog and a cat"),
      (3L, "fr", "le chat et le chien"), (4L, "fr", "un chien sur le tapis"))
      .toDF("doc_id", "lang", "text")
    val modelPath = java.nio.file.Files.createTempDirectory("nb_model").toString + "/m"
    TextClassifier.save(spark, modelPath, TextClassifier.train(train, "lang", "text"))
    val ckpt = java.nio.file.Files.createTempDirectory("nb_ckpt").toString
    val got = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.nbRouteIntake(
        modelPath,
        sink = (df, _) => df.select("doc_id", "predicted", "score_fx").collect()
          .foreach(r => got.synchronized {
            got(r.getLong(0)) = (r.getString(1), r.getLong(2)) })))
      .start()
    val probes = Seq(10L -> "le chat dort", 11L -> "the dog sat",
      12L -> "zebra zebra zebra")
    try {
      mem.addData(probes.take(2): _*)
      q.processAllAvailable()
      mem.addData(probes.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val want = TextClassifier.classify(probes.toDF("doc_id", "text"),
        "doc_id", "text", TextClassifier.load(spark, modelPath))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.toMap === want, "streamed labels/scores differ from batch")
    assert(got(10L)._1 === "fr" && got(11L)._1 === "en")
  }

  test("nb route intake: model generation is PINNED — an in-place artifact " +
      "overwrite mid-stream does not change routing; a new closure loads it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextClassifier
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"), (2L, "en", "a dog and a cat"),
      (3L, "fr", "le chat et le chien"), (4L, "fr", "un chien sur le tapis"))
      .toDF("doc_id", "lang", "text")
    val modelPath = java.nio.file.Files.createTempDirectory("nb_pin").toString + "/m"
    TextClassifier.save(spark, modelPath, TextClassifier.train(docs, "lang", "text"))
    val got = scala.collection.mutable.Map.empty[Long, String]
    def route(): (Long, String) => Unit = {
      val intake = StreamingAnalytics.nbRouteIntake(modelPath,
        sink = (df, _) => df.select("doc_id", "predicted").collect()
          .foreach(r => got.synchronized { got(r.getLong(0)) = r.getString(1) }))
      (id, text) => {
        val ckpt = java.nio.file.Files.createTempDirectory("nb_pin_ckpt").toString
        val mem = MemoryStream[(Long, String)]
        val q = mem.toDF().toDF("doc_id", "text").writeStream
          .option("checkpointLocation", ckpt).foreachBatch(intake).start()
        try { mem.addData(id -> text); q.processAllAvailable() } finally q.stop()
      }
    }
    // generation A: first batch loads + pins the fr/en model
    val gen1 = route()
    gen1(10L, "le chat dort")
    assert(got(10L) === "fr")
    // replace the artifact IN PLACE with a relabeled model (same texts,
    // disjoint label alphabet, so any reload would be visible)
    TextClassifier.save(spark, modelPath, TextClassifier.train(
      docs.withColumn("lang", concat(lit("x_"), col("lang"))), "lang", "text"))
    // the SAME closure keeps its pinned generation: old labels, no
    // FileNotFound from the overwritten files
    gen1(11L, "le chat dort")
    assert(got(11L) === "fr",
      "mid-stream artifact replacement must not change a pinned closure's routing")
    // a NEW closure (= query restart) picks up the new generation
    val gen2 = route()
    gen2(12L, "le chat dort")
    assert(got(12L) === "x_fr", "a fresh closure must load the current artifact")
  }

  test("ann search intake: streamed query batches match the batch prepared-index search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Artifacts, Similarity}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val quant = Similarity.trainCentroids(e, nlist = 8, trainIters = 2)
    val centPath = java.nio.file.Files.createTempDirectory("ann_cent").toString + "/c"
    Artifacts.saveCentroids(spark, centPath, quant._1, quant._2)
    val lists = Similarity.ivfPrepare(e, quant).persist()
    val ckpt = java.nio.file.Files.createTempDirectory("ann_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val queries = e.filter(col("vec_id") < 6)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.annSearchIntake(
        lists, centPath, k = 3, nprobe = 2,
        sink = (df, _) => df.select("query_id", "cand_id", "rank", "sim")
          .collect().foreach(r => got.synchronized { got += r.toSeq })))
      .start()
    try {
      mem.addData(queries.take(3).toSeq: _*)
      q.processAllAvailable()
      mem.addData(queries.drop(3).toSeq: _*)
      q.processAllAvailable()
    } finally { q.stop(); lists.unpersist() }
    val want = Similarity.ivfTopKPrepared(
        lists, e.filter(col("vec_id") < 6), k = 3, quant, nprobe = 2)
      .select("query_id", "cand_id", "rank", "sim")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(got.sortBy(_.mkString(",")).toSeq == want,
      "streamed ANN results differ from the batch prepared-index search")
  }

  test("pq search intake: streamed query batches match the batch PQ search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Artifacts, Similarity}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val quant = Similarity.trainCentroids(e, nlist = 8, trainIters = 2)
    val cb = Similarity.trainPqCodebooks(e, m = 8, ksub = 16, trainIters = 1)
    val tmp = java.nio.file.Files.createTempDirectory("pq_serve").toString
    Artifacts.saveCentroids(spark, tmp + "/cent", quant._1, quant._2)
    Artifacts.savePqCodebooks(spark, tmp + "/cb", cb)
    val lists = Similarity.pqGeomFrames(
      e.filter(col("vec_id") < 0), e, quant, cb, nprobe = 2).lists.persist()
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val queries = e.filter(col("vec_id") < 6)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pq_ckpt").toString)
      .foreachBatch(StreamingAnalytics.pqSearchIntake(
        lists, e, tmp + "/cent", tmp + "/cb", k = 3, nprobe = 2,
        sink = (df, _) => df.select("query_id", "cand_id", "rank", "sim")
          .collect().foreach(r => got.synchronized { got += r.toSeq })))
      .start()
    try {
      mem.addData(queries.take(3).toSeq: _*)
      q.processAllAvailable()
      mem.addData(queries.drop(3).toSeq: _*)
      q.processAllAvailable()
    } finally { q.stop(); lists.unpersist() }
    val probes = Similarity.pqProbes(
      e.filter(col("vec_id") < 6), quant, cb, nprobe = 2)
    val want = Similarity.pqTopKFromGeom(
        lists, probes, e.filter(col("vec_id") < 6), e, k = 3)
      .select("query_id", "cand_id", "rank", "sim")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(got.sortBy(_.mkString(",")).toSeq == want,
      "streamed PQ results differ from the batch prepared-index search")
  }

  test("pq index growth soak: mid-stream pqAppend serves at the next batch; codebook swap refused") {
    import graft.operators.{Artifacts, Similarity}
    // the PQ sibling of the compactIndex-mid-stream spec: pqServeIntake
    // re-lists the store path every micro-batch, so an index grown by
    // pqAppend (file-granular append) is served at the very next
    // micro-batch — while the MODEL (centroids + codebooks) stays
    // pinned at first load, so growing the index never silently
    // re-encodes under a different generation
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = e.filter(col("vec_id") >= 20)
    // the appended batch: exact copies of the queries under fresh ids —
    // cosine 1.0 guarantees they MUST rank once the index serves them
    val held = e.filter(col("vec_id") < 4)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val quant = Similarity.trainCentroids(base, nlist = 8, trainIters = 2)
    val cb = Similarity.trainPqCodebooks(base, m = 8, ksub = 16, trainIters = 1)
    val tmp = java.nio.file.Files.createTempDirectory("pq_soak").toString
    val listsPath = tmp + "/lists"
    Similarity.pqPrepare(base, quant, cb).write.parquet(listsPath)
    Artifacts.saveCentroids(spark, tmp + "/cent", quant._1, quant._2)
    Artifacts.savePqCodebooks(spark, tmp + "/cb", cb)
    val results = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
    val corpus = e.unionByName(held) // raw floats already in the store
    val intake = StreamingAnalytics.pqServeIntake(
      listsPath, corpus, tmp + "/cent", tmp + "/cb",
      k = 5, nprobe = 8,
      sink = (df, bid) => results(bid) = df.select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val queryBatch = e.filter(col("vec_id") < 4)
    intake(queryBatch, 0L)
    assert(results(0L).nonEmpty)
    assert(results(0L).forall(c => c._2 >= 20 && c._2 < 1000000L),
      s"batch 0 must see only base-index candidates: ${results(0L)}")
    // GROW the index mid-stream, through the round-tripped artifacts
    Similarity.pqAppend(listsPath, held,
      Artifacts.loadCentroids(spark, tmp + "/cent"),
      Artifacts.loadPqCodebooks(spark, tmp + "/cb"))
    intake(queryBatch, 1L)
    // the appended vectors are served at the next micro-batch, and the
    // grown index answers exactly like a batch search over full lists
    assert((0L until 4L).forall(q => results(1L).contains((q, q + 1000000L))),
      s"appended exact copies must surface after pqAppend: ${results(1L)}")
    val want = Similarity.pqTopKFromGeom(
        spark.read.parquet(listsPath),
        Similarity.pqProbes(queryBatch, quant, cb, nprobe = 8),
        queryBatch, corpus, k = 5)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(results(1L) == want,
      "post-append stream results must equal the batch search on the grown index")
    // model pin: an in-place codebook swap must NOT change what this
    // closure serves (same generation until the closure is rebuilt)
    Artifacts.savePqCodebooks(spark, tmp + "/cb",
      Similarity.trainPqCodebooks(e, m = 8, ksub = 16, trainIters = 2))
    intake(queryBatch, 2L)
    assert(results(2L) == results(1L),
      "pinned codebook generation must refuse the in-place swap")
  }

  test("pq search intake pins its model generation for the query lifetime") {
    import graft.operators.{Artifacts, Similarity}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val quant = Similarity.trainCentroids(e, nlist = 8, trainIters = 1)
    val cb = Similarity.trainPqCodebooks(e, m = 8, ksub = 16, trainIters = 1)
    val tmp = java.nio.file.Files.createTempDirectory("pq_pin").toString
    Artifacts.saveCentroids(spark, tmp + "/cent", quant._1, quant._2)
    Artifacts.savePqCodebooks(spark, tmp + "/cb", cb)
    val lists = Similarity.pqPrepare(e, quant, cb).persist()
    var lastN = -1L
    def intake() = StreamingAnalytics.pqSearchIntake(
      lists, e, tmp + "/cent", tmp + "/cb", k = 3, nprobe = 2,
      sink = (df, _) => lastN = df.count())
    val batch = e.filter(col("vec_id") < 4)
    val gen1 = intake()
    gen1(batch, 0L)
    assert(lastN > 0, "first batch must return results")
    // swap the centroid artifact IN PLACE for a generation whose cell
    // ids don't exist in the store — the operational hazard (quantizer
    // replaced without rebuilding lists) the pin exists to contain
    Artifacts.saveCentroids(spark, tmp + "/cent",
      quant._1.map(_ + 1000000L), quant._2)
    gen1(batch, 1L)
    assert(lastN > 0,
      "pinned closure must keep serving from its loaded generation")
    val gen2 = intake()
    gen2(batch, 0L)
    assert(lastN == 0,
      "a fresh closure must load the current (mismatched) artifact")
    lists.unpersist()
  }

  test("chunk intake: streamed chunks equal the batch operator bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ckpt = java.nio.file.Files.createTempDirectory("chunk_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.chunkIntake(
        window = 16, stride = 8,
        sink = (df, _) => df.collect()
          .foreach(r => got.synchronized { got += r.toSeq })))
      .start()
    try {
      mem.addData(docs.take(20).toSeq: _*)
      q.processAllAvailable()
      mem.addData(docs.drop(20).take(20).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Packing.chunkOverlap(
        spark.createDataset(docs.take(40).toSeq).toDF("doc_id", "text"),
        "doc_id", "text", window = 16, stride = 8)
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(got.sortBy(_.mkString(",")).toSeq == want,
      "streamed chunks differ from the batch operator")
  }

  test("uniform sample updates: standing sample equals batch capPerGroup exactly; replay is identity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sampling
    // 2 groups × 40 ids, k=5, interleaved across 3 batches with one
    // batch replayed — arrival order scrambled vs id order
    val rows = (0 until 40).map(i => ("a", i * 7L % 40 + 100)) ++
      (0 until 40).map(i => ("b", i * 11L % 40 + 500))
    val batches = rows.grouped(27).toList
    val latest = scala.collection.mutable.Map.empty[String, (Seq[Long], Long)]
    val mem = MemoryStream[(String, Long)]
    val q = StreamingAnalytics.uniformSampleUpdates(
        mem.toDF().toDF("source", "doc_id"), "doc_id", "source", k = 5)
      .writeStream
      .outputMode("update")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => latest.synchronized {
          latest(r.getString(0)) = (r.getSeq[Long](1), r.getLong(2))
        }))
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData(batches(1): _*); q.processAllAvailable() // replay
    } finally q.stop()
    val batch = Sampling.capPerGroup(rows.toDF("source", "doc_id"),
        "doc_id", "source", k = 5)
      .orderBy("source", "rank_in_group")
      .collect().groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSeq }
    assert(latest.view.mapValues(_._1).toMap == batch,
      s"streamed sample ${latest.toMap} != batch $batch")
    // n_seen counts observations (replay re-counts); the SAMPLE is
    // replay-invariant, which the equality above already proves
    assert(latest("a")._2 >= 40 && latest("b")._2 >= 40)
  }

  test("streaming corpus intake: dedup + quality gate match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the data pipeline processes a lot of the input rows and " +
      "it is that for the most part quite readable text of the corpus " +
      "with a sensible number of words in it and the usual mix"
      // > 20 tokens, high stopword ratio → quality ≥ 0.5
    val junk = "zzz"                       // < 20 tokens → low quality
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"intake_${System.nanoTime()}"
    val q = StreamingAnalytics.corpusIntake(
        mem.toDF().toDF("timestamp", "doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      // batch 1: only the good doc — its fingerprint enters dedup state
      mem.addData((ts(1), 1L, good))
      q.processAllAvailable()
      // batch 2: a CASE/WHITESPACE variant of the good doc (the batch
      // gate's normalized fingerprint must catch it — a raw content
      // hash would not) and a junk doc; cross-batch arrival makes the
      // keep-first choice deterministic
      mem.addData((ts(2), 2L, good.toUpperCase.replace(" ", "  ")),
        (ts(3), 3L, junk))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("doc_id", "quality_score", "predicted_lang", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      assert(rows.map(_._1).toSet == Set(1L),
        s"normalized dup (2) and junk (3) must be gated, got ${rows.toSeq}")
      // the streaming columns are the BATCH expressions verbatim — values
      // must equal a batch run on the same row
      val batch = graft.operators.TextAnalysis
        .withQuality(Seq((1L, good)).toDF("doc_id", "text"), "text")
        .withColumn("predicted_lang", graft.operators.TextAnalysis.langId($"text"))
        .select("doc_id", "quality_score", "predicted_lang", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("corpus intake gates identically under the RocksDB state store") {
    val rocks = StreamingSessionize.withRocksDbStateStore(spark)
    import rocks.implicits._
    implicit val sqlCtx = rocks.sqlContext
    val good = "the data pipeline processes a lot of the input rows and " +
      "it is that for the most part quite readable text of the corpus " +
      "with a sensible number of words in it and the usual mix"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"intake_rocks_${System.nanoTime()}"
    val q = StreamingAnalytics.corpusIntake(
        mem.toDF().toDF("timestamp", "doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), 1L, good))
      q.processAllAvailable()
      // the dedup state crossing micro-batches now lives in RocksDB
      mem.addData((ts(2), 2L, good.toUpperCase.replace(" ", "  ")), (ts(3), 3L, "zzz"))
      q.processAllAvailable()
      val kept = rocks.table(name).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L),
        s"RocksDB-backed dedup state must gate exactly like the default store: $kept")
    } finally q.stop()
  }

  test("streaming dedup keeps first per content hash within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"dedup_${System.nanoTime()}"
    val q = StreamingAnalytics.streamingDedup(
        mem.toDF().toDF("timestamp", "doc_id", "text"), "text")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), 1L, "same text"), (ts(2), 2L, "same text"), (ts(3), 3L, "other"))
      q.processAllAvailable()
      mem.addData((ts(4), 4L, "same text"))   // dup within horizon → dropped
      q.processAllAvailable()
      val ids = spark.table(name).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1)  // exactly one of the dups kept
      assert(ids.contains(3L))
      assert(!ids.contains(4L))
    } finally q.stop()
  }

  test("near-dedup intake: later-batch near-copy is dropped against the standing index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // long stopword-rich texts that clear the quality gate; DISTINCT
    // topics share only stopword runs (3-shingle Jaccard well under the
    // 0.5 threshold), while a near copy changes one content word and
    // stays well above it
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndidx").toString + "/index"
    val admitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, bid) =>
        admitted ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0))))
    val q = mem.toDF().toDF("timestamp", "doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      // batch 0: two distinct docs + a within-batch near-copy of doc 1
      mem.addData((ts(1), 1L, doc("spark")), (ts(2), 2L, doc("flink")),
        (ts(3), 3L, doc("spark").replace("rows", "records")))
      q.processAllAvailable()
      // batch 1: near-copy of doc 1 (CROSS-batch, via the index), an
      // exact copy of doc 2 (jaccard 1.0 case), and a fresh doc
      mem.addData((ts(4), 4L, doc("spark").replace("store", "lake")),
        (ts(5), 5L, doc("flink")), (ts(6), 6L, doc("duckdb")))
      q.processAllAvailable()
      // batch 2: near-copy of the FRESH doc admitted in batch 1 — the
      // index must have grown batch over batch
      mem.addData((ts(7), 7L, doc("duckdb").replace("tables", "frames")))
      q.processAllAvailable()
      val byBatch = admitted.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(byBatch(0L) == Set(1L, 2L), s"batch 0 admitted ${byBatch.get(0L)}")
      assert(byBatch.getOrElse(1L, Set.empty[Long]) == Set(6L),
        s"batch 1 must drop the cross-batch near copy (4) and exact copy (5): $byBatch")
      assert(byBatch.getOrElse(2L, Set.empty[Long]) == Set.empty[Long],
        s"batch 2's near copy of doc 6 must be dropped: $byBatch")
      // the standing index holds exactly the admitted docs' signatures
      val indexIds = spark.read.parquet(indexPath)
        .select("id").as[Long].collect().toSet
      assert(indexIds == Set(1L, 2L, 6L))

      // STREAMING ≡ BATCH: the same corpus through the batch operators
      // (ids increase with arrival, so keep-smallest-id == keep-first)
      val all = Seq(
        (1L, doc("spark")), (2L, doc("flink")),
        (3L, doc("spark").replace("rows", "records")),
        (4L, doc("spark").replace("store", "lake")),
        (5L, doc("flink")), (6L, doc("duckdb")),
        (7L, doc("duckdb").replace("tables", "frames"))).toDF("doc_id", "text")
      val enriched = graft.operators.TextAnalysis.cleanEnrich(all, "text")
        .filter($"quality_score" >= 0.5)
      val exactKeep = enriched.groupBy($"fingerprint")
        .agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      val exactDeduped = enriched.join(exactKeep, Seq("fingerprint", "doc_id"))
      val pairs = graft.operators.Dedup.minhashLsh(
        exactDeduped, "doc_id", "text", threshold = 0.5)
      val batchSurvivors = exactDeduped.join(
          pairs.select($"id_b".as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(batchSurvivors == indexIds,
        s"streaming admission ($indexIds) must equal the batch pipeline ($batchSurvivors)")
    } finally q.stop()
  }

  test("curate intake: replayed-stream manifest equals the batch manifest fate-for-fate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The planted contract under which streaming ≡ batch exactly:
    // arrival order respects doc_id order, and each near-dup cluster's
    // best-quality member either co-arrives with its cluster or arrives
    // first (the incumbent). Quality is tuned via stopword ratio —
    // swapping stopwords for content words lowers the score without
    // dropping 3-gram Jaccard below the 0.5 stage threshold.
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    def worse(topic: String, m: Map[String, String]): String =
      m.foldLeft(doc(topic)) { case (t, (a, b)) => t.replace(a, b) }
    val lowq = "short text low quality"
    // the probe must NOT share the template's topic-free 5-gram runs
    // ("runtime are the part of" etc.) with the whole corpus — break
    // them so only the planted doc 4 trips decontamination
    val probeText = worse("eval",
      Map("part" -> "evalpart", "tables while" -> "tablet whilst"))
    val b0 = Seq(
      1L -> doc("spark"),                       // kept
      2L -> doc("spark"),                       // exact_dup (in batch)
      3L -> lowq,                               // low_quality
      4L -> probeText.replace("rows", "cells"), // contaminated (vs probe)
      5L -> worse("hive", Map("and the" -> "minus some")), // near_dup (loses keep-best to 6)
      6L -> doc("hive"))                        // kept (cluster argmax, larger id)
    val b1 = Seq(
      7L -> doc("spark"),                       // exact_dup (cross-batch fp)
      8L -> lowq,                               // exact_dup (fp of a low-quality FIRST)
      9L -> worse("hive", Map("it is" -> "iron ore")), // near_dup (vs incumbent 6, via sig index)
      10L -> doc("presto"))                     // kept
    val b2 = Seq(
      11L -> worse("presto", Map("in the" -> "beside a")), // near_dup (incumbent 10, index grew)
      12L -> doc("iceberg"))                    // kept
    val probes = Seq(100L -> probeText).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    val gate = StreamingAnalytics.curateIntake(probes,
      s"$root/fp_index", s"$root/sig_index",
      sink = (m, _) => got ++= m.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      Seq(b0, b1, b2).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val want = graft.operators.Curate
      .manifest(Seq(b0, b1, b2).flatten.toDF("doc_id", "text"), probes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got.sortBy(_._1).toSeq == want,
      s"stream manifest ${got.sortBy(_._1)} != batch manifest $want")
    // the planted scenario exercises every fate
    assert(want.map(_._2).toSet ==
      Set("kept", "exact_dup", "low_quality", "contaminated", "near_dup"))
    // standing state holds exactly the incumbents' signatures and every
    // first-seen fingerprint
    assert(spark.read.parquet(s"$root/sig_index").select("id").as[Long]
      .collect().toSet == Set(1L, 6L, 10L, 12L))
    assert(spark.read.parquet(s"$root/fp_index").count() == 9) // 12 docs - 3 dup fingerprints
    graft.operators.CacheRegistry.releaseAll()
  }

  test("curate intake substring stage: spans priced vs the standing kept corpus, replay idempotent") {
    import spark.implicits._
    import graft.operators.Curate
    val shared = "the quick brown fox jumps over the lazy sleeping dog" // 10 toks
    val blockB = "every green turtle walks slowly across warm sand" // 8 toks
    val doc1 = "the spark system parses the input logs and computes " +
      "the output tables " + shared
    val doc10 = "the hive engine scans the remote files and emits " +
      "the final rows " + shared
    val doc11 = "the ocean water moves gently near the shore today " + blockB +
      " while the birds watch from above " + blockB
    val doc12 = "the mountain path climbs steeply toward the snowy peak where " +
      "many hikers rest beside the ancient stone marker every spring season"
    val b0 = Seq(1L -> doc1, 2L -> doc1, 3L -> "short low")
    val b1 = Seq(10L -> doc10, 11L -> doc11, 12L -> doc12)
    val probes = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-curate-ss").toString
    type Row4 = (Long, String, Option[Long], Option[Long])
    val got = scala.collection.mutable.Map.empty[Long, Seq[Row4]]
    def mkGate(r: String, sunk: scala.collection.mutable.Map[Long, Seq[Row4]]) =
      StreamingAnalytics.curateIntake(probes, s"$r/fp", s"$r/sig",
        sink = (m, bid) => sunk.synchronized {
          sunk(bid) = m.collect().map(x => (x.getLong(0), x.getString(1),
            if (x.isNullAt(3)) None else Some(x.getLong(3)),
            if (x.isNullAt(4)) None else Some(x.getLong(4)))).sortBy(_._1).toSeq
        },
        substringIndexPath = s"$r/ss", spanTokens = 8)
    val gate = mkGate(root, got)
    gate(b0.toDF("doc_id", "text"), 0L)
    gate(b1.toDF("doc_id", "text"), 1L)
    // planted expectations: doc 10's shared 10-token tail is a
    // CROSS-BATCH span dup vs standing doc 1 (too short a share for
    // near_dup at jaccard 0.5 — the span stage catches what the doc
    // stage keeps); doc 11 self-repeats an 8-token block; non-kept
    // docs price NULL
    assert(got(0L) == Seq((1L, "kept", Some(22L), Some(0L)),
      (2L, "exact_dup", None, None), (3L, "low_quality", None, None)),
      s"batch 0: ${got(0L)}")
    assert(got(1L) == Seq(
      (10L, "kept", Some(22L), Some(10L)),
      (11L, "kept", Some(31L), Some(16L)),
      (12L, "kept", Some(21L), Some(0L))), s"batch 1: ${got(1L)}")
    // doc-level fates equal the batch manifest over the cumulative corpus
    val all = (b0 ++ b1).toDF("doc_id", "text")
    val wantStrip = Curate.manifestWithStrip(all, probes, spanTokens = 8)
      .collect().map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getLong(4)))).sortBy(_._1).toSeq
    assert((got(0L) ++ got(1L)).map(t => (t._1, t._2)).sorted ==
      wantStrip.map(t => (t._1, t._2)).sorted)
    // where the contracts coincide (batch-1 docs: their dup spans only
    // look BACKWARD), the stream prices exactly what the batch operator
    // prices on the accumulated corpus...
    assert(got(1L) == wantStrip.filter(t => t._1 >= 10L))
    // ...and the one divergence is the documented incremental contract:
    // the STANDING copy of a span whose duplicate arrived later (doc
    // 1's shared tail) is the full recompute's finding, not the stream's
    assert(wantStrip.find(_._1 == 1L).get._4.contains(10L))
    assert(got(0L).find(_._1 == 1L).get._4.contains(0L))
    // the whole corpus as ONE batch: full equality with manifestWithStrip
    val root2 = java.nio.file.Files.createTempDirectory("graft-curate-ss1").toString
    val got2 = scala.collection.mutable.Map.empty[Long, Seq[Row4]]
    mkGate(root2, got2)(all, 0L)
    assert(got2(0L) == wantStrip, s"one-batch ${got2(0L)} vs $wantStrip")
    // at-least-once replay of batch 1: same manifest re-delivered, the
    // count index's own-partition exclusion stops self-flagging, and the
    // dynamic partition overwrite leaves the index exactly as run-once
    def idx(): Seq[(String, Long, String)] = spark.read.parquet(s"$root/ss")
      .select(org.apache.spark.sql.functions.hex(org.apache.spark.sql.functions.col("m")),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("batch_id").cast("string"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2)))
      .sorted.toSeq
    val before = idx()
    val g1 = got(1L)
    gate(b1.toDF("doc_id", "text"), 1L)
    assert(got(1L) == g1, s"replay must re-deliver identically: ${got(1L)}")
    assert(idx() == before, "replayed append must be idempotent")
    graft.operators.CacheRegistry.releaseAll()
  }

  test("streaming sequenceCount equals the batch fold, out-of-order arrivals included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"seqcount_${System.nanoTime()}"
    val q = StreamingAnalytics.sequenceCountUpdates(
        mem.toDF().toDF("timestamp", "user_id", "event_type"),
        steps = Seq("view", "click"), lateness = "10 minutes")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    val events = scala.collection.mutable.ArrayBuffer[(Timestamp, Long, String)]()
    def add(rows: (Timestamp, Long, String)*): Unit = {
      events ++= rows; mem.addData(rows: _*); q.processAllAvailable()
    }
    try {
      // batch 1: user 1 completes one chain; user 2 opens only
      add((ts(1), 1L, "view"), (ts(2), 1L, "click"), (ts(3), 2L, "view"))
      // batch 2: OUT OF ORDER inside the horizon — a view at ts(4)
      // arrives after a click at ts(5) was announced; the buffered fold
      // must still chain view(4) -> click(5)
      add((ts(5), 1L, "click"), (ts(4), 1L, "view"), (ts(6), 2L, "click"))
      // advance the watermark far past every event, then once more so
      // the event-time timeout drains the remaining buffers
      add((ts(50), 3L, "view"))
      add((ts(55), 3L, "view"))
      val got = spark.table(name)
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_matches").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch reference over every event whose time the watermark passed
      val wmUs = (ts(55).getTime - 10 * 60 * 1000) * 1000L
      val folded = events.filter(_._1.getTime * 1000L <= wmUs)
        .map { case (t, u, e) => (u, e, t.getTime * 1000L) }.toSeq
      val batch = graft.operators.SequenceCount.sequenceCount(
          folded.toDF("user_id", "event_type", "t_us"),
          "user_id", "event_type", "t_us", Seq("view", "click"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.view.filterKeys(_ != 3L).toMap ==
        batch.view.filterKeys(_ != 3L).toMap,
        s"streaming $got vs batch $batch")
      assert(got(1L) == 2L, "both chains counted, including the out-of-order one")
      assert(got(2L) == 1L)
    } finally q.stop()
  }

  test("a replayed micro-batch overwrites its own partition: no double-admission") {
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndretry").toString + "/index"
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, bid) =>
        sunk ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0))))
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 0L)
    val batch1 = Seq((2L, doc("flink"))).toDF("doc_id", "text")
    gate(batch1, 1L)
    val before = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    // foreachBatch's at-least-once: the SAME batch id replays after a
    // failure — dynamic partition overwrite must leave the index exactly
    // as if it ran once
    gate(batch1, 1L)
    val after = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(after == before && before == Set((1L, 0L), (2L, 1L)),
      s"replay must be idempotent: before=$before after=$after")
    // the replay crashed AFTER the index append, so its own signatures
    // were already in the index — the doc must NOT self-match at
    // jaccard 1.0 and silently vanish from the sink (at-least-once
    // delivery, not at-most-once): the replayed run re-emits doc 2
    assert(sunk.count(_ == (1L, 2L)) == 2,
      s"replayed batch must re-deliver its survivors to the sink: $sunk")
    // and the replayed doc was NOT flagged as a dup of itself mid-retry:
    // a third batch near-copying doc 2 still dedupes against ONE copy
    gate(Seq((3L, doc("flink").replace("rows", "records"))).toDF("doc_id", "text"), 2L)
    val ids = spark.read.parquet(indexPath).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), "near copy of the replayed doc must be dropped")

    // the post-compaction copy: a compaction folded a batch's partition
    // into batch_id=-1 before its replay (the batch_id partition filter
    // can no longer see it) — the id-equality guard must still stop the
    // self-match, and the replayed docs still reach the sink
    val batch3 = Seq((9L, doc("trino"))).toDF("doc_id", "text")
    gate(batch3, 3L)
    StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 1)
    gate(batch3, 3L)
    assert(sunk.count(_ == (3L, 9L)) == 2,
      s"post-compaction replay must re-deliver doc 9: $sunk")
  }

  test("same-id re-delivery in a later batch is a genuine duplicate, not a replay artifact") {
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndredeliver").toString + "/index"
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, bid) =>
        sunk ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0))))
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 0L)
    // the source re-delivers doc 1 (same id, same text) in a DIFFERENT
    // batch — not a Spark retry of batch 0. Its index copy sits in a
    // LIVE partition (batch_id = 0), so the id-equal match must NOT be
    // excused as a replay self-match: the incoming copy is a duplicate
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 1L)
    assert(sunk.toSet == Set((0L, 1L)),
      s"re-delivered doc must be deduped, not re-admitted: $sunk")
    val idx = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(idx == Set((1L, 0L)),
      s"index must keep exactly the first admission: $idx")
  }

  test("streaming cluster closure: incremental labels ≡ batch closure across micro-batches") {
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val root = java.nio.file.Files
      .createTempDirectory("graft-ndlabels").toString
    val indexPath = s"$root/index"
    val labelsPath = s"$root/labels"
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      labelsPath = labelsPath)
    def labelMap(): Map[Long, Long] =
      StreamingAnalytics.currentComponents(spark, labelsPath)
        .as[(Long, Long)].collect().toMap
    def batchCc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap

    // batch 0: 2 near-dups 1 (within-batch pair), 3 is distinct
    gate(Seq(
      (1L, doc("spark")),
      (2L, doc("spark").replace("rows", "records")),
      (3L, doc("flink"))).toDF("doc_id", "text"), 0L)
    assert(labelMap() == batchCc(Seq((1L, 2L))),
      s"after batch 0: ${labelMap()}")
    // batch 1: 4 near-dups the INDEXED 1 (cross-index pair), 5 distinct
    gate(Seq(
      (4L, doc("spark").replace("tables", "frames")),
      (5L, doc("trino"))).toDF("doc_id", "text"), 1L)
    assert(labelMap() == batchCc(Seq((1L, 2L), (1L, 4L))),
      s"after batch 1: ${labelMap()}")
    // batch 2: 6 joins 3's cluster, 7 joins 5's — two clusters grow at once
    gate(Seq(
      (6L, doc("flink").replace("rows", "records")),
      (7L, doc("trino").replace("week", "month"))).toDF("doc_id", "text"), 2L)
    val pairsSoFar = Seq((1L, 2L), (1L, 4L), (3L, 6L), (5L, 7L))
    assert(labelMap() == batchCc(pairsSoFar),
      s"after batch 2: ${labelMap()}")
    assert(labelMap() == Map(2L -> 1L, 4L -> 1L, 6L -> 3L, 7L -> 5L,
      1L -> 1L, 3L -> 3L, 5L -> 5L))

    // at-least-once: replaying batch 2 must leave the store unchanged
    gate(Seq(
      (6L, doc("flink").replace("rows", "records")),
      (7L, doc("trino").replace("week", "month"))).toDF("doc_id", "text"), 2L)
    assert(labelMap() == batchCc(pairsSoFar),
      s"replayed batch must be idempotent: ${labelMap()}")

    // compaction folds deltas; answers unchanged, and later increments
    // (a component merge) still land on the folded snapshot
    StreamingAnalytics.compactLabels(spark, labelsPath, numFiles = 1)
    assert(labelMap() == batchCc(pairsSoFar),
      s"compaction changed the assignment: ${labelMap()}")
    StreamingAnalytics.componentsApply(spark, labelsPath,
      Seq((2L, 6L)).toDF("id_a", "id_b"), 3L)
    assert(labelMap() == batchCc(pairsSoFar :+ (2L, 6L)),
      s"post-compaction merge: ${labelMap()}")
    assert(labelMap().values.toSet.intersect(Set(3L)).isEmpty &&
      labelMap()(3L) == 1L && labelMap()(6L) == 1L,
      "merging 2~6 must fold flink's cluster into component 1")
  }

  test("re-delivery after compaction is re-admitted once; the next re-delivery dedups") {
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndcompactredeliver").toString + "/index"
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, bid) =>
        sunk ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0))))
    // admit, then compact: doc 1's only index copy now sits in the
    // compacted partition (batch_id = -1)
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 0L)
    StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 1)
    // re-delivery in a later batch: indistinguishable from a
    // post-compaction replay by construction — re-admitted ONCE; its
    // new copy lands in a LIVE partition (batch_id = 1)
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 1L)
    assert(sunk.toSet == Set((0L, 1L), (1L, 1L)),
      s"post-compaction re-delivery must be re-admitted once: $sunk")
    // THIRD delivery: doc 1 now has BOTH a compacted copy and a live
    // re-admitted copy. The single (1,1) match row must not be excused
    // on compacted membership alone — the live copy makes it a genuine
    // duplicate, and the index must not accumulate another row
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 2L)
    assert(sunk.toSet == Set((0L, 1L), (1L, 1L)),
      s"third same-id delivery must dedup against the live copy: $sunk")
    val idx = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(idx == Set((1L, -1L), (1L, 1L)),
      s"index must hold the compacted copy plus one re-admission: $idx")
    // a FOURTH delivery after another compaction folds the live copy:
    // both copies now compacted → again indistinguishable from replay,
    // re-admitted once more — the documented, bounded behavior
    StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 1)
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 3L)
    assert(sunk.toSet == Set((0L, 1L), (1L, 1L), (3L, 1L)),
      s"re-delivery after every copy is compacted re-admits once: $sunk")
  }

  test("soak: alternating compaction and re-delivery stays bounded across rounds") {
    // The round-9 adversarial sequence — admit → compact → re-deliver →
    // compact → re-deliver — extended to three full rounds. The invariant
    // under ANY number of compactions: each compaction makes the next
    // same-id re-delivery indistinguishable from a replay (re-admitted
    // ONCE, documented), every further delivery before the next compaction
    // dedups against the live copy, and compaction's distinct() collapses
    // the byte-identical re-admission — so the index never exceeds one
    // live + one compacted row per doc, and emissions are exactly one per
    // (compaction, first-re-delivery) pair. Unbounded growth here is the
    // re-delivery hole the round-10 replayOnly exclusion closed.
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndsoak").toString + "/index"
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, bid) =>
        sunk ++= df.select("doc_id").collect().map(r => (bid, r.getLong(0))))
    val payload = Seq((1L, doc("spark"))).toDF("doc_id", "text")
    gate(payload, 0L)                       // admit
    var bid = 1L
    val expected = scala.collection.mutable.Set((0L, 1L))
    (1 to 3).foreach { round =>
      StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 1)
      val idxAfterCompact = spark.read.parquet(indexPath)
        .select("id", "batch_id").as[(Long, Long)].collect().toSeq
      assert(idxAfterCompact == Seq((1L, -1L)),
        s"round $round: compaction must leave exactly the one folded row: $idxAfterCompact")
      gate(payload, bid)                    // re-delivery: re-admitted once
      expected += ((bid, 1L))
      assert(sunk.toSet == expected.toSet,
        s"round $round: first post-compaction re-delivery re-admits once: $sunk")
      bid += 1
      gate(payload, bid)                    // re-delivery: dedups vs live copy
      assert(sunk.toSet == expected.toSet,
        s"round $round: second re-delivery must dedup against the live copy: $sunk")
      bid += 1
      val idx = spark.read.parquet(indexPath)
        .select("id", "batch_id").as[(Long, Long)].collect().toSet
      assert(idx == Set((1L, -1L), (1L, bid - 2)),
        s"round $round: index bounded at compacted + one live re-admission: $idx")
    }
  }

  test("compactIndex(belowBatchId) leaves the in-flight batch's partition out of the fold") {
    import spark.implicits._
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndbound").toString + "/index"
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5)
    gate(Seq((1L, doc("spark"))).toDF("doc_id", "text"), 0L)
    gate(Seq((2L, doc("flink"))).toDF("doc_id", "text"), 1L)
    // batch 2's first attempt appended its partition, then crashed; the
    // start-of-retry compaction runs with belowBatchId = 2 — committed
    // batches fold, batch 2's own partition must survive untouched so
    // the retry's dynamic-partition overwrite stays idempotent
    val batch2 = Seq((3L, doc("duckdb"))).toDF("doc_id", "text")
    gate(batch2, 2L)
    StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 1,
      belowBatchId = 2L)
    val mid = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(mid == Set((1L, -1L), (2L, -1L), (3L, 2L)),
      s"fold must stop below batch 2: $mid")
    gate(batch2, 2L)   // the retry
    val after = spark.read.parquet(indexPath)
      .select("id", "batch_id").as[(Long, Long)].collect().toSet
    assert(after == mid, s"retry after bounded compaction must be a no-op: $after")
  }

  test("index compaction collapses batch partitions and gating continues unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(topic: String): String =
      s"the $topic system and the $topic runtime are the part of the " +
        s"$topic stack which reads the $topic rows and the $topic tables " +
        s"while it is the $topic job that keeps the $topic data in the " +
        s"$topic store for the $topic users of the $topic week"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-ndcompact").toString + "/index"
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val gate = StreamingAnalytics.nearDedupIntake(indexPath, threshold = 0.5,
      sink = (df, _) => admitted ++= df.select("doc_id").collect().map(_.getLong(0)))
    val q = mem.toDF().toDF("timestamp", "doc_id", "text")
      .writeStream.foreachBatch(gate).start()
    try {
      mem.addData((ts(1), 1L, doc("spark"))); q.processAllAvailable()
      mem.addData((ts(2), 2L, doc("flink"))); q.processAllAvailable()
      mem.addData((ts(3), 3L, doc("duckdb"))); q.processAllAvailable()
      def partitions() = new java.io.File(indexPath).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).toSet
      assert(partitions() == Set("batch_id=0", "batch_id=1", "batch_id=2"))

      StreamingAnalytics.compactIndex(spark, indexPath, numFiles = 2)
      assert(partitions() == Set("batch_id=-1"),
        "compaction must collapse the per-batch generations")
      assert(spark.read.parquet(indexPath).select("id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L), "compaction must preserve the index contents")
      assert(!new java.io.File(indexPath + "._compact").exists())

      // the gate keeps working against the compacted generation: a near
      // copy of a pre-compaction doc is dropped, a fresh doc admitted
      // (and lands in a NEW batch partition beside the compacted one)
      mem.addData((ts(4), 4L, doc("spark").replace("store", "lake")),
        (ts(5), 5L, doc("trino")))
      q.processAllAvailable()
      assert(admitted.toSet == Set(1L, 2L, 3L, 5L), s"got $admitted")
      assert(partitions() == Set("batch_id=-1", "batch_id=3"))
    } finally q.stop()
  }

  test("streaming funnel equals the batch cascade, out-of-order arrivals included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"funnel_${System.nanoTime()}"
    val steps = Seq("view", "cart", "purchase")
    val windowUs = 30L * 60 * 1000000
    val q = StreamingAnalytics.funnelUpdates(
        mem.toDF().toDF("timestamp", "user_id", "event_type"),
        steps, windowUs, lateness = "10 minutes")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    val events = scala.collection.mutable.ArrayBuffer[(Timestamp, Long, String)]()
    def add(rows: (Timestamp, Long, String)*): Unit = {
      events ++= rows; mem.addData(rows: _*); q.processAllAvailable()
    }
    try {
      // user 1 completes in order; user 2's cart ARRIVES before its view
      // (out of order inside the horizon); user 3 views only; user 4's
      // purchase falls outside the 30-min window of its view
      add((ts(1), 1L, "view"), (ts(2), 1L, "cart"), (ts(3), 2L, "cart"))
      add((ts(2), 2L, "view"), (ts(4), 1L, "purchase"), (ts(5), 3L, "view"))
      add((ts(6), 4L, "view"), (ts(45), 4L, "purchase"), (ts(8), 4L, "cart"))
      // advance the watermark past everything, then drain timeouts
      add((ts(57), 9L, "view"))
      add((ts(59), 9L, "view"))
      val got = spark.table(name)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("funnel_level").as("lvl"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val wmUs = (ts(59).getTime - 10 * 60 * 1000) * 1000L
      val folded = events.filter(_._1.getTime * 1000L <= wmUs)
        .map { case (t, u, e) => (u, e, t.getTime * 1000L) }.toSeq
      val batch = graft.operators.Funnel.funnel(
          folded.toDF("user_id", "event_type", "t_us"),
          "user_id", "event_type", "t_us", steps, windowUs)
        .select("user_id", "funnel_level")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.view.filterKeys(_ != 9L).toMap ==
        batch.view.filterKeys(_ != 9L).toMap, s"streaming $got vs batch $batch")
      assert(got(1L) == 3 && got(2L) == 2 && got(3L) == 1 && got(4L) == 2)
      // the chosen timestamps match the batch cascade's minima
      val t4 = spark.table(name).filter($"user_id" === 4L && $"funnel_level" === 2)
        .select("t1_us", "t2_us", "t3_us").collect().last
      assert(t4.getLong(0) == ts(6).getTime * 1000L)
      assert(t4.getLong(1) == ts(8).getTime * 1000L)
      assert(t4.isNullAt(2), "out-of-window purchase must not fill t3")
    } finally q.stop()
  }

  test("streaming retention per-key flags roll up to the batch cohort table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val name = s"retention_${System.nanoTime()}"
    // period = minutes since epoch: non-decreasing in event time
    val q = StreamingAnalytics.retentionUpdates(
        mem.toDF().toDF("timestamp", "user_id")
          .withColumn("period", org.apache.spark.sql.functions
            .expr("cast(timestamp as long) div 60")),
        offsets = Seq(1, 3), lateness = "10 minutes")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    val events = scala.collection.mutable.ArrayBuffer[(Timestamp, Long)]()
    def add(rows: (Timestamp, Long)*): Unit = {
      events ++= rows; mem.addData(rows: _*); q.processAllAvailable()
    }
    try {
      // user 1: returns at +1 and +3; user 2: returns at +2 only (misses
      // both offsets); user 3: cohort event only; user 2's +2 return
      // arrives before its cohort event (out of order in the horizon)
      add((ts(1), 1L), (ts(2), 1L), (ts(4), 2L))
      add((ts(2), 2L), (ts(4), 1L), (ts(5), 3L))
      add((ts(57), 9L))
      add((ts(59), 9L))
      val latest = spark.table(name)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.min("cohort_period").as("cohort_period"),
          org.apache.spark.sql.functions.max("retained_p1").as("retained_p1"),
          org.apache.spark.sql.functions.max("retained_p3").as("retained_p3"))
        .filter($"user_id" =!= 9L)
      val gotCohorts = latest.groupBy("cohort_period")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_keys"),
          org.apache.spark.sql.functions.sum("retained_p1").as("retained_p1"),
          org.apache.spark.sql.functions.sum("retained_p3").as("retained_p3"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val wmUs = (ts(59).getTime - 10 * 60 * 1000) * 1000L
      val folded = events.filter(_._1.getTime * 1000L <= wmUs)
        .map { case (t, u) => (u, t.getTime / 60000L) }.toSeq
      val batch = graft.operators.Retention.cohorts(
          folded.toDF("user_id", "period"), "user_id", "period", Seq(1, 3))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(gotCohorts == batch, s"streaming $gotCohorts vs batch $batch")
    } finally q.stop()
  }

  test("hybrid serve intake: streamed fusion equals the batch legs bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Relevance, Similarity}
    val corpus = Seq(
      (0L, "apple banana cherry date elder fig"),
      (1L, "apple banana cherry date elder grape"),
      (2L, "umbrella violet walnut xylophone yarn zebra"),
      (3L, "apple banana cherry kiwi lemon mango")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)), (3L, Array(0.8f, 0.2f, 0.0f))
    ).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("hybrid_serve").toString
    Relevance.saveLexIndex(s"$root/lex",
      Relevance.lexicalIndex(corpus, "doc_id", "text", maxDocFreq = 1000))
    emb.write.parquet(s"$root/emb")
    val queries = Seq(
      (100L, "apple banana cherry nectarine olive", Array(0.95f, 0.05f, 0.0f)),
      (101L, "umbrella violet walnut quartz ruby", Array(0.0f, 0.9f, 0.1f)))
    val ckpt = java.nio.file.Files.createTempDirectory("hybrid_ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Double, Long)]
    val mem = MemoryStream[(Long, String, Array[Float])]
    val q = mem.toDF().toDF("query_id", "text", "embedding")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.hybridServeIntake(
        s"$root/lex", s"$root/emb", legK = 3, k = 4,
        sink = (df, _) => df.collect().foreach(r => got.synchronized {
          got += ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getLong(5))) })))
      .start()
    try {
      mem.addData(queries.take(1): _*); q.processAllAvailable()
      mem.addData(queries.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    val qDf = queries.toDF("query_id", "text", "embedding")
    val want = Relevance.rrfFuse(Seq(
        "lex" -> Relevance.lexicalJaccardTopK(qDf.select("query_id", "text"),
          Relevance.loadLexIndex(spark, s"$root/lex"), legK = 3),
        "vec" -> Similarity.bruteForceTopK(qDf.select("query_id", "embedding"),
            emb, 3, qId = "query_id", qVec = "embedding")
          .select(col("query_id"), col("cand_id"), col("rank"))),
      k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet
    assert(got.toSet == want, s"streamed ${got.toSet} vs batch $want")
    assert(got.map(_._1).toSet == Set(100L, 101L))
  }

  test("substring intake: per-batch spans equal the batch operator over the cumulative corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val blockA = (1 to 25).map(i => s"a$i").mkString(" ")
    val blockB = (1 to 22).map(i => s"b$i").mkString(" ")
    val uniq = (n: Int, p: String) => (1 to n).map(i => s"$p$i").mkString(" ")
    val batches = Seq(
      Seq(0L -> blockA, 1L -> uniq(30, "u")),
      // 10 repeats standing blockA shifted; 11 self-repeats blockB;
      // 12 is novel (and becomes standing for batch 3)
      Seq(10L -> s"${uniq(6, "p")} $blockA",
          11L -> s"$blockB ${uniq(10, "m")} $blockB",
          12L -> uniq(28, "n")),
      Seq(20L -> (uniq(28, "n") + " " + uniq(5, "z"))) // copies doc 12
    )
    val idxPath = java.nio.file.Files.createTempDirectory("substr_idx").toString + "/idx"
    val ckpt = java.nio.file.Files.createTempDirectory("substr_ckpt").toString
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Long)]]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAnalytics.substringIntake(
        idxPath,
        sink = (df, bid) => got.synchronized {
          got(bid) = df.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        }))
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // differential: batch k's spans == dupSpans(batches 0..k) ∩ batch k ids
    batches.zipWithIndex.foreach { case (b, k) =>
      val cumulative = batches.take(k + 1).flatten.toDF("doc_id", "text")
      val ids = b.map(_._1).toSet
      val want = Dedup.dupSpans(cumulative, "doc_id", "text", spanTokens = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(t => ids(t._1)).toSet
      assert(got(k.toLong) == want, s"batch $k: ${got(k.toLong)} vs $want")
    }
    // the planted expectations themselves, for readability of intent
    assert(got(0L) == Set.empty)
    assert(got(1L) == Set((10L, 6L, 31L), (11L, 0L, 22L), (11L, 32L, 54L)))
    assert(got(2L) == Set((20L, 0L, 28L)))
  }
  test("vector ingest intake: ingest-then-serve equals rebuild-then-serve, replay and compaction included") {
    import spark.implicits._
    import graft.operators.{Artifacts, Similarity}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val b = (0 until 3).map(i => e.filter(col("vec_id") % 3 === i))
    val quant = Similarity.trainCentroids(b(0), nlist = 8, trainIters = 3)
    val root = java.nio.file.Files.createTempDirectory("graft-vecing").toString
    Artifacts.saveCentroids(spark, s"$root/cents", quant._1, quant._2)
    val queries = e.filter(col("vec_id") < 6)
    val drifts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Similarity.IvfDriftReport)]
    val gate = StreamingAnalytics.vectorIngestIntake(s"$root/ivf", s"$root/cents",
      driftEvery = 2, driftSink = (r, bid) => drifts += ((bid, r)))
    b.zipWithIndex.foreach { case (df, i) => gate(df, i.toLong) }
    def serve(lists: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      Similarity.ivfTopKPrepared(lists, queries, k = 3, quant, nprobe = 2)
        .select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.toSeq)
        .sortBy(r => (r(0).asInstanceOf[Long], r(3).asInstanceOf[Long])).toSeq
    val rebuilt = Similarity.ivfPrepare(e, quant)
    val servedIngest = serve(spark.read.parquet(s"$root/ivf"))
    assert(servedIngest.nonEmpty &&
      servedIngest == serve(rebuilt),
      "ingested store must serve bit-identically to a full rebuild")
    // at-least-once replay: dynamic overwrite of the batch's own
    // partition leaves the store exactly as run-once
    def store(): Seq[(Long, Long, String)] = spark.read.parquet(s"$root/ivf")
      .select(col("cand_id"), col("cent_id"), col("batch_id").cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val before = store()
    gate(b(1), 1L)
    assert(store() == before,
      "replayed ingest batch must overwrite its own partition only")
    // compaction folds committed partitions into batch_id = -1 via the
    // rename-swap; serving is unchanged
    StreamingAnalytics.compactVectorIndex(spark, s"$root/ivf",
      numFiles = 2, belowBatchId = 2L)
    assert(spark.read.parquet(s"$root/ivf").select(col("batch_id").cast("long"))
      .distinct().as[Long].collect().toSet == Set(-1L, 2L))
    assert(serve(spark.read.parquet(s"$root/ivf")) == servedIngest,
      "compaction must not change what the store serves")
    // drift cadence: batch 0 has no standing index yet (skipped), batch
    // 2 probes quiet on the in-distribution stream...
    assert(drifts.map(_._1) == Seq(2L), s"drift probes at ${drifts.map(_._1)}")
    assert(!drifts.head._2.drifted, s"in-distribution probe: ${drifts.head._2}")
    // ...and fires on a genuinely shifted batch (mass far off every
    // trained centroid: the assignment-quality symptom)
    val dim = e.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val shifted = (100000 until 100064).map(i =>
        (i.toLong, Seq.tabulate(dim)(d => if (d == 0) 10f else 0.01f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    gate(shifted, 4L)
    assert(drifts.map(_._1) == Seq(2L, 4L) && drifts.last._2.drifted,
      s"shifted batch must trip the drift gate: ${drifts.last._2}")
    // PQ twin: same partitioned-append discipline under the shared
    // coarse quantizer, serve equality at the pinned geometry
    val books = Similarity.trainPqCodebooks(b(0), m = 4, ksub = 16)
    Artifacts.savePqCodebooks(spark, s"$root/books", books)
    val pqGate = StreamingAnalytics.vectorIngestIntake(s"$root/pq",
      s"$root/cents", codebooksPath = s"$root/books")
    b.zipWithIndex.foreach { case (df, i) => pqGate(df, i.toLong) }
    def pqServe(lists: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      Similarity.pqTopKFromGeom(lists,
          Similarity.pqProbes(queries, quant, books, nprobe = 2),
          queries, e, k = 3, rerank = 12)
        .select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.toSeq)
        .sortBy(r => (r(0).asInstanceOf[Long], r(3).asInstanceOf[Long])).toSeq
    val pqIngest = pqServe(spark.read.parquet(s"$root/pq"))
    assert(pqIngest.nonEmpty &&
      pqIngest == pqServe(Similarity.pqPrepare(e, quant, books)),
      "PQ ingested store must serve bit-identically to a full rebuild")
    // composition: the SERVING intake reads the ingest-built partitioned
    // store directly (batch_id partition column and all) and answers
    // exactly like the batch geometry search over the same store
    val served = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
    val serveGate = StreamingAnalytics.pqServeIntake(s"$root/pq", e,
      s"$root/cents", s"$root/books", k = 3, nprobe = 2, rerank = 12,
      sink = (df, bid) => served(bid) = df.select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    serveGate(queries, 0L)
    assert(served(0L) ==
      pqIngest.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).sorted,
      "pqServeIntake over the ingest-built store must match the batch search")
    // PQ mode with drift probing but no float sibling must fail loudly
    val badGate = StreamingAnalytics.vectorIngestIntake(s"$root/pq2",
      s"$root/cents", codebooksPath = s"$root/books", driftEvery = 1)
    intercept[IllegalArgumentException] { badGate(b(0), 0L) }
    // ...and probes fine against the float sibling this stream maintains
    val pqDrifts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Similarity.IvfDriftReport)]
    val sibGate = StreamingAnalytics.vectorIngestIntake(s"$root/pq3",
      s"$root/cents", codebooksPath = s"$root/books", driftEvery = 1,
      driftListsPath = s"$root/ivf",
      driftSink = (r, bid) => pqDrifts += ((bid, r)))
    sibGate(b(0), 9L)
    assert(pqDrifts.map(_._1) == Seq(9L) && !pqDrifts.head._2.drifted)
  }

  test("fingerprintDedupIntake: image near-dups within and across batches, refusal pass-through, replay-idempotent") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal}
    implicit val sqlCtx = spark.sqlContext
    // planted BMPs, the MultimodalSpec scheme: near duplicates perturb
    // only grid cell (0,0) -> hamming <= 1; distinct seeds decorrelate
    def img(seed: Long, near: Boolean = false): Array[Byte] =
      Multimodal.ContainerFixtures.bmp(27, 21, (x, y) => {
        val g = (seed * 37 + x * 11 + y * 23) % 251
        (if (near && x * 9 / 27 == 0 && y * 8 / 21 == 0) (g + 128) % 251
         else g).toInt
      })
    val refusal = "not an image".getBytes
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-fpidx").toString + "/index"
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val gate = StreamingAnalytics.fingerprintDedupIntake(indexPath,
      graft.functions.ImageExpressions.dhashImage, bucketBits = 16,
      sink = (df, bid) => emitted ++= df.select("doc_id", "sim")
        .collect().map(r => (bid, r.getLong(0), r.isNullAt(1))))
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = mem.toDF().toDF("doc_id", "media")
      .writeStream.foreachBatch(gate).start()
    try {
      // batch 0: two distinct images + a within-batch near-dup of doc 1
      mem.addData((1L, img(1)), (2L, img(2)), (3L, img(1, near = true)))
      q.processAllAvailable()
      // batch 1: cross-batch near-dup of doc 1, exact re-delivery of
      // doc 2 under a new id, a refusal, and a fresh image
      mem.addData((4L, img(1, near = true)), (5L, img(2)),
        (6L, refusal), (7L, img(7)))
      q.processAllAvailable()
      // batch 2: near-dup of the image admitted in batch 1 — the index
      // must have grown batch over batch
      mem.addData((8L, img(7, near = true)))
      q.processAllAvailable()
      val byBatch = emitted.groupBy(_._1).view
        .mapValues(_.map(e => (e._2, e._3)).toSet).toMap
      assert(byBatch(0L) == Set((1L, false), (2L, false)))
      // refusal 6 passes through with a null fingerprint; 4 and 5 drop
      assert(byBatch(1L) == Set((6L, true), (7L, false)))
      assert(byBatch.getOrElse(2L, Set.empty[(Long, Boolean)]).isEmpty)
      // the standing index holds exactly the admitted fingerprints
      val idx = spark.read.parquet(indexPath)
      assert(idx.select("id").as[Long].collect().toSet == Set(1L, 2L, 7L))
      // STREAMING ≡ BATCH: same corpus through the batch operator with
      // keep-smallest-id (ids follow arrival)
      val all = Seq(1L -> img(1), 2L -> img(2), 3L -> img(1, near = true),
        4L -> img(1, near = true), 5L -> img(2), 7L -> img(7),
        8L -> img(7, near = true)).toDF("doc_id", "media")
      val dropped = Dedup.imagePhashDups(all, "doc_id", "media",
        maxHamming = 3, bucketBits = 16)
        .select("id_b").as[Long].collect().toSet
      val batchKept = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L).filterNot(dropped).toSet
      assert(batchKept == Set(1L, 2L, 7L),
        s"batch operator must keep the same survivors: $batchKept")
      // REPLAY idempotency: re-run batch 2 through the gate directly —
      // the own-partition exclusion must keep doc 8 dropped (it matches
      // doc 7 in a LIVE partition), and the index must not grow
      emitted.clear()
      gate(Seq(8L -> img(7, near = true)).toDF("doc_id", "media"), 2L)
      assert(emitted.isEmpty)
      assert(spark.read.parquet(indexPath)
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 7L))
      // replay of batch 1 re-admits doc 7 into its own partition
      // (dynamic overwrite -> still exactly one copy) and re-emits the
      // refusal; 4/5 still drop against the other live partitions
      emitted.clear()
      gate(Seq(4L -> img(1, near = true), 5L -> img(2),
        6L -> refusal, 7L -> img(7)).toDF("doc_id", "media"), 1L)
      assert(emitted.map(e => (e._2, e._3)).toSet ==
        Set((6L, true), (7L, false)))
      assert(spark.read.parquet(indexPath).groupBy("id").count()
        .filter(col("count") > 1).count() == 0L,
        "replay must not duplicate index rows")
    } finally q.stop()
  }

  test("fingerprintDedupIntake covers text via the SimHash kernel (cross-batch)") {
    import spark.implicits._
    import graft.operators.Dedup
    // the scaladoc's third fingerprint family: same intake, text column,
    // Dedup.simhash64 as the fingerprint — near-copy text dedups across
    // batches against the standing index
    def doc(topic: String): String =
      (1 to 30).map(i => s"the $topic pipeline stage $i reads and writes rows").mkString(" ")
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-fptext").toString + "/index"
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val gate = StreamingAnalytics.fingerprintDedupIntake(indexPath,
      Dedup.simhash64, mediaCol = "text", bucketBits = 16,
      sink = (df, bid) => emitted ++= df.select("doc_id")
        .collect().map(r => (bid, r.getLong(0))))
    val corpus = Seq(
      (1L, doc("spark")), (2L, doc("flink")),
      // exact re-delivery under a new id: hamming 0, must drop
      (3L, doc("spark")),
      // one-word variant: whether it is within the radius is the
      // KERNEL's call — the stream must agree with the batch operator
      (4L, doc("flink").replace("stage 7", "stage seven")),
      (5L, doc("duckdb")))
    gate(corpus.take(2).toDF("doc_id", "text"), 0L)
    gate(corpus.drop(2).toDF("doc_id", "text"), 1L)
    val byBatch = emitted.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) == Set(1L, 2L))
    // STREAM ≡ BATCH: survivors must match the batch operator's
    // keep-smallest-id over the same corpus (ids follow arrival)
    val droppedBatch = Dedup.simhashDups(corpus.toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 3, bucketBits = 16)
      .select("id_b").as[Long].collect().toSet
    assert(droppedBatch.contains(3L)) // the exact copy is always a pair
    assert(byBatch(1L) == Set(3L, 4L, 5L).diff(droppedBatch),
      s"stream survivors must equal batch survivors: $byBatch vs dropped=$droppedBatch")
    assert(spark.read.parquet(indexPath).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L, 5L).diff(droppedBatch))
  }

  test("fingerprintDedupIntake covers video via the clip-signature kernel (cross-batch)") {
    import spark.implicits._
    import graft.operators.{Dedup, Multimodal}
    // the fourth fingerprint family through the SAME intake: planted AVI
    // clips (3 BMP frames), near-dups perturb cell (0,0) in every frame
    def clip(seed: Long, near: Boolean = false): Array[Byte] =
      Multimodal.ContainerFixtures.aviMjpeg(40000L, 27, 21,
        (0 until 3).map { f =>
          Multimodal.ContainerFixtures.bmp(27, 21, (x, y) => {
            val g = (seed * 37 + f * 41 + x * 11 + y * 23) % 251
            (if (near && x * 9 / 27 == 0 && y * 8 / 21 == 0) (g + 128) % 251
             else g).toInt
          })
        })
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-fpvid").toString + "/index"
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val gate = StreamingAnalytics.fingerprintDedupIntake(indexPath,
      graft.functions.VideoExpressions.videoSigHash, bucketBits = 16,
      sink = (df, bid) => emitted ++= df.select("doc_id", "sim")
        .collect().map(r => (bid, r.getLong(0), r.isNullAt(1))))
    gate(Seq(1L -> clip(1), 2L -> clip(2)).toDF("doc_id", "media"), 0L)
    // batch 1: cross-batch near-dup of 1, exact re-delivery of 2 under a
    // new id, a refusal (non-AVI), and a fresh clip
    gate(Seq(3L -> clip(1, near = true), 4L -> clip(2),
      5L -> "not a clip".getBytes, 6L -> clip(6)).toDF("doc_id", "media"), 1L)
    val byBatch = emitted.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3)).toSet).toMap
    assert(byBatch(0L) == Set((1L, false), (2L, false)))
    assert(byBatch(1L) == Set((5L, true), (6L, false)))
    // STREAM ≡ BATCH: survivors equal the batch operator's
    // keep-smallest-id over the same corpus
    val dropped = Dedup.videoSigDups(
        Seq(1L -> clip(1), 2L -> clip(2), 3L -> clip(1, near = true),
          4L -> clip(2), 6L -> clip(6)).toDF("doc_id", "media"),
        "doc_id", "media", maxHamming = 3, bucketBits = 16)
      .select("id_b").as[Long].collect().toSet
    assert(dropped == Set(3L, 4L))
    assert(spark.read.parquet(indexPath).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 6L))
  }

  test("fingerprintDedupIntake: mid-stream compaction changes no admission, replay stays idempotent") {
    import spark.implicits._
    import graft.operators.Multimodal
    def img(seed: Long, near: Boolean = false): Array[Byte] =
      Multimodal.ContainerFixtures.bmp(27, 21, (x, y) => {
        val g = (seed * 37 + x * 11 + y * 23) % 251
        (if (near && x * 9 / 27 == 0 && y * 8 / 21 == 0) (g + 128) % 251
         else g).toInt
      })
    val root = java.nio.file.Files.createTempDirectory("graft-fpcomp").toString
    def run(indexPath: String, compactAt: Option[Long])
        : Seq[(Long, Set[Long])] = {
      val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val gate = StreamingAnalytics.fingerprintDedupIntake(indexPath,
        graft.functions.ImageExpressions.dhashImage, bucketBits = 16,
        sink = (df, bid) => emitted ++= df.filter(col("sim").isNotNull)
          .select("doc_id").collect().map(r => (bid, r.getLong(0))))
      val batches = Seq(
        0L -> Seq(1L -> img(1), 2L -> img(2)),
        1L -> Seq(3L -> img(1, near = true), 4L -> img(4)),
        // batch 2 probes BOTH generations: 5 exact-copies doc 2 (folded
        // into -1 when compaction ran), 6 near-dups doc 4 (live), 7 fresh
        2L -> Seq(5L -> img(2), 6L -> img(4, near = true), 7L -> img(7)))
      batches.foreach { case (bid, docs) =>
        // the StreamMedia hook shape: compact at BATCH START, folding
        // only batches below the one about to run
        if (compactAt.contains(bid))
          StreamingAnalytics.compactFingerprintIndex(spark, indexPath,
            numFiles = 2, belowBatchId = bid)
        gate(docs.toDF("doc_id", "media"), bid)
      }
      emitted.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        .toSeq.sortBy(_._1)
    }
    val compacted = run(s"$root/idx_c", compactAt = Some(2L))
    val plain = run(s"$root/idx_p", compactAt = None)
    assert(compacted == plain,
      s"admissions must be identical across a mid-stream compaction: $compacted vs $plain")
    assert(compacted.toMap.apply(2L) == Set(7L))
    // the compacted generation really exists and holds the folded batches
    val idx = spark.read.parquet(s"$root/idx_c")
    assert(idx.select("batch_id").distinct().as[Long].collect().toSet
      == Set(-1L, 2L))
    assert(idx.filter(col("batch_id") === -1L).select("id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
    // replay of the post-compaction batch: own-partition exclusion keeps
    // it idempotent against BOTH generations — 7 re-admits into its own
    // partition (one copy), 5 and 6 still drop
    val emitted2 = scala.collection.mutable.ArrayBuffer[Long]()
    val gate2 = StreamingAnalytics.fingerprintDedupIntake(s"$root/idx_c",
      graft.functions.ImageExpressions.dhashImage, bucketBits = 16,
      sink = (df, _) => emitted2 ++= df.filter(col("sim").isNotNull)
        .select("doc_id").collect().map(_.getLong(0)))
    gate2(Seq(5L -> img(2), 6L -> img(4, near = true), 7L -> img(7))
      .toDF("doc_id", "media"), 2L)
    assert(emitted2.toSet == Set(7L))
    assert(spark.read.parquet(s"$root/idx_c").groupBy("id").count()
      .filter(col("count") > 1).count() == 0L,
      "replay after compaction must not duplicate index rows")
  }

  test("hammingAgainst matches only within the radius and survives flood buckets") {
    import spark.implicits._
    import graft.operators.Dedup
    val index = Seq((10L, 0x0F0FL), (11L, 0xFF00FF00L), (12L, -1L))
      .toDF("id", "sim")
    val incoming = Seq(
      (1L, 0x0F0FL),            // exact: hamming 0 vs 10
      (2L, 0x0F0EL),            // hamming 1 vs 10
      (3L, 0x0FF0L),            // hamming 8 vs 10 -> no match
      (4L, -2L)                 // hamming 1 vs 12
    ).toDF("doc_id", "sim")
    val m = Dedup.hammingAgainst(index, incoming, maxHamming = 3,
        bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(m == Set((10L, 1L, 0), (10L, 2L, 1), (12L, 4L, 1)))
    // flood bucket: many identical index fingerprints still match (the
    // probe addresses 2 blocks; identical rows fill every block, so the
    // match survives) and the candidate count stays bounded — banded
    // candidates plus the exact fast path's one representative row
    val flood = (100L to 400L).map(i => (i, 0L)).toDF("id", "sim")
    val probe = Seq((1L, 0L)).toDF("doc_id", "sim")
    val fm = Dedup.hammingAgainst(flood, probe, maxHamming = 0,
      maxBucket = 16, bucketBits = 16)
    assert(fm.count() > 0 && fm.count() <= 4 * 2 * 16 + 1,
      "flood-bucket candidates must stay within bands*probes*maxBucket + 1 exact rep")
  }

  test("hammingAgainst exact fast path surfaces a re-delivery buried in flood buckets") {
    import spark.implicits._
    import graft.operators.Dedup
    // every band's bucket for the probe fingerprint is flooded by far
    // more rows than 2 blocks cover, none within the radius, and the
    // SINGLE exact copy hides among them: the sim-equality fast path
    // must still surface it (the 2-block probe alone misses it with
    // high probability — the advisor's re-admission hazard, where the
    // gate would preferentially re-admit exactly the most frequent
    // payloads as their buckets flood)
    val target = 0x1234123412341234L
    val crowd = (0 until 4).flatMap { b =>
      (0 until 150).map { i =>
        var s = 0L
        for (w <- 0 until 4) {
          val win = if (w == b) (target >> (b * 16)) & 0xFFFFL
                    else (i + 1 + 97L * w + 1000L * b) & 0xFFFFL
          s |= win << (w * 16)
        }
        (1000L + b * 1000L + i, s)
      }
    }
    val idx = (crowd :+ ((999L, target))).toDF("id", "sim")
    val probe = Seq((1L, target)).toDF("doc_id", "sim")
    val m = Dedup.hammingAgainst(idx, probe, maxHamming = 0,
        maxBucket = 4, bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(m == Set((999L, 1L, 0)),
      s"the buried exact copy must be the one and only match: $m")
  }
}
