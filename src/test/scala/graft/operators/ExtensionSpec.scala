package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-duplicate and recall tests for the LSH-based extension
  * operators (the variants whose candidate sets are banding-dependent and
  * therefore not DuckDB-oracle-checkable). */
class ExtensionSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private def sf = "/root/testdata/sf0.001"

  private lazy val planted = {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 5
    Seq(
      (0L, base),
      (1L, base),                                     // exact dup of 0
      (2L, base.replace("delta", "xray")),            // near dup of 0
      (3L, "completely different words entirely unrelated content here now " * 5),
      (4L, base.replace("alpha bravo", "zulu yankee")) // near dup of 0
    ).toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-duplicates, not the unrelated doc") {
    val pairs = Dedup.minhashLsh(planted, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))   // exact dup
    assert(pairs.contains((0L, 2L)))   // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash LSH recall vs exact ngram jaccard on real corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // LSH verifies with exact jaccard → no false positives possible
    assert(lsh.subsetOf(exact))
    // 16 bands × 4 rows at j≥0.5 → expected recall >> 0.9
    assert(lsh.size.toDouble / exact.size >= 0.9,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("oversized duplicate cluster (> maxBucket) still surfaces every member") {
    import spark.implicits._
    // 100 identical docs overflow the 64-doc bucket cap in every band; the
    // bounded-span pairing must still link all members (the old
    // whole-group drop reported ZERO pairs here).
    val base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 4
    val docs = ((0 until 100).map(i => (i.toLong, base)) :+
      (999L, "totally unrelated other words entirely different content " * 4))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val mhMembers = mh.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until 100L).toSet.subsetOf(mhMembers), "minhash must link all cluster members")
    assert(!mhMembers.contains(999L))
    // span cap bounds the blowup: ≤ docs × maxBucket pairs, not n²/2
    assert(mh.length <= 100 * 64)
    val sh = Dedup.simhashDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val shMembers = sh.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until 100L).toSet.subsetOf(shMembers), "simhash must link all cluster members")
    assert(!shMembers.contains(999L))
  }

  test("dedup caches are released by CacheRegistry after materialization") {
    def settled(target: => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + 10000
      while (!target && System.currentTimeMillis() < deadline) Thread.sleep(100)
      target
    }
    // drain anything earlier tests in this suite left tracked
    CacheRegistry.releaseAll()
    settled(true)
    Thread.sleep(300)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashLsh(planted, "doc_id", "text", threshold = 0.5).count()
    Dedup.ngramJaccard(planted, "doc_id", "text", n = 3, threshold = 0.5).count()
    assert(spark.sparkContext.getPersistentRDDs.keySet != before,
      "operators should persist intermediates while running")
    CacheRegistry.releaseAll()
    // non-blocking unpersist → poll briefly
    assert(settled(spark.sparkContext.getPersistentRDDs.keySet == before),
      s"release must leave no retained dedup caches; " +
        s"left=${spark.sparkContext.getPersistentRDDs.keySet}")
  }

  test("simhash flags exact dup with hamming 0") {
    val pairs = Dedup.simhashDups(planted, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").longValue)).toList
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 1L && h == 0L })
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  /** Hyperplane LSH prunes for HIGH-similarity neighbors (cos ≳ 0.9);
    * random 64-d corpus "neighbors" sit at cos 0.3-0.5 where any pruning
    * index must lose recall. So the recall contract is tested the way the
    * operator is used: planted near-duplicate queries. */
  test("LSH ANN finds planted near-duplicate vectors") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // queries = slightly perturbed copies of corpus vectors 0..19
    val q = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val hits = Similarity.lshTopK(q, e, 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val found = (0L until 20L).count(i => hits.get(i + 10000).contains(i))
    assert(found >= 18, s"LSH found source vector for only $found/20 perturbed queries")
  }

  test("IVF ANN finds planted near-duplicate vectors") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val hits = Similarity.ivfTopK(q, e, 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val found = (0L until 20L).count(i => hits.get(i + 10000).contains(i))
    assert(found >= 15, s"IVF found source vector for only $found/20 perturbed queries")
  }

  /** Recall contract for the LSH embedding-dedup scale path, tested where
    * LSH can work: planted high-sim twins (the real near-dup use case).
    * Random-vector pairs at cos 0.4-0.5 are below any hyperplane-LSH
    * pruning horizon — the exact twin query covers that regime. */
  test("embedding cosine dedup (LSH) finds planted twins, no cartesian in plan") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val twins = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val out = Similarity.cosineDedup(e.unionByName(twins), threshold = 0.9)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cosineDedup plan must be bucket-joined, got:\n$plan")
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 20L).count(i => pairs.contains((i, i + 10000)))
    assert(found >= 18, s"LSH cosine dedup found only $found/20 planted near-dup pairs")
  }

  /** The cells scale path's twin of the LSH planted-twin test: recall in
    * the SPARSE regime (real near-dups, threshold 0.9) plus the
    * no-product plan guarantee. */
  test("embedding cosine dedup (cells) finds planted twins, no cartesian in plan") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val twins = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val out = Similarity.cosineDedupCells(e.unionByName(twins), threshold = 0.9,
      probeCells = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cosineDedupCells plan must be cell-joined, got:\n$plan")
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 20L).count(i => pairs.contains((i, i + 10000)))
    assert(found == 20, s"cells cosine dedup found only $found/20 planted near-dup pairs")
    CacheRegistry.releaseAll()
  }

  test("oversized identical-embedding cell flood is span-bounded, zero-norm kept out") {
    import spark.implicits._
    // 300 identical embeddings assign to the SAME top-probeCells cells —
    // the degenerate flood. The span guard must bound pairs at
    // O(n × span) while still surfacing every member, and a zero vector
    // must never pair (NaN cosine contract).
    val vec = Array(0.6f, -0.2f, 0.9f, 0.1f, -0.7f, 0.3f, 0.5f, -0.4f)
    val outlier = Array(-0.6f, 0.2f, -0.9f, -0.1f, 0.7f, -0.3f, -0.5f, 0.4f)
    val zero = Array.fill(8)(0.0f)
    val rows = (0 until 300).map(i => (i.toLong, vec)) ++
      Seq((9999L, outlier), (10000L, zero))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.cosineDedupCells(df, threshold = 0.9, maxCell = 32,
      probeCells = 2)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect()
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until 300L).toSet.subsetOf(members), "every cluster member must surface")
    assert(!members.contains(9999L) && !members.contains(10000L))
    assert(pairs.length <= 300 * 32 * 2 * 2,
      s"span guard must bound pairs at n×span, got ${pairs.length} (all-pairs = ${300 * 299 / 2})")
    CacheRegistry.releaseAll()
  }

  test("oversized identical-embedding cluster (> maxBucket) is linear, not quadratic") {
    import spark.implicits._
    // 300 identical embeddings land whole in ONE RHP bucket in every
    // table — the degenerate case a dirty corpus produces. The block-keyed
    // span guard must (a) keep compute/output at O(n × maxBucket), not
    // n²/2 all-pairs, (b) still surface every member in ≥1 pair so
    // connected components can collapse the cluster, (c) never emit a
    // pair with the unrelated outlier.
    val vec = Array(0.6f, -0.2f, 0.9f, 0.1f, -0.7f, 0.3f, 0.5f, -0.4f)
    val outlier = Array(-0.6f, 0.2f, -0.9f, -0.1f, 0.7f, -0.3f, -0.5f, 0.4f)
    val rows = (0 until 300).map(i => (i.toLong, vec)) :+ (9999L, outlier)
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.cosineDedup(df, threshold = 0.9)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect()
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0L until 300L).toSet.subsetOf(members), "every cluster member must surface")
    assert(!members.contains(9999L))
    assert(pairs.length <= 300 * 64,
      s"span guard must bound pairs at n×maxBucket, got ${pairs.length} (all-pairs = ${300 * 299 / 2})")
    CacheRegistry.releaseAll()
  }

  test("zero-norm embeddings never flood cosine reports (NaN guard)") {
    import spark.implicits._
    // NaN >= threshold is TRUE in Spark and NaN sorts above every double
    // under desc — one all-zero vector must not contaminate any result
    val vec = Array(0.6f, -0.2f, 0.9f, 0.1f, -0.7f, 0.3f, 0.5f, -0.4f)
    val zero = Array.fill(8)(0.0f)
    val rows = (0 until 30).map(i => (i.toLong, vec)) :+ (999L, zero)
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val zeroProbe = Seq((5000L, zero)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // a zero PROBE flags nothing; a zero CORPUS vector is never flagged
    assert(Similarity.semanticContamination(df, zeroProbe, 0.1).count() == 0)
    val contam = Similarity.semanticContamination(df, df.filter($"vec_id" === 0), 0.9)
      .select("vec_id").as[Long].collect()
    assert(!contam.contains(999L) && contam.nonEmpty)
    // dedup family: the zero vector is KEPT verbatim, never a witness
    val m = Similarity.semanticDedup(df, threshold = 0.9)
      .select("vec_id", "is_kept", "dup_of").as[(Long, Int, Option[Long])].collect()
    val zeroRow = m.find(_._1 == 999L).get
    assert(zeroRow._2 == 1 && zeroRow._3.isEmpty)
    assert(m.filter(_._2 == 0).forall(r => r._3.get != 999L))
    val pairs = Similarity.cosineDedup(df, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.forall(p => p._1 != 999L && p._2 != 999L) && pairs.nonEmpty)
    // ANN: a zero query returns nothing; a zero candidate never ranks
    assert(Similarity.bruteForceTopK(zeroProbe, df, 5).count() == 0)
    assert(Similarity.bruteForceTopK(df.filter($"vec_id" === 0), df, 100)
      .select("cand_id").as[Long].collect().forall(_ != 999L))
    CacheRegistry.releaseAll()
  }

  test("semantic contamination flags the planted paraphrase, not clean docs") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    // probes = perturbed copies of corpus vectors 0..4 (a "benchmark"
    // whose items leaked into the corpus in paraphrased form)
    val probes = e.filter(col("vec_id") < 5)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val corpus = e
    val out = Similarity.semanticContamination(corpus, probes, threshold = 0.95)
      .select("vec_id", "closest_probe", "n_probe_hits")
      .as[(Long, Long, Long)].collect()
    val flagged = out.map(r => r._1 -> r._2).toMap
    (0L until 5L).foreach { i =>
      assert(flagged.get(i).contains(i + 10000),
        s"leaked corpus vector $i must be flagged with its probe as evidence")
    }
    assert(out.length < 20,
      s"threshold 0.95 must not flag unrelated vectors, got ${out.length}")
    // plan shape: probes are broadcast — the corpus side must not shuffle
    val plan = Similarity.semanticContamination(corpus, probes, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "probe scoring must be a broadcast product, corpus never exchanged for it")
  }

  test("semantic dedup keeps one representative per planted twin cluster") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    // 20 perturbed twins of corpus vectors 0..19: cos(twin, source) ≈ 1,
    // so k-means MUST co-locate each twin with its source and the in-cell
    // exact-cosine pass must drop the twin (higher id) with the source as
    // witness
    val twins = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val m = Similarity.semanticDedup(e.unionByName(twins), threshold = 0.95)
    val rows = m.select("vec_id", "is_kept", "dup_of")
      .as[(Long, Int, Option[Long])].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    val dropped = (0L until 20L).count { i =>
      val (_, kept, dupOf) = byId(i + 10000)
      kept == 0 && dupOf.exists(_ < i + 10000)
    }
    assert(dropped >= 18, s"only $dropped/20 planted twins were dropped")
    // sources (the lower ids) survive unless they had an even-lower dup
    (0L until 20L).foreach { i =>
      val (_, kept, dupOf) = byId(i)
      if (kept == 0) assert(dupOf.exists(_ < i), s"source $i dropped without witness")
    }
    // determinism: a second run produces the identical manifest
    val again = Similarity.semanticDedup(e.unionByName(twins), threshold = 0.95)
      .select("vec_id", "is_kept", "dup_of")
      .as[(Long, Int, Option[Long])].collect()
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    CacheRegistry.releaseAll()
  }

  test("semantic dedup mega-cell degrades linearly, keeps exactly one") {
    import spark.implicits._
    // 400 identical vectors: one k-means cell swallows them all; the
    // rank-span guard (maxCell) must keep pair compute linear and the
    // consecutive-rank chain must drop every member but the minimum id
    val vec = Array(0.6f, -0.2f, 0.9f, 0.1f, -0.7f, 0.3f, 0.5f, -0.4f)
    val rows = (0 until 400).map(i => (i.toLong, vec))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val m = Similarity.semanticDedup(df, threshold = 0.99, maxCell = 32)
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val out = m.select("vec_id", "is_kept", "dup_of")
      .as[(Long, Int, Option[Long])].collect()
    assert(out.count(_._2 == 1) == 1, "exactly one representative kept")
    assert(out.filter(_._2 == 0).forall(r => r._3.exists(_ < r._1)))
    CacheRegistry.releaseAll()
  }

  test("incremental dedup flags near-copies of the index, never fresh docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def doc() = (0 until 30).map(_ => s"w${rnd.nextInt(1000)}").mkString(" ")
    val indexDocs = (0L until 50L).map(i => (i, doc()))
    // 20 near-copies (one token swapped) + 30 fresh documents
    val copies = indexDocs.take(20).map { case (i, t) =>
      val w = t.split(" "); w(7) = "CHANGED"
      (100L + i, w.mkString(" "))
    }
    val fresh = (200L until 230L).map(i => (i, doc()))
    val index = indexDocs.toDF("doc_id", "text")
    val incoming = (copies ++ fresh).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshAgainst(index, incoming, "doc_id", "text",
        threshold = 0.5)
      .select("index_id", "incoming_id").as[(Long, Long)].collect()
    val bySrc = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val recalled = (0L until 20L).count(i => bySrc.get(100L + i).exists(_.contains(i)))
    assert(recalled >= 18, s"only $recalled/20 planted near-copies flagged")
    assert(pairs.forall(_._2 >= 100L), "output pairs incoming ids only on the right")
    assert((200L until 230L).forall(i => !bySrc.contains(i)),
      "fresh documents must not be flagged")
    CacheRegistry.releaseAll()
  }

  test("incremental dedup hot bucket stays bounded, every copy still flagged") {
    import spark.implicits._
    val t = "same words repeated here for every single document in the flood " * 2
    val index = (0L until 300L).map(i => (i, t)).toDF("doc_id", "text")
    val incoming = (1000L until 1005L).map(i => (i, t)).toDF("doc_id", "text")
    val q = Dedup.minhashLshAgainst(index, incoming, "doc_id", "text", threshold = 0.9)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = q.select("incoming_id").distinct().as[Long].collect().toSet
    assert(got == (1000L until 1005L).toSet,
      s"every incoming member of the 300-doc flood must surface: $got")
    CacheRegistry.releaseAll()
  }

  test("semantic dedup beyond the dense-assign limit: two-level index, recall held") {
    import spark.implicits._
    // 4200 centroids > DenseAssignLimit forces the coarse→children
    // two-level assignment path; planted twins must still co-locate with
    // their sources and drop with a valid witness
    assert(Similarity.DenseAssignLimit == 4096)
    val rnd = new scala.util.Random(17)
    val cents = Array.fill(4200)(Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    val centIds = Array.tabulate(4200)(_.toLong)
    val base = centIds.map(i => (i, cents(i.toInt)))
    val twins = (0 until 25).map(i => (10000L + i, cents(i).map(v => v * 1.01f + 0.003f)))
    val df = (base.toSeq ++ twins).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val m = Similarity.semanticDedup(df, threshold = 0.95,
      pretrained = Some((centIds, cents)))
    val rows = m.select("vec_id", "is_kept", "dup_of")
      .as[(Long, Int, Option[Long])].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    val dropped = (0 until 25).count { i =>
      val (_, kept, dupOf) = byId(10000L + i)
      kept == 0 && dupOf.exists(_ < 10000L + i)
    }
    assert(dropped >= 22, s"only $dropped/25 planted twins dropped under two-level assignment")
    // every drop cites a valid smaller-id witness; no cell is null (dims match)
    assert(rows.filter(_._2 == 0).forall(r => r._3.exists(_ < r._1)))
    assert(m.filter(col("cell").isNull).count() == 0)
    // determinism across runs (coarse index + assignment are pure functions)
    val again = Similarity.semanticDedup(df, threshold = 0.95,
        pretrained = Some((centIds, cents)))
      .select("vec_id", "is_kept", "dup_of")
      .as[(Long, Int, Option[Long])].collect()
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    CacheRegistry.releaseAll()
  }

  test("IVF beyond the dense-assign limit: two-level probes keep top-1 recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val cents = Array.fill(4200)(Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    val centIds = Array.tabulate(4200)(_.toLong)
    val corpus = centIds.map(i => (i, cents(i.toInt))).toSeq
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val queries = (0 until 25).map(i => (10000L + i, cents(i).map(v => v * 1.01f + 0.003f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val top1 = Similarity.ivfTopK(queries, corpus, k = 1, nlist = 4200,
        nprobe = 4, pretrained = Some((centIds, cents)))
      .filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val hits = (0 until 25).count(i => top1.get(10000L + i).contains(i.toLong))
    assert(hits >= 22, s"only $hits/25 twins retrieved their source past the dense limit")
    CacheRegistry.releaseAll()
  }

  test("quantized IVF retrieves the planted source with exact emitted sims") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val pre = Similarity.trainCentroids(e, nlist = 16, trainIters = 2)
    val quant = Similarity.ivfTopKQuantized(q, e, k = 5, nlist = 16,
      pretrained = Some(pre))
    val top1 = quant.filter(col("rank") === 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val hits = (0L until 20L).count(i => top1.get(i + 10000).contains(i))
    assert(hits >= 18, s"only $hits/20 twins retrieved their source through int8 lists")
    // emitted sims are EXACT: spot-check against the float cosine
    val full = Similarity.ivfTopK(q, e, k = 5, nlist = 16, pretrained = Some(pre))
      .select("query_id", "cand_id", "sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val qsims = quant.select("query_id", "cand_id", "sim")
      .as[(Long, Long, Double)].collect()
    val overlap = qsims.filter(r => full.contains((r._1, r._2)))
    assert(overlap.nonEmpty &&
      overlap.forall(r => math.abs(full((r._1, r._2)) - r._3) < 1e-12),
      "quantized path must emit the same exact sims as the float path")
    CacheRegistry.releaseAll()
  }

  test("IVF Lloyd training buys recall over seed-only centroids") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    def recall(iters: Int): Int = {
      val hits = Similarity.ivfTopK(q, e, 1, trainIters = iters)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
      (0L until 20L).count(i => hits.get(i + 10000).contains(i))
    }
    val trained = recall(2)
    val seedOnly = recall(0)
    assert(trained >= seedOnly,
      s"Lloyd-trained centroids must not lose recall: trained=$trained seed=$seedOnly")
    assert(trained >= 15, s"trained IVF recall too low: $trained/20")
  }

  test("corpus_curate labels every document with a consistent fate") {
    val out = graft.queries.ExtensionQueries.corpusCurate(spark, sf).collect()
    val nDocs = spark.read.parquet(sf + "/documents.parquet").count()
    assert(out.length == nDocs, "one manifest row per input document")
    val fates = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(fates.keySet.subsetOf(
      Set("exact_dup", "low_quality", "contaminated", "near_dup", "kept")))
    assert(fates.getOrElse("kept", 0) > 0, "some documents must survive")
    // stages 1+2 must agree with the standalone clean gate: its
    // survivors are exactly the docs not dropped as exact_dup/low_quality
    val cleanN = graft.queries.ExtensionQueries.corpusClean(spark, sf).count()
    assert(fates.getOrElse("exact_dup", 0) + fates.getOrElse("low_quality", 0)
      == nDocs - cleanN,
      s"stage-1/2 fates disagree with corpus_clean: $fates vs $cleanN/$nDocs")
    CacheRegistry.releaseAll()
  }

  test("corpus_curate_summary totals reconcile with the live manifest") {
    val manifest = graft.queries.ExtensionQueries.corpusCurate(spark, sf)
      .collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val summary = graft.queries.ExtensionQueries
      .corpusCurateSummary(spark, sf).collect()
    val byFate = summary.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byFate.view.mapValues(_.toInt).toMap == manifest,
      s"summary $byFate disagrees with live manifest $manifest")
    assert(summary.map(_.getLong(2)).sum == manifest.values.sum)
    CacheRegistry.releaseAll()
  }

  test("scale-aware ANN budget derivations pin the measured calibration points") {
    import Similarity.{autoLshProbes, autoPqRerank}
    // gate/oracle scales replay the historical fixed geometry
    assert(autoLshProbes(500) == 32)      // sf0.01 gate corpus
    assert(autoLshProbes(2000) == 32)     // sf0.1
    assert(autoLshProbes(20000) == 32)    // sf1 — measured 1.000 recall
    assert(autoPqRerank(500, 5) == 40)    // sf0.01 gate corpus (8·k floor)
    assert(autoPqRerank(1600, 5) == 40)   // floor boundary: sqrt(1600) = 40
    // measured recovery points of the 2M-vector decay curve
    assert(autoLshProbes(200000) == 48)   // sf10 — measured 0.960
    assert(autoLshProbes(2000000) == 488) // sf100 — measured 1.000
    assert(autoPqRerank(200000, 5) == 448)   // sf10 — measured 0.960
    // the 160·k saturation cap: the r18 2M sweep measured 800 as the
    // exact budget reaching the 0.960 cell ceiling (600 → 0.940), and
    // NO measured decade up to 20M improves past it — √n's 1415 here
    // (and 4473 at 20M) bought zero recall for linear wall
    assert(autoPqRerank(2000000, 5) == 800)  // sf100 — measured ceiling
    assert(autoPqRerank(20000000, 5) == 800) // 20M — ceiling from 400
    // clamps guard the unmeasured range
    assert(autoLshProbes(1L << 40) == 4096)
    assert(autoPqRerank(1L << 40, 5) == 800)
    // degenerate inputs stay at the floors
    assert(autoLshProbes(0) == 32 && autoPqRerank(0, 5) == 40)
  }

  test("planted boilerplate tails FIRE the composed substring stage (nonzero span mass)") {
    // the unplanted corpora are span-clean (r17 probe: zero shared
    // >=6-token spans among kept survivors at any width) — the planted
    // variant exists to price a nonzero path under the oracle gate
    val out = graft.queries.ExtensionQueries
      .corpusCurateSubstringPlanted(spark, sf)
    val fired = out.filter(col("n_dup_tokens") > 0)
      .select("doc_id", "n_dup_tokens").collect()
    assert(fired.nonEmpty, "the planted stage must fire")
    fired.foreach { r =>
      assert(r.getLong(0) >= 100 && r.getLong(0) % 7 == 3,
        s"only planted docs may carry span mass, got doc ${r.getLong(0)}")
      // each kept planted doc's island covers at least the 26-token
      // tail; a coinciding final body word between two planted docs
      // legitimately extends the shared window a step left
      assert(r.getLong(1) >= 26L && r.getLong(1) <= 40L,
        s"doc ${r.getLong(0)}: island ${r.getLong(1)} vs the planted tail")
    }
  }

  test("corpus_curate_substring prices dup spans over kept docs only") {
    val out = graft.queries.ExtensionQueries
      .corpusCurateSubstring(spark, sf).collect()
    val plain = graft.queries.ExtensionQueries.corpusCurate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == plain.size, "one manifest row per input document")
    out.foreach { r =>
      val (id, fate) = (r.getLong(0), r.getString(1))
      assert(plain(id) == fate,
        s"strip stage must not change fates: doc $id $fate vs ${plain(id)}")
      if (fate == "kept") {
        // stage columns present and bounded: 0 <= n_dup_tokens <= n_tokens
        assert(!r.isNullAt(3) && !r.isNullAt(4), s"kept doc $id missing stage cols")
        assert(r.getLong(4) >= 0L && r.getLong(4) <= r.getLong(3),
          s"doc $id dup tokens ${r.getLong(4)} out of [0, ${r.getLong(3)}]")
      } else {
        // the stage never saw non-survivors
        assert(r.isNullAt(3) && r.isNullAt(4),
          s"non-kept doc $id must carry NULL stage columns")
      }
    }
    // staged semantics: spans derive from the KEPT subset, so the
    // whole-corpus strip is an upper bound on per-doc dup mass
    val whole = Dedup.dupSpans(
        spark.read.parquet(sf + "/documents.parquet").select("doc_id", "text"),
        "doc_id", "text", spanTokens = 20)
      .groupBy("doc_id").agg(sum("span_len").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(_.getString(1) == "kept").foreach { r =>
      assert(r.getLong(4) <= whole.getOrElse(r.getLong(0), 0L),
        s"kept-subset span mass exceeds whole-corpus mass for doc ${r.getLong(0)}")
    }
    CacheRegistry.releaseAll()
  }

  test("pq ADC score equals the reconstruction inner product") {
    import spark.implicits._
    import graft.functions.VectorExpressions.{pqAdc, pqEncode, pqLut}
    // 2 subspaces × 2 codes × dsub=2 — small enough to verify by hand
    val cb: Array[Array[Array[Float]]] = Array(
      Array(Array(1f, 0f), Array(0f, 1f)),
      Array(Array(0.5f, 0.5f), Array(-1f, 2f)))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.4f, 0.6f)),
      (2L, Seq(0.0f, 1.1f, -0.9f, 1.8f))).toDF("vec_id", "embedding")
    val q = df.select(col("vec_id").as("qid"),
      pqLut(col("embedding"), cb).as("lut"))
    val c = df.select(col("vec_id").as("cid"),
      pqEncode(col("embedding"), cb).as("codes"))
    val adc = q.crossJoin(c)
      .select(col("qid"), col("cid"), pqAdc(col("lut"), col("codes")).as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // vec 1 encodes to (0, 0): recon = (1, 0, 0.5, 0.5)
    val recon1 = Array(1f, 0f, 0.5f, 0.5f)
    val q2 = Array(0.0f, 1.1f, -0.9f, 1.8f)
    val expected = q2.indices.foldLeft(0.0)((s, i) =>
      s + q2(i).toDouble * recon1(i).toDouble)
    assert(math.abs(adc((2L, 1L)) - expected) < 1e-12,
      s"ADC ${adc((2L, 1L))} != recon dot $expected")
    CacheRegistry.releaseAll()
  }

  test("ann_pq_topk holds the recall gate with zero violations at sf0.001") {
    val rec = graft.queries.ExtensionQueries.annPqRecall(spark, sf).collect().head
    assert(rec.getAs[Long]("recall_ok") == 1L, s"pq recall below gate: $rec")
    assert(rec.getAs[Long]("n_queries") == 10L)
    val vio = graft.queries.ExtensionQueries.annPqViolations(spark, sf)
      .collect().head
    assert(vio.getAs[Long]("n_violations") == 0L, s"pq violations: $vio")
    assert(vio.getAs[Long]("has_pairs") == 1L)
    CacheRegistry.releaseAll()
  }

  test("connected components collapse transitive duplicate chains") {
    import spark.implicits._
    // chain 1-2-3-4 (consecutive pairs only), separate pair 10-11, isolated 99
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L), "chain collapses to min id")
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(!cc.contains(99L), "isolated docs are not in the pair graph")
    CacheRegistry.releaseAll()
  }

  test("dedup_keep_best keeps exactly the highest-quality member per cluster") {
    val out = graft.queries.ExtensionQueries.dedupKeepBest(spark, sf).collect()
    assert(out.nonEmpty)
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (compId, rows) =>
      val kept = rows.filter(_.getInt(3) == 1)
      assert(kept.length == 1, s"component $compId keeps ${kept.length} members")
      val best = rows.minBy(r => (-r.getDouble(2), r.getLong(0)))
      assert(kept.head.getLong(0) == best.getLong(0),
        s"component $compId kept ${kept.head.getLong(0)}, best is ${best.getLong(0)}")
    }
    assert(byComp.exists(_._2.length > 1),
      "corpus must contain at least one multi-doc cluster to exercise the argmax")
    CacheRegistry.releaseAll()
  }

  test("connected components label a 300-node chain exactly (pointer jumping)") {
    import spark.implicits._
    // a path graph of diameter 299: plain min-label propagation moves the
    // min ONE hop per round and would exit maxIter=20 with silently wrong
    // labels; the pointer-jumping step doubles the propagated radius per
    // round, so 20 rounds cover diameter ~2^19 and this must be exact.
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, stats) = Dedup.connectedComponentsWithStats(chain)
    val cc = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 300)
    assert((0L to 299L).forall(cc(_) == 0L),
      s"non-minimal labels: ${cc.filter(_._2 != 0L).take(5)}")
    assert(stats.converged, "pointer jumping must converge on a 299-diameter path")
    assert(stats.iterations <= 10, // ~log2(299) doubling rounds + confirm
      s"doubling should converge in O(log d) rounds, took ${stats.iterations}")
    CacheRegistry.releaseAll()
  }

  test("incremental connected components ≡ batch recompute across edge batches") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeded random graph sliced into 4 arrival batches — includes merges
    // of previously-separate components, fresh nodes joining old
    // components, and redundant intra-component edges
    val rnd = new scala.util.Random(42)
    val edges = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val batches = edges.grouped((edges.size + 3) / 4).toSeq
    var labels = Seq.empty[(Long, Long)].toDF("id", "label")
    var seen = Seq.empty[(Long, Long)]
    for (b <- batches) {
      seen ++= b
      val delta = Dedup.connectedComponentsIncrement(
        labels, b.toDF("id_a", "id_b"))
      val deltaMap = asMap(delta)
      // apply the delta the way a store would: delta wins per id
      labels = (asMap(labels) ++ deltaMap).toSeq.toDF("id", "label")
      assert(asMap(labels) == asMap(
        Dedup.connectedComponents(seen.toDF("id_a", "id_b"))),
        s"incremental labels diverge from batch recompute after ${seen.size} edges")
      CacheRegistry.releaseAll()
    }
    // a directed merge: two established components joined by one edge —
    // the delta must relabel every member of the losing component
    val merged = Dedup.connectedComponentsIncrement(
      Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "label"),
      Seq((2L, 11L)).toDF("id_a", "id_b"))
    assert(asMap(merged) == Map(10L -> 1L, 11L -> 1L),
      s"merge delta must cover exactly the losing component's members")
    CacheRegistry.releaseAll()
  }

  test("connected components surface a tested failure signal when budget runs out") {
    import spark.implicits._
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (_, stats) = Dedup.connectedComponentsWithStats(chain, maxIter = 2)
    assert(!stats.converged, "2 rounds cannot close a 299-diameter path")
    assert(stats.iterations == 2)
    CacheRegistry.releaseAll()
  }

  test("repetition stats flag duplicated content") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "spam spam spam spam")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .orderBy("doc_id")
      .select("dup_word_fraction", "top_bigram_fraction", "dup_trigram_fraction")
      .collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(0).getDouble(1) == 1.0 / 7)   // every bigram unique, 7 total
    assert(out(0).getDouble(2) == 0.0)
    assert(out(1).getDouble(0) == 0.75)      // 4 words, 1 distinct
    assert(out(1).getDouble(1) == 1.0)       // "spam spam" owns all 3 bigrams
    assert(out(1).getDouble(2) == 0.5)       // 2 trigrams, 1 distinct
  }

  test("PII redaction replaces emails, IPs, and long digit runs") {
    import spark.implicits._
    val df = Seq((1L,
      "contact bob.smith+x@mail.example.org from 10.0.42.7 ref 12345678 order 42"))
      .toDF("doc_id", "text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).collect().head.getString(0)
    assert(out == "contact <EMAIL> from <IP> ref <NUM> order 42")
    val counts = TextAnalysis.piiCounts(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .select("n_emails", "n_ips", "n_longnums").collect().head
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((1L, 1L, 1L)))
  }

  test("exact dedup groups identical texts") {
    import spark.implicits._
    val dups = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(dups, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((1L, 2L), (3L, 1L)))
  }

  test("multimodal stub plumbing is deterministic and typed") {
    import spark.implicits._
    val docs = Seq((7L, "hello world", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.ingest(spark, docs)).collect()
    assert(feats.length == 1)
    val f = feats.head
    assert(f.n_bytes == 11L && f.width == 12 && f.height == 12 && f.n_frames == 12)
    assert(f.checksum_hex == "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }

  test("ivfPrepare + ivfTopKPrepared equals monolithic ivfTopK, including via parquet") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val quant = Similarity.trainCentroids(e, nlist = 16, trainIters = 2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "rank", "sim")
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    val mono = canon(Similarity.ivfTopK(q, e, k = 3, nlist = 16,
      pretrained = Some(quant)))
    val lists = Similarity.ivfPrepare(e, quant)
    assert(canon(Similarity.ivfTopKPrepared(lists, q, k = 3, quant)) == mono)
    // serve from a PERSISTED index (the streaming/serving path)
    val path = java.nio.file.Files
      .createTempDirectory("ivf-lists").toString + "/lists"
    lists.write.parquet(path)
    val reloaded = spark.read.parquet(path)
    assert(canon(Similarity.ivfTopKPrepared(reloaded, q, k = 3, quant)) == mono)
  }

  test("lshPrepare/saveLshIndex + lshTopKPrepared equals monolithic lshTopK") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "rank", "sim")
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    // the gate geometry: AUTO bucket depth, AUTO probes
    val mono = canon(Similarity.lshTopK(q, e, k = 3,
      tables = 8, bitsPerTable = 0, maxBucket = 64, probes = 0))
    // in-memory prepared
    val idx = Similarity.lshPrepare(e, tables = 8, bitsPerTable = 0,
      maxBucket = 64)
    assert(canon(Similarity.lshTopKPrepared(idx, q, e, k = 3)) == mono)
    // persisted + reloaded (the standing-artifact serve path): same
    // frozen geometry, same AUTO probe budget from the stored count
    val path = java.nio.file.Files
      .createTempDirectory("lsh-index").toString + "/idx"
    assert(!Similarity.lshIndexExists(spark, path))
    Similarity.saveLshIndex(spark, path, e, tables = 8, bitsPerTable = 0,
      maxBucket = 64)
    assert(Similarity.lshIndexExists(spark, path))
    val loaded = Similarity.loadLshIndex(spark, path)
    assert(loaded.tables == 8 && loaded.maxBucket == 64 &&
      loaded.bitsPerTable == idx.bitsPerTable &&
      loaded.nCorpus == idx.nCorpus)
    assert(canon(Similarity.lshTopKPrepared(loaded, q, e, k = 3)) == mono)
    // a pinned explicit probe width also matches the monolithic call
    assert(canon(Similarity.lshTopKPrepared(loaded, q, e, k = 3, probes = 4)) ==
      canon(Similarity.lshTopK(q, e, k = 3, tables = 8, bitsPerTable = 0,
        maxBucket = 64, probes = 4)))
  }

  /** The r12 artifact-replay contract: each geometry-split path
    * (FromGeom/From) must equal its monolithic operator BIT-FOR-BIT —
    * the driver's DuckDB oracles replay the persisted geometry frames,
    * so any drift between the split and monolithic paths would
    * hash-fail the gate. Frames are round-tripped through parquet (the
    * production artifact path), exactly as the oracle reads them. */
  test("geometry-replay splits equal their monolithic operators via parquet") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val quant = Similarity.trainCentroids(e, nlist = 16, trainIters = 2)
    val root = java.nio.file.Files.createTempDirectory("geom-replay").toString
    def rt(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.parquet(s"$root/$name"); spark.read.parquet(s"$root/$name")
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq

    // IVF
    val ivfMono = canon(Similarity.ivfTopK(q, e, k = 5, nlist = 16,
      nprobe = 12, pretrained = Some(quant)))
    val ivfF = Similarity.ivfGeomFrames(q, e, quant, nprobe = 12)
    assert(canon(Similarity.ivfTopKFromGeom(rt(ivfF.lists, "il"),
      rt(ivfF.probes, "ip"), q, e, k = 5)) == ivfMono)

    // IVFQ (int-array code twin must match the binary codes' scores)
    val ivfqMono = canon(Similarity.ivfTopKQuantized(q, e, k = 5, nlist = 16,
      nprobe = 12, pretrained = Some(quant)))
    val ivfqF = Similarity.ivfqGeomFrames(q, e, quant, nprobe = 12)
    assert(canon(Similarity.ivfqTopKFromGeom(rt(ivfqF.lists, "ql"),
      rt(ivfqF.probes, "qp"), q, e, k = 5)) == ivfqMono)

    // cells dedup (multi-probe)
    val cellsMono = canon(Similarity.cosineDedupCells(e, threshold = 0.4,
      probeCells = 4, pretrained = Some(quant)))
    val slim = Similarity.cellProbesFrame(e, quant, probeCells = 4)
    assert(canon(Similarity.cosineDedupCellsFrom(rt(slim, "cells"), e,
      threshold = 0.4, maxSpan = 256 * 4)) == cellsMono)

    // semantic dedup manifest
    val semMono = canon(Similarity.semanticDedup(e, threshold = 0.4,
      pretrained = Some(quant)))
    val assigned = Similarity.semanticAssignFrame(e, quant)
    assert(canon(Similarity.semanticDedupFrom(rt(assigned, "assign"), e,
      threshold = 0.4, maxCell = 256)) == semMono)
    CacheRegistry.releaseAll()
  }

  test("bipartite minhash geometry replay equals minhashLshAgainst via parquet") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val index = docs.filter(col("doc_id") < 400)
    val incoming = docs.filter(col("doc_id") >= 400)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    val mono = canon(Dedup.minhashLshAgainst(index, incoming, "doc_id", "text",
      bands = 16, rowsPerBand = 4, shingleWidth = 3, threshold = 0.5))
    val idx = Dedup.minhashPrepare(index, "doc_id", "text")
    val inc = Dedup.minhashPrepare(incoming, "doc_id", "text")
    val f = Dedup.minhashBipartiteFrames(idx, inc,
      bands = 16, rowsPerBand = 4, maxBucket = 64)
    val root = java.nio.file.Files.createTempDirectory("bip-replay").toString
    def rt(df: org.apache.spark.sql.DataFrame, name: String) = {
      df.write.parquet(s"$root/$name"); spark.read.parquet(s"$root/$name")
    }
    assert(canon(Dedup.minhashVerifyFrom(rt(f.idxBlocks, "ib"), rt(f.probes, "pr"),
      idx, inc, threshold = 0.5)) == mono)
    CacheRegistry.releaseAll()
  }

  test("pqAppend extends a persisted PQ store identically to a one-shot build") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val base = e.filter(col("vec_id") >= 20)
    val quant = Similarity.trainCentroids(base, nlist = 8, trainIters = 2)
    val cb = Similarity.trainPqCodebooks(base, m = 8, ksub = 16, trainIters = 1)
    val root = java.nio.file.Files.createTempDirectory("pq-append").toString
    val listsPath = s"$root/lists"
    Similarity.pqPrepare(base, quant, cb).write.parquet(listsPath)
    Artifacts.saveCentroids(spark, s"$root/cent", quant._1, quant._2)
    Artifacts.savePqCodebooks(spark, s"$root/cb", cb)
    val loadedQuant = Artifacts.loadCentroids(spark, s"$root/cent")
    val loadedCb = Artifacts.loadPqCodebooks(spark, s"$root/cb")
    Similarity.pqAppend(listsPath, e.filter(col("vec_id") < 20),
      loadedQuant, loadedCb)
    val appended = spark.read.parquet(listsPath)
    // the appended store is row-identical to encoding everything at once:
    // frozen quantizer + frozen codebooks => encoding is a pure function
    val oneShot = Similarity.pqPrepare(e, quant, cb)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(1), r.getLong(0), r.getSeq[Int](2).mkString(","), r.getDouble(3))
    assert(appended.select("cent_id", "cand_id", "codes", "rn")
        .collect().map(key).sorted.toSeq
      == oneShot.select("cent_id", "cand_id", "codes", "rn")
        .collect().map(key).sorted.toSeq,
      "append under frozen models must equal the one-shot build")
    CacheRegistry.releaseAll()
  }

  test("pqTopKFromGeom without the probe broadcast is row-identical") {
    // the escape hatch for large offline query batches (the LUT makes
    // PQ probes ~32 KB/row at production m·ksub — too big to broadcast
    // past ~100k queries): AQE-picked join must change the PLAN only
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 8)
    val quant = Similarity.trainCentroids(e, nlist = 8, trainIters = 2)
    val cb = Similarity.trainPqCodebooks(e, m = 8, ksub = 16, trainIters = 1)
    val f = Similarity.pqGeomFrames(queries, e, quant, cb, nprobe = 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val bcast = Similarity.pqTopKFromGeom(f.lists, f.probes, queries, e, k = 5)
      .collect().map(key).sorted.toSeq
    val shuffled = Similarity.pqTopKFromGeom(f.lists, f.probes, queries, e,
        k = 5, broadcastProbes = false)
      .collect().map(key).sorted.toSeq
    assert(bcast.nonEmpty && bcast == shuffled,
      "broadcast flag must not change emitted rows")
    CacheRegistry.releaseAll()
  }

  test("ivfAppend extends a round-tripped index; recall holds without retrain") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    // the store is built BEFORE the new batch arrives: quantizer trained
    // and lists prepared on the base corpus only, both round-tripped
    // through parquet (the production artifact path)
    val base = e.filter(col("vec_id") >= 20)
    val quant = Similarity.trainCentroids(base, nlist = 16, trainIters = 2)
    val root = java.nio.file.Files
      .createTempDirectory("ivf-append").toString
    val listsPath = s"$root/lists"
    Similarity.ivfPrepare(base, quant).write.parquet(listsPath)
    Artifacts.saveCentroids(spark, s"$root/centroids", quant._1, quant._2)
    val loadedQuant = Artifacts.loadCentroids(spark, s"$root/centroids")
    // today's crawl: vectors 0..19, appended under the frozen quantizer
    val batch = e.filter(col("vec_id") < 20)
    Similarity.ivfAppend(listsPath, batch, loadedQuant)
    val lists = spark.read.parquet(listsPath)
    assert(lists.select("cand_id").distinct().count() == e.count(),
      "appended store must cover base + batch")
    // planted near-dup queries of the APPENDED vectors must be served
    // from the extended lists at the planted-twin recall bar — the
    // appended rows are fully live index members, not second-class
    val q = batch.select(($"vec_id" + 10000).as("vec_id"),
      transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
    val hits = Similarity.ivfTopKPrepared(lists, q, k = 1, loadedQuant)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    val found = (0L until 20L).count(i => hits.get(i + 10000).contains(i))
    assert(found >= 15, s"appended-index IVF found only $found/20 planted queries")
    // and a same-distribution batch does NOT trip the drift probe
    val report = Similarity.ivfDriftProbe(spark.read.parquet(listsPath),
      batch, loadedQuant)
    assert(!report.drifted,
      s"same-distribution batch must not signal retrain: $report")
    assert(report.batch_n == 20 && report.index_n == e.count(),
      s"probe must see both sides: $report")
  }

  test("ivfDriftProbe fires on a shifted distribution") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val quant = Similarity.trainCentroids(e, nlist = 16, trainIters = 2)
    val lists = Similarity.ivfPrepare(e, quant)
    // a batch from a DIFFERENT mode: constant offset dominates every
    // dimension, so the whole batch collapses toward the one centroid
    // nearest the new mass and sits far from every trained centroid
    val shifted = e.filter(col("vec_id") < 100)
      .select(($"vec_id" + 50000).as("vec_id"),
        transform($"embedding", v => v * lit(0.05f) + lit(5.0f)).as("embedding"))
    val report = Similarity.ivfDriftProbe(lists, shifted, quant)
    assert(report.drifted, s"shifted batch must signal retrain: $report")
    assert(report.hot_share_batch > report.hot_share_index ||
      report.sim_drop > 0.05 || report.reassign_fraction > 0.2,
      s"at least one symptom must be material: $report")
  }

  test("centroid artifact round-trips bit-exactly and serves ivfTopK unchanged") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val trained = Similarity.trainCentroids(e, nlist = 16, trainIters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft-artifacts").toString + "/centroids-16"
    assert(!Artifacts.exists(spark, path))
    Artifacts.saveCentroids(spark, path, trained._1, trained._2)
    assert(Artifacts.exists(spark, path))
    val loaded = Artifacts.loadCentroids(spark, path)
    // bit-exact, ORDER INCLUDED — centroid index is the cell id
    assert(loaded._1.toSeq == trained._1.toSeq)
    assert(loaded._2.map(_.toSeq).toSeq == trained._2.map(_.toSeq).toSeq)
    def serve(p: (Array[Long], Array[Array[Float]])) =
      Similarity.ivfTopK(q, e, k = 3, nlist = 16, pretrained = Some(p))
        .select("query_id", "cand_id", "rank", "sim")
        .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(serve(loaded) == serve(trained),
      "a loaded quantizer must serve the same results as the in-memory one")
  }

  test("simhash bucket width derivation: smallest w in [16,32] with n <= occ·2^w") {
    assert(Dedup.simhashBucketBits(0L) == 16)
    assert(Dedup.simhashBucketBits(500L) == 16)
    assert(Dedup.simhashBucketBits(8L << 16) == 16)       // n = occ·2^16 exactly
    assert(Dedup.simhashBucketBits((8L << 16) + 1) == 17) // one doc past the boundary
    assert(Dedup.simhashBucketBits(5000000L) == 20)       // the sf100 rung
    assert(Dedup.simhashBucketBits(Long.MaxValue) == 32)  // capped
    for (n <- Seq(1L, 7L, 9L, 65535L, 524287L, 524289L, 1048576L,
        123456789L, 34359738368L)) {
      val w = Dedup.simhashBucketBits(n)
      assert(w >= 16 && w <= 32)
      assert(w == 32 || n <= 8L * (1L << w), s"n=$n w=$w occupancy target violated")
      assert(w == 16 || n > 8L * (1L << (w - 1)), s"n=$n w=$w not minimal")
    }
  }

  test("simhash wide bands (forced scale-regime width) keep precision and catch dups") {
    // w=20 is what a 5M-doc corpus derives; identical texts have identical
    // simhashes, hence identical buckets at ANY width
    for (w <- Seq(20, 32)) {
      val pairs = Dedup.simhashDups(planted, "doc_id", "text",
          maxHamming = 3, maxBucket = 64, bucketBits = w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 1L)), s"w=$w must link the exact dup")
      assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
        s"w=$w linked the unrelated doc")
    }
    // small corpora derive w=16: the default path must equal the
    // historical fixed banding exactly
    val derived = Dedup.simhashDups(planted, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val forced16 = Dedup.simhashDups(planted, "doc_id", "text",
        maxHamming = 3, maxBucket = 64, bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(derived == forced16)
  }

  test("ngram jaccard with >32-bit doc ids equals the small-id result (surrogate path)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      Dedup.ngramJaccard(d, "doc_id", "text", n = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val small = pairs(docs) // ids < 2^31: ids are their own surrogates
    assert(small.nonEmpty)
    val shift = 5000000000000L // sf100-style chained offsets force the dense rank
    val big = pairs(docs.withColumn("doc_id", col("doc_id") + shift))
      .map { case (a, b, j) => (a - shift, b - shift, j) }
    assert(big == small)
  }

  test("ngramJaccardAcross equals filter-after-the-fact in both id regimes") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val split = 400L
    def cross(d: org.apache.spark.sql.DataFrame, sp: Long): Set[(Long, Long, Double)] =
      Dedup.ngramJaccardAcross(d, "doc_id", "text", split = sp,
          n = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .filter(col("id_a") < split && col("id_b") >= split)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)
    assert(cross(docs, split) == expected) // direct regime: ids < 2^31
    val shift = 5000000000000L // forces the dense-rank surrogate path
    val big = cross(docs.withColumn("doc_id", col("doc_id") + shift), split + shift)
      .map { case (a, b, j) => (a - shift, b - shift, j) }
    assert(big == expected) // surrogate regime: id threshold → rank space
  }

  test("ngram containment catches a quoted short doc that jaccard misses") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")      // 10 3-grams
    val filler = (1 to 120).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (0L, quote),                       // the short original
      (1L, s"$filler $quote"),           // long page quoting it verbatim
      (2L, (1 to 50).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(docs, "doc_id", "text",
        n = 3, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // all 10 of doc 0's 3-grams appear in doc 1 -> containment 1.0
    assert(cont.keySet == Set((0L, 1L)) && cont((0L, 1L)) == 1.0, s"$cont")
    // jaccard at the same corpus misses it: union is filler-dominated
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, s"jaccard unexpectedly paired: ${jac.toSeq}")
  }

  test("corpus dup profile counts exact clusters and span token mass per source") {
    import spark.implicits._
    import graft.queries.ExtensionQueries
    val a30 = (1 to 30).map(i => s"a$i").mkString(" ")
    val b22 = (1 to 22).map(i => s"b$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("dupprof").toString
    Seq(
      (0L, a30, "srcA"), (1L, a30, "srcA"),               // exact pair
      (2L, (1 to 25).map(i => s"c$i").mkString(" "), "srcA"),
      (3L, s"p1 p2 p3 p4 p5 $b22", "srcB"),                // shifted copies
      (4L, s"$b22 q1 q2 q3 q4", "srcB")
    ).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val prof = ExtensionQueries.corpusDupProfile(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // srcA: 3 docs, the identical pair is exact-dup AND all-span-dup
    assert(prof("srcA") == ((3L, 2L, 2L, 60L, 85L)), s"$prof")
    // srcB: shifted 22-token block -> both docs span-flagged, no exact
    assert(prof("srcB") == ((2L, 0L, 2L, 44L, 53L)), s"$prof")
  }

  test("dupSpans merges shifted copies into maximal spans and skips short docs") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i").mkString(" ")  // 60 unique tokens
    val unique1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val unique2 = (1 to 25).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (0L, s"$unique1 $words"),        // block at offsets [30, 90)
      (1L, s"$unique2 $words"),        // same block shifted: [25, 85)
      (2L, (1 to 19).map(i => s"c$i").mkString(" ")), // < 20 tokens: no shingles
      (3L, (1 to 40).map(i => s"d$i").mkString(" "))  // unique: no dups
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, "doc_id", "text", spanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every offset whose 20-token window lies inside the shared 60-token
    // block is duplicated; consecutive offsets merge into ONE span
    // covering exactly the block: doc 0 [30, 90), doc 1 [25, 85)
    assert(spans == Set((0L, 30L, 90L), (1L, 25L, 85L)))
  }

  test("dupSpans catches within-document self-repetition") {
    import spark.implicits._
    val block = (1 to 22).map(i => s"r$i").mkString(" ")
    val mid = (1 to 10).map(i => s"m$i").mkString(" ")
    // one doc repeating its own 22-token block: [0,22) and [32,54)
    val docs = Seq((7L, s"$block $mid $block")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, "doc_id", "text", spanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((7L, 0L, 22L), (7L, 32L, 54L)))
  }

  test("stripDupSpans removes every duplicated span, keeps unique text verbatim") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"w$i").mkString(" ")
    val unique1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val unique2 = (1 to 25).map(i => s"b$i").mkString(" ")
    val block = (1 to 22).map(i => s"r$i").mkString(" ")
    val mid = (1 to 10).map(i => s"m$i").mkString(" ")
    val docs = Seq(
      (0L, s"$unique1 $words"),
      (1L, s"$unique2 $words"),
      (2L, (1 to 40).map(i => s"d$i").mkString(" ")), // unique: untouched
      (3L, s"$block $mid $block")                     // self-repeat
    ).toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(docs, "doc_id", "text", spanTokens = 20)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((unique1, 90L, 60L)))
    assert(out(1L) == ((unique2, 85L, 60L)))
    assert(out(2L) == (((1 to 40).map(i => s"d$i").mkString(" "), 40L, 0L)))
    assert(out(3L) == ((mid, 54L, 44L)))
  }

  test("dupSpans/stripDupSpans match a brute-force reference on random corpora") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val L = 5
    // tiny alphabet so rolling windows collide often (the interesting regime)
    val docGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 5).map(i => s"t$i")).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

    def refSpans(corpus: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
      val sh = for {
        (id, text) <- corpus
        w = text.split(" ", -1).toSeq
        if w.length >= L
        i <- 0 to w.length - L
      } yield (id, i, w.slice(i, i + L).mkString(" "))
      val counts = sh.groupBy(_._3).view.mapValues(_.size).toMap
      sh.filter(s => counts(s._3) > 1).groupBy(_._1).flatMap { case (id, offs) =>
        val sorted = offs.map(_._2).sorted
        sorted.foldLeft(List.empty[(Int, Int)]) {
          case (acc, i) if acc.nonEmpty && i - acc.head._2 <= L =>
            (acc.head._1, i) :: acc.tail    // extend the open island
          case (acc, i) => (i, i) :: acc    // open a new island
        }.map { case (s, e) => (id, s.toLong, (e + L).toLong) }
      }.toSet
    }

    val prop = Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val expected = refSpans(corpus)
      val got = Dedup.dupSpans(df, "doc_id", "text", spanTokens = L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val stripped = Dedup.stripDupSpans(df, "doc_id", "text", spanTokens = L)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
      val stripOk = corpus.forall { case (id, text) =>
        val w = text.split(" ", -1).toSeq
        val covered = expected.collect {
          case (i, s, e) if i == id => (s until e) }.flatten.toSet
        val keep = w.zipWithIndex.collect {
          case (t, j) if !covered(j.toLong) => t }
        stripped(id) == ((keep.mkString(" "), covered.size.toLong))
      }
      // incremental ≡ batch restricted to incoming ids (counts add)
      val split = corpus.size / 2
      val standing = df.filter(col("doc_id") < split)
      val incoming = df.filter(col("doc_id") >= split)
      val inc = Dedup.dupSpansAgainst(
          Dedup.dupSpanIndex(standing, "doc_id", "text", spanTokens = L),
          incoming, "doc_id", "text", spanTokens = L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val incOk = inc == expected.filter(_._1 >= split)
      got == expected && stripOk && incOk
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("dupSpansAgainst flags an incoming copy of a standing singleton") {
    import spark.implicits._
    val block = (1 to 25).map(i => s"s$i").mkString(" ")
    val standing = Seq(
      (0L, s"$block"),                                    // single copy
      (1L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, s"${(1 to 6).map(i => s"p$i").mkString(" ")} $block"), // copy at [6, 31)
      (11L, (1 to 24).map(i => s"q$i").mkString(" "))     // novel: no spans
    ).toDF("doc_id", "text")
    val idx = Dedup.dupSpanIndex(standing, "doc_id", "text", spanTokens = 20)
    val spans = Dedup.dupSpansAgainst(idx, incoming, "doc_id", "text",
        spanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((10L, 6L, 31L)))
  }

  test("hybrid RRF ranks a both-legs candidate above single-leg candidates") {
    import spark.implicits._
    // query doc 0; cand 1 = lexical twin with an unrelated embedding,
    // cand 2 = vector twin with unrelated text, cand 3 = decent in BOTH
    val docs = Seq(
      (0L, "apple banana cherry date elder fig"),
      (1L, "apple banana cherry date elder grape"),
      (2L, "umbrella violet walnut xylophone yarn zebra"),
      (3L, "apple banana cherry kiwi lemon mango"),
      (4L, "quince raspberry strawberry tomato ugli vanilla")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.8f, 0.2f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // legK=2: lexical top-2 = {1, 3}, vector top-2 = {2, 3}
    val top = Relevance.hybridRrfTopK(docs, emb, "doc_id", "text",
        "vec_id", "embedding", nQueries = 1, legK = 2, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    val byCand = top.map(t => t._1 -> t).toMap
    assert(byCand.keySet == Set(1L, 2L, 3L), s"got ${top.toSeq}")
    // cand 3 retrieved by both legs (1/62 + 1/62) beats either
    // single-leg rank-1 (1/61) -> fused rank 1
    assert(byCand(3L)._4 == 1L, s"both-legs candidate must win: ${top.toSeq}")
    assert(byCand(3L)._2 > 0L && byCand(3L)._3 > 0L)
    // single-leg candidates carry rank 0 on the missing leg; the
    // 1/61 = 1/61 tie breaks by cand_id
    assert(byCand(1L) == ((1L, 1L, 0L, 2L))) // lexical only
    assert(byCand(2L) == ((2L, 0L, 1L, 3L))) // vector only
  }

  test("rrfFuse generalizes to three legs with rank-0 absences and stable ties") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "cand_id", "rank")
    val b = Seq((0L, 11L, 1L), (0L, 12L, 2L)).toDF("query_id", "cand_id", "rank")
    val c = Seq((0L, 11L, 3L), (0L, 13L, 1L)).toDF("query_id", "cand_id", "rank")
    val out = Relevance.rrfFuse(Seq("a" -> a, "b" -> b, "c" -> c), k = 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
      .sortBy(_._5)
    // cand 11 rides three terms (1/62 + 1/61 + 1/63) -> rank 1; the
    // single-leg rank-1s (cand 10 in a, cand 13 in c) tie at 1/61 and
    // break by cand_id; cand 12 (1/62) is last
    assert(out.toSeq == Seq(
      (11L, 2L, 1L, 3L, 1L),
      (10L, 1L, 0L, 0L, 2L),
      (13L, 0L, 0L, 1L, 3L),
      (12L, 0L, 2L, 0L, 4L)))
  }

  test("hybrid RRF df-cap drops boilerplate tokens from the lexical leg") {
    import spark.implicits._
    // 'the' appears in every doc; with maxDocFreq=2 it cannot generate
    // candidates, so doc 2 (sharing ONLY 'the' with the query) is absent
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "the quick brown bear"),
      (2L, "the zebra yak wolf"),
      (3L, "the quick red fox")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val lexCands = Relevance.hybridRrfTopK(docs, emb, "doc_id", "text",
        "vec_id", "embedding", nQueries = 1, legK = 4, k = 4, maxDocFreq = 2)
      .filter(col("lex_rank") > 0)
      .collect().map(_.getLong(1)).toSet
    assert(lexCands == Set(1L, 3L), s"got $lexCands")
  }
}
