package graft.operators

import graft.SparkSpec
import graft.tools.ScaleUp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's `*_recall` rows gate the 0.9 floors at sf0.01 (n=500) —
  * but recall of every banded/celled candidate scheme is scale-dependent
  * (bucket depth, guard activation, cell occupancy all move with n).
  * This spec re-asserts each floor ONE ORDER UP, on a 10× [[ScaleUp]]
  * corpus (n=5000, constant duplicate/similarity density by the
  * ScaleUpSpec invariants), each family tested in its contracted regime:
  * true top-k for ANN, exact-twin pair recall for MinHash, planted
  * near-identical twins for the sparse-regime embedding dedup. A
  * geometry tuned to the gate corpus that decays with n (the pre-round-8
  * fixed 16×3 ANN code measured 0.96 at n=500 but 0.22 at n=20k) now
  * fails CI, not just the builder's out-of-band probe. */
class ScaleRecallSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.01"
  private val Copies = 10

  private lazy val emb10: DataFrame = {
    val e = ScaleUp.scaleTable(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embeddings", Copies)
      .persist()
    e.count()
    e
  }
  private lazy val docs10: DataFrame = {
    val d = ScaleUp.scaleTable(
      spark.read.parquet(s"$sf/documents.parquet"), "documents", Copies)
      .persist()
    d.count()
    d
  }

  private def topPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ANN LSH (registered scale geometry) holds recall@5 >= 0.9 at 10x corpus") {
    val q = emb10.filter(col("vec_id") < 10)
    val truth = topPairs(Similarity.bruteForceTopK(q, emb10, 5))
    CacheRegistry.releaseAll()
    val got = topPairs(Similarity.lshTopK(q, emb10, 5,
      tables = 24, bitsPerTable = 0, probes = 32))
    CacheRegistry.releaseAll()
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, f"ANN LSH recall@5 at n=5000: $recall%.3f < 0.9")
  }

  private def plantedQueries(n: Int): DataFrame = {
    import spark.implicits._
    emb10.filter(col("vec_id") < n)
      .select(($"vec_id" + 10000000L).as("vec_id"),
        transform($"embedding", v => v * lit(1.01f) + lit(0.003f)).as("embedding"))
  }

  test("IVF ANN (auto nlist) finds planted twins at 10x corpus") {
    import spark.implicits._
    val nlist = Similarity.autoNlist(emb10.count())
    val hits = Similarity.ivfTopK(plantedQueries(20), emb10, 1,
        nlist = nlist, nprobe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    CacheRegistry.releaseAll()
    val found = (0L until 20L).count(i => hits.get(i + 10000000L).contains(i))
    assert(found >= 18, s"IVF found source for only $found/20 planted twins at n=5000")
  }

  test("IVFq ANN (auto nlist, int8 first stage) finds planted twins at 10x corpus") {
    import spark.implicits._
    val nlist = Similarity.autoNlist(emb10.count())
    val hits = Similarity.ivfTopKQuantized(plantedQueries(20), emb10, 1,
        nlist = nlist, nprobe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    CacheRegistry.releaseAll()
    val found = (0L until 20L).count(i => hits.get(i + 10000000L).contains(i))
    assert(found >= 18, s"IVFq found source for only $found/20 planted twins at n=5000")
  }

  test("minhash LSH (registered banding) holds pair recall >= 0.9 vs exact jaccard at 10x corpus") {
    import spark.implicits._
    val exact = Dedup.ngramJaccard(docs10, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs10, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    assert(exact.nonEmpty, "scaled corpus lost its duplicate pairs — ScaleUp broke density")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, f"minhash recall at n=5000: $recall%.3f < 0.9 (${exact.size} exact pairs)")
  }

  test("embedding cells dedup (sparse regime) recovers planted twins at 10x corpus") {
    import spark.implicits._
    val twins = plantedQueries(100)
    val corpus = emb10.select("vec_id", "embedding").unionByName(twins)
    val pairs = Similarity.cosineDedupCells(corpus, threshold = 0.9, probeCells = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    val found = (0L until 100L).count(i =>
      pairs.contains((i, i + 10000000L)) || pairs.contains((i + 10000000L, i)))
    assert(found >= 90, s"cells dedup recovered only $found/100 planted twins at n=5100")
  }
}
