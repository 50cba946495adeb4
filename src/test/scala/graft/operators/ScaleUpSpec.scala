package graft.operators

import graft.SparkSpec
import graft.tools.ScaleUp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the scale-probe generator — the sf0.1→sf1 scaling
  * table in BASELINE.md is only as credible as these. */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("copy 0 is the identity; keys offset per copy; FKs stay consistent") {
    import spark.implicits._
    val orders = Seq((1L, 10L, "O"), (2L, 11L, "F")).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val customer = Seq((10L, "a"), (11L, "b")).toDF("c_custkey", "c_name")
    val so = ScaleUp.scaleTable(orders, "orders", 3)
    val sc = ScaleUp.scaleTable(customer, "customer", 3)
    assert(so.count() == 6 && sc.count() == 6)
    // copy 0 rows survive byte-identical
    assert(so.filter($"o_orderkey" === 1L && $"o_custkey" === 10L).count() == 1)
    // every order still finds exactly one customer — FK consistency
    val joined = so.join(sc, $"o_custkey" === $"c_custkey")
    assert(joined.count() == 6)
    // and copies never cross-join: each copy's orders match its own customers
    assert(joined.filter($"o_custkey" =!= $"c_custkey").count() == 0)
  }

  test("document copies are within-copy isomorphic and cross-copy disjoint") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val scaled = ScaleUp.scaleTable(docs, "documents", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scaled(1L) == "alpha beta gamma alpha", "copy 0 untouched")
    assert(scaled(1L + 1000000000L) == "alpha_1 beta_1 gamma_1 alpha_1",
      "copy k renames every token consistently")
    // isomorphism: copy-k token equality structure matches copy 0
    val t0 = scaled(1L).split(" ")
    val t1 = scaled(1L + 1000000000L).split(" ")
    assert(t0.indices.forall(i => t0.indices.forall(j =>
      (t0(i) == t0(j)) == (t1(i) == t1(j)))))
    // disjoint: no token shared across copies
    assert(scaled(1L).split(" ").toSet.intersect(
      scaled(1L + 1000000000L).split(" ").toSet).isEmpty)
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  test("embedding signed permutation: bit-exact isometry at 20 copies, " +
    "all shards mutually dissimilar (the old rotation cycled at 2×dim)") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    // two fixed vectors with a known angle, dim large enough that a
    // random signed permutation can't accidentally align shards
    val v1 = Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)
    val v2 = Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)
    val emb = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val copies = 20 // > dim: impossible under round-13 rotation×negation
    val scaled = ScaleUp.scaleTable(emb, "embeddings", copies)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(scaled.size == 2 * copies)
    assert(scaled(1L) == v1 && scaled(2L) == v2, "copy 0 untouched")
    val c0 = cos(v1, v2)
    for (k <- 0 until copies) {
      val off = k * 1000000000L
      val (a, b) = (scaled(1L + off), scaled(2L + off))
      // a signed permutation only reorders/negates components: the
      // multiset of elementwise PRODUCTS is bit-identical (signs
      // cancel pairwise), so the isometry is exact up to summation
      // order — far inside the 1e-12 contract
      assert(a.zip(b).map { case (x, y) => x * y }.sorted ==
        v1.zip(v2).map { case (x, y) => x * y }.sorted,
        s"copy $k must preserve the dot-product term multiset exactly")
      assert(math.abs(cos(a, b) - c0) < 1e-12,
        s"copy $k must preserve cosines to 1e-12")
      assert(a.map(_.abs).sorted == v1.map(_.abs).sorted,
        s"copy $k must be a signed permutation of the components")
    }
    // cross-copy: every pair of shards must be dissimilar — this is the
    // property whose absence past 2×dim copies blocked sf100 embeddings
    for (k <- 0 until copies; j <- (k + 1) until copies) {
      val c = cos(scaled(1L + k * 1000000000L), scaled(1L + j * 1000000000L))
      assert(math.abs(c) < 0.9, s"shards $k,$j too similar (cos=$c)")
    }
  }

  test("embedding transform chains across decades: two passes with " +
    "distinct offsets give pairwise-dissimilar composed shards") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(11)
    val v = Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)
    val emb = Seq((1L, v)).toDF("vec_id", "embedding")
    // pass 1 (sf0.1→sf1-style, offset 10⁹), pass 2 (sf1→sf10-style,
    // offset 10¹²) — the key-collision rule already forces distinct
    // offsets, and the transform seed rides the offset, so the 9
    // composed shards must all differ (round-13 rotations had
    // (k,j) ≡ (j,k) and (k,0) ≡ (0,k))
    val pass1 = ScaleUp.scaleTable(emb, "embeddings", 3)
    val pass2 = ScaleUp.scaleTable(pass1, "embeddings", 3, 1000000000000L)
    val shards = pass2.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(shards.size == 9)
    val ids = shards.keys.toSeq.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.size) {
      val c = cos(shards(ids(i)), shards(ids(j)))
      assert(math.abs(c) < 0.9,
        s"composed shards ${ids(i)},${ids(j)} too similar (cos=$c)")
    }
    // and every shard is still an exact isometric image of the original
    for (id <- ids)
      assert(shards(id).map(_.abs).sorted == v.map(_.abs).sorted)
  }
}
