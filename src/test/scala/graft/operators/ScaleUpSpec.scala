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

  test("embedding copies rotate dimensions: exact within-copy isometry") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(4.0f, 3.0f, 2.0f, 1.0f))).toDF("vec_id", "embedding")
    val scaled = ScaleUp.scaleTable(emb, "embeddings", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(scaled(1L) == Seq(1.0f, 2.0f, 3.0f, 4.0f))
    assert(scaled(1L + 1000000000L) == Seq(2.0f, 3.0f, 4.0f, 1.0f),
      "copy 1 rotates by one dimension")
    assert(scaled(1L + 2000000000L) == Seq(3.0f, 4.0f, 1.0f, 2.0f))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // rotation is an isometry: within-copy cosines equal copy-0 cosines
    val c0 = cos(scaled(1L), scaled(2L))
    val c1 = cos(scaled(1L + 1000000000L), scaled(2L + 1000000000L))
    assert(math.abs(c0 - c1) < 1e-12)
  }

  test("embedding copies past dim negate instead of repeating (sf10 regression)") {
    import spark.implicits._
    // dim=4, 8 copies: copy 4 would be a BYTE-IDENTICAL repeat of copy 0
    // under mod-only rotation (cross-copy cosine 1.0 — fake duplicates);
    // the second dim-cycle must come back negated (anti-parallel, −1)
    val emb = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val scaled = ScaleUp.scaleTable(emb, "embeddings", 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(scaled.size == 8, "no copy may crash past the dim boundary")
    assert(scaled(1L + 4000000000L) == Seq(-1.0f, -2.0f, -3.0f, -4.0f),
      "copy dim is the negated identity rotation, not a repeat")
    assert(scaled(1L + 5000000000L) == Seq(-2.0f, -3.0f, -4.0f, -1.0f))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(math.abs(cos(scaled(1L), scaled(1L + 4000000000L)) + 1.0) < 1e-12,
      "the repeated rotation must be anti-parallel, never identical")
  }
}
