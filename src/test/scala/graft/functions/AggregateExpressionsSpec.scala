package graft.functions

import graft.SparkSpec
import graft.operators.{CacheRegistry, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for [[AggregateExpressions.CollectUpToLongs]] — the
  * bounded collect that enforces the inverted-index kernel's df cap
  * inside the pair-grouping aggregate (r22) — plus a differential
  * pinning the kernel's df-cap semantics against an independent
  * relational formulation (the pre-r21 anti-join + self-join shape). */
class AggregateExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def collected(rows: Seq[(Long, Long)], limit: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    rows.toDF("k", "v")
      .repartition(7) // spread groups over partitions so merge() runs
      .groupBy("k")
      .agg(AggregateExpressions.collectUpToLongs(col("v"), limit).as("lst"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("groups under the limit collect COMPLETE value sets") {
    val rows = for (k <- 0L until 10L; i <- 0L until k + 1) yield (k, k * 100 + i)
    val got = collected(rows, limit = 11)
    assert(got.keySet == (0L until 10L).toSet)
    for (k <- 0L until 10L)
      assert(got(k).sorted == (0L until k + 1).map(k * 100 + _),
        s"group $k incomplete: ${got(k).sorted}")
  }

  test("groups over the limit cap at exactly `limit` elements (the df>cap signal)") {
    val rows = (0L until 500L).map(i => (1L, i)) ++ (0L until 3L).map(i => (2L, i))
    val got = collected(rows, limit = 8)
    assert(got(1L).length == 8)                 // capped, never 500
    assert(got(1L).toSet.subsetOf((0L until 500L).toSet))
    assert(got(2L).sorted == Seq(0L, 1L, 2L))   // small group untouched
  }

  test("null values are skipped like collect_list") {
    import spark.implicits._
    val got = Seq((1L, Some(7L)), (1L, None), (1L, Some(9L)))
      .toDF("k", "v")
      .groupBy("k")
      .agg(AggregateExpressions.collectUpToLongs(col("v"), 10).as("lst"))
      .collect().map(r => r.getSeq[Long](1).sorted).head
    assert(got == Seq(7L, 9L))
  }

  /** Independent relational reference for the df-capped jaccard kernel:
    * explode distinct grams, compute df with a plain aggregate + join
    * (no broadcast hints, no packing), self-join on gram, count shared,
    * jaccard ≥ threshold. */
  private def referenceJaccard(docs: DataFrame, n: Int, threshold: Double,
                               maxDocFreq: Int): Set[(Long, Long, Double)] = {
    val g = docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), n).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), size(col("grams")).as("ng"),
        explode(col("grams")).as("g"))
    val ok = g.join(
      g.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq).select("g"), "g")
    val a = ok.select(col("g"), col("doc_id").as("id_a"), col("ng").as("na"))
    val b = ok.select(col("g"), col("doc_id").as("id_b"), col("ng").as("nb"))
    a.join(b, "g").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("ngramJaccard df cap equals the independent relational formulation " +
       "on a boilerplate-heavy corpus (cap exercised)") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"same$i").mkString(" ") // shared by ALL docs
    val docs = (0L until 40L).map { i =>
      val pairSeed = i / 2 // consecutive pairs share their unique tail
      (i, s"$boiler " + (1 to 10).map(j => s"u${pairSeed}_$j").mkString(" ") +
        s" tail${i % 2}_x tail${i % 2}_y")
    }.toDF("doc_id", "text")
    val cap = 5 // boilerplate grams (df=40) far above it; unique tails below
    val expected = referenceJaccard(docs, n = 3, threshold = 0.3, maxDocFreq = cap)
    assert(expected.nonEmpty, "fixture must produce pairs under the cap")
    val got = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, threshold = 0.3, maxDocFreq = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    CacheRegistry.releaseAll()
    assert(got == expected)
  }
}
