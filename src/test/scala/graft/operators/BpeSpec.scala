package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer + encoder contract tests. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("property: encode reconstructs and stays vocab-closed for ANY merges") {
    // random words over a tiny alphabet (so merges actually apply) and
    // random merge tables, including nonsensical/overlapping ones: the
    // encoder must never lose or invent characters, never emit an empty
    // piece, and every multi-codepoint piece must be a merge product
    val word = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "𝄞")).map(_.mkString))
    val sym = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "𝄞")).map(_.mkString))
    val mergesGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(sym, sym)))
    checkProp(Prop.forAll(word, mergesGen) { (w, merges) =>
      val ranks = merges.distinct.zipWithIndex.toMap
      val pieces = Bpe.encodeWord(w, ranks)
      val products = merges.map { case (a, b) => a + b }.toSet
      pieces.mkString("") == w &&
        pieces.forall(_.nonEmpty) &&
        pieces.forall(p => Bpe.codepoints(p).length == 1 || products.contains(p))
    })
  }

  test("encodeWord replays merges greedily by rank, leftmost on ties") {
    val ranks = Seq(("l", "o"), ("lo", "w"), ("e", "r")).zipWithIndex.toMap
    assert(Bpe.encodeWord("lower", ranks) == Seq("low", "er"))
    assert(Bpe.encodeWord("loser", ranks) == Seq("lo", "s", "er"))
    assert(Bpe.encodeWord("low", ranks) == Seq("low"))
    assert(Bpe.encodeWord("xyz", ranks) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", ranks) == Seq())
    // overlapping occurrences merge left-to-right, non-overlapping
    val aa = Map(("a", "a") -> 0)
    assert(Bpe.encodeWord("aaa", aa) == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", aa) == Seq("aa", "aa"))
  }

  test("codepoint discipline: astral characters never tear") {
    val cps = Bpe.codepoints("a𝄞b") // a 𝄞 b
    assert(cps == Vector("a", "𝄞", "b"))
    assert(Bpe.encodeWord("a𝄞b", Map.empty).length == 3)
  }

  test("training learns the most frequent pair first, hand-checked") {
    import spark.implicits._
    // "ab" appears in 5 words (weighted 5+3=8 with repeats), "bc" in 3
    val docs = Seq("abx abx abx aby aby", "bcz bcz bcz").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 2)
    assert(merges.head == (("a", "b")), s"got $merges")
    // second merge: with 'ab' fused, the next best weighted pair
    assert(merges.length == 2)
  }

  test("training stops when no pair reaches minPairCount") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text") // every pair appears once
    assert(Bpe.train(docs, "text", numMerges = 10).isEmpty)
  }

  test("encode reproduces the training segmentation on the real corpus") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 16)
    assert(merges.nonEmpty)
    val ranks = merges.zipWithIndex.toMap
    // reference segmentation: apply merges in rank order (the trainer's
    // exact discipline) — encodeWord's greedy replay must agree on EVERY
    // distinct corpus word
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    words.foreach { w =>
      val ref = merges.foldLeft(Bpe.codepoints(w): Seq[String]) {
        case (segs, (a, b)) => Bpe.mergeOnce(segs, a, b)
      }
      val got = Bpe.encodeWord(w, ranks)
      assert(got == ref, s"word '$w': greedy $got != rank-replay $ref")
      assert(got.mkString("") == w, s"reconstruction failed for '$w'")
    }
  }

  /** In-memory ONE-merge-at-a-time reference trainer — the textbook
    * algorithm, recount after every merge — for the batched-vs-sequential
    * differential. Total order on ties matches the trainer: (cnt desc, a, b). */
  private def trainSequentialReference(wordFreq: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, n) => Bpe.codepoints(w) -> n }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (segs, n) =>
        var i = 0
        while (i < segs.length - 1) {
          counts((segs(i), segs(i + 1))) = counts.getOrElse((segs(i), segs(i + 1)), 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minPairCount) stop = true
        else {
          merges += ((a, b))
          words = words.map { case (segs, n) => Bpe.mergeOnce(segs, a, b).toVector -> n }
        }
      }
    }
    merges.toSeq
  }

  test("batched rounds learn EXACTLY the sequential merge sequence (real corpus)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wordFreq = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq
    val ref = trainSequentialReference(wordFreq, numMerges = 24)
    val (batched, rounds) = Bpe.trainWithStats(docs, "text", numMerges = 24, maxBatch = 64)
    assert(batched == ref,
      s"batched (rounds=$rounds) diverged from sequential:\n$batched\nvs\n$ref")
    info(s"24 merges learned in $rounds driver rounds")
    assert(rounds < 24, s"batching never batched: $rounds rounds for 24 merges")
    // maxBatch=1 degenerates to the old one-merge-per-round trainer
    assert(Bpe.train(docs, "text", numMerges = 8, maxBatch = 1) == ref.take(8))
  }

  test("disjoint-alphabet corpus learns many merges in one round") {
    import spark.implicits._
    val docs = Seq("ab ab ab ab ab cd cd cd cd ef ef ef").toDF("text")
    val (merges, rounds) = Bpe.trainWithStats(docs, "text", numMerges = 3)
    assert(merges == Seq(("a", "b"), ("c", "d"), ("e", "f")))
    assert(rounds == 1, s"expected one batched round, took $rounds")
  }

  test("bpeEncode expression flattens per-word pieces in order") {
    import spark.implicits._
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = Seq("low lower low").toDF("text")
      .select(graft.functions.TextExpressions.bpeEncode(col("text"), merges).as("p"))
      .as[Seq[String]].head()
    assert(out == Seq("low", "low", "e", "r", "low"))
    // null text -> null array; empty text -> empty array
    val nulls = Seq[Option[String]](None, Some("")).toDF("text")
      .select(graft.functions.TextExpressions.bpeEncode(col("text"), merges).as("p"))
      .collect()
    assert(nulls(0).isNullAt(0) && nulls(1).getSeq[String](0).isEmpty)
  }

  test("merge-table artifact round-trips in rank order and encodes unchanged") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val trained = Bpe.train(docs, "text", numMerges = 24)
    val path = java.nio.file.Files
      .createTempDirectory("graft-artifacts").toString + "/bpe-24"
    Artifacts.saveMerges(spark, path, trained)
    assert(Artifacts.exists(spark, path))
    val loaded = Artifacts.loadMerges(spark, path)
    // exact sequence — RANK is the encoder's merge priority
    assert(loaded == trained)
    def encode(merges: Seq[(String, String)]) =
      docs.limit(50).select(col("doc_id"),
          graft.functions.TextExpressions.bpeEncode(col("text"), merges).as("p"))
        .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(encode(loaded) == encode(trained),
      "a loaded merge table must encode identically to the trained one")
  }
}
