package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quality scoring: hand-checked counts, bit-exact agreement
  * of the fixed-point mean-likelihood score with a plain-Scala reference
  * fold, backoff on held-out (unseen) transitions, the log-perplexity
  * twin within tolerance, and artifact save/load parity. */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Context/next transitions of order n (context = n-1 tokens joined
    * by a space), matching the operator's composite-key contract. */
  private def refTransitions(t: String, n: Int): Seq[(String, String)] = {
    val w = t.split(" ", -1)
    if (w.length < n) Seq.empty
    else (0 to w.length - n).map(i =>
      w.slice(i, i + n - 1).mkString(" ") -> w(i + n - 1))
  }

  /** Plain-Scala reference of the exact fixed-point score. */
  private def refScores(train: Seq[(Long, String)], score: Seq[(Long, String)],
                        k: Double = 1.0, n: Int = 2): Map[Long, (Long, Long, Double)] = {
    val trTrain = train.flatMap { case (_, t) => refTransitions(t, n) }
    val big = trTrain.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val ctx = trTrain.groupBy(_._1).map { case (p, xs) => p -> xs.size.toLong }
    val v = train.flatMap(_._2.split(" ", -1)).distinct.size.toDouble
    score.flatMap { case (id, t) =>
      val tr = refTransitions(t, n)
      if (tr.isEmpty) None
      else {
        val fxs = tr.map { bg =>
          val p = (big.getOrElse(bg, 0L).toDouble + k) /
            (ctx.getOrElse(bg._1, 0L).toDouble + k * v)
          math.floor(p * 1000000000.0 + 0.5).toLong
        }
        val sum = fxs.sum
        Some(id -> ((tr.size.toLong, sum,
          sum.toDouble / tr.size.toDouble / 1000000000.0)))
      }
    }.toMap
  }

  private val corpus = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the cat ate the fish",
    3L -> "dogs chase the cat",
    4L -> "word")

  test("train: hand-checked bigram/context counts and vocab size") {
    val m = LanguageModel.train(docsDf(corpus), "text")
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big(("the", "cat")) === 3L)
    assert(big(("cat", "sat")) === 1L)
    val ctx = m.contexts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx("the") === 5L)
    assert(ctx("cat") === 2L)
    assert(!ctx.contains("word")) // single-token doc contributes no context
    // vocab: the cat sat on mat ate fish dogs chase word = 10
    assert(m.vocabSize === 10L)
  }

  test("mean-likelihood score is bit-equal to the reference fold; 1-token docs absent") {
    val df = docsDf(corpus)
    val m = LanguageModel.train(df, "text")
    val got = LanguageModel.scoreMeanLikelihood(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = refScores(corpus, corpus)
    assert(got.keySet === Set(1L, 2L, 3L)) // doc 4 has no transitions
    got.foreach { case (id, (n, fx, s)) =>
      assert((n, fx) === (want(id)._1, want(id)._2), s"doc $id")
      assert(s === want(id)._3, s"doc $id score not bit-equal")
    }
  }

  test("held-out docs back off: unseen transition and unseen context") {
    val df = docsDf(corpus)
    val m = LanguageModel.train(df, "text")
    // "cat the": seen context "cat" (c=2), unseen transition -> 1/(2+10)
    // "zebra runs": unseen context -> 1/10 = k/(0 + k*V)
    val held = Seq(10L -> "cat the", 11L -> "zebra runs")
    val got = LanguageModel.scoreMeanLikelihood(docsDf(held), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val want = refScores(corpus, held)
    assert(got(10L) === want(10L)._3)
    assert(got(11L) === want(11L)._3)
    assert(math.abs(got(10L) - 1.0 / 12) < 1e-9)
    assert(math.abs(got(11L) - 0.1) < 1e-9)
  }

  test("perplexity twin matches exp(-mean ln p) of the reference probabilities") {
    val df = docsDf(corpus)
    val m = LanguageModel.train(df, "text")
    val got = LanguageModel.scorePerplexity(df, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val trTrain = corpus.flatMap { case (_, t) =>
      val w = t.split(" ", -1); w.init.zip(w.tail)
    }
    val big = trTrain.groupBy(identity).map { case (p, xs) => p -> xs.size }
    val ctx = trTrain.groupBy(_._1).map { case (p, xs) => p -> xs.size }
    corpus.foreach { case (id, t) =>
      val w = t.split(" ", -1)
      val tr = w.init.zip(w.tail)
      if (tr.nonEmpty) {
        val lnSum = tr.map { bg =>
          math.log((big.getOrElse(bg, 0).toDouble + 1.0) /
            (ctx.getOrElse(bg._1, 0).toDouble + 10.0))
        }.sum
        val want = math.exp(-lnSum / tr.size)
        assert(math.abs(got(id) - want) / want < 1e-12, s"doc $id")
      }
    }
    // a model-like doc is less perplexed than an unseen-word doc
    val alien = LanguageModel.scorePerplexity(
        docsDf(Seq(20L -> "zebra quantum flux")), "doc_id", "text", m)
      .collect().head.getDouble(2)
    assert(alien > got(1L))
  }

  test("trigram order: composite context key, bit-equal to reference; short docs absent") {
    val df = docsDf(corpus)
    val m3 = LanguageModel.train(df, "text", n = 3)
    val big = m3.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big(("the cat", "sat")) === 1L)
    assert(big(("the cat", "ate")) === 1L)
    assert(m3.vocabSize === 10L) // unigram vocab regardless of order
    val got = LanguageModel.scoreMeanLikelihood(df, "doc_id", "text", m3, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = refScores(corpus, corpus, n = 3)
    assert(got.keySet === want.keySet)
    assert(got.keySet === Set(1L, 2L, 3L)) // "word" (1 token) absent
    got.foreach { case (id, (nTr, fx, s)) =>
      assert((nTr, fx, s) === want(id), s"doc $id")
    }
    // 2-token doc has no trigram transitions
    val short = LanguageModel.scoreMeanLikelihood(
      docsDf(Seq(30L -> "two tokens")), "doc_id", "text", m3, n = 3)
    assert(short.count() === 0L)
  }

  test("save/load round-trip serves bit-identical scores") {
    val df = docsDf(corpus)
    val m = LanguageModel.train(df, "text")
    val path = java.nio.file.Files.createTempDirectory("ngramlm").toString + "/m"
    LanguageModel.save(spark, path, m)
    val loaded = LanguageModel.load(spark, path)
    assert(loaded.vocabSize === m.vocabSize)
    val a = LanguageModel.scoreMeanLikelihood(df, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = LanguageModel.scoreMeanLikelihood(df, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
