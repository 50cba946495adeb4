package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextClassifier]] — training math vs an in-memory reference NB,
  * exact-scoring invariants, artifact round-trip, and held-out
  * separability on an easy synthetic corpus. */
class TextClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def corpus() = Seq(
    (0L, "en", "the cat sat on the mat"),
    (1L, "en", "a dog and a cat"),
    (2L, "fr", "le chat et le chien"),
    (3L, "fr", "un chien sur le tapis"),
    (4L, "en", "the dog sat"),
    (5L, "fr", "le chat dort")
  ).toDF("doc_id", "lang", "text")

  test("trained weights match an in-memory reference implementation") {
    val docs = corpus()
    val m = TextClassifier.train(docs, "lang", "text")
    val rows = docs.select("lang", "text").as[(String, String)].collect()
    val occ = rows.flatMap { case (l, t) => t.split(" ", -1).map((l, _)) }
    val vocab = occ.map(_._2).distinct.length
    val nC = occ.groupBy(_._1).view.mapValues(_.length).toMap
    def fx(x: Double) = math.floor(math.log(x) * 1e9).toLong
    val expW = occ.groupBy(identity).map { case ((l, tok), os) =>
      (tok, l, fx((os.length + 1.0) / (nC(l) + vocab.toDouble)))
    }.toSet
    val gotW = m.weights.as[(String, String, Long)].collect().toSet
    assert(gotW === expW)
    val nDocs = rows.length
    val docsC = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val expC = docsC.map { case (l, dc) =>
      (l, fx(dc.toDouble / nDocs), fx(1.0 / (nC(l) + vocab.toDouble)))
    }.toSet
    assert(m.classes.as[(String, Long, Long)].collect().toSet === expC)
    assert(m.labels === Seq("en", "fr"))
  }

  test("classify scores exactly: sparse backoff ≡ dense formulation") {
    val docs = corpus()
    val m = TextClassifier.train(docs, "lang", "text")
    val w = m.weights.as[(String, String, Long)].collect()
      .map { case (t, l, v) => (t, l) -> v }.toMap
    val cls = m.classes.as[(String, Long, Long)].collect()
    // score a doc with seen, cross-class, and fully-unseen tokens
    val probe = Seq((9L, "le cat zebra zebra")).toDF("doc_id", "text")
    val got = TextClassifier.classify(probe, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().head
    val toks = "le cat zebra zebra".split(" ", -1)
    val expected = cls.map { case (l, prior, w0) =>
      val s = prior + toks.map(t => w.getOrElse((t, l), w0)).sum
      (s, l)
    }.max // (score, label) max ≡ struct-max tie-break
    assert((got._3, got._2) === expected)
  }

  test("artifact round-trip serves identical predictions") {
    val docs = corpus()
    val m = TextClassifier.train(docs, "lang", "text")
    val path = s"/tmp/graft-test-nb-${System.nanoTime()}"
    TextClassifier.save(spark, path, m)
    assert(Artifacts.exists(spark, path + "/classes"))
    val loaded = TextClassifier.load(spark, path)
    assert(loaded.labels === m.labels)
    val direct = TextClassifier.classify(docs, "doc_id", "text", m)
      .collect().map(_.toSeq).toSet
    val served = TextClassifier.classify(docs, "doc_id", "text", loaded)
      .collect().map(_.toSeq).toSet
    assert(served === direct)
  }

  test("held-out prediction is fully separable on disjoint vocabularies") {
    val train = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "aa", "alpha beta gamma delta alpha")
      else (i, "bb", "uno dos tres cuatro uno dos")
    }.toDF("doc_id", "lang", "text")
    val m = TextClassifier.train(train, "lang", "text")
    val probes = Seq((100L, "aa", "gamma alpha beta"),
      (101L, "bb", "tres uno"), (102L, "aa", "delta delta zebra"))
      .toDF("doc_id", "lang", "text")
    val got = probes.join(
        TextClassifier.classify(probes, "doc_id", "text", m), Seq("doc_id"))
      .filter(col("lang") === col("predicted")).count()
    assert(got === 3)
  }

  test("held-out accuracy on testdata beats 5-class chance") {
    // the generator's lang label is only WEAKLY coupled to its token
    // distribution (all langs share one 31-token vocabulary with
    // near-uniform frequencies), so the bar is signal-above-chance
    // (0.2), not separability — measured ~0.34 at sf0.001
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val model = TextClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), "lang", "text")
    val scored = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang")
      .join(TextClassifier.classify(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model), Seq("doc_id"))
    val (right, total) = (
      scored.filter(col("lang") === col("predicted")).count(), scored.count())
    assert(total > 0)
    assert(right.toDouble / total > 0.25,
      s"held-out accuracy $right/$total not above chance")
  }
}
