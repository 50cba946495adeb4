package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the corpus-management operators: BM25 relevance,
  * deterministic hash splitting, and sequence packing. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // ------------------------------------------------------------- bm25 ----

  /** In-JVM reference implementation (plain Scala) for both idf modes. */
  private def bm25Ref(docs: Seq[(Long, String)], terms: Seq[String],
                      logIdf: Boolean, k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.size.toDouble
    val avgdl = words.map(_._2.size).sum.toDouble / n
    val idf = terms.map { t =>
      val df = words.count(_._2.contains(t)).toDouble
      val odds = (n - df + 0.5) / (df + 0.5)
      t -> (if (logIdf) math.log(1.0 + odds) else odds)
    }.toMap
    words.flatMap { case (id, ws) =>
      val dl = ws.size.toDouble
      val score = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        idf(t) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
      }.sum
      if (terms.exists(ws.contains)) Some(id -> score) else None
    }.toMap
  }

  private val corpus = Seq(
    (1L, "data model data pipeline"),
    (2L, "spark engine spark spark joins"),
    (3L, "completely unrelated words here"),
    (4L, "data spark data engine data quality data"))

  test("bm25 matches an in-JVM reference in both idf modes") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    for (mode <- Seq("rational", "log")) {
      val got = Relevance.bm25(df, "doc_id", "text", Seq("data", "spark"), idfMode = mode)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = bm25Ref(corpus, Seq("data", "spark"), logIdf = mode == "log")
      assert(got.keySet == Set(1L, 2L, 4L), s"mode=$mode: doc 3 has no query term")
      want.foreach { case (id, s) =>
        assert(got(id) == s, s"mode=$mode doc=$id got=${got(id)} want=$s")
      }
    }
  }

  test("bm25 ranks the term-dense doc first and saturates with k1") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val scores = Relevance.bm25(df, "doc_id", "text", Seq("data"), idfMode = "log")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) > scores(1L), "4 x tf beats 2 x tf")
    // saturation: quadrupling tf must NOT quadruple the score
    assert(scores(4L) < 4.0 * scores(1L) / 2.0)
  }

  test("tfidf keywords surface the distinctive term, not the common one") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat the cat quantum"),
      (2L, "the dog the dog banana"),
      (3L, "the fish the fish guitar")).toDF("doc_id", "text")
    val kw = Relevance.tfidfKeywords(df, "doc_id", "text", k = 2)
      .collect().groupBy(_.getLong(0))
    // rank 1 must be the doc's repeated distinctive term (tf=2, df=1),
    // never "the" (df=3 → idf 0.5/3.5 tiny despite tf=2)
    assert(kw(1L).find(_.getLong(1) == 1L).get.getString(2) == "cat")
    assert(kw(2L).find(_.getLong(1) == 1L).get.getString(2) == "dog")
    assert(kw(3L).find(_.getLong(1) == 1L).get.getString(2) == "fish")
    // singleton distinctive term outranks the corpus-wide stopword too
    assert(kw(1L).find(_.getLong(1) == 2L).get.getString(2) == "quantum")
    assert(kw.values.forall(_.length == 2))
  }

  test("bm25 on an empty corpus returns an empty frame, not NaN/NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Relevance.bm25(empty, "doc_id", "text", Seq("data"))
    assert(out.columns.toSeq == Seq("doc_id", "score"))
    assert(out.count() == 0L)
  }

  // -------------------------------------------------------- hashSplit ----

  test("hash split: deterministic, complete, and close to requested fractions") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.hashSplit(df, "doc_id", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 10000L, "every row assigned exactly one split")
    assert(math.abs(got("train") - 8000L) < 200, s"train=${got("train")}")
    assert(math.abs(got("val") - 1000L) < 100, s"val=${got("val")}")
    // determinism + append-stability: the first 1000 ids get identical
    // assignments whether or not the other 9000 are present
    val small = Sampling.hashSplit((0L until 1000L).toDF("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = Sampling.hashSplit(df, "doc_id", splits)
      .filter($"doc_id" < 1000).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == full)
  }

  test("hex thresholds are exact fixed-width lowercase hex") {
    assert(Sampling.hexThreshold(0.8) == "cccccccc")
    assert(Sampling.hexThreshold(0.9) == "e6666666")
    assert(Sampling.hexThreshold(0.0) == "00000000")
    // exactly 1.0 → the "g" sentinel (above every hex bucket: strict `<`
    // keeps all); within 2^-32 BELOW 1.0 → ffffffff, which strict `<`
    // correctly drops for the top bucket — no keep-all misfire
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(1.0 - math.pow(2, -33)) == "ffffffff")
    assert("ffffffff" < "g")
  }

  // ---------------------------------------------------- weightedSample ----

  test("weighted sample: per-group rates, nesting, and 0/1 edges") {
    import spark.implicits._
    val df = ((0L until 8000L).map(i => (Option(i), s"g${i % 4}")) ++
      Seq((Option.empty[Long], "g0"), (Option.empty[Long], "g2")))
      .toDF("doc_id", "source")
    val sampled = Sampling.weightedSample(df, "doc_id", "source",
      rates = Seq("g0" -> 1.0, "g1" -> 0.0, "g2" -> 0.5), defaultRate = 0.25)
    assert(sampled.filter(col("doc_id").isNull).count() == 0,
      "null ids have no hash draw: dropped at every rate, including 1.0")
    val out = sampled.collect().map(r => (r.getLong(0), r.getString(1)))
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup("g0") == 2000, "rate 1.0 keeps every non-null row incl. bucket ffffffff")
    assert(!byGroup.contains("g1"), "rate 0.0 keeps nothing")
    assert(math.abs(byGroup("g2") - 1000) < 150, s"g2=${byGroup.get("g2")}")
    assert(math.abs(byGroup("g3") - 500) < 100, s"g3=${byGroup.get("g3")}")
    // nesting: the rows kept at 0.25 are a subset of those kept at 0.5
    val at25 = Sampling.weightedSample(df, "doc_id", "source",
      rates = Seq(), defaultRate = 0.25).select("doc_id").as[Long].collect().toSet
    val at50 = Sampling.weightedSample(df, "doc_id", "source",
      rates = Seq(), defaultRate = 0.5).select("doc_id").as[Long].collect().toSet
    assert(at25.subsetOf(at50), "hash sampling must be nested across rates")
  }

  // ------------------------------------------------------- capPerGroup ----

  test("per-group cap: exact top-k equals the single-window reference") {
    import spark.implicits._
    // heavy skew: g0 has 5000 rows, g1 has 7, g2 has 1
    val rows = (0L until 5000L).map((_, "g0")) ++
      (5000L until 5007L).map((_, "g1")) :+ (9999L, "g2")
    val df = rows.toDF("doc_id", "source")
    val got = Sampling.capPerGroup(df, "doc_id", "source", k = 25, salts = 8)
      .select("doc_id", "source", "rank_in_group")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // reference: plain md5-ordered row_number per group
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val want = df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= 25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // groups smaller than k survive whole
    assert(got.count(_._2 == "g1") == 7 && got.count(_._2 == "g2") == 1)
    // salt-count invariance: the result is a pure function of the data
    val alt = Sampling.capPerGroup(df, "doc_id", "source", k = 25, salts = 3)
      .select("doc_id", "source", "rank_in_group")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(alt == want)
  }

  test("token-budget rates: proportional, temperature-flattened, waterfilled") {
    def expectedTokens(profile: Seq[(String, Long)], rates: Seq[(String, Double)]): Double = {
      val r = rates.toMap
      profile.map { case (s, t) => t * r(s) }.sum
    }
    val profile = Seq("a" -> 100L, "b" -> 900L, "c" -> 0L)
    // alpha = 1: plain proportional downsampling — every rate = budget/total
    val prop = Sampling.ratesForTokenBudget(profile, 500L, alpha = 1.0).toMap
    assert(math.abs(prop("a") - 0.5) < 1e-12 && math.abs(prop("b") - 0.5) < 1e-12)
    assert(prop("c") == 0.0)
    // alpha = 0: uniform targets, the small source caps at 1.0 and its
    // unused budget waterfills to the big one (100·1.0 + 900·r = 500)
    val flat = Sampling.ratesForTokenBudget(profile, 500L, alpha = 0.0).toMap
    assert(flat("a") == 1.0)
    assert(math.abs(flat("b") - 400.0 / 900.0) < 1e-12)
    assert(math.abs(expectedTokens(profile, flat.toSeq) - 500.0) < 1e-6)
    // alpha = 0.5 sits between: small source upweighted vs proportional
    val mid = Sampling.ratesForTokenBudget(profile, 500L, alpha = 0.5).toMap
    assert(mid("a") > prop("a") && mid("a") <= 1.0)
    assert(math.abs(expectedTokens(profile, mid.toSeq) - 500.0) < 1e-6)
    // budget >= corpus: everything kept; budget 0: nothing
    assert(Sampling.ratesForTokenBudget(profile, 5000L).forall(r =>
      r._2 == (if (r._1 == "c") 0.0 else 1.0)))
    assert(Sampling.ratesForTokenBudget(profile, 0L).forall(_._2 == 0.0))
    // the rates feed weightedSample directly (types line up)
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i < 100) "a" else "b"))
      .toDF("doc_id", "source")
    val kept = Sampling.weightedSample(docs, "doc_id", "source",
      rates = Sampling.ratesForTokenBudget(profile, 500L, alpha = 0.0))
    assert(kept.filter(col("source") === "a").count() == 100L, "rate-1.0 source whole")
  }

  test("property: token-budget rates stay in [0,1] and meet the budget") {
    val profileGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 1000000L)).map(_.zipWithIndex.map {
        case (t, i) => s"s$i" -> t
      }))
    val alphaGen = Gen.oneOf(0.0, 0.3, 0.5, 1.0, 2.0, 50.0, 500.0)
    val fracGen = Gen.chooseNum(0.0, 2.0)
    val prop = Prop.forAll(profileGen, alphaGen, fracGen) { (profile0, alpha0, frac0) =>
      // scalacheck shrinking may step outside the generators' ranges —
      // clamp ALL inputs to the operator's documented domain so a shrunk
      // counterexample reports the real failure, not a require() throw
      val profile = profile0.map { case (s, t) => s -> math.max(0L, t) }
      val alpha = math.max(0.0, alpha0)
      val frac = math.max(0.0, frac0)
      val total = profile.map(_._2).sum
      val budget = (total * frac).toLong
      val rates = Sampling.ratesForTokenBudget(profile, budget, alpha)
      val rateMap = rates.toMap
      val inRange = rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 && !r.isNaN }
      val expected = profile.map { case (s, t) => t * rateMap(s) }.sum
      val target = math.min(budget.toDouble, total.toDouble)
      // expected kept tokens meet the (clamped) budget up to fp rounding
      val meets = math.abs(expected - target) <= math.max(1e-6 * target, 1e-6)
      inRange && meets && rates.map(_._1) == profile.map(_._1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("takeUniform: exactly n rows, stable under appends and salt count") {
    import spark.implicits._
    val small = (0L until 3000L).toDF("doc_id")
    val big = (0L until 9000L).toDF("doc_id")
    // a user column named "all" must survive untouched, and null ids are
    // dropped (no hash draw), not ranked first
    val withAll = ((0L until 50L).map(i => (Option(i), s"v$i")) :+
      (Option.empty[Long], "vnull")).toDF("doc_id", "all")
    val keptAll = Sampling.takeUniform(withAll, "doc_id", n = 60)
    assert(keptAll.columns.toSeq.contains("all"))
    val vals = keptAll.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(vals.length == 50 && vals.forall { case (i, v) => v == s"v$i" })
    val gotSmall = Sampling.takeUniform(small, "doc_id", n = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(gotSmall.size == 100)
    // append stability: growing the corpus only rotates members via the
    // hash order — rows sampled from the SUBSET that remain in the
    // superset's top-100 draw must be the superset's lowest draws too
    val gotBig = Sampling.takeUniform(big, "doc_id", n = 100, salts = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(gotBig.size == 100)
    // reference: global md5 order
    val want = big.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(100).select("doc_id").as[Long].collect().toSet
    assert(gotBig == want, "two-phase result equals the global TakeOrdered")
  }

  test("heavy hitters: exact above threshold, partitioning-independent") {
    import spark.implicits._
    // skewed synthetic stream: token f0 dominates, long uniform tail
    val docs = (0 until 200).map { i =>
      val hot = Seq.fill(8)("f0") ++ Seq.fill(3)("f1")
      val tail = Seq(s"t${i % 97}", s"u${i % 89}")
      (i.toLong, (hot ++ tail).mkString(" "))
    }
    val k = 10
    def run(parts: Int): Map[String, Long] =
      TextAnalysis.heavyHitters(
          docs.toDF("doc_id", "text").repartition(parts), "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force reference
    val all = docs.flatMap(_._2.split(" ", -1))
    val n = all.size
    val want = all.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    assert(want.contains("f0"), "test corpus must actually have a heavy hitter")
    val one = run(1)
    val many = run(13)
    assert(one == want, s"exactness at 1 partition: $one vs $want")
    assert(many == want, "the sketch's candidate set varies with partitioning; the answer must not")
  }

  test("weighted heavy hitters: exact above the weight threshold, partitioning-independent") {
    import spark.implicits._
    // skew by WEIGHT, not occurrence count: 'whale' appears once with a
    // huge weight, 'ants' appears constantly with tiny weights summing
    // under the bar, 'mid' crosses it by accumulation
    val rows = Seq(("whale", 5000L)) ++
      (1 to 400).map(i => (s"ant$i", 1L)) ++
      (1 to 40).map(_ => ("mid", 30L))
    val k = 5
    val w = rows.map(_._2).sum
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter { case (_, s) => s * (k + 1) > w }.toMap
    assert(want.keySet == Set("whale", "mid"), s"fixture sanity: $want")
    def run(parts: Int, seed: Int): Map[String, Long] = {
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      TextAnalysis.heavyHittersWeighted(
          shuffled.toDF("item", "w").repartition(parts), "item", "w", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(run(1, 0) == want)
    assert(run(17, 1) == want,
      "summary contents vary with partitioning/order; the thresholded answer must not")
    // null items and non-positive weights are ignored
    val withJunk = (rows.map { case (i, v) => (Option(i), v) } ++
      Seq((None, 99999L), (Option("neg"), -5L))).toDF("item", "w")
    assert(TextAnalysis.heavyHittersWeighted(withJunk, "item", "w", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == want)
  }

  // ------------------------------------------------------- freqQuality ----

  test("token-frequency quality: hand-checked df and hapax ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha zzz1 zzz2 zzz1")).toDF("doc_id", "text")
    // df: alpha=3, beta=2, gamma=1, delta=1, zzz1=1, zzz2=1
    val got = TextAnalysis.freqQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 2.0, 1.0 / 3)))            // (3+2+1)/3, gamma hapax
    assert(got(2L) == ((3L, 2.0, 1.0 / 3)))            // (3+2+1)/3, delta hapax
    assert(got(3L) == ((3L, 5.0 / 3, 2.0 / 3)))        // distinct: alpha,zzz1,zzz2
    // hotK = 2 forces the vocab (6 tokens) through BOTH join paths —
    // alpha+beta broadcast-hot, the rest through the shuffled cold tail;
    // the split must be invisible in the result
    val split = TextAnalysis.freqQuality(df, "doc_id", "text", hotK = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(split == got, "hot/cold split must not change any value")
  }

  // --------------------------------------------------- decontamination ----

  test("cross-ngram overlap finds planted benchmark contamination only") {
    import spark.implicits._
    val bench = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val corpus = Seq(
      (100L, s"intro words then $bench and a closing remark"), // contains the benchmark
      (101L, "entirely different content with no overlap at all here today"),
      (5L, bench)                                              // the probe itself
    ).toDF("doc_id", "text")
    val probes = Seq((5L, bench)).toDF("doc_id", "text")
    val got = Dedup.crossNgramOverlap(corpus, probes, "doc_id", "text",
        n = 5, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 1, s"only the contaminated doc matches: ${got.toSeq}")
    val (docId, probeId, shared) = got.head
    assert(docId == 100L && probeId == 5L)
    // the 11-word benchmark has 7 distinct 5-grams, all inside doc 100
    assert(shared == 7L)
  }

  test("cross-ngram overlap df cap suppresses corpus-wide boilerplate") {
    import spark.implicits._
    val boiler = "this is the standard footer text appended to every document"
    val corpus = (0L until 50L).map(i => (100L + i, s"unique$i words$i $boiler"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, boiler)).toDF("doc_id", "text")
    val hits = Dedup.crossNgramOverlap(corpus, probes, "doc_id", "text",
      n = 5, minShared = 1, maxDocFreq = 10).count()
    assert(hits == 0L, "grams in >maxDocFreq corpus docs are not contamination signal")
  }

  // ---------------------------------------------------------- packing ----

  test("pack manifest: exact spans on a hand-checked shard") {
    import spark.implicits._
    // tokens per doc: 3, 4, 2 at seqLen 5 →
    //   d1: seq0[0..3)        from doc[0..3)
    //   d2: seq0[3..5) doc[0..2), seq1[0..2) doc[2..4)
    //   d3: seq1[2..4)        from doc[0..2)
    val df = Seq((1L, "s", 3), (2L, "s", 4), (3L, "s", 2)).toDF("doc_id", "source", "n")
    val got = Packing.packManifest(df, "doc_id", "source", col("n"), seqLen = 5)
      .orderBy("seq_id", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 3L),
      (0L, 2L, 3L, 0L, 2L),
      (1L, 2L, 0L, 2L, 2L),
      (1L, 3L, 2L, 0L, 2L)))
  }

  test("chunk overlap: hand-checked windows, coverage, no redundant tails") {
    import spark.implicits._
    // 7 tokens, window 4, stride 2 → starts 0, 2, 4 (start 6 is a pure
    // suffix of the start-4 chunk: 6 + 4 - 2 = 8 ≥ 7 → suppressed)
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Packing.chunkOverlap(df, "doc_id", "text", window = 4, stride = 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f"),
      (2L, 4L, 3L, "e f g")))

    // invariants on a ragged corpus: every token index covered; first
    // `stride` tokens of each chunk reconstruct the document; no chunk
    // is a suffix of its predecessor; short docs yield exactly 1 chunk
    val docs = Seq(
      (10L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (11L, "only three tokens"),
      (12L, "x")).toDF("doc_id", "text")
    val chunks = Packing.chunkOverlap(docs, "doc_id", "text", window = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    for ((id, text) <- Seq((10L, (1 to 100).map(i => s"t$i").mkString(" ")),
        (11L, "only three tokens"), (12L, "x"))) {
      val toks = text.split(" ").toSeq
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      // coverage: concat of first-stride slices + tail of last = doc
      val rebuilt = (mine.init.flatMap(_._4.split(" ").take(4)) ++
        mine.last._4.split(" ")).toSeq
      assert(rebuilt == toks, s"doc $id must reconstruct from chunks")
      assert(mine.head._3 == 0L)
      if (toks.size <= 8) assert(mine.size == 1, s"short doc $id gets 1 chunk")
    }
  }

  test("pack manifest invariants: conservation, capacity, shard isolation") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"shard${i % 3}", (i % 37 + 1).toInt))
      .toDF("doc_id", "source", "n")
    val m = Packing.packManifest(docs, "doc_id", "source", col("n"), seqLen = 64)
    // every token of every doc lands exactly once
    val perDoc = m.groupBy("doc_id").agg(sum("tok_len").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 500L).foreach(i => assert(perDoc(i) == i % 37 + 1))
    // no sequence exceeds seqLen, and all but each shard's last are full
    val perSeq = m.groupBy("shard", "seq_id").agg(sum("tok_len").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perSeq.values.forall(_ <= 64))
    val lastSeq = perSeq.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    perSeq.foreach { case ((s, q), t) => if (q != lastSeq(s)) assert(t == 64L, s"$s/$q") }
    // offsets tile each sequence contiguously from 0
    val seqs = m.select("shard", "seq_id", "seq_off", "tok_len")
      .collect().groupBy(r => (r.getString(0), r.getLong(1)))
    seqs.foreach { case (_, rows) =>
      val spans = rows.map(r => (r.getLong(2), r.getLong(2) + r.getLong(3))).sortBy(_._1)
      assert(spans.head._1 == 0L)
      spans.sliding(2).foreach {
        case Array(a, b) => assert(a._2 == b._1, "spans must tile with no gap/overlap")
        case _ =>
      }
    }
  }

  test("pack manifest skips empty and malformed docs without shifting offsets") {
    import spark.implicits._
    // n = -1 is what size(null_array) yields in non-ANSI Spark: it must be
    // dropped BEFORE the cumulative sum, or doc 3's tok_before would
    // silently become 5 - 1 = 4 and its spans would overlap doc 2's
    val df = Seq((1L, "s", 0), (2L, "s", 5), (25L, "s", -1), (3L, "s", 3))
      .toDF("doc_id", "source", "n")
    val got = Packing.packManifest(df, "doc_id", "source", col("n"), seqLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 0L, 5L),   // doc 2 starts at seq offset 0: doc 1 shifted nothing
      (0L, 3L, 5L, 0L, 3L)))  // doc 3 starts right after doc 2: -1 shifted nothing
  }

  test("packBins: first-fit-decreasing reference, oversize sentinel, order invariance") {
    import spark.implicits._
    def referenceFfd(docs: Seq[(Long, Long)], cap: Long): Map[Long, (Long, Long)] = {
      // (doc_id -> (bin, off)) — textbook FFD, largest first, id tiebreak
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      val out = scala.collection.mutable.Map[Long, (Long, Long)]()
      docs.sortBy { case (id, n) => (-n, id) }.foreach { case (id, n) =>
        if (n > cap) out(id) = (-1L, -1L)
        else {
          val i = bins.indexWhere(_ + n <= cap)
          if (i >= 0) { out(id) = (i.toLong, bins(i)); bins(i) += n }
          else { out(id) = (bins.length.toLong, 0L); bins += n }
        }
      }
      out.toMap
    }
    val docs = Seq( // (id, tokens) incl. an oversize and exact-fit edge
      (1L, 60L), (2L, 50L), (3L, 40L), (4L, 40L), (5L, 10L),
      (6L, 101L), (7L, 100L), (8L, 1L))
    val expected = referenceFfd(docs, cap = 100L)
    for (seed <- Seq(0, 1, 2)) { // input order must not matter
      val shuffled = new scala.util.Random(seed).shuffle(docs)
      val df = shuffled.map { case (id, n) => (id, "s", n) }
        .toDF("doc_id", "shard", "n_tok").repartition(3 + seed)
      val got = Packing.packBins(df, "doc_id", "shard", col("n_tok"), seqLen = 100)
        .collect().map(r => r.getLong(2) -> (r.getLong(1), r.getLong(4))).toMap
      assert(got == expected, s"seed=$seed")
    }
    // shards pack independently
    val multi = Seq((1L, "a", 80L), (2L, "b", 80L), (3L, "a", 20L))
      .toDF("doc_id", "shard", "n_tok")
    val m = Packing.packBins(multi, "doc_id", "shard", col("n_tok"), 100)
      .collect().map(r => r.getLong(2) -> (r.getString(0), r.getLong(1), r.getLong(4))).toMap
    assert(m == Map(1L -> (("a", 0L, 0L)), 2L -> (("b", 0L, 0L)), 3L -> (("a", 0L, 80L))))
  }

  test("packBins FFD liveness: at most one bin per shard ends half-empty") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val docs = (1L to 400L).map(id => (id, "s" + (id % 3), 1L + rnd.nextInt(100)))
      .toDF("doc_id", "shard", "n_tok")
    val loads = Packing.packBins(docs, "doc_id", "shard", col("n_tok"), 128)
      .filter(col("bin_id") >= 0)
      .groupBy("shard", "bin_id").agg(sum("n_tok").as("load"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    loads.groupBy(_._1).foreach { case (shard, ls) =>
      val halfEmpty = ls.count(_._2 * 2 <= 128)
      assert(halfEmpty <= 1, s"shard $shard: $halfEmpty bins <= half full")
    }
  }

  // --------------------------------------------------------- upsample ----

  test("upsample: repeat factors, weightedSample agreement, monotone nesting") {
    import spark.implicits._
    val df = ((0L until 4000L).map(i => (Option(i), s"g${i % 4}")) :+
      (Option.empty[Long], "g0")).toDF("doc_id", "source")
    val up = Sampling.upsample(df, "doc_id", "source",
      rates = Seq("g0" -> 2.5, "g1" -> 0.5, "g2" -> 0.0), defaultRate = 1.0)
      .select("doc_id", "source", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(!up.exists(_._2 == "g2"), "rate 0 drops the group")
    val byGroup = up.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup("g3") == 1000, "default rate 1.0 = exactly one copy each")
    assert(math.abs(byGroup("g0") - 2500) < 150, s"g0=${byGroup("g0")}")
    assert(math.abs(byGroup("g1") - 500) < 100, s"g1=${byGroup("g1")}")
    // copy_idx is contiguous from 0 per kept row
    up.groupBy(r => (r._1, r._2)).values.foreach { copies =>
      assert(copies.map(_._3).sorted.toSeq == (0 until copies.length))
    }
    // a sub-1 rate IS weightedSample's keep decision, same draw
    val wsKeep = Sampling.weightedSample(df, "doc_id", "source",
      rates = Seq("g1" -> 0.5), defaultRate = 1.0)
      .filter(col("source") === "g1").select("doc_id").as[Long].collect().toSet
    assert(up.filter(_._2 == "g1").map(_._1).toSet == wsKeep)
    // monotone: the copy multiset at rate 1.3 nests inside rate 2.3
    def copiesAt(r: Double) = Sampling.upsample(df, "doc_id", "source",
        rates = Seq("g3" -> r), defaultRate = 0.0)
      .select("doc_id", "copy_idx").as[(Long, Int)].collect().toSet
    assert(copiesAt(1.3).subsetOf(copiesAt(2.3)))
  }

  test("upsample rejects inputs whose columns collide with the plumbing names") {
    import spark.implicits._
    // posexplode emits fixed `pos`/`col` names; an input already carrying
    // one would be silently renamed or dropped — refuse instead
    for (bad <- Seq("copy_idx", "pos", "col", "_n_copies")) {
      val df = Seq((1L, "g", "x")).toDF("doc_id", "source", bad)
      val e = intercept[IllegalArgumentException] {
        Sampling.upsample(df, "doc_id", "source", rates = Seq("g" -> 2.0))
      }
      assert(e.getMessage.contains(bad))
    }
  }

  // ---------------------------------------------------------- shuffle ----

  test("shuffled: partition-order read equals the global md5 order, seeded") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val s7 = Sampling.shuffled(df, "doc_id", seed = 7L, numPartitions = 8)
    assert(s7.rdd.getNumPartitions == 8)
    // collect concatenates partitions in index order: with range
    // partitioning + local sort that IS the global shuffle-key order
    val got = s7.select("doc_id").as[Long].collect().toSeq
    val want = df.withColumn("k", Sampling.shuffleKey(col("doc_id"), 7L))
      .orderBy("k", "doc_id").select("doc_id").as[Long].collect().toSeq
    assert(got == want, "distributed shuffle must equal the single-sort reference")
    assert(got != (0L until 5000L).toSeq, "order is actually shuffled")
    // reproducible per seed, different across seeds
    val again = Sampling.shuffled(df, "doc_id", seed = 7L, numPartitions = 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(again == got)
    val other = Sampling.shuffled(df, "doc_id", seed = 8L, numPartitions = 8)
      .select("doc_id").as[Long].collect().toSeq
    assert(other != got)
  }

  // -------------------------------------------------------- spanDedup ----

  test("span dedup keeps the first occurrence of every repeated span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // spans: "a b c", "d e f" — both first
      (2L, "a b c x y z"),   // "a b c" repeats doc 1 → dropped; "x y z" kept
      (3L, "d e f"),         // entire doc repeats doc 1's span → empty
      (4L, "x y z a b c"))   // both spans repeat earlier firsts → empty
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", chunkTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a b c d e f", 2L, 2L),
      (2L, "x y z", 2L, 1L),
      (3L, "", 1L, 0L),
      (4L, "", 2L, 0L)))
  }

  test("span dedup: randomized differential vs an in-JVM reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    // small vocab + short docs → dense span collisions incl. cross-doc,
    // intra-doc, and ragged-tail repeats
    val docs = (0L until 250L).map(i =>
      (i, (0 until 3 + rnd.nextInt(14)).map(_ => s"t${rnd.nextInt(5)}").mkString(" ")))
    val chunk = 4
    // reference: first-occurrence wins in (doc_id, idx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val spans = toks.grouped(chunk).map(_.mkString(" ")).toSeq
      val kept = spans.filter { sp => seen.add(sp) }
      (id, kept.mkString(" "), spans.length.toLong, kept.length.toLong)
    }
    val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", chunk)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
  }

  test("span dedup: ragged tails, intra-doc repeats, partition invariance") {
    import spark.implicits._
    val docs = Seq(
      (10L, "p q r p q r p q"),  // spans "p q r", "p q r"(dup), "p q" — tail is its own span
      (11L, "p q"))              // repeats doc 10's tail span → empty
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", chunkTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (10L, "p q r p q", 3L, 2L),  // intra-doc repeat dropped, order preserved
      (11L, "", 1L, 0L)))
    // partitioning must not change who wins the first-occurrence race
    val rnd = new scala.util.Random(7)
    val big = (0L until 300L).map(i =>
      (i, (0 until 12).map(_ => s"w${rnd.nextInt(9)}").mkString(" ")))
      .toDF("doc_id", "text")
    def run(parts: Int) = Dedup.spanDedup(big.repartition(parts), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(run(1) == run(13))
  }
}
