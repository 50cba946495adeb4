package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("salted collect_set equals the direct aggregate on a skewed key") {
    import spark.implicits._
    // 10k rows on one hot key + a few cold keys
    val df = ((1 to 10000).map(i => ("hot", s"v${i % 500}")) ++
      (1 to 20).map(i => (s"cold$i", "x"))).toDF("k", "v")
    val salted = Salting.saltedCollectSet(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(salted("hot") == (0 until 500).map(i => s"v$i").toSet)
    assert(salted("cold7") == Set("x"))
    assert(salted.size == 21)
  }

  test("salted sorted list preserves the exact multiset, duplicates included") {
    import spark.implicits._
    // hot key floods ONE repeated value (the case value-derived salts
    // cannot spread) plus a tail; the merged sorted multiset must be exact
    val df = ((1 to 5000).map(_ => ("hot", 7)) ++
      (1 to 100).map(i => ("hot", i)) ++
      Seq(("cold", 3), ("cold", 1), ("cold", 3))).toDF("k", "v")
    val got = Salting.saltedSortedList(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val expectedHot = ((1 to 5000).map(_ => 7) ++ (1 to 100)).sorted
    assert(got("hot") == expectedHot)
    assert(got("cold") == Seq(1, 3, 3))
  }

  test("exact percentile matches a sort-and-index reference on ties and evens") {
    import spark.implicits._
    def reference(vs: Seq[Double], p: Double): Double =
      vs.sorted.apply(math.floor((vs.size - 1) * p).toInt)
    val groups = Map(
      "a" -> Seq(5.0, 1.0, 3.0),                       // odd n
      "b" -> Seq(4.0, 2.0, 8.0, 6.0),                  // even n → lower element
      "c" -> Seq(2.0, 2.0, 2.0, 9.0),                  // heavy ties
      "d" -> Seq(1.5))                                 // singleton
    val df = groups.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }.toDF("k", "v")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = Salting.exactPercentile(df, "k", "v", p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      groups.foreach { case (k, vs) =>
        assert(got(k) == reference(vs, p), s"key=$k p=$p")
      }
      assert(got.size == groups.size, s"exactly one row per key at p=$p")
    }
  }

  test("weighted percentile equals replicate-then-unweighted, non-positive weights dropped") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1.0, 3L), ("a", 5.0, 1L), ("a", 2.0, 2L),  // multiset 1,1,1,2,2,5
      ("b", 9.0, 0L), ("b", 4.0, 0L), ("b", 7.0, -2L), // zero/negative ignored
      ("c", 3.0, 4L))
    val df = rows.toDF("k", "v", "w")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = Salting.exactPercentileWeighted(df, "k", "v", p, Some("w"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // reference: physically replicate each row `w` times, unweighted
      val replicated = rows.flatMap { case (k, v, w) =>
        Seq.fill(math.max(0, w.toInt))((k, v))
      }.toDF("k", "v")
      val ref = Salting.exactPercentile(replicated, "k", "v", p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == ref, s"p=$p")
    }
    // all-nonpositive-weight key emits no row
    assert(!Salting.exactPercentileWeighted(df, "k", "v", 0.5, Some("w"))
      .collect().map(_.getString(0)).contains("b"))
  }

  test("multi-percentile one-pass equals the single-p operator at every p") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map(_ => (s"k${rnd.nextInt(4)}", rnd.nextInt(40).toDouble))
      .toDF("k", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val multi = Salting.exactPercentiles(df, "k", "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to ps.size).map(r.getDouble)).toMap
    ps.zipWithIndex.foreach { case (p, i) =>
      val single = Salting.exactPercentile(df, "k", "v", p)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      single.foreach { case (k, v) =>
        assert(multi(k)(i) == v, s"p=$p key=$k")
      }
    }
    intercept[IllegalArgumentException] { // label collision after rounding
      Salting.exactPercentiles(df, "k", "v", Seq(0.501, 0.502))
    }
  }

  test("distributed cumulative-sum percentile path equals the window path") {
    import spark.implicits._
    // enough distinct values per key that the range partitioner actually
    // slices each key across several partitions
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(_ =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(900).toDouble, 1L + rnd.nextInt(5)))
    val df = rows.toDF("k", "v", "w")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val win = Salting.exactPercentileWeighted(df, "k", "v", p, Some("w"),
        distributed = Some(false)).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val dist = Salting.exactPercentileWeighted(df, "k", "v", p, Some("w"),
        distributed = Some(true)).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(dist == win, s"weighted p=$p")
    }
    val ps = Seq(0.1, 0.5, 0.75, 0.99)
    val win = Salting.exactPercentiles(df, "k", "v", ps,
      distributed = Some(false)).collect()
      .map(r => r.getString(0) -> (1 to ps.size).map(r.getDouble)).toMap
    val dist = Salting.exactPercentiles(df, "k", "v", ps,
      distributed = Some(true)).collect()
      .map(r => r.getString(0) -> (1 to ps.size).map(r.getDouble)).toMap
    assert(dist == win)
  }

  test("exact percentile ignores nulls and emits one row per key") {
    import spark.implicits._
    val df = Seq(("a", Some(3.0)), ("a", None), ("a", Some(1.0)), ("b", None))
      .toDF("k", "v")
    val got = Salting.exactPercentile(df, "k", "v", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 1.0)) // b has no non-null values → no row
  }

  test("skewJoin equals the plain inner join under a 5000:1 hot key") {
    import spark.implicits._
    // fact: one hot key with 5000 rows, a long tail, keys absent from dim
    val fact = ((0 until 5000).map(i => (1L, i.toLong)) ++
      (2L until 40L).map(k => (k, k * 100)) ++
      Seq((999L, -1L)))                       // no dim match → dropped
      .toDF("k", "payload")
    // dim: duplicate dim rows must preserve join multiplicity
    val dim = (Seq((1L, "hot"), (1L, "hot2")) ++
      (2L until 30L).map(k => (k, s"d$k")))
      .toDF("k", "label")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "label")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    val plain = sorted(fact.join(dim, "k"))
    // thresholds straddle the hot key's 5000 rows: engage the salted
    // path, the all-cold path, and both mixed, at several salt counts
    for (salts <- Seq(1, 7, 16); thr <- Seq(10L, 4999L, 100000L))
      assert(sorted(Salting.skewJoin(fact, dim, Seq("k"), salts, thr)) == plain,
        s"salts=$salts thr=$thr must not change the join result")
    assert(plain.count(_._1 == 1L) == 10000, "hot key × 2 dim rows")
  }

  test("skewJoin spreads a hot key flooded with byte-identical rows across salts") {
    import spark.implicits._
    // the canonical skew shape: one hot key whose 5000 fact rows are
    // ALL byte-identical — a content-derived salt would collapse them
    // onto a single salt (and a single task), silently disabling the
    // spread that is the operator's entire purpose
    val fact = ((0 until 5000).map(_ => (1L, 42L)) ++
      (2L until 20L).map(k => (k, k))).toDF("k", "payload")
    val dim = (Seq((1L, "hot"), (1L, "hot2")) ++
      (2L until 20L).map(k => (k, s"d$k"))).toDF("k", "label")
    for (salts <- Seq(8, 16)) {
      val hot = Salting.hotKeys(fact, Seq("k"), 100L)
      val salted = Salting.saltedLeft(fact, Seq("k"), salts, hot)
      val hotSalts = salted.filter($"k" === 1L)
        .select("_salt").distinct().count()
      assert(hotSalts >= salts / 2,
        s"identical-row flood must reach >= ${salts / 2} of $salts salts, got $hotSalts")
      val cold = salted.filter($"k" =!= 1L)
        .select("_salt").distinct().collect().map(_.getInt(0)).toSeq
      assert(cold == Seq(0), "cold keys stay on salt 0 (no dim replication cost)")
      // and the join result is still exactly the plain join
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "payload", "label")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(sorted(Salting.skewJoin(fact, dim, Seq("k"), salts, 100L)) ==
        sorted(fact.join(dim, "k")))
    }
  }
}
