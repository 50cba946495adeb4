package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codegen kernels: the generated code must agree
  * with a straightforward Scala reference implementation, and results
  * must be partitioning-invariant. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))

  test("property: vec_dot codegen equals sequential Scala fold") {
    import spark.implicits._
    check(Prop.forAll(vecGen, vecGen) { (a: List[Float], b: List[Float]) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val got = Seq((a, b)).toDF("a", "b")
        .select(VectorExpressions.vecDot($"a", $"b")).collect().head.getDouble(0)
      got == expected
    })
  }

  test("property: simhash codegen equals bit-count reference") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.long)) { (hs: List[Long]) =>
      val counts = Array.fill(64)(0)
      hs.foreach(h => (0 until 64).foreach(b => counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)))
      val expected = (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
      val got = Seq(Tuple1(hs)).toDF("h")
        .select(VectorExpressions.simhashFromHashes($"h")).collect().head.getLong(0)
      got == expected
    })
  }

  test("minhash signature is partitioning-invariant and order-sensitive only to set content") {
    import spark.implicits._
    val doc = (1 to 50).map(_.toLong)
    val sig1 = Seq(Tuple1(doc)).toDF("h")
      .select(VectorExpressions.minhashSig($"h", 32)).collect().head.getSeq[Long](0)
    val sig2 = Seq(Tuple1(scala.util.Random.shuffle(doc))).toDF("h")
      .select(VectorExpressions.minhashSig($"h", 32)).collect().head.getSeq[Long](0)
    assert(sig1 == sig2)   // min over a set: element order irrelevant
    assert(sig1.length == 32 && sig1.distinct.length > 16)
  }

  test("int8 quantize + integer dot: cosine surives quantization, scales cancel") {
    import spark.implicits._
    check(Prop.forAll(vecGen, vecGen) { (a: List[Float], b: List[Float]) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
        .select(
          VectorExpressions.int8Quantize($"a").as("qa"),
          VectorExpressions.int8Quantize($"b").as("qb"),
          VectorExpressions.vecDot($"a", $"b").as("dot"),
          VectorExpressions.vecDot($"a", $"a").as("na2"),
          VectorExpressions.vecDot($"b", $"b").as("nb2"))
        .select($"qa", $"qb", $"dot", $"na2", $"nb2",
          VectorExpressions.int8VecDot($"qa", $"qb").cast("double").as("qdot"),
          VectorExpressions.int8VecDot($"qa", $"qa").cast("double").as("qna2"),
          VectorExpressions.int8VecDot($"qb", $"qb").cast("double").as("qnb2"))
        .collect().head
      val (qa, qb) = (df.getAs[Array[Byte]](0), df.getAs[Array[Byte]](1))
      val inJvm = qa.zip(qb).map { case (x, y) => x.toLong * y }.sum.toDouble
      val na = math.sqrt(df.getDouble(3)) * math.sqrt(df.getDouble(4))
      val cosF = if (na == 0) 0.0 else df.getDouble(2) / na
      val qn = math.sqrt(df.getDouble(6)) * math.sqrt(df.getDouble(7))
      val cosQ = if (qn == 0) 0.0 else df.getDouble(5) / qn
      // codegen integer dot equals the JVM fold; quantized cosine within
      // the max-abs error envelope of the float cosine
      df.getDouble(5) == inJvm && (na == 0 || qn == 0 || math.abs(cosQ - cosF) < 0.06)
    })
  }

  test("int8 quantize: zero vector -> zero bytes; max element -> ±127") {
    import spark.implicits._
    val r = Seq((Array.fill(6)(0.0f), Array(0.5f, -1.0f, 0.25f)))
      .toDF("z", "v")
      .select(col("z").cast("array<float>").as("z"), col("v").cast("array<float>").as("v"))
      .select(VectorExpressions.int8Quantize($"z"), VectorExpressions.int8Quantize($"v"))
      .collect().head
    assert(r.getAs[Array[Byte]](0).toSeq == Seq.fill(6)(0: Byte))
    assert(r.getAs[Array[Byte]](1).toSeq == Seq[Byte](64, -127, 32))
  }

  test("two-level centroid assignment agrees with the dense scan away from coarse boundaries") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(29)
    val cents = Array.fill(600)(Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat))
    val centIds = Array.tabulate(600)(_.toLong)
    val (coarse, children) = Similarity.coarseIndex(centIds, cents)
    // every fine centroid hangs under exactly one coarse cell
    assert(children.map(_.length).sum == 600)
    assert(children.flatten.sorted.toSeq == (0 until 600))
    // ON-centroid vectors: the two-level path must find the exact cell
    // (the owning coarse cell is by construction the vector's nearest)
    val probe = (0 until 600 by 7).map(i => (i.toLong, cents(i)))
    val got = probe.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .select(col("vec_id"), VectorExpressions.twoLevelNearestCentroids(
        col("embedding"), coarse, children, centIds, cents, 2, keep = 3).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.forall { case (id, cells) => cells.head == id },
      s"${got.count { case (id, cells) => cells.head != id }} on-centroid probes mis-assigned")
    // top-k: keep distinct cells, the self cell strictly first
    assert(got.forall { case (_, cells) =>
      cells.length == 3 && cells.distinct.length == 3 })
    // dimension mismatch → null, same contract as the dense expression
    val bad = Seq((1L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .select(VectorExpressions.twoLevelNearestCentroids(
        col("embedding"), coarse, children, centIds, cents, 2).as("cells"))
      .collect().head
    assert(bad.isNullAt(0))
  }

  test("rhp_table_buckets matches the packed-signature extraction within 64 bits") {
    import spark.implicits._
    // the packed path: one 64-bit signature, buckets = bit slices
    check(Prop.forAll(vecGen) { (v: List[Float]) =>
      val (tables, bits) = (8, 6)   // 48 planes — inside the packed window
      val row = Seq(Tuple1(v)).toDF("v")
        .select(col("v").cast("array<float>").as("v"))
        .select(
          VectorExpressions.rhpSig($"v", tables * bits).as("sig"),
          VectorExpressions.rhpTableBuckets($"v", tables, bits).as("b"))
        .collect().head
      val sig = row.getLong(0)
      val mask = (1L << bits) - 1
      val expected = (0 until tables).map(t => (sig >>> (t * bits)) & mask)
      row.getSeq[Long](1) == expected
    })
  }

  test("rhp_table_buckets is well-defined past 64 total planes (packed path is not)") {
    import spark.implicits._
    val (tables, bits) = (24, 9)   // 216 planes — packed long would alias mod 64
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(40)(List.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val rows = vs.map(Tuple1(_)).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(VectorExpressions.rhpTableBuckets($"v", tables, bits))
      .collect().map(_.getSeq[Long](0))
    assert(rows.forall(b => b.length == tables && b.forall(x => x >= 0 && x < (1L << bits))))
    // distinct planes per table: tables must not be copies of each other
    assert(rows.map(_.toSeq).toSeq.transpose.map(_.toSet).distinct.length > 1)
  }

  test("rhp_multi_probe: base bucket first, flips confined to each table's bits, no repeats") {
    import spark.implicits._
    val (tables, bits, probes) = (4, 8, 16)
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(20)(List.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val rows = vs.map(Tuple1(_)).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
      .select(
        VectorExpressions.rhpTableBuckets($"v", tables, bits).as("base"),
        VectorExpressions.rhpMultiProbe($"v", tables, bits, probes).as("probes"))
      .collect()
    rows.foreach { r =>
      val base = r.getSeq[Long](0)
      val all = r.getSeq[Long](1)
      assert(all.length == tables * probes)
      (0 until tables).foreach { t =>
        val tp = all.slice(t * probes, (t + 1) * probes)
        assert(tp.head == base(t), "probe 0 must be the exact bucket")
        assert(tp.forall(b => (b & ~((1L << bits) - 1)) == 0L))
        // enumeration never repeats a bucket while distinct flips remain
        assert(tp.distinct.length == probes.min(1 << bits))
      }
    }
  }

  test("winnow fingerprint invariant under repartitioning") {
    import spark.implicits._
    val docs = (0 until 64).map(i => (i.toLong, s"document number $i with some shared words " * 3))
    def fps(parts: Int) = docs.toDF("id", "text").repartition(parts)
      .select($"id", TextExpressions.winnowFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1) == fps(7))
  }

  test("property: int8 kernel quantization equals its declarative HOF twin") {
    // ivfqGeomFrames emits BOTH encodings (binary for the Spark scorer,
    // int array for the oracle twin) from two implementations of
    // floor(x*127/maxabs + 0.5); this pins them value-identical so an
    // edit to one cannot silently desynchronize oracle from engine.
    import spark.implicits._
    check(Prop.forAll(vecGen) { (v: List[Float]) =>
      val row = Seq(Tuple1(v)).toDF("v")
        .select(col("v").cast("array<float>").as("v"))
        .select(VectorExpressions.int8Quantize($"v").as("bytes"),
          graft.operators.Similarity.quantizeInt8($"v")._2.as("ints"))
        .collect().head
      val bytes = row.getAs[Array[Byte]](0)
      val ints = row.getSeq[Int](1)
      bytes.length == ints.length &&
        bytes.indices.forall(i => bytes(i).toInt == ints(i))
    })
  }

  test("property: pq_encode is the L2 argmin and ADC is the reconstruction dot") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    val m = 2; val ksub = 4; val dsub = 8
    val cbGen = Gen.listOfN(m,
      Gen.listOfN(ksub, Gen.listOfN(dsub, Gen.chooseNum(-5.0f, 5.0f))))
    val vGen = Gen.listOfN(m * dsub, Gen.chooseNum(-5.0f, 5.0f))
    check(Prop.forAll(cbGen, vGen, vGen) { (cbl, x, q) =>
      val cb: Array[Array[Array[Float]]] =
        cbl.map(_.map(_.toArray).toArray).toArray
      def arr(v: List[Float]): ArrayData = new GenericArrayData(v.toArray)
      val codes = VectorExpressions.PqEncode(Literal(null), cb)
        .nullSafeEval(arr(x)).asInstanceOf[ArrayData]
      // reference argmin: brute L2 per subspace, ties to the first code
      val wantCodes = (0 until m).map { j =>
        (0 until ksub).minBy { c =>
          (0 until dsub).foldLeft(0.0) { (s, i) =>
            val d = x(j * dsub + i).toDouble - cb(j)(c)(i).toDouble
            s + d * d
          }
        }
      }
      val encOk = (0 until m).forall(j => codes.getInt(j) == wantCodes(j))
      // ADC(lut(q), codes(x)) must equal dot(q, reconstruction(x)) exactly
      val lut = VectorExpressions.PqLut(Literal(null), cb)
        .nullSafeEval(arr(q)).asInstanceOf[ArrayData]
      val adc = VectorExpressions.PqAdc(Literal(null), Literal(null))
        .nullSafeEval(lut, codes).asInstanceOf[Double]
      val recon = (0 until m).flatMap(j => cb(j)(codes.getInt(j)))
      val wantDot = (0 until m).map { j =>
        (0 until dsub).foldLeft(0.0) { (s, i) =>
          s + q(j * dsub + i).toDouble * recon(j * dsub + i).toDouble
        }
      }.sum // per-subspace partials summed in j order = the kernel's fold
      encOk && adc == wantDot
    })
  }

  test("pq_adc yields null on shape mismatch instead of throwing") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val adc = VectorExpressions.PqAdc(Literal(null), Literal(null))
    def lut(n: Int) = new GenericArrayData(Array.fill(n)(1.0))
    def codes(cs: Int*) = new GenericArrayData(cs.toArray)
    // empty code word (m = 0): would divide by zero without the guard
    assert(adc.nullSafeEval(lut(8), codes()) == null)
    // LUT length not a multiple of m: mismatched artifact generations
    assert(adc.nullSafeEval(lut(7), codes(0, 1)) == null)
    // code out of [0, ksub): corrupted lists read against a smaller book
    assert(adc.nullSafeEval(lut(8), codes(0, 4)) == null)
    assert(adc.nullSafeEval(lut(8), codes(-1, 0)) == null)
    // well-formed input still scores
    assert(adc.nullSafeEval(lut(8), codes(3, 0)) == 2.0)
    // same contract through the codegen path (DataFrame evaluation)
    import spark.implicits._
    val rows = Seq(
      (Array.fill(8)(1.0), Array(3, 0)),   // ok -> 2.0
      (Array.fill(8)(1.0), Array[Int]()),  // m = 0 -> null
      (Array.fill(7)(1.0), Array(0, 1)),   // stride mismatch -> null
      (Array.fill(8)(1.0), Array(0, 9)))   // code >= ksub -> null
      .toDF("lut", "codes")
      .select(VectorExpressions.pqAdc(col("lut"), col("codes")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(rows.toSeq == Seq(2.0, null, null, null))
  }
}
