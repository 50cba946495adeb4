package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Custom Catalyst expressions for the hot numeric kernels.
  *
  * The built-in higher-order functions (`zip_with` + `aggregate`) evaluate
  * a lambda per element through interpreted `Expression.eval` — on a
  * 2M-pair × 64-dim cosine join that is ~400M lambda invocations and
  * dominated the bench. These expressions compile to a tight primitive
  * loop via `doGenCode` (preference order per the design brief: built-ins
  * → custom Expression → custom physical operator).
  *
  * Determinism contract: accumulation is sequential in element order, in
  * double precision — bit-identical to the DuckDB oracle's per-pair fold.
  */
object VectorExpressions {

  /** Σ a(i)·b(i) over two float arrays, accumulated in double. */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash folded from an array of 64-bit token hashes: bit b of
    * the result is set iff Σ_tokens (bit b of hash ? +1 : −1) > 0. */
  case class SimHashFromHashes(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val counts = ctx.freshName("counts")
        val out = ctx.freshName("out")
        s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $a.numElements(); $i++) {
          long $h = $a.getLong($i);
          for (int $b = 0; $b < 64; $b++) {
            $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counts[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature: for each of `k` salted rehashes, the minimum over
    * the input hash array. Matches `min(xxhash64(h, i))` semantics (Spark
    * folds xxhash64 args: hashLong(i, hashLong(h, 42))) in one pass. */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val sig = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < hs.numElements()) {
        val base = XXH64.hashLong(hs.getLong(i), 42L)
        var j = 0
        while (j < k) {
          val v = XXH64.hashLong(j.toLong, base)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val base = ctx.freshName("base")
        val v = ctx.freshName("v")
        val sig = ctx.freshName("sig")
        val xxh = classOf[XXH64].getName
        s"""
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $i = 0; $i < $a.numElements(); $i++) {
          long $base = $xxh.hashLong($a.getLong($i), 42L);
          for (int $j = 0; $j < $k; $j++) {
            long $v = $xxh.hashLong((long) $j, $base);
            if ($v < $sig[$j]) $sig[$j] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH signature of a float vector: bit p is the sign
    * of Σ_i v(i)·plane(p,i), planes derived deterministically as
    * `xxhash64(p, i) / 2^63` (identical to the HOF formulation it
    * replaces: Spark's xxhash64(a,b) folds hashLong(b, hashLong(a, 42))). */
  case class RhpSignature(child: Expression, nBits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "rhp_signature"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var sig = 0L
      var p = 0
      while (p < nBits) {
        val pBase = XXH64.hashLong(p.toLong, 42L)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val plane = XXH64.hashLong(i.toLong, pBase).toDouble / 9.223372036854776e18
          dot += v.getFloat(i).toDouble * plane
          i += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val sig = ctx.freshName("sig")
        val pBase = ctx.freshName("pBase")
        val xxh = classOf[XXH64].getName
        s"""
        int $n = $a.numElements();
        long $sig = 0L;
        for (int $p = 0; $p < $nBits; $p++) {
          long $pBase = $xxh.hashLong((long) $p, 42L);
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ((double) $a.getFloat($i)) *
              (((double) $xxh.hashLong((long) $i, $pBase)) / 9.223372036854776e18);
          }
          if ($dot >= 0) $sig |= (1L << $p);
        }
        ${ev.value} = $sig;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-table random-hyperplane bucket codes of a float vector: element
    * t = the `bitsPerTable`-bit bucket whose bit b is the sign of the
    * dot with plane p = t·bitsPerTable + b — the SAME plane derivation
    * and bucket layout as [[RhpSignature]] + shiftright extraction, but
    * without packing all planes into one 64-bit signature, so any
    * tables × bitsPerTable works. (The packed form silently corrupts
    * beyond 64 total bits: Java shifts mod 64, so plane p ≥ 64 ORs its
    * sign into bit p−64 — a consistent but unintended hash family, and
    * one [[RhpMultiProbe]]'s unpacked probes cannot match.) For
    * configurations within 64 bits the emitted buckets are bit-identical
    * to the packed path. */
  case class RhpTableBuckets(child: Expression, tables: Int, bitsPerTable: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rhp_table_buckets"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < bitsPerTable) {
          val p = t * bitsPerTable + b
          val pBase = XXH64.hashLong(p.toLong, 42L)
          var dot = 0.0
          var i = 0
          while (i < n) {
            val plane = XXH64.hashLong(i.toLong, pBase).toDouble / 9.223372036854776e18
            dot += v.getFloat(i).toDouble * plane
            i += 1
          }
          if (dot >= 0) bucket |= (1L << b)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val t = ctx.freshName("t")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val bucket = ctx.freshName("bucket")
        val buckets = ctx.freshName("buckets")
        val pBase = ctx.freshName("pBase")
        val xxh = classOf[XXH64].getName
        s"""
        int $n = $a.numElements();
        long[] $buckets = new long[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          long $bucket = 0L;
          for (int $b = 0; $b < $bitsPerTable; $b++) {
            long $pBase = $xxh.hashLong((long) ($t * $bitsPerTable + $b), 42L);
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += ((double) $a.getFloat($i)) *
                (((double) $xxh.hashLong((long) $i, $pBase)) / 9.223372036854776e18);
            }
            if ($dot >= 0) $bucket |= (1L << $b);
          }
          $buckets[$t] = $bucket;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Query-directed multi-probe bucket sequence for random-hyperplane
    * LSH (Lv et al., VLDB'07, adapted to hyperplane signatures): for
    * each of `tables` sub-signatures of `bitsPerTable` bits, emit the
    * base bucket plus the `probes − 1` buckets obtained by flipping the
    * LEAST-CONFIDENT bit subsets — ranked by the summed squared
    * hyperplane margins of the flipped bits, enumerated in increasing
    * score with the standard extend/shift heap (so two small-margin
    * flips can outrank one large-margin flip). A query then inspects
    * the buckets its near neighbors most plausibly landed in, which
    * buys the recall that deeper (scale-adaptive) bucket codes cost —
    * without touching the corpus side: corpus vectors still insert into
    * exactly one bucket per table.
    *
    * Hyperplanes and bucket layout are bit-identical to [[RhpSignature]]
    * (bucket bit j of table t = global signature bit t·bitsPerTable+j),
    * so probe buckets join directly against [[RhpSignature]]-built
    * corpus buckets. Output: array of tables × probes longs,
    * table-major, base bucket first per table — may contain duplicate
    * (table, bucket) pairs when 2^bitsPerTable < probes; dedup after
    * the explode. */
  case class RhpMultiProbe(child: Expression, tables: Int, bitsPerTable: Int,
                           probes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rhp_multi_probe"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val out = new Array[Long](tables * probes)
      val margins = new Array[Double](bitsPerTable)
      val order = new Array[Int](bitsPerTable)
      var t = 0
      while (t < tables) {
        var base = 0L
        var b = 0
        while (b < bitsPerTable) {
          val p = t * bitsPerTable + b
          val pBase = XXH64.hashLong(p.toLong, 42L)
          var dot = 0.0
          var i = 0
          while (i < n) {
            val plane = XXH64.hashLong(i.toLong, pBase).toDouble / 9.223372036854776e18
            dot += v.getFloat(i).toDouble * plane
            i += 1
          }
          if (dot >= 0) base |= (1L << b)
          margins(b) = dot * dot
          b += 1
        }
        // bit indices by increasing |margin| (the flip-plausibility order)
        var k = 0
        while (k < bitsPerTable) { order(k) = k; k += 1 }
        // insertion sort on margins — bitsPerTable is small
        var s = 1
        while (s < bitsPerTable) {
          val oi = order(s); val om = margins(oi)
          var j = s - 1
          while (j >= 0 && margins(order(j)) > om) { order(j + 1) = order(j); j -= 1 }
          order(j + 1) = oi
          s += 1
        }
        out(t * probes) = base
        // heap of flip subsets over margin-sorted positions: seed {0};
        // pop S → emit; push S+extend (add pos max+1) and S+shift
        // (replace max with max+1) — enumerates by increasing Σ margin²
        val heap = new java.util.PriorityQueue[(Double, List[Int])](
          11, (a: (Double, List[Int]), b: (Double, List[Int])) =>
            java.lang.Double.compare(a._1, b._1))
        if (bitsPerTable > 0) heap.add((margins(order(0)), List(0)))
        var emitted = 1
        while (emitted < probes && !heap.isEmpty) {
          val (score, subset) = heap.poll()
          var bucket = base
          subset.foreach(pos => bucket ^= (1L << order(pos)))
          out(t * probes + emitted) = bucket
          emitted += 1
          val mx = subset.head // subsets kept max-first
          if (mx + 1 < bitsPerTable) {
            heap.add((score + margins(order(mx + 1)), (mx + 1) :: subset))
            heap.add((score - margins(order(mx)) + margins(order(mx + 1)),
              (mx + 1) :: subset.tail))
          }
        }
        // fewer subsets than probes (tiny bitsPerTable): pad with base
        while (emitted < probes) { out(t * probes + emitted) = base; emitted += 1 }
        t += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("rhpMultiProbe", this, classOf[RhpMultiProbe].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct w-gram hashes from an array of per-word hashes: each gram
    * hash chains its words' hashes through XXH64 — replaces the
    * slice+concat+hash-string HOF formulation (which built 1M+ strings
    * per 5k docs and dominated the dedup profile). Output is sorted
    * (set semantics downstream: intersection/minhash). */
  case class HashShingles(child: Expression, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hash_shingles"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements() - w + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = XXH64.hashLong(hs.getLong(i), 42L)
        var j = 1
        while (j < w) { h = XXH64.hashLong(hs.getLong(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      var uniq = 1
      i = 1
      while (i < n) {
        if (out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashShingles", this, classOf[HashShingles].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** POSITIONAL w-gram hashes from an array of per-word hashes: one
    * 64-bit chained-XXH64 hash per token offset, IN OFFSET ORDER and
    * with duplicates kept — the rolling-shingle sibling of
    * [[HashShingles]] (which sorts and dedups for set semantics). Used
    * as the cheap no-false-negative candidate key of the substring-dedup
    * count pass: equal span text ⟹ equal token hashes ⟹ equal key, so a
    * 64-bit count ≥ 2 over these keys is an exact superset of the md5
    * duplicate set, without materializing a span STRING per offset. */
  case class HashShinglesAll(child: Expression, w: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hash_shingles_all"

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements() - w + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Long])
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = XXH64.hashLong(hs.getLong(i), 42L)
        var j = 1
        while (j < w) { h = XXH64.hashLong(hs.getLong(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hashShinglesAll", this, classOf[HashShinglesAll].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`keep` nearest centroids (cosine, ties by centroid id) of a
    * float-vector column, computed MAP-SIDE against a driver-collected
    * centroid matrix — the IVF assignment step with zero shuffle (replaces
    * a corpus×nlist crossJoin + row_number window, which shuffled the
    * whole corpus keyed by vector id). `centroids` is small by contract
    * (nlist ≤ 2^12), so it rides into codegen as a reference object the
    * way a broadcast var would ride into a task. */
  case class NearestCentroids(child: Expression, centIds: Array[Long],
                              centroids: Array[Array[Float]], keep: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "nearest_centroids"

    @transient private lazy val centNorms: Array[Double] = centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var vn = 0.0
      var i = 0
      while (i < n) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
      vn = math.sqrt(vn)
      val m = centroids.length
      val sims = new Array[Double](m)
      var c = 0
      while (c < m) {
        val cent = centroids(c)
        // A dimension mismatch would silently truncate the dot product and
        // mis-assign cells — return null (SQL contract) instead so the row
        // drops out visibly rather than landing in a wrong cell.
        if (cent.length != n) return null
        var dot = 0.0
        i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
        sims(c) = dot / (vn * centNorms(c))
        c += 1
      }
      // partial selection: keep ≤ nprobe is tiny, m ≤ 2^12
      val out = new Array[Long](math.min(keep, m))
      val taken = new Array[Boolean](m)
      var r = 0
      while (r < out.length) {
        var best = -1
        c = 0
        while (c < m) {
          if (!taken(c) && (best < 0 || sims(c) > sims(best) ||
              (sims(c) == sims(best) && centIds(c) < centIds(best)))) best = c
          c += 1
        }
        taken(best) = true
        out(r) = centIds(best)
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
      val tmp = ctx.freshName("cells")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Two-level (coarse → children) nearest-centroid assignment — lifts
    * [[NearestCentroids]]' dense-scan ceiling (O(nlist × dim) per row) to
    * O((ncoarse + probed children) × dim): rank the `coarseCents` by
    * cosine, take the `coarseProbes` best coarse cells, then the top-`keep`
    * by cosine over only THEIR fine children (ties to the smaller
    * centroid id, [[NearestCentroids]] order). Same map-side discipline —
    * the whole index rides into codegen as a reference object; the
    * corpus is never shuffled by assignment.
    *
    * APPROXIMATION CONTRACT: a vector whose true nearest fine centroid
    * hangs under a coarse cell outside its `coarseProbes` best is
    * assigned to the best fine centroid among the probed children —
    * deterministic, possibly not the global argmax. For SemDeDup-style
    * clustering that shifts cell boundaries, never correctness:
    * near-identical vectors follow the same deterministic path and land
    * in the same cell. Null on dimension mismatch ([[NearestCentroids]]
    * contract). */
  case class TwoLevelNearestCentroid(child: Expression,
      coarseCents: Array[Array[Float]], childLists: Array[Array[Int]],
      centIds: Array[Long], centroids: Array[Array[Float]], coarseProbes: Int,
      keep: Int = 1)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "two_level_nearest_centroids"

    @transient private lazy val coarseNorms: Array[Double] = coarseCents.map(norm)
    @transient private lazy val fineNorms: Array[Double] = centroids.map(norm)
    private def norm(c: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val dim = if (centroids.nonEmpty) centroids(0).length else -1
      if (n != dim) return null
      var vn = 0.0
      var i = 0
      while (i < n) { val x = v.getFloat(i).toDouble; vn += x * x; i += 1 }
      vn = math.sqrt(vn)
      def cos(c: Array[Float], cn: Double): Double = {
        var dot = 0.0; var j = 0
        while (j < n) { dot += v.getFloat(j).toDouble * c(j).toDouble; j += 1 }
        dot / (vn * cn)
      }
      // top-`coarseProbes` coarse cells (selection over ncoarse sims)
      val m = coarseCents.length
      val sims = new Array[Double](m)
      var c = 0
      while (c < m) { sims(c) = cos(coarseCents(c), coarseNorms(c)); c += 1 }
      val taken = new Array[Boolean](m)
      // candidate fine cells = children of the probed coarse cells
      val candIdx = new scala.collection.mutable.ArrayBuffer[Int](coarseProbes * 8)
      val candSim = new scala.collection.mutable.ArrayBuffer[Double](coarseProbes * 8)
      var r = 0
      while (r < math.min(coarseProbes, m)) {
        var best = -1
        c = 0
        while (c < m) {
          if (!taken(c) && (best < 0 || sims(c) > sims(best))) best = c
          c += 1
        }
        taken(best) = true
        val kids = childLists(best)
        var k = 0
        while (k < kids.length) {
          val f = kids(k)
          candIdx += f
          candSim += cos(centroids(f), fineNorms(f))
          k += 1
        }
        r += 1
      }
      // top-`keep` by (sim desc, centId asc) over the candidate pool
      val outLen = math.min(keep, candIdx.length)
      if (outLen == 0) return null
      val used = new Array[Boolean](candIdx.length)
      val out = new Array[Long](outLen)
      var o = 0
      while (o < outLen) {
        var best = -1
        var j = 0
        while (j < candIdx.length) {
          if (!used(j) && (best < 0 || candSim(j) > candSim(best) ||
              (candSim(j) == candSim(best) &&
                centIds(candIdx(j)) < centIds(candIdx(best))))) best = j
          j += 1
        }
        used(best) = true
        out(o) = centIds(candIdx(best))
        o += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("twoLevelNearest", this,
        classOf[TwoLevelNearestCentroid].getName)
      val tmp = ctx.freshName("cells")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Symmetric max-abs int8 quantization of a float vector into a BINARY
    * column — the compact storage form [[Int8VecDot]] scores. Per
    * element: `floor(x·127/maxabs + 0.5)` (identical formula to
    * [[graft.operators.Similarity.quantizeInt8]]'s SQL form, so the two
    * stores agree bit-for-bit); all-zero input → all-zero bytes. The
    * per-vector scale is deliberately NOT emitted: cosine of two
    * max-abs-quantized vectors cancels both scales. */
  case class Int8Quantize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def prettyName: String = "int8_quantize"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var maxabs = 0.0
      var i = 0
      while (i < n) {
        val a = math.abs(v.getFloat(i).toDouble)
        if (a > maxabs) maxabs = a
        i += 1
      }
      val out = new Array[Byte](n)
      if (maxabs > 0) {
        i = 0
        while (i < n) {
          out(i) = math.floor(v.getFloat(i).toDouble * 127.0 / maxabs + 0.5).toInt.toByte
          i += 1
        }
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("int8Quantize", this, classOf[Int8Quantize].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = (byte[]) $ref.nullSafeEval($a);"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Σ a(i)·b(i) over two int8 vectors stored as BINARY columns,
    * accumulated in long — the first-stage scoring kernel for quantized
    * ANN lists (4× less memory bandwidth than float arrays; exact
    * integer arithmetic, bit-deterministic). Stops at the shorter
    * length, like [[FloatVecDot]]. */
  case class Int8VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "int8_vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Array[Byte]]
      val y = b.asInstanceOf[Array[Byte]]
      val n = math.min(x.length, y.length)
      var acc = 0L
      var i = 0
      while (i < n) { acc += x(i).toLong * y(i).toLong; i += 1 }
      java.lang.Long.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
        int $n = java.lang.Math.min($a.length, $b.length);
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ((long) $a[$i]) * ((long) $b[$i]);
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Product-quantization encoder: split the float vector into
    * `codebooks.length` contiguous subspaces and emit, per subspace, the
    * index of the L2-NEAREST sub-centroid (argmin ‖x_j − c‖², ties to the
    * smaller code since the scan keeps the first minimum — deterministic).
    * Null when the vector length is not m × dsub (the
    * [[NearestCentroids]] mismatch contract). L2, not cosine: the code
    * minimizes RECONSTRUCTION error, which bounds the ADC inner-product
    * error by ‖q‖·‖x−x̂‖ — a direction-only assignment would discard
    * sub-vector magnitude, which the inner product needs. */
  case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_encode"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = codebooks.length
      val dsub = codebooks(0)(0).length
      if (v.numElements() != m * dsub) return null
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          val cent = cb(c)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = v.getFloat(j * dsub + i).toDouble - cent(i).toDouble
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      val tmp = ctx.freshName("codes")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-query ADC lookup table: lut[j·ksub + c] = Σ_i q[j·dsub+i]·cb[j][c][i],
    * accumulated sequentially in double (element order — the oracle's
    * list arithmetic folds identically). Computed ONCE per query row;
    * every candidate then scores in O(m) array lookups ([[PqAdc]])
    * instead of O(dim) multiplies — the classic PQ bandwidth win. Null
    * on dimension mismatch. */
  case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "pq_lut"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = codebooks.length
      val ksub = codebooks(0).length
      val dsub = codebooks(0)(0).length
      if (v.numElements() != m * dsub) return null
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var c = 0
        while (c < ksub) {
          val cent = cb(c)
          var dot = 0.0
          var i = 0
          while (i < dsub) {
            dot += v.getFloat(j * dsub + i).toDouble * cent(i).toDouble
            i += 1
          }
          out(j * ksub + c) = dot
          c += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      val tmp = ctx.freshName("lut")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
        Object $tmp = $ref.nullSafeEval($a);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Asymmetric-distance score: Σ_j lut[j·ksub + codes[j]] — the
    * approximate inner product ⟨q, x̂⟩ from a [[PqLut]] table and a
    * [[PqEncode]] code word, summed in subspace order in double. ksub is
    * recovered from the operand shapes (lut length = m·ksub, codes
    * length = m). */
  case class PqAdc(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"
    // null on shape mismatch (empty code word, LUT not a multiple of m,
    // code out of [0, ksub)) — the same null-on-mismatch contract as
    // PqEncode/PqLut, so a corrupted or cross-generation lists artifact
    // read against different codebooks surfaces as null scores (dropped
    // candidates) instead of an index-out-of-bounds deep in codegen
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val lut = a.asInstanceOf[ArrayData]
      val codes = b.asInstanceOf[ArrayData]
      val m = codes.numElements()
      if (m == 0 || lut.numElements() % m != 0) return null
      val ksub = lut.numElements() / m
      var acc = 0.0
      var j = 0
      while (j < m) {
        val c = codes.getInt(j)
        if (c < 0 || c >= ksub) return null
        acc += lut.getDouble(j * ksub + c)
        j += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val j = ctx.freshName("j")
        val m = ctx.freshName("m")
        val ksub = ctx.freshName("ksub")
        val acc = ctx.freshName("acc")
        val c = ctx.freshName("c")
        val bad = ctx.freshName("bad")
        s"""
        int $m = $b.numElements();
        boolean $bad = ($m == 0 || $a.numElements() % $m != 0);
        double $acc = 0.0;
        if (!$bad) {
          int $ksub = $a.numElements() / $m;
          for (int $j = 0; $j < $m && !$bad; $j++) {
            int $c = $b.getInt($j);
            if ($c < 0 || $c >= $ksub) { $bad = true; }
            else { $acc += $a.getDouble($j * $ksub + $c); }
          }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
        """
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Norm of the PQ RECONSTRUCTION: √(Σ_j ‖cb[j][codes[j]]‖²) — the
    * denominator that turns [[PqAdc]]'s inner product into an
    * approximate cosine. Per-(subspace, code) squared norms are cached
    * once per operator instance; evaluation is m lookups + one sqrt. */
  case class PqReconNorm(child: Expression, codebooks: Array[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_recon_norm"

    @transient private lazy val sqNorms: Array[Array[Double]] =
      codebooks.map(_.map { c =>
        var s = 0.0
        var i = 0
        while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
        s
      })

    override def nullSafeEval(input: Any): Any = {
      val codes = input.asInstanceOf[ArrayData]
      val m = codes.numElements()
      var s = 0.0
      var j = 0
      while (j < m) { s += sqNorms(j)(codes.getInt(j)); j += 1 }
      java.lang.Double.valueOf(math.sqrt(s))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqReconNorm", this, classOf[PqReconNorm].getName)
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = ((java.lang.Double) $ref.nullSafeEval($a)).doubleValue();"
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Column-facing wrappers.
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDot(GraftBridge.expr(a), GraftBridge.expr(b)))
  def int8VecDot(a: Column, b: Column): Column =
    GraftBridge.column(Int8VecDot(GraftBridge.expr(a), GraftBridge.expr(b)))
  def int8Quantize(vec: Column): Column =
    GraftBridge.column(Int8Quantize(GraftBridge.expr(vec)))
  def simhashFromHashes(h: Column): Column =
    GraftBridge.column(SimHashFromHashes(GraftBridge.expr(h)))
  def minhashSig(h: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expr(h), k))
  def rhpSig(vec: Column, nBits: Int): Column =
    GraftBridge.column(RhpSignature(GraftBridge.expr(vec), nBits))
  def rhpMultiProbe(vec: Column, tables: Int, bitsPerTable: Int,
                    probes: Int): Column =
    GraftBridge.column(RhpMultiProbe(GraftBridge.expr(vec), tables,
      bitsPerTable, probes))
  def rhpTableBuckets(vec: Column, tables: Int, bitsPerTable: Int): Column =
    GraftBridge.column(RhpTableBuckets(GraftBridge.expr(vec), tables,
      bitsPerTable))
  def hashShingles(wordHashes: Column, w: Int): Column =
    GraftBridge.column(HashShingles(GraftBridge.expr(wordHashes), w))
  def hashShinglesAll(wordHashes: Column, w: Int): Column =
    GraftBridge.column(HashShinglesAll(GraftBridge.expr(wordHashes), w))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expr(vec), codebooks))
  def pqLut(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqLut(GraftBridge.expr(vec), codebooks))
  def pqAdc(lut: Column, codes: Column): Column =
    GraftBridge.column(PqAdc(GraftBridge.expr(lut), GraftBridge.expr(codes)))
  def pqReconNorm(codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqReconNorm(GraftBridge.expr(codes), codebooks))
  def nearestCentroids(vec: Column, centIds: Array[Long],
                       centroids: Array[Array[Float]], keep: Int): Column =
    GraftBridge.column(NearestCentroids(GraftBridge.expr(vec), centIds, centroids, keep))
  def twoLevelNearestCentroids(vec: Column, coarseCents: Array[Array[Float]],
      childLists: Array[Array[Int]], centIds: Array[Long],
      centroids: Array[Array[Float]], coarseProbes: Int, keep: Int = 1): Column =
    GraftBridge.column(TwoLevelNearestCentroid(GraftBridge.expr(vec),
      coarseCents, childLists, centIds, centroids, coarseProbes, keep))

  /** Register SQL-facing names so `spark.sql("SELECT vec_dot(a,b) ...")`
    * works (FunctionRegistry extension point). Idempotent — re-registering
    * logs a "replaced a previously registered function" warning per call. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    def once(name: String)(body: => Unit): Unit =
      if (!reg.functionExists(FunctionIdentifier(name))) body
    once("vec_dot") {
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    }
    once("simhash64_from_hashes") {
      reg.createOrReplaceTempFunction("simhash64_from_hashes",
        exprs => SimHashFromHashes(exprs.head), "scala_udf")
    }
    once("int8_quantize") {
      reg.createOrReplaceTempFunction("int8_quantize",
        exprs => Int8Quantize(exprs.head), "scala_udf")
    }
    once("int8_vec_dot") {
      reg.createOrReplaceTempFunction("int8_vec_dot",
        exprs => Int8VecDot(exprs(0), exprs(1)), "scala_udf")
    }
  }
}
