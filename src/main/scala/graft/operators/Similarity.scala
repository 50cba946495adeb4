package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - [[cosine]]: sequential double fold over the arrays (zip_with +
  *   aggregate) — element order fixed, so the result is bit-deterministic
  *   and matches an oracle computing the same fold.
  * - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *   against the corpus, per-query top-k via window. Scales linearly in
  *   corpus size: the corpus is never shuffled, only scanned.
  * - [[lshTopK]]: scale path — deterministic random-hyperplane signatures;
  *   candidates must share one of `tables` sub-signatures, then exact
  *   re-rank. Turns the all-pairs product into bucket-local work.
  */
object Similarity {

  import graft.functions.VectorExpressions.vecDot

  /** Deterministic double-precision cosine similarity of two float array
    * columns (sequential codegen'd fold ⇒ reproducible bit-for-bit). */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))

  /** Euclidean norm of a float array column. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast side). Norms are
    * precomputed per vector — one dot per pair instead of three. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"),
      vecNorm(col(qVec)).as("qn"))
    val c = corpus.select(col(cId).as("cand_id"), col(cVec).as("cv"),
      vecNorm(col(cVec)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** `nBits`-bit random-hyperplane signature of a float-array column:
    * bit p = sign of the dot product with a hyperplane whose components
    * are `xxhash64-derived uniforms in [-1, 1)` — no RNG state, so
    * signatures are reproducible across runs and executors. Codegen'd
    * ([[graft.functions.VectorExpressions.RhpSignature]]). */
  def rhpSignature(vec: Column, nBits: Int): Column =
    graft.functions.VectorExpressions.rhpSig(vec, nBits)

  /** ANN top-k: candidates share at least one of `tables` sub-signatures
    * (bitsPerTable bits each), exact cosine re-rank within candidates. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              tables: Int = 8, bitsPerTable: Int = 8): DataFrame = {
    val nBits = tables * bitsPerTable
    val mask = (1L << bitsPerTable) - 1
    def sigTables(df: DataFrame, id: String, vec: String, side: String): DataFrame =
      df.select(col(id).as(s"${side}_id"), col(vec).as(s"${side}v"),
          rhpSignature(col(vec), nBits).as("sig"))
        .select(col(s"${side}_id"), col(s"${side}v"),
          posexplode(transform(sequence(lit(0), lit(tables - 1)),
            t => call_function("shiftright", col("sig"), t * bitsPerTable).bitwiseAND(mask))))
        .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "table")

    val q = sigTables(queries, "vec_id", "embedding", "query")
    val c = sigTables(corpus, "vec_id", "embedding", "cand")
    val cands = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "queryv", "cand_id", "candv")
      .dropDuplicates("query_id", "cand_id")
      .withColumn("sim", cosine(col("queryv"), col("candv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into `nlist`
    * centroid cells, search only the `nprobe` cells nearest each query,
    * exact cosine re-rank inside them — the classic
    * cluster-prune-then-rerank scale path (complements [[lshTopK]]).
    *
    * Centroids start as a deterministic pseudo-random corpus sample — the
    * `nlist` vectors with the smallest `xxhash64(vec_id)` — fetched with
    * one `TakeOrderedAndProject` pass (per-partition top-k, driver merge:
    * no count() job, no shuffle), then refined with `trainIters` Lloyd
    * (k-means) iterations whose shuffles carry only (cell, dim,
    * fixed-point partial sum) rows, and carried into the assignment
    * expression the way a broadcast var rides into a task. Assignment of
    * every corpus vector to its cell is MAP-SIDE
    * ([[graft.functions.VectorExpressions.NearestCentroids]]): at 100 TB
    * the corpus is scanned once and never shuffled by the assignment —
    * the only corpus-wide movement left is the final per-query top-k
    * window over candidates inside probed cells, which `nprobe/nlist`
    * bounds.
    *
    * CONTRACT: `queries` is the small side (an online query batch /
    * evaluation set — thousands, not a corpus). With the default
    * `broadcastProbes=true` the probes (queries × nprobe rows) are
    * broadcast so the corpus streams past them without shuffling; a query
    * set too large to broadcast would OOM, so for corpus-scale query sets
    * pass `broadcastProbes=false` to let AQE pick the join strategy (the
    * corpus side then shuffles on cent_id — graceful, not wrong). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              broadcastProbes: Boolean = true,
              trainIters: Int = 2): DataFrame = {
    val centroidRows = corpus
      .select(col("vec_id").cast("long").as("cent_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
      .collect()
    val centIds = centroidRows.map(_.getLong(0))
    var cents = centroidRows.map(_.getSeq[Float](1).toArray)

    // Lloyd refinement: assignment stays MAP-SIDE (NearestCentroids rides
    // into the scan); the mean recompute explodes to (cell, dim, value)
    // and partial-aggregates before the shuffle, so the exchange carries
    // one (cell, dim, partial-sum, count) row per task — corpus bytes
    // never shuffle. Sums are fixed-point longs (order-independent
    // integer adds), so the trained centroids — and therefore cell
    // assignments — are bit-deterministic across runs/partitionings.
    for (_ <- 1 to trainIters) {
      val assigned = corpus.select(
        element_at(graft.functions.VectorExpressions
          .nearestCentroids(col("embedding"), centIds, cents, 1), 1).as("cell"),
        posexplode(col("embedding")))
        // dim-mismatched vectors assign to a null cell by contract
        // (NearestCentroids) — drop them from training like the inverted
        // lists drop them at query time
        .where(col("cell").isNotNull)
      val meanRows = assigned
        .groupBy(col("cell"), col("pos"))
        // decimal(38,0) sum: order-independent exact integer adds with
        // ~2^126 headroom — a long would silently wrap for hot cells of
        // unnormalized embeddings at corpus scale
        .agg(sum(floor(col("col").cast("double") * (1L << 24))
          .cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = meanRows.groupBy(_.getLong(0))
      val idIndex = centIds.zipWithIndex.toMap
      val next = cents.map(_.clone())
      byCell.foreach { case (cell, rows) =>
        val ci = idIndex(cell)
        rows.foreach { r =>
          val pos = r.getInt(1)
          next(ci)(pos) =
            (r.getDecimal(2).doubleValue() / (1L << 24) / r.getLong(3)).toFloat
        }
      }
      cents = next // cells with no members keep their previous centroid
    }
    def nearest(vec: Column, keep: Int): Column =
      graft.functions.VectorExpressions.nearestCentroids(vec, centIds, cents, keep)

    // inverted lists: single nearest cell per corpus vector, zero-shuffle
    val lists = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("candv"),
      vecNorm(col("embedding")).as("candn"),
      element_at(nearest(col("embedding"), 1), 1).as("cent_id"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("queryv"),
      vecNorm(col("embedding")).as("queryn"),
      explode(nearest(col("embedding"), nprobe)).as("cent_id"))
    // cand appears in exactly one cell and probe cells are distinct per
    // query, so (query_id, cand_id) pairs are already unique — no dedup.
    val probesSide = if (broadcastProbes) broadcast(probes) else probes
    val cands = lists.join(probesSide, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Symmetric per-vector int8 quantization (max-abs scaling) — the
    * standard 4× storage/bandwidth reduction for corpus-scale embedding
    * stores; dequantized values sit within scale/2 of the original.
    * Deterministic: `floor(x*127/maxabs + 0.5)` is pure IEEE double math,
    * identical in any engine.
    * @return (scale, quantized int array) — scale = maxabs/127. */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val maxabs = array_max(transform(vec, x => abs(x.cast("double"))))
    val q = when(maxabs > 0,
      transform(vec, x =>
        floor(x.cast("double") * 127.0 / maxabs + 0.5).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))
    (maxabs / 127.0, q)
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold) — LSH-bucketed
    * self-join + exact verify. */
  def cosineDedup(df: DataFrame, threshold: Double,
                  tables: Int = 8, bitsPerTable: Int = 8): DataFrame = {
    val nBits = tables * bitsPerTable
    val mask = (1L << bitsPerTable) - 1
    val sigs = df.select(col("vec_id"), col("embedding"),
        rhpSignature(col("embedding"), nBits).as("sig"))
      .select(col("vec_id"), col("embedding"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)),
          t => call_function("shiftright", col("sig"), t * bitsPerTable).bitwiseAND(mask))))
      .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "table")
    val a = sigs.select(col("table"), col("bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = sigs.select(col("table"), col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
