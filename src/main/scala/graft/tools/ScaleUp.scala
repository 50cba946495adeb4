package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: replicate a testdata scale dir N× with
  * domain-consistent key offsets, so per-query scaling ratios can be
  * measured one order of magnitude up from the largest driver-provided
  * scale factor (`Bench` pointed at the output dir).
  *
  * Every copy `k` offsets EVERY key/id column by `k × 10⁹` — one global
  * offset keeps foreign keys consistent (an order's `o_custkey + k·10⁹`
  * still matches its customer's `c_custkey + k·10⁹`), and joins match
  * within a copy exactly like the original, so join selectivities and
  * group cardinalities scale linearly the way a genuinely bigger corpus
  * would. `region`/`nation` stay as-is (TPC-H holds them fixed across
  * scale factors) and nation/region FOREIGN KEYS are not offset, so
  * every copy's customers still land in the 25 real nations.
  *
  * Two columns are deliberately perturbed per copy so the scaled corpus
  * is 10 ISOMORPHIC, mutually-DISSIMILAR shards — each copy reproduces
  * the original's internal duplicate/similarity structure, and copies
  * share (almost) nothing with each other, so pair counts and cluster
  * sizes scale linearly the way a genuinely 10× corpus's would. (A mere
  * suffix token would leave every document 9 near-duplicate twins: the
  * dup GRAPH would densify ~45× and a scaling probe would measure
  * duplicate-density growth, not data growth.)
  *  - `documents.text`: copy k > 0 suffixes EVERY token with `_k` — a
  *    consistent within-copy renaming (shingle structure isomorphic to
  *    the original) that shares no shingles across copies;
  *  - `embeddings.embedding`: copy k applies a SEEDED SIGNED
  *    PERMUTATION of the dimensions (seed = mix of `offsetBase` and
  *    `k`). A signed permutation matrix is orthogonal, so every
  *    within-copy norm and cosine is preserved — and because the
  *    transform only reorders components and flips signs, the
  *    isometry is BIT-EXACT in floating point (a Givens/Householder
  *    rotation would be correct only to rounding error and cost
  *    O(d²)). Cross-copy, two shards differ by another random signed
  *    permutation, so similarities decorrelate; distinct copies
  *    collide with probability ~1/(d!·2^d) — negligible at any dim
  *    ≥ 8 — so the scheme is valid at ARBITRARY copy counts (the old
  *    rotation×negation scheme cycled at 2×dim copies, which is why
  *    sf100 embeddings didn't exist until round 14).
  *
  * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <outDir> [copies=10]
  * [offsetBase=10⁹]`.
  *
  * CHAINED DECADES: a third-rung corpus can be built FROM a scaled dir
  * (e.g. sf10 → sf100 with copies=10). `offsetBase` must exceed
  * firstPassCopies × 10⁹ or the two passes' key offsets collide (copy
  * sums repeat → duplicate ids); pass e.g. 1000000000000. Embeddings
  * chain too: the transform seed incorporates `offsetBase`, which the
  * key-collision rule already forces to differ between passes, so the
  * two passes draw INDEPENDENT signed permutations and the composed
  * transform of shard (k, j) — one more signed permutation — repeats
  * neither pass's nor any other shard's (the round-13 scheme had
  * (k,j) ≡ (j,k) because cyclic rotations commute; random signed
  * permutations don't). Document token suffixes compose fine
  * (`w_k_j` — still a within-copy renaming, still cross-copy
  * disjoint), as do plain key offsets.
  */
object ScaleUp {
  private val Offset = 1000000000L

  /** Key/id columns to offset per copy, by table. Attribute columns and
    * nation/region foreign keys are left untouched. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  private val passthrough = Seq("region", "nation")

  /** splitmix64 finalizer — decorrelates consecutive (offset, copy)
    * seeds before they reach java.util.Random's LCG. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The signed permutation for copy `k`, encoded as 1-based signed
    * source indices: output(i) = sign(s)·embedding(|s|) for
    * s = result(i). Copy 0 is the identity (the original shard
    * survives byte-identical, like documents/keys). Deterministic
    * across JVMs: java.util.Random's algorithm is fixed by its spec,
    * and the seed depends only on (offsetBase, copy). */
  private[tools] def signedPerm(dim: Int, copy: Long, offset: Long): Array[Int] =
    if (copy == 0L) Array.tabulate(dim)(_ + 1)
    else {
      val rnd = new java.util.Random(mix64(offset) ^ mix64(copy))
      val perm = Array.tabulate(dim)(identity)
      var i = dim - 1
      while (i > 0) { // Fisher–Yates
        val j = rnd.nextInt(i + 1)
        val t = perm(i); perm(i) = perm(j); perm(j) = t
        i -= 1
      }
      Array.tabulate(dim)(i => (perm(i) + 1) * (if (rnd.nextBoolean()) 1 else -1))
    }

  def scaleTable(df: DataFrame, table: String, copies: Int,
                 offset: Long = Offset): DataFrame = {
    val copied = df.withColumn("_copy",
      explode(sequence(lit(0L), lit(copies - 1L))))
    val keyed = keyCols.getOrElse(table, Seq.empty).foldLeft(copied) {
      (acc, c) => acc.withColumn(c, col(c) + col("_copy") * offset)
    }
    val perturbed = table match {
      case "documents" =>
        keyed.withColumn("text",
          when(col("_copy") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                w => concat(w, lit("_"), col("_copy"))), " ")))
      case "embeddings" =>
        // Per-copy seeded signed permutation (see object scaladoc):
        // bit-exact orthogonal transform, valid at arbitrary copy
        // counts. The copies×dim signed-index table is built on the
        // driver (≤ a few hundred KB even at 1000 copies) and shipped
        // as one nested array literal; each row does O(d) element_at
        // lookups inside codegen — no join, no shuffle, no FP error
        // beyond the sign flip (which is exact).
        // Validate dimensionality up front instead of sampling one
        // arbitrary row: a null embedding or ragged dims would
        // otherwise surface mid-job as an opaque ANSI getInt /
        // element_at error. One tiny aggregate (3 longs to the driver).
        val stats = df.agg(
          sum(when(col("embedding").isNull, 1L).otherwise(0L)).as("nulls"),
          min(size(col("embedding"))).as("mn"),
          max(size(col("embedding"))).as("mx")).head()
        if (stats.isNullAt(1)) keyed // empty table — nothing to permute
        else {
          require(stats.getLong(0) == 0L,
            s"[scale-up] table '$table' has ${stats.getLong(0)} null " +
              "embedding rows; clean them before scaling")
          require(stats.getInt(1) == stats.getInt(2),
            s"[scale-up] table '$table' has ragged embedding dims " +
              s"(min=${stats.getInt(1)}, max=${stats.getInt(2)}); a " +
              "signed permutation needs one uniform dimension")
          val dim = stats.getInt(1)
          val sidx: Seq[Seq[Int]] =
            (0L until copies.toLong).map(k => signedPerm(dim, k, offset).toSeq)
          val rowSidx = element_at(typedLit(sidx), col("_copy").cast("int") + 1)
          keyed.withColumn("embedding",
            transform(rowSidx, s =>
              when(s > 0, element_at(col("embedding"), s))
                .otherwise(-element_at(col("embedding"), -s))))
        }
      case _ => keyed
    }
    perturbed.drop("_copy")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <outDir> [copies]")
    val (src, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val offset = if (args.length > 3) args(3).toLong else Offset
    val skip = sys.env.get("SPARK_GRAFT_SCALEUP_SKIP")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    // SPARK_GRAFT_SCALEUP_ONLY=embeddings regenerates a single table
    // into an existing scaled dir (e.g. adding embeddings to an sf100
    // built before the arbitrary-copy isometry existed) without
    // rewriting the other ~24 GB.
    val only = sys.env.get("SPARK_GRAFT_SCALEUP_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = (keyCols.keys.toSeq ++ passthrough)
      .filterNot(skip.contains).filter(t => only.forall(_.contains(t)))
    for (t <- tables.sorted) {
      // Tables handles the events table's INT64 TIMESTAMP(NANOS) (read
      // nanos-as-long, rebuild a micros TimestampType); the scaled copy
      // is then written as plain micros, which Tables also accepts
      val in = graft.queries.Tables(spark, src, t)
      // (the round-13 copies ≤ 2×dim embedding guard is gone: the
      // seeded signed permutation never cycles, so scaleTable is safe
      // at any copy count for library callers and main alike)
      val scaled =
        if (passthrough.contains(t)) in else scaleTable(in, t, copies, offset)
      // repartition before write: the source tables are single-file,
      // single-row-group parquet (unsplittable — scans arrive as ONE
      // partition), and a genuinely 10× corpus is many files. Without
      // this the scaled corpus inherits the pathology ×10 and every
      // sf1 measurement charges queries for a serial scan no real
      // corpus would impose.
      val parts = if (passthrough.contains(t)) 1
        else spark.sparkContext.defaultParallelism
      scaled.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale-up] $t: ${in.count()} -> ${scaled.count()} rows")
    }
    spark.stop()
  }
}
