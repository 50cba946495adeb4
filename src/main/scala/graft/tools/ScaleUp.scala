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
  *  - `embeddings.embedding`: copy k rotates the dimensions by k — an
  *    exact isometry within the copy (all within-copy cosines
  *    preserved), while cross-copy similarities decorrelate.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <outDir> [copies=10]
  * [offsetBase=10⁹]`.
  *
  * CHAINED DECADES: a third-rung corpus can be built FROM a scaled dir
  * (e.g. sf10 → sf100 with copies=10), with two constraints the args
  * encode. (1) `offsetBase` must exceed firstPassCopies × 10⁹ or the
  * two passes' key offsets collide (copy sums repeat → duplicate ids);
  * pass e.g. 1000000000000. (2) embeddings must be SKIPPED
  * (`SPARK_GRAFT_SCALEUP_SKIP=embeddings`): composing two
  * rotation×negation isometries repeats — copies (k,j) and (j,k) get
  * IDENTICAL vectors, so cross-copy duplicate density would grow with
  * copies instead of data. Document token suffixes compose fine
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
        // Rotation is an exact isometry but CYCLES at dim copies: raw
        // slice lengths go negative past it (the sf10 crash), and a
        // mod-only fix would hand copies k and k+dim IDENTICAL vectors
        // (cross-copy cosine 1.0 — duplicate density would grow with
        // copies instead of data). Rotate by k mod dim and NEGATE every
        // second dim-cycle: negation preserves every within-copy cosine
        // and turns the repeated rotation anti-parallel (cosine −1),
        // keeping the shards mutually dissimilar up to 2×dim copies
        // (enforced in main).
        val dim = size(col("embedding"))
        val rot = pmod(col("_copy"), dim.cast("long")).cast("int")
        val rotated = when(rot === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), rot + 1, dim - rot),
            slice(col("embedding"), lit(1), rot)))
        val negated = floor(col("_copy") / dim.cast("long")) % 2 === 1
        keyed.withColumn("embedding",
          when(negated, transform(rotated, x => -x)).otherwise(rotated))
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
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = (keyCols.keys.toSeq ++ passthrough).filterNot(skip.contains)
    for (t <- tables.sorted) {
      // Tables handles the events table's INT64 TIMESTAMP(NANOS) (read
      // nanos-as-long, rebuild a micros TimestampType); the scaled copy
      // is then written as plain micros, which Tables also accepts
      val in = graft.queries.Tables(spark, src, t)
      if (t == "embeddings") {
        val dim = in.select(size(col("embedding"))).head().getInt(0)
        require(copies <= 2 * dim,
          s"rotation×negation yields $dim×2 distinct isometries; " +
            s"copies=$copies would repeat shards (dim=$dim)")
      }
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
