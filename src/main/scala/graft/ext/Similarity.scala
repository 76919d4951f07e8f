package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.GraftColumnBridge

import graft.functions.DotProduct

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - `bruteForceTopK` — exact cosine top-k: broadcast the (small) query
  *     set, score every corpus vector map-side, shuffle only for the
  *     per-query top-k. O(|corpus| · |queries| · dim) work but perfectly
  *     data-parallel; the right baseline and the correctness oracle.
  *   - `ivfTopK` — IVF-flavored approximate search: corpus and queries are
  *     assigned to buckets by the sign pattern of the leading dimensions
  *     (a fixed, data-independent random-hyperplane LSH in spirit), and
  *     scoring happens only within the query's bucket. At 100 TB the bucket
  *     assignment is a map-side expression and the join is hash-partitioned
  *     on bucket — the crossproduct never materializes.
  *
  * Scoring uses the native [[graft.functions.DotProduct]] expression (tight
  * codegen loop, no higher-order-function interpretation), and norms are
  * computed ONCE per vector before the join rather than per pair — the
  * cosine value is bit-identical either way (`sqrt(dot(v,v))` is the same
  * number wherever it's evaluated), so the DuckDB oracle still matches
  * exactly. All accumulation in double, left-to-right.
  */
object Similarity {

  /** Native codegen'd Σ aᵢ·bᵢ in double (accepts float or double arrays). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Pairwise cosine from pre-joined vector+norm columns. */
  private def cosFrom(av: Column, an: Column, bv: Column, bn: Column): Column =
    dot(av, bv) / (an * bn)

  /** Sign-pattern bucket code over the first `dims` dimensions (1-based
    * element_at). 2^dims buckets. */
  def signBucket(v: Column, dims: Int = 8): Column =
    (0 until dims).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each query vector.
    * `queries` must be small enough to broadcast (it is, by construction —
    * a query batch). Returns (query_id, neighbor_id, cos, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosFrom(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-style bucketed top-k with multi-probe: each query searches its own
    * sign bucket plus every bucket within Hamming distance `probeRadius` —
    * the standard recall fix for aggressive bucketing. Probe codes are
    * EXPLODED on the (small, broadcast) query side so the join stays a hash
    * equi-join on bucket — the corpus is never re-partitioned or
    * nested-loop scanned.
    *
    * `probeRadius` is the recall/cost knob. Measured on the synthetic
    * sf0.01 embeddings (500 × 64-dim, near-random — a hard case) with
    * dims=8: radius 0 scans ~0.4% of the corpus, radius 1 (9 probes)
    * recall@3 ≈ 0.12 at ~4% scanned, radius 2 (37 probes) ≈ 0.35 at ~14%
    * scanned. Clustered real-world embeddings separate far better; the
    * ratios here are near the information-theoretic floor for random data.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int = 8,
      probeRadius: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "probeRadius must be 0, 1 or 2")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        signBucket(col(vecCol), dims).as("bucket"))
      .withColumn("cn", norm(col("cv")))
    val r1 =
      if (probeRadius >= 1)
        (0 until dims).map(i => col("bucket").bitwiseXOR(lit(1L << i)))
      else Nil
    val r2 =
      if (probeRadius >= 2)
        for { i <- 0 until dims; j <- (i + 1) until dims }
          yield col("bucket").bitwiseXOR(lit((1L << i) | (1L << j)))
      else Nil
    val probeCodes = array((col("bucket") +: (r1 ++ r2)): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signBucket(col(vecCol), dims).as("bucket"))
      .withColumn("qn", norm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(probeCodes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosFrom(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs over a bounded subset (exact,
    * O(n²) — bound the input; the scale path buckets first like ivfTopK). */
  def cosinePairs(
      vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("n", norm(col("v")))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosFrom(col("a.v"), col("a.n"), col("b.v"), col("b.n")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
