package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  * All math in double (cast from float) with left-to-right summation, so an
  * external oracle (DuckDB list_cosine_similarity) reproduces results
  * bit-for-bit.
  */
object Similarity {

  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ via zip_with + aggregate — codegen'd, no UDF. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

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
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-style bucketed top-k: scores only within the query's sign bucket.
    * Approximate (a true neighbor in another bucket is missed) — the
    * recall/cost tradeoff knob is `dims`. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), signBucket(col(vecCol), dims).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"), signBucket(col(vecCol), dims).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
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
    val v = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
