package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic relevance /
  * keyword-extraction primitive of a text-data pipeline.
  *
  * Shape at scale (all shuffle keys are high-cardinality):
  *   1. explode tokens → (doc, term) rows; `groupBy(doc, term).count()`
  *      gives tf with map-side partial aggregation — the explode never
  *      materializes through a shuffle unreduced;
  *   2. document frequency is a second aggregate over the (doc, term)
  *      frame — `groupBy(term).count()` on already-distinct pairs;
  *   3. score = tf · ln(N / df), with N stamped as a literal from a
  *      driver-side count (the q03/A1 pattern — no single-partition
  *      window, no cross join);
  *   4. top-k terms per document via row_number over the (doc) window —
  *      doc_id is unique-per-document, so the window partitioning is
  *      as fine as the data itself.
  *
  * Determinism across engines: ties rank by (score desc, term asc); a
  * score tie between engines requires identical (tf, df) inputs, which
  * produce the identical double, so the tie-break is engine-stable. Empty
  * tokens are filtered on both sides (Spark's split drops trailing empties
  * where SQL engines may keep them).
  */
object Tfidf {

  /** Top-`k` TF-IDF terms per document.
    * @return (idCol, term, tf, score, rank), rank 1..k per document
    */
  def topTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val n = docs.count() // driver-side scalar, stamped as a literal below

    val termRows = docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = termRows.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf.join(df, "term")
      .withColumn("score", col("tf") * log(lit(n.toDouble) / col("df")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }
}
