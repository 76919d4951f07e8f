package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-locate join keys at WRITE time so repeated
  * joins on those keys run with NO shuffle on either side.
  *
  * At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⋈ orders)
  * is shuffling both inputs. Writing both tables bucketed by the join key
  * into the same bucket count makes Spark's scan report a compatible
  * `HashPartitioning`, and the SortMergeJoin consumes both sides in place —
  * the Exchange disappears from the plan (asserted in BucketingSpec). The
  * price is paid once at ingestion, amortized over every downstream join —
  * the standard layout for a curated lakehouse fact table.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting any previous one).
    * Buckets AND sorts within buckets by `keyCols` so merge joins skip both
    * the exchange and the sort. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      keyCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table written by [[writeBucketed]]. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
