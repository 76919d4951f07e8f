package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Skew-free per-key ordinal assignment.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ...)` funnels n/k rows
  * through a single task per key value — fatal when the key has a handful of
  * values (event types, record kinds) and n is 100 TB-scale. This operator
  * produces the identical ordinal with the two-phase zipWithIndex pattern
  * (same as the chunked-pipeline ordinal reconstruction,
  * [[graft.etl.Pipeline.processChunkedFile]]):
  *
  *   1. range-partition + sort by the global order columns (parallel sort);
  *   2. job 1: count rows per (partition, key) — k × numPartitions entries
  *      to the driver;
  *   3. prefix-sum offsets per key in partition order (driver, tiny);
  *   4. job 2: re-walk each partition assigning offset + local running index.
  *
  * Both jobs MUST run over the one materialized RDD: Dataset actions re-plan
  * per action and `repartitionByRange` re-samples its boundaries on each
  * planning, so two Dataset actions could see different partitionings and
  * the offsets would land on the wrong rows. A single `.rdd` pins one
  * physical plan; the second job reuses the first's shuffle output.
  */
object Ordinals {

  /** Append `outCol` = 0-based ordinal of the row within its `keyCol` group,
    * ordered by `orderCols` globally. Fully parallel at any key cardinality. */
  def perKeyOrdinal(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      outCol: String = "ordinal"): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)

    val sortedRdd = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .rdd

    val perPartCounts: Array[(Int, Map[Any, Long])] =
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
        it.foreach(r => m(r.get(keyIdx)) += 1L)
        Iterator.single((pid, m.toMap))
      }.collect()

    val offsets: Map[(Int, Any), Long] = {
      val running = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
      perPartCounts.sortBy(_._1).flatMap { case (pid, counts) =>
        counts.map { case (k, n) =>
          val start = running(k)
          running(k) = start + n
          (pid, k) -> start
        }
      }.toMap
    }
    val offsetsB = spark.sparkContext.broadcast(offsets)

    val outRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.Map.empty[Any, Long].withDefaultValue(0L)
      it.map { r =>
        val k = r.get(keyIdx)
        val ord = offsetsB.value.getOrElse((pid, k), 0L) + local(k)
        local(k) += 1L
        Row.fromSeq(r.toSeq :+ ord)
      }
    }
    spark.createDataFrame(outRdd, df.schema.add(outCol, LongType, nullable = false))
  }
}
