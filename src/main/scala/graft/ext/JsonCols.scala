package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed promotion of a JSON string column into first-class columns —
  * the distributed form of the reference's detect-JSON → extract → promote
  * loop (etl_pipeline.py:197-218 infers per-batch dicts row by row; here
  * schema-on-read is one codegen'd `from_json` pass).
  *
  * Scale discipline: the promotion itself never infers. [[promote]] takes
  * an explicit schema and is a pure map (from_json + star-expand, stays
  * inside whole-stage codegen, no shuffle, no driver round-trip).
  * [[inferSchema]] is the bounded front door for when the schema is
  * unknown: it samples at most `sampleRows` rows (a `limit`, so the scan
  * short-circuits — never a full pass over 100 TB) and runs Spark's own
  * JSON schema inference on just that sample. Infer once, persist the
  * schema, promote everywhere — the 100 TB pass is always the flat map.
  */
object JsonCols {

  /** Promote `jsonCol` into typed top-level columns via `from_json` with an
    * explicit `schema`. Existing columns are kept (minus `jsonCol` itself
    * when `dropSource`); malformed rows yield nulls (PERMISSIVE), matching
    * the reference's skip-bad-records behavior (etl_pipeline.py:85-90). */
  def promote(
      df: DataFrame, jsonCol: String, schema: StructType,
      dropSource: Boolean = true): DataFrame = {
    val kept = df.columns.filterNot(c => dropSource && c == jsonCol)
    require(!schema.fieldNames.exists(kept.contains),
      s"promoted fields collide with existing columns: " +
        schema.fieldNames.filter(kept.contains).mkString(", "))
    df.withColumn("graft_json", from_json(col(jsonCol), schema))
      .select(kept.map(col) :+ col("graft_json.*"): _*)
  }

  /** Infer the JSON column's schema from a bounded sample (default 10k
    * rows). The `limit` keeps this a short-circuiting scan prefix — on a
    * 100 TB table it reads a handful of row groups, not the corpus. */
  def inferSchema(
      df: DataFrame, jsonCol: String, sampleRows: Int = 10000): StructType = {
    val sample: Dataset[String] = df
      .filter(col(jsonCol).isNotNull)
      .select(col(jsonCol).cast("string"))
      .limit(sampleRows)
      .as(Encoders.STRING)
    // malformed sample rows surface as the corrupt-record column; that is
    // parse bookkeeping, not a data field — promotion nulls bad rows instead
    val corrupt = df.sparkSession.sessionState.conf.columnNameOfCorruptRecord
    StructType(df.sparkSession.read.json(sample).schema
      .filterNot(_.name == corrupt))
  }
}
