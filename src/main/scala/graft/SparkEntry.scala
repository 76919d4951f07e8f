package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's declared query
  * (SURVEY §2.10 relational corpus + extension operators); `oracleSql` holds
  * the DuckDB-runnable equivalent with IDENTICAL column names (the driver
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q15: the 5-way TPC-H-style join + regional revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q15(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator: SURVEY §2.10 relational corpus
    * (q01–q28), LLM-pipeline extension operators (x01–x176), and the
    * pipeline end-to-end entries (e01–e03) — 207 queries total (count
    * pinned by QueryMapSpec so this doc cannot drift). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.StrictMap.disjointUnion(
      graft.queries.Relational.queries, graft.queries.Extensions.queries)

  /** For each key in `queries`, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.StrictMap.disjointUnion(
      graft.queries.Relational.oracleSql, graft.queries.Extensions.oracleSql)
}
