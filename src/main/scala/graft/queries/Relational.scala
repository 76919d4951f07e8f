package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** SURVEY.md §2.10 declared relational query corpus (Q01–Q18).
  *
  * Each query exercises the Spark primitive that one reference-operator row of
  * SURVEY §2 maps to (reference = Riya17171/ETL-PIPELINE2.0, cited per query),
  * is deterministic (explicit ORDER BY on a unique key), and has a DuckDB
  * oracle with IDENTICAL column names (see [[graft.SparkEntry.oracleSql]]).
  *
  * Scale notes (the engine targets ~100 TB on a real cluster; local[32] only
  * verifies correctness):
  *   - Filters/projections are pushed to the parquet scan (Catalyst).
  *   - Aggregations use partial (map-side) aggregation for free via groupBy.
  *   - Dimension-table joins (nation, region) are explicitly broadcast;
  *     fact-fact joins are left to AQE, which converts to broadcast when the
  *     runtime size allows and handles skew otherwise.
  *   - The global count (Q03) is a driver-side `count()` + `lit`, NOT
  *     `Window.partitionBy()` (which would funnel all rows into one partition).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Q01 — scan + filter + projection (ref: residual text filter,
    * etl_pipeline.py:104-113). Both predicates reach the parquet scan. */
  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q02 — groupBy-count (ref: items_by_type, etl_pipeline.py:402-405). */
  def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** Q03 — global count stamped on every row (ref: total_items,
    * etl_pipeline.py:269-271). Driver-side count + lit instead of an
    * unpartitioned window: two jobs, but no single-partition shuffle. */
  def q03(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val total = e.count()
    e.select(col("event_id"), lit(total).as("total_items"))
      .orderBy("event_id")
      .limit(100)
  }

  /** Q04 — per-kind ordinal (ref: source_index ordinal, E6,
    * etl_pipeline.py:169-195). NOT a `Window.partitionBy(event_type)`:
    * event_type has ~5 values, so that window funnels n/5 rows through one
    * task each at scale. [[graft.ext.Ordinals.perKeyOrdinal]] computes the
    * identical ordinal with a fully parallel two-phase pass. */
  def q04(s: SparkSession, dir: String): DataFrame =
    graft.ext.Ordinals.perKeyOrdinal(
        t(s, dir, "events").select("event_type", "event_id"),
        "event_type", Seq("event_id"))
      .orderBy("event_type", "event_id")
      .limit(200)

  /** Q05 — source_index = "{type}_{ordinal}" (ref: etl_pipeline.py:177-194).
    * Same skew-free ordinal as q04. */
  def q05(s: SparkSession, dir: String): DataFrame =
    graft.ext.Ordinals.perKeyOrdinal(
        t(s, dir, "events").select("event_type", "event_id"),
        "event_type", Seq("event_id"))
      .select(concat(
        col("event_type"), lit("_"), col("ordinal").cast("string"))
        .as("source_index"))
      .orderBy("source_index")
      .limit(200)

  /** Q06 — type-precedence sort (ref: normalize regroup N2,
    * etl_pipeline.py:232-258). */
  def q06(s: SparkSession, dir: String): DataFrame = {
    val prec = when(col("event_type") === "click", 0)
      .when(col("event_type") === "view", 1)
      .when(col("event_type") === "purchase", 2)
      .otherwise(3)
    t(s, dir, "events")
      .select("event_id", "event_type")
      .orderBy(prec, col("event_id"))
      .limit(100)
  }

  /** Q07 — vertical union with shared schema (ref: normalize concat N3,
    * etl_pipeline.py:260-264 → unionByName). */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
    val sup = t(s, dir, "supplier")
      .select(col("s_name").as("name"), col("s_acctbal").as("bal"))
    c.unionByName(sup).orderBy("name", "bal")
  }

  /** Q08 — distinct (ref: block dedup A6, etl_pipeline.py:79,87-88,102). */
  def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select("p_brand", "p_type")
      .distinct()
      .orderBy("p_brand", "p_type")

  /** Q09 — JSON field extraction (ref: extract_json E2,
    * etl_pipeline.py:127-137). get_json_object is codegen'd; no UDF. */
  def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")
      .limit(100)

  /** Q10 — whitespace word count (ref: extract_text E4,
    * etl_pipeline.py:153-159). Pure string expressions, stays inside
    * whole-stage codegen. */
  def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .cast("long").as("word_count"))
      .orderBy("doc_id")
      .limit(100)

  /** Q11 — substring title + paragraph-length filter (ref: E4 + D4,
    * etl_pipeline.py:112,157). */
  def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(length(trim(col("text"))) > 5)
      .select(col("doc_id"), substring(col("text"), 1, 50).as("title"))
      .orderBy("doc_id")
      .limit(100)

  /** Q12 — coalesce/nullif coercion (ref: numeric coercion N5,
    * etl_pipeline.py:279-282). */
  def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        coalesce(
          when(col("o_orderpriority") === "", lit(null))
            .otherwise(col("o_orderpriority")),
          lit("NONE")).as("pr"))
      .orderBy("o_orderkey")
      .limit(100)

  /** Q13 — per-field stats in ONE pass (ref: infer_schema A4,
    * etl_pipeline.py:197-218): present_in = count(col), nulls derived. */
  def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .agg(
        count(lit(1)).as("n"),
        count(col("c_acctbal")).as("present_in"),
        (count(lit(1)) - count(col("c_acctbal"))).as("nulls"))

  /** Q14 — broadcast dim join + agg (SURVEY §2.7). nation is tiny at any
    * scale factor → explicit broadcast, no shuffle of the fact side's rows
    * beyond the final groupBy. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("customers"),
        round(sum("c_acctbal"), 2).as("bal"))
      .orderBy("n_name")
  }

  /** Q15 — TPC-H-style multi-join + agg (SURVEY §2.10). nation/region are
    * broadcast (constant size); lineitem⋈orders⋈customer are key-partitioned
    * shuffles that AQE may convert to broadcast at small SF. Revenue rounded
    * per the declared-query contract (§5.6). */
  def q15(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("r_name")
  }

  /** Q16 — regex detection filter (ref: JSON block detector D2,
    * etl_pipeline.py:81-90 → rlike). */
  def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("text").rlike("join.*filter|filter.*join"))
      .select("doc_id")
      .orderBy("doc_id")

  /** Q17 — hourly windowed agg, batch-equivalent of the streaming shape
    * (SURVEY §2.8). date_trunc + groupBy = tumbling window. */
  def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .orderBy("h", "event_type")

  /** Q18 — semi-join (SURVEY §2.7): left_semi avoids materializing the right
    * side's columns and dedups build-side keys. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q19 — intersect (SURVEY §2.7: set ops free in Spark). */
  def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** Q20 — except: customers without a >300k order. */
  def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("ck"))
      .except(t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("ck")))
      .orderBy("ck")

  /** Q21 — anti-join: customers without a >250k order. left_anti streams
    * the probe side and dedups build keys — no NOT-IN correlated rescan. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_totalprice") > 250000)
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q22 — rollup aggregation (subtotals + grand total). Null ordering is
    * pinned explicitly: Spark defaults nulls-first ASC, DuckDB nulls-last. */
  def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Q23 — exact interpolated median per group (percentile, not approx). */
  def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(round(median(col("o_totalprice")), 2).as("med"))
      .orderBy("o_orderstatus")

  /** Q24 — correlated scalar subquery (Catalyst decorrelates to an
    * aggregate + outer join). Expressed through the SQL surface. */
  def q24(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q24_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_q24_orders")
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM graft_q24_orders o WHERE o.o_custkey = c.c_custkey) AS n
        |FROM graft_q24_customer c ORDER BY c_custkey LIMIT 100""".stripMargin)
  }

  /** Q25 — date-part extraction + grouping on the order date. */
  def q25(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("y", "m")

  /** Q26 — running (cumulative) sum per user in event-time order. The
    * window partitions by user_id — high-cardinality, so it parallelizes;
    * contrast q04/q05 where a ~5-value key forces the two-phase ordinal
    * instead. Explicit ROWS frame so ties behave identically in DuckDB.
    * The sum accumulates in integer CENTS (value is 2-decimal by
    * construction): double window sums are order-dependent and engines
    * accumulate in different orders, so a float sum could round differently
    * at a .005 boundary; the integer sum is exact in any order. */
  def q26(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        (sum(round(col("value") * 100).cast("long")).over(w) / lit(100.0)).as("run"))
      .orderBy("event_id")
      .limit(500)
  }

  /** Q27 — pivot: one count column per event type (explicit value list, so
    * the schema is static and no extra distinct-values job runs). */
  def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      // scope the fill to the pivoted cells: an unscoped fill(0) would also
      // rewrite a null user_id group to 0 and diverge from the oracle
      .na.fill(0, Seq("click", "view", "purchase"))
      .orderBy("user_id")
      .limit(200)

  /** Q28 — ordered string aggregation (collect_list → sort → join): the
    * grouped-concatenation shape (DuckDB string_agg / listagg). Sorting the
    * collected array makes the result order-deterministic regardless of
    * task arrival order; lexicographic on the stringified key both sides. */
  def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_custkey") < 200)
      .groupBy("o_custkey")
      .agg(
        concat_ws(",",
          array_sort(collect_list(col("o_orderkey").cast("string")))).as("orders_csv"),
        count(lit(1)).as("cnt"))
      .orderBy("o_custkey")

  /** Query map fragment contributed to [[graft.SparkEntry.queries]]. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = StrictMap(
    "q01_filter_project" -> (q01 _),
    "q02_groupby_count" -> (q02 _),
    "q03_global_count" -> (q03 _),
    "q04_partition_ordinal" -> (q04 _),
    "q05_source_index" -> (q05 _),
    "q06_precedence_sort" -> (q06 _),
    "q07_union_by_name" -> (q07 _),
    "q08_distinct" -> (q08 _),
    "q09_json_extract" -> (q09 _),
    "q10_word_count" -> (q10 _),
    "q11_substring_filter" -> (q11 _),
    "q12_coalesce_cast" -> (q12 _),
    "q13_field_stats" -> (q13 _),
    "q14_join_agg" -> (q14 _),
    "q15_multi_join" -> (q15 _),
    "q16_regex_detect" -> (q16 _),
    "q17_hourly_window" -> (q17 _),
    "q18_semi_join" -> (q18 _),
    "q19_intersect" -> (q19 _),
    "q20_except" -> (q20 _),
    "q21_anti_join" -> (q21 _),
    "q22_rollup" -> (q22 _),
    "q23_median" -> (q23 _),
    "q24_corr_subquery" -> (q24 _),
    "q25_date_parts" -> (q25 _),
    "q26_running_sum" -> (q26 _),
    "q27_pivot" -> (q27 _),
    "q28_string_agg" -> (q28 _)
  )

  /** DuckDB oracle SQL — column names MUST match the Spark results above. */
  val oracleSql: Map[String, String] = StrictMap(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_groupby_count" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q03_global_count" ->
      """SELECT event_id, count(*) OVER () AS total_items FROM events
        |ORDER BY event_id LIMIT 100""".stripMargin,
    "q04_partition_ordinal" ->
      """SELECT event_type, event_id,
        |  row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS ordinal
        |FROM events ORDER BY event_type, event_id LIMIT 200""".stripMargin,
    "q05_source_index" ->
      """SELECT event_type || '_' ||
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS VARCHAR)
        |  AS source_index
        |FROM events ORDER BY source_index LIMIT 200""".stripMargin,
    "q06_precedence_sort" ->
      """SELECT event_id, event_type FROM events
        |ORDER BY CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
        |  WHEN 'purchase' THEN 2 ELSE 3 END, event_id LIMIT 100""".stripMargin,
    "q07_union_by_name" ->
      """SELECT c_name AS name, c_acctbal AS bal FROM customer
        |UNION ALL SELECT s_name, s_acctbal FROM supplier
        |ORDER BY name, bal""".stripMargin,
    "q08_distinct" ->
      "SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type",
    "q09_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,
    "q10_word_count" ->
      """SELECT doc_id,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS word_count
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin,
    "q11_substring_filter" ->
      """SELECT doc_id, substr(text, 1, 50) AS title FROM documents
        |WHERE length(trim(text)) > 5 ORDER BY doc_id LIMIT 100""".stripMargin,
    "q12_coalesce_cast" ->
      """SELECT o_orderkey,
        |  coalesce(CAST(NULLIF(o_orderpriority, '') AS VARCHAR), 'NONE') AS pr
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q13_field_stats" ->
      """SELECT count(*) AS n, count(c_acctbal) AS present_in,
        |  count(*) - count(c_acctbal) AS nulls FROM customer""".stripMargin,
    "q14_join_agg" ->
      """SELECT n_name, count(*) AS customers, round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q15_multi_join" ->
      """SELECT r_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q16_regex_detect" ->
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(text, 'join.*filter|filter.*join')
        |ORDER BY doc_id""".stripMargin,
    "q17_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c,
        |  round(sum(value), 2) AS v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q18_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q19_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "q20_except" ->
      """SELECT c_custkey AS ck FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY ck""".stripMargin,
    "q21_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q22_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q23_median" ->
      """SELECT o_orderstatus, round(median(o_totalprice), 2) AS med FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q24_corr_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n
        |FROM customer c ORDER BY c_custkey LIMIT 100""".stripMargin,
    "q25_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q26_running_sum" ->
      """SELECT event_id, user_id,
        |  sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / CAST(100.0 AS DOUBLE) AS run
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "q27_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST LIMIT 200""".stripMargin,
    "q28_string_agg" ->
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ','
        |    ORDER BY CAST(o_orderkey AS VARCHAR)) AS orders_csv,
        |  count(*) AS cnt
        |FROM orders WHERE o_custkey < 200
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
