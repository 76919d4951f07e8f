package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered funnels and cohort retention, the
  * two standard questions a 100 TB event stream gets asked.
  *
  * Both are expressed as keyed aggregates and equi-joins only (every
  * shuffle is on the high-cardinality user key; event-type filters are
  * map-side and reach the scan), so they hold their shape at any scale —
  * no per-user windows over full histories, no sequence reassembly.
  */
object Behavior {

  /** Ordered funnel: for each user, the earliest strictly-increasing
    * completion times of `steps` — step i+1 must happen AFTER the user's
    * earliest step-i time (the standard earliest-completion funnel
    * semantics). Returns converting users only: (userCol, t1..tk) as epoch
    * MICROSECONDS (comparisons and outputs pinned to µs so engines with
    * different native timestamp precisions agree).
    *
    * Shape: one filtered aggregate per step, each joined to the previous
    * frontier on the user key — the frontier only shrinks, so later steps
    * join ever-smaller sides; AQE broadcasts them when they fit. */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val us = unix_micros(col(tsCol))
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(us).as("t1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (frontier, (step, i)) =>
      val (prev, cur) = (s"t${i + 1}", s"t${i + 2}")
      val carried = (1 to i + 1).map(j => col(s"t$j"))
      events.filter(col(typeCol) === step)
        .select(col(userCol), us.as("graft_us"))
        .join(frontier, userCol)
        .filter(col("graft_us") > col(prev))
        .groupBy((col(userCol) +: carried): _*)
        .agg(min(col("graft_us")).as(cur))
    }
  }

  /** Event-rate anomaly detection: hourly event counts z-scored against
    * the trailing `trailing` observed hours; hours with |z| ≥ `minZ` (and
    * a full trailing window) are flagged — the ops-side spike/drop monitor
    * over an event stream.
    *
    * Determinism: the trailing aggregates are INTEGER sums (count, Σcnt,
    * Σcnt²) — exact in any order — and the float math is three pinned ops
    * (mean = s/n; var = q/n − mean·mean; z = (cnt − mean)/√var), so
    * engines agree bit-for-bit before the final rounding.
    *
    * Scale shape: the raw stream collapses to one row per hour in a
    * map-combined aggregate FIRST; the ordered window then runs over the
    * tiny hourly rollup (8760 rows/year), not the events — a global window
    * there is free. Gaps (hours with zero events) are not back-filled;
    * the trailing window is over OBSERVED hours.
    *
    * @return (hour 'yyyy-MM-dd HH:00', n_events, z) for flagged hours */
  def rateAnomalies(
      events: DataFrame, tsCol: String,
      trailing: Int = 24, minZ: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy(date_format(date_trunc("hour", col(tsCol)),
        "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("hour")).rowsBetween(-trailing, -1)
    val stats = hourly
      .withColumn("graft_n", count(lit(1)).over(w))
      .withColumn("graft_s", sum(col("n_events")).over(w))
      .withColumn("graft_q",
        sum(col("n_events") * col("n_events")).over(w))
      .filter(col("graft_n") === trailing)
    val mean = col("graft_s").cast("double") / col("graft_n")
    val variance = col("graft_q").cast("double") / col("graft_n") - mean * mean
    stats
      .withColumn("graft_var", variance)
      // var > 0 (bit-identical across engines) rather than a NaN/±inf
      // z-filter: NaN ordering differs between engines, var doesn't
      .filter(col("graft_var") > 0.0)
      .withColumn("graft_z", (col("n_events") - mean) / sqrt(col("graft_var")))
      .filter(abs(col("graft_z")) >= minZ)
      .select(col("hour"), col("n_events"), round(col("graft_z"), 4).as("z"))
  }

  /** Event-type transition matrix: counts of consecutive (from → to)
    * event-type pairs within each user's time-ordered stream — the
    * first-order Markov view of user behavior ("what follows what"), and
    * the standard input to next-action models and funnel discovery.
    *
    * Shape: ONE window, partitioned by the high-cardinality user key (no
    * global sort, no single-partition window); each user's history sorts
    * within its partition, then the (from, to) count is a tiny aggregate
    * with map-side combine. Ordering is pinned to (epoch-µs, idCol) so
    * same-timestamp ties break identically in any engine. */
  def transitions(
      events: DataFrame, userCol: String, tsCol: String, idCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    events.select(col(userCol), col(idCol), col(tsCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Rolling `windowDays`-day active users (WAU-style): for every
    * observed day, the count of DISTINCT users active in the trailing
    * window ending that day.
    *
    * SQL's "COUNT(DISTINCT) OVER (RANGE ...)" doesn't exist in any
    * engine for a reason — a distinct set can't ride a sliding frame. The
    * scale shape instead: collapse events to distinct (day, user) rows
    * map-side, EXPLODE each into its `windowDays` member windows (a pure
    * map: ×7 of an already-tiny relation), and count-distinct per window
    * day — partial aggregation dedups (window, user) before the exchange.
    * Windows with no earlier data are still emitted (they count whatever
    * the partial trailing window holds), and days beyond the last
    * observed day are dropped. Returns (day 'yyyy-MM-dd', n_active). */
  def rollingActiveUsers(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    val dayUser = events
      .select(to_date(col(tsCol)).as("graft_day"), col(userCol).as("graft_u"))
      .distinct()
    val maxDay = dayUser.agg(max(col("graft_day"))).collect()(0).getDate(0)
    dayUser
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("graft_k"),
        col("graft_day"), col("graft_u"))
      .select(date_add(col("graft_day"), col("graft_k")).as("graft_w"),
        col("graft_u"))
      .filter(col("graft_w") <= lit(maxDay))
      .groupBy(date_format(col("graft_w"), "yyyy-MM-dd").as("day"))
      .agg(count_distinct(col("graft_u")).as("n_active"))
  }

  /** Daily cohort retention: users grouped by their first-ever event day,
    * counted distinct per (cohort day, day offset) they were active.
    * Returns (cohort_day 'yyyy-MM-dd', day_offset, n_users).
    *
    * Shape: one user-keyed aggregate for the cohort day, one join back on
    * the user key, one (cohort, offset) aggregate — count_distinct's
    * partial aggregation dedups (cohort, offset, user) map-side. */
  def retention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val cohorts = events.groupBy(col(userCol))
      .agg(min(day).as("graft_cohort"))
    events.select(col(userCol), day.as("graft_day"))
      .join(cohorts, userCol)
      .groupBy(
        date_format(col("graft_cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("graft_day"), col("graft_cohort")).cast("long")
          .as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
