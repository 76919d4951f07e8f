package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","spread","sf"}.
  *
  * One untimed warm-up pass precedes the timed passes so the numbers
  * measure steady-state engine throughput (plans JIT-compiled, code
  * generated, parquet footers cached) rather than first-iteration JVM
  * warm-up — the regime a long-running cluster actually operates in. Each
  * query is then timed SPARK_GRAFT_REPEATS (default 3) times and reported
  * as the per-query MEDIAN with a (max−min)/median spread, so one noisy
  * run can neither mask nor mimic a real regression.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q01_x,q02_y limits the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // Execute the FULL physical plan: Dataset.count() plans a new
    // count-aggregate over the query, letting Catalyst prune every projected
    // column and eliminate the final sort — a map-heavy query would
    // benchmark as a bare scan. toRdd produces the final plan's rows.
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()

    // warm-up pass (untimed; failures reported on the timed pass)
    names.foreach { name =>
      try run(name)
      catch { case e: Throwable =>
        System.err.println(s"BENCH WARMUP ERROR $name: $e")
      }
    }

    // let the warm-up pass's async cleanup (ContextCleaner block removal,
    // GC of cached/checkpointed data) settle so it doesn't bill the first
    // timed query — observed as a one-off 5-7 s spike on whatever ran first
    System.gc()
    Thread.sleep(2000)

    // timed pass — a failing query must be VISIBLE, not a ~0s entry.
    // MEDIAN of `repeats` runs per query: a single sample cannot be told
    // apart from environment noise (round 6's committed bench ran 1.3×
    // slower than round 5 on byte-identical code), while the median of 3
    // absorbs a one-off GC pause / page-cache miss on any single run. The
    // per-query spread (max−min)/median is reported alongside so a reader
    // can tell a stable 1.3× regression from a noisy environment.
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS").map(_.toInt).getOrElse(3)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedOnce(name: String): Double = {
      // GC + settle between runs: without it, a heavy-allocation
      // query's garbage is collected and its checkpoint/cache blocks are
      // dropped (async ContextCleaner) DURING whichever query runs next —
      // observed as 3-9× one-off inflation on the follower (x29 8.4 s
      // in-run vs 1.6 s isolated; e02 billed e01's eviction at 50×). The
      // pause is untimed: entries measure the query, not the
      // predecessor's cleanup.
      System.gc()
      Thread.sleep(250)
      val t0 = System.nanoTime()
      try run(name)
      catch { case e: Throwable =>
        System.err.println(s"BENCH ERROR $name: $e")
        errors(name) = e.toString
      }
      (System.nanoTime() - t0) / 1e9
    }
    val samples = names.map(name => name -> Seq.fill(repeats)(timedOnce(name)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = samples.map { case (n, xs) => n -> median(xs) }
    val spreads = samples.map { case (n, xs) =>
      val m = median(xs)
      n -> (if (m > 0) math.rint((xs.max - xs.min) / m * 1000) / 1000 else 0.0)
    }

    def jstr(s: String): String =
      // truncate BEFORE escaping — cutting after could split a 2-char
      // escape and leave a dangling backslash that breaks the JSON line
      "\"" + s.take(200).replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","note":"per-query median of $repeats timed runs after 1 warm-up; spread=(max-min)/median per query","repeats":$repeats,"queries":$qs,"spread":$sp,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the driver keeps only a truncated tail of stdout in its committed
    // artifact; ALSO write the whole line to a parseable file so per-query
    // numbers survive into the round evidence (BENCH_full_r{N}.json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full_latest.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    // and a medians-only companion ({query: sec} + total, nothing else) —
    // small enough to survive any artifact truncation and diff cleanly
    // across rounds
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","queries":$qs}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out.replaceAll("\\.json$", "") + "_medians.json"),
      (compact + "\n").getBytes("UTF-8"))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
