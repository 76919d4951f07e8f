package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement aid for the optimization rounds (guide §1): run ONE declared
  * query (after an untimed warm-up pass, like [[Bench]]) and print one line
  * per Spark JOB — wall ms and the call site that submitted it — then a
  * per-call-site rollup. A fixture-heavy query (the state-lifecycle gates)
  * is tens of small actions; this attributes its seconds to the operator
  * call sites that spend them, which the total alone cannot.
  *
  * Usage: ProfileQuery <name[,name...]> [sfDir]  (env as Bench: SPARK_GRAFT_CPUS)
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach(profileOne(spark, sfDir, _))
    spark.stop()
  }

  private def profileOne(
      spark: SparkSession, sfDir: String, name: String): Unit = {
    val fn = SparkEntry.queries(name)
    // warm-up (JIT, codegen, footer caches) — profile the steady state
    fn(spark, sfDir).queryExecution.toRdd.count()
    // GC + settle between passes (the Bench discipline): without it the
    // profiled pass is billed the warm-up's async checkpoint/cache
    // eviction — observed 3-4x inflation on materialize-heavy queries
    System.gc()
    Thread.sleep(500)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val stageTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0)
    val sqlExecs = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    val sqlDone = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // attribute the job to the deepest graft frame in the call site
        // (stage details carry the submitting stack)
        val site = js.stageInfos.iterator
          .flatMap(si => (si.details.split("\n").iterator ++
              Iterator(si.name))
            .filter(l => l.contains("graft.") && !l.contains("ProfileQuery")))
          .map(_.trim.stripPrefix("at "))
          .nextOption()
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
        jobs.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, (System.nanoTime() - t0) / 1000000L))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageTasks.addAndGet(sc.stageInfo.numTasks.toLong)
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          sqlExecs.put(s.executionId, (s.description, System.nanoTime()))
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
          Option(sqlExecs.remove(s.executionId)).foreach { case (d, t0) =>
            sqlDone.add((s.executionId, d, (System.nanoTime() - t0) / 1000000L))
          }
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).queryExecution.toRdd.count()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    Thread.sleep(500) // let the async listener bus drain
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val all = done.asScala.toSeq.sortBy(_._1)
    println(s"== $name: wall ${wallMs} ms, ${all.size} jobs, " +
      s"${stageTasks.get()} tasks, ${taskTimeMs.get()} ms task time ==")
    println("-- by job call site --")
    all.groupBy(_._2).toSeq
      .map { case (site, xs) => (xs.map(_._3).sum, xs.size, site) }
      .sortBy(-_._1)
      .foreach { case (ms, n, site) => println(f"$ms%7d ms  n=$n%-4d $site") }
    val execs = sqlDone.asScala.toSeq
    println(s"-- by SQL execution site (${execs.size} executions) --")
    execs.groupBy(_._2).toSeq
      .map { case (site, xs) => (xs.map(_._3).sum, xs.size, site) }
      .sortBy(-_._1)
      .foreach { case (ms, n, site) => println(f"$ms%7d ms  n=$n%-4d $site") }
  }
}
