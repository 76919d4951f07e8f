package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more declared
  * queries plus quick node tallies (exchanges, reuse, scans) — the
  * iteration loop for plan work without editing [[Plans]].
  *
  * Usage: `sbt "runMain graft.Explain x17_dedup_lsh[,x18_...] [sfDir]"`.
  * With `SPARK_GRAFT_PLAN_DIR` (+ optional `SPARK_GRAFT_PLAN_SUFFIX`),
  * each plan is ALSO written to `<dir>/<query><suffix>.txt` — how the
  * optimization rounds snapshot before/after plans for the committed
  * evidence (`plans/r{N}/`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq).getOrElse(
      sys.error(s"usage: Explain <queryName>[,<queryName>...] [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = Tables.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR").filter(_.nonEmpty)
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    names.foreach { name =>
      val query = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val plan = Plans.capturePlan(query(spark, sfDir))
      val tallies = Seq("Exchange", "ReusedExchange", "Scan parquet",
        "HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Window")
        .map(node => f"$node%-20s ${node.r.findAllIn(plan).length}")
        .mkString("\n")
      val body = s"$plan\n=== node tallies ===\n$tallies\n"
      println(s"==== $name ====")
      println(body)
      planDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name$suffix.txt"),
          body.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
