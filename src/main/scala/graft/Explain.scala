package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one declared query plus
  * quick node tallies (exchanges, reuse, scans) — the iteration loop for
  * plan work without editing [[Plans]].
  *
  * Usage: `sbt "runMain graft.Explain x17_dedup_lsh [sfDir]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error(s"usage: Explain <queryName> [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val query = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = Tables.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = Plans.capturePlan(query(spark, sfDir))
    println(plan)
    println("=== node tallies ===")
    Seq("Exchange", "ReusedExchange", "Scan parquet", "HashAggregate",
      "SortMergeJoin", "BroadcastHashJoin", "Window").foreach { node =>
      println(f"$node%-20s ${node.r.findAllIn(plan).length}")
    }
    spark.stop()
  }
}
