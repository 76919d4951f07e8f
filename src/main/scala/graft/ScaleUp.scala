package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence data generator: replicate the sf0.1 fact tables ×N with
  * shifted keys to a target directory, producing an sf≈N/10 dataset WITHOUT
  * touching the read-only driver testdata.
  *
  * Purpose: run [[Bench]] one order of magnitude above the per-round sf0.1
  * to demonstrate the plans hold as data grows (no blow-up in the
  * shuffle-heavy dedup/component/LSH paths), not to re-check correctness —
  * the DuckDB oracle gate stays on the driver's own sf0.01.
  *
  * Key scheme: replica r shifts every fact-table primary key by r·10⁷
  * (well above any sf0.1 key), so keys stay unique; foreign keys INTO the
  * dimension tables (custkey, partkey, suppkey, user_id) are left alone, so
  * each dimension row simply gains N× the fact rows — the realistic
  * direction of growth. `documents.text` is replicated verbatim, which
  * plants exact-duplicate groups of size N: the dedup/LSH/component queries
  * get denser candidate buckets than at sf0.1 — a harder, not easier, run.
  * Output is written through the session's shuffle parallelism (multi-file
  * parquet, multiple row groups), so scans split like a real dataset
  * instead of the testdata's single-row-group-per-table layout.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <destDir> [replicas=10]`.
  */
object ScaleUp {

  /** Tables copied as-is (dimensions — small at every scale). */
  val dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Fact table → primary-key column shifted per replica. */
  val facts: Map[String, String] = Map(
    "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", // FK to orders: shifted IDENTICALLY so joins hold
    "events" -> "event_id",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  val shiftPerReplica = 10000000L

  def replicate(df: DataFrame, keyCol: String, replicas: Int): DataFrame =
    df.withColumn("graft_r",
        explode(array((0 until replicas).map(r => lit(r.toLong)): _*)))
      .withColumn(keyCol, col(keyCol) + col("graft_r") * shiftPerReplica)
      .drop("graft_r")

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/graft_sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dims.foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")
    }
    facts.foreach { case (name, key) =>
      // raw read (no ts conversion): the copy keeps the source's physical
      // types so Tables.apply's nanos handling exercises the same path
      val out = replicate(spark.read.parquet(s"$src/$name.parquet"), key, replicas)
      out.repartition(cpus.toInt)
        .write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")
      println(s"SCALEUP $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
