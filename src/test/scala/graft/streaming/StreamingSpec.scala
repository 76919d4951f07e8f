package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.streaming.Sessionize.{SessionAssignment, SessionEvent}

/** Stateful streaming sessionization must agree with the declared batch
  * query's semantics (x13) when the same events are replayed in order
  * across multiple micro-batches. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("streaming sessionization == batch lag/cumsum sessions across micro-batches") {
    // ground truth: the batch window formulation over sf0.001 events
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val newSess = when(
      lag(col("ts_us"), 1).over(w).isNull ||
        (col("ts_us") - lag(col("ts_us"), 1).over(w)) > Sessionize.DefaultGapUs, 1)
      .otherwise(0)
    val expected = e
      .withColumn("session_seq",
        sum(newSess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap

    // replay the same events through the stateful streaming operator in
    // 3 chronological micro-batches
    val events = e.as[(Long, Long, Long)].collect()
      .map { case (id, u, ts) => SessionEvent(id, u, ts) }
      .sortBy(ev => (ev.ts_us, ev.event_id))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.assign(stream.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("sessions").as[SessionAssignment]
        .collect().map(a => a.event_id -> a.session_seq).toMap
      assert(got.size == expected.size)
      val mismatches = expected.collect {
        case (id, s) if got(id) != s => (id, s, got(id))
      }
      assert(mismatches.isEmpty, s"first mismatches: ${mismatches.take(5)}")
    } finally q.stop()
  }

  test("extract_blocks generator works from SQL via LATERAL VIEW") {
    graft.functions.ExtractBlocks.register(spark)
    val content = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/sample_data.txt"))
    Seq(content).toDF("content").createOrReplaceTempView("docs")
    val rows = spark.sql(
      """SELECT eb.block_type, eb.source_index, eb.payload
        |FROM docs LATERAL VIEW extract_blocks(content) eb""".stripMargin)
      .collect()
    assert(rows.length == 27)
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byType == Map("html" -> 3, "json" -> 9, "text" -> 15))
    // payloads are valid JSON records with the type discriminator
    assert(rows.forall(r => graft.etl.Json.isValidObject(r.getString(2))))
  }

  test("extract_blocks rejects non-string input with a clear error") {
    graft.functions.ExtractBlocks.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT extract_blocks(42)").collect()
    }
    assert(err.getMessage.contains("extract_blocks") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
