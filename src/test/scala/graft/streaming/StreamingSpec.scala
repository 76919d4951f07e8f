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

  test("streaming transitions == batch transition matrix across micro-batches") {
    import graft.streaming.TransitionStream.{Transition, TypedEvent}
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    // ground truth: the batch operator the x76 oracle gates
    val expected = graft.ext.Behavior
      .transitions(e, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long)].collect()
      .map { case (f, t, n) => (f, t) -> n }.toMap

    val events = e
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, u, ts, ty) => TypedEvent(id, u, ts, ty) }
      .sortBy(ev => (ev.ts_us, ev.event_id))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[TypedEvent]
    val q = TransitionStream.pairs(stream.toDS())
      .writeStream.format("memory").queryName("transitions_s")
      .outputMode("append").start()
    try {
      // 3 chronological micro-batches: pairs split across batch
      // boundaries must still be emitted exactly once via the state
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("transitions_s").as[Transition].collect()
        .groupBy(t => (t.from_type, t.to_type))
        .map { case (k, v) => k -> v.length.toLong }
      assert(got == expected)
    } finally q.stop()
  }

  test("watermarked windowed agg over a stream matches the batch q17 shape") {
    import org.apache.spark.sql.Row
    import java.sql.Timestamp
    // batch ground truth on sf0.001 events (hour, type, count, sum)
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("event_type"), col("value"))
    val expected = e
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // stream the same events chronologically, then push the watermark past
    // the end with one late sentinel event in a final batch
    implicit val sqlCtx = spark.sqlContext
    val rows = e.orderBy("ts").as[(Timestamp, String, Double)].collect()
    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = WindowedAgg.hourly(
      stream.toDS().toDF("ts", "event_type", "value"), watermarkDelay = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      stream.addData(rows.toSeq)
      q.processAllAvailable()
      // sentinel far in the future closes every real window
      stream.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), "sentinel", 0.0)))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .filter(col("event_type") =!= "sentinel")
        .collect().map((r: Row) => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got.size == expected.size,
        s"windows: got ${got.size}, expected ${expected.size}")
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming first-arrival dedup == batch exact dedup on a replayed stream") {
    import java.sql.Timestamp
    // corpus with planted duplicates: every 3rd doc repeats an earlier text,
    // arriving later in event time under a new id
    val base = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().take(40)
    val docs = base.zipWithIndex.flatMap { case ((id, text), i) =>
      val orig = (id, text, new Timestamp(1700000000000L + i * 1000L))
      if (i % 3 == 0)
        Seq(orig, (id + 100000L, text, new Timestamp(1700000000000L + (i + 40) * 1000L)))
      else Seq(orig)
    }.sortBy(_._3.getTime)
    // ground truth: the batch operator's representatives (min id per text)
    val expected = graft.ext.Dedup.exact(
        docs.map { case (id, text, _) => (id, text) }.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = DedupStream.firstArrivals(
      stream.toDS().toDF("doc_id", "text", "ts"), "ts", "text", horizon = "1 hour")
    val q = out.writeStream.format("memory").queryName("first_arrivals")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("first_arrivals")
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, // first arrival IS the min id: ts follows id order
        s"missing=${expected.diff(got).take(5)} extra=${got.diff(expected).take(5)}")
    } finally q.stop()
  }

  test("streaming near-dup ingest: corpus grows, near/exact dups rejected with audit pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val corpusDir = s"$dir/corpus"
    val pairsDir = s"$dir/pairs"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupIngest(
      stream.toDS().toDF("doc_id", "text"), corpusDir, pairsDir,
      "doc_id", "text", checkpointDir = s"$dir/ckpt")
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again today"
      val b = "an entirely different document about spark shuffles and windows here"
      val short = "hi there" // below shingle size — invisible to the LSH path
      // batch 0: an exact in-batch duplicate collapses before ingest
      stream.addData(Seq((1L, a), (2L, a), (3L, b), (4L, short)))
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L, 4L))
      // batch 1: near-dup of a (1-word change), exact dup of b, an exact
      // dup of the SHORT doc (caught by fingerprint, not LSH), one fresh doc
      val a2 = a.replace("today", "tomorrow")
      val fresh = "completely unrelated vocabulary with many novel words in sequence"
      stream.addData(Seq((10L, a2), (11L, b), (12L, fresh), (13L, short)))
      q.processAllAvailable()
      assert(spark.read.parquet(corpusDir).select("doc_id")
        .as[Long].collect().toSet == Set(1L, 3L, 4L, 12L),
        "near/exact dups of corpus docs must be rejected, fresh docs accepted")
      val pairs = spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((10L, 1L)), s"missing near-dup audit pair in $pairs")
      assert(pairs.contains((11L, 3L)), s"missing exact-dup audit pair in $pairs")
      assert(pairs.contains((13L, 4L)),
        s"missing short-doc exact-dup audit pair in $pairs")
    } finally q.stop()
    // replay semantics: the ingest reads the corpus EXCLUDING the batch's
    // own partition, so a replayed batch must reproduce (not self-reject
    // and wipe) its accepted set. Re-derive batch 1's acceptance the way
    // the replayed lambda would and compare against what batch 1's
    // partition actually holds.
    val corpusMinus1 = spark.read.parquet(corpusDir)
      .filter(col("batch_id") =!= 1L).select("doc_id", "text")
    val batch1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (11L, "an entirely different document about spark shuffles and windows here"),
      (12L, "completely unrelated vocabulary with many novel words in sequence"),
      (13L, "hi there")).toDF("doc_id", "text")
    val replayRejected = graft.ext.Dedup.incrementalLshPairs(
        corpusMinus1, batch1, "doc_id", "text")
      .select("new_id").as[Long].collect().toSet ++
      batch1.filter(org.apache.spark.sql.functions.length(col("text")) < 20)
        .join(corpusMinus1.withColumn("graft_fp", md5(col("text")))
          .select("graft_fp"),
          md5(batch1("text")) === col("graft_fp"))
        .select("doc_id").as[Long].collect().toSet
    val partition1 = spark.read.parquet(s"$corpusDir/batch_id=1")
      .select("doc_id").as[Long].collect().toSet
    assert(partition1 == Set(10L, 11L, 12L, 13L) -- replayRejected,
      s"replay would not reproduce partition 1: $partition1 vs rejected $replayRejected")
    assert(partition1 == Set(12L), "batch 1 must have accepted exactly doc 12")
  }

  test("streaming near-dup ingest from persisted state: same acceptance, O(batch) per batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_state").toString
    val stateDir = s"$dir/state"
    val pairsDir = s"$dir/pairs"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupIngestFromState(
      stream.toDS().toDF("doc_id", "text"), stateDir, pairsDir,
      "doc_id", "text", checkpointDir = s"$dir/ckpt")
    def acceptedIds: Set[Long] = spark.read.parquet(s"$stateDir/members")
      .select("id").as[Long].collect().toSet
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again today"
      val b = "an entirely different document about spark shuffles and windows here"
      val short = "hi there" // below shingle size: un-bandable, still corpus
      // batch 0: an exact in-batch duplicate collapses before ingest; the
      // short doc must be RETAINED in the state (the state IS the corpus)
      // even though it can never band
      stream.addData(Seq((1L, a), (2L, a), (3L, b), (4L, short)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L, 4L))
      // batch 1: near-dup of a, exact dup of b, one fresh doc — the match
      // runs against persisted bands, not recomputed corpus signatures
      val a2 = a.replace("today", "tomorrow")
      val fresh = "completely unrelated vocabulary with many novel words in sequence"
      stream.addData(Seq((10L, a2), (11L, b), (12L, fresh)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L, 4L, 12L),
        "near/exact dups of the state corpus must be rejected, fresh docs accepted")
      val pairs = spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((10L, 1L)), s"missing near-dup audit pair in $pairs")
      assert(pairs.contains((11L, 3L)), s"missing exact-dup audit pair in $pairs")
      // the accepted corpus — including the un-bandable short doc — is
      // reconstructable from the state itself
      assert(spark.read.parquet(s"$stateDir/reps").select("text")
        .as[String].collect().toSet == Set(a, b, short, fresh))
      // ...and short docs contribute no band rows (a null signature must
      // not collide everything on md5(""))
      val bandRids = spark.read.parquet(s"$stateDir/bands")
        .select("rid").as[Long].collect().toSet
      assert(!bandRids.contains(4L), "short doc must not band")
      // batch 2: an exact re-arrival of the ACCEPTED short doc — the LSH
      // pair path filters short docs on both sides, so the fingerprint
      // check against the state's reps must reject it (with an audit row)
      // while a fresh doc in the same batch is accepted
      val fresh2 = "another brand new document holding plenty of distinct words"
      stream.addData(Seq((20L, short), (21L, fresh2)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L, 4L, 12L, 21L),
        "cross-batch short-doc exact dup must be rejected by fingerprint")
      val pairs2 = spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      assert(pairs2.contains((20L, 4L)),
        s"missing short-doc exact-dup audit pair in $pairs2")
    } finally q.stop()

    // at-least-once replay: re-running batch 1's work against a state that
    // already holds its own tagged append must reproduce (not destroy) the
    // acceptance — the excludeTag read path
    val batch1 = Seq((10L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (11L, "an entirely different document about spark shuffles and windows here"),
      (12L, "completely unrelated vocabulary with many novel words in sequence"))
      .toDF("doc_id", "text")
    val replayPairs = graft.ext.Dedup.incrementalLshPairsFromState(
        stateDir, graft.ext.Dedup.exact(batch1, "doc_id", "text"),
        "doc_id", "text", excludeTag = Some(1L))
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(replayPairs.map(_._1) == Set(10L, 11L),
      s"replay must re-reject exactly the original dups: $replayPairs")
    graft.ext.Dedup.appendLshState(
      graft.ext.Dedup.exact(batch1, "doc_id", "text")
        .join(replayPairs.map(_._1).toSeq.toDF("doc_id"), Seq("doc_id"), "left_anti"),
      "doc_id", "text", stateDir, batchTag = Some(1L))
    assert(acceptedIds == Set(1L, 3L, 4L, 12L, 21L),
      "replay overwrote, not duplicated")
  }

  test("streaming vector ingest vs IVF state: near-dups rejected, replay overwrites") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_ingest").toString
    val stateDir = s"$dir/state"
    val pairsDir = s"$dir/pairs"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.vectorDedupIngest(
      stream.toDS().toDF("vec_id", "embedding"), stateDir, pairsDir,
      "vec_id", "embedding", checkpointDir = s"$dir/ckpt",
      threshold = 0.9, k = 2, iters = 1, nProbe = 2)
    def acceptedIds: Set[Long] = spark.read.parquet(s"$stateDir/cells")
      .select("vid").as[Long].collect().toSet
    val v1 = Seq(1f, 0f, 0f, 0f)
    val v3 = Seq(0f, 0f, 1f, 0f)
    try {
      // batch 0: trains the index; the byte-identical vector collapses
      stream.addData(Seq((1L, v1), (2L, v1), (3L, v3)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L))
      // batch 1: near-dup of v1 (cos ≈ 0.994) rejected with an audit
      // pair; an orthogonal fresh vector accepted
      val near1 = Seq(0.9f, 0.1f, 0f, 0f)
      val fresh = Seq(0f, 1f, 0f, 0f)
      stream.addData(Seq((10L, near1), (11L, fresh)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L, 11L))
      val pairs = spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
      assert(pairs.contains((10L, 1L)), s"missing audit pair in $pairs")
    } finally q.stop()
    // at-least-once replay of batch 1: the excludeTag read must re-reject
    // exactly vector 10 (not self-reject 11 against its own append)
    import org.apache.spark.sql.functions.col
    val batch1 = Seq((10L, Seq(0.9f, 0.1f, 0f, 0f)), (11L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val replay = graft.ext.Similarity.nearDupPairsFromState(
        spark, stateDir, batch1, threshold = 0.9, nProbe = 2,
        excludeTag = Some(1L))
      .select("new_id").as[Long].collect().toSet
    assert(replay == Set(10L), s"replay must re-reject exactly 10: $replay")
    graft.ext.Similarity.appendIvfState(
      batch1.filter(col("vec_id") =!= 10L), stateDir, k = 2, iters = 1,
      batchTag = Some(1L))
    assert(acceptedIds == Set(1L, 3L, 11L), "replay overwrote, not duplicated")
  }

  test("streaming text ingest respects tombstones: deleted docs re-enter, live dups reject") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_del").toString
    val stateDir = s"$dir/state"
    val pairsDir = s"$dir/pairs"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = DedupStream.nearDupIngestFromState(
      stream.toDS().toDF("doc_id", "text"), stateDir, pairsDir,
      "doc_id", "text", checkpointDir = s"$dir/ckpt")
    def live: Set[Long] = {
      val tombs = spark.read.parquet(s"$stateDir/tombstones")
        .select("id").as[Long].collect().toSet
      spark.read.parquet(s"$stateDir/members")
        .select("id").as[Long].collect().toSet -- tombs
    }
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "an entirely different document about spark shuffles and windows here"
    try {
      stream.addData(Seq((1L, a), (3L, b)))
      q.processAllAvailable()
      // curation removes doc 1 between micro-batches (excision /
      // decontamination output shape); the ingest keeps running
      graft.ext.Dedup.deleteFromLshState(spark, stateDir,
        Seq(1L).toDF("doc_id"), "doc_id", deleteTag = Some(1L))
      // a byte-identical re-arrival of the DELETED text must be ACCEPTED
      // (its group's rep is a ghost — rejecting against it would drop
      // content the corpus no longer holds)
      stream.addData(Seq((10L, a)))
      q.processAllAvailable()
      assert(live == Set(3L, 10L),
        s"re-arrival of deleted content must sign fresh: $live")
      // ...and a near-dup of the LIVE re-accepted doc still rejects
      stream.addData(Seq((20L, a.replace("today", "tomorrow"))))
      q.processAllAvailable()
      assert(live == Set(3L, 10L), s"live near-dup must still reject: $live")
      assert(spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
        .contains((20L, 10L)))
    } finally q.stop()
  }

  test("streaming vector ingest respects tombstones: deleted ghosts don't reject arrivals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_del").toString
    val stateDir = s"$dir/state"
    val pairsDir = s"$dir/pairs"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.vectorDedupIngest(
      stream.toDS().toDF("vec_id", "embedding"), stateDir, pairsDir,
      "vec_id", "embedding", checkpointDir = s"$dir/ckpt",
      threshold = 0.9, k = 2, iters = 1, nProbe = 2)
    def acceptedIds: Set[Long] = graft.ext.Similarity
      .ivfTopKFromState(spark, stateDir,
        Seq((99L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding"),
        topK = 10, nProbe = 2)
      .select("neighbor_id").as[Long].collect().toSet
    val v1 = Seq(1f, 0f, 0f, 0f)
    val v3 = Seq(0f, 0f, 1f, 0f)
    try {
      stream.addData(Seq((1L, v1), (3L, v3)))
      q.processAllAvailable()
      assert(acceptedIds == Set(1L, 3L))
      // curation removes vector 1 BETWEEN micro-batches (the engine's own
      // dedup/decontamination shape); the ingest query keeps running
      graft.ext.Similarity.deleteFromIvfState(spark, stateDir,
        Seq(1L).toDF("vec_id"), "vec_id", deleteTag = Some(1L))
      assert(acceptedIds == Set(3L), "tombstoned vector still answers")
      // a near-dup of the DELETED vector arrives: it must be ACCEPTED —
      // rejecting against a ghost would permanently drop content the
      // corpus no longer holds
      val near1 = Seq(0.9f, 0.1f, 0f, 0f)
      stream.addData(Seq((10L, near1)))
      q.processAllAvailable()
      assert(acceptedIds == Set(3L, 10L),
        "arrival matching only a tombstoned ghost must be accepted")
      // ...and a live near-dup still rejects: 10's own near-dup
      stream.addData(Seq((20L, Seq(0.89f, 0.11f, 0f, 0f))))
      q.processAllAvailable()
      assert(acceptedIds == Set(3L, 10L),
        "live near-dup must still be rejected after a delete")
      assert(spark.read.parquet(pairsDir)
        .select("new_id", "old_id").as[(Long, Long)].collect().toSet
        .contains((20L, 10L)))
    } finally q.stop()
  }

  test("streaming postings ingest composes with deletes: parity on survivors + new batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_del").toString
    val stateDir = s"$dir/state"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = IndexStream.postingsIngest(
      stream.toDS().toDF("doc_id", "text"), stateDir,
      "doc_id", "text", checkpointDir = s"$dir/ckpt")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val (b1, b2) = (docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250))
    try {
      stream.addData(b1.select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      // curation deletes a slice of batch 0 between micro-batches; the
      // ingest keeps running and later batches land on the same state
      graft.ext.Index.deleteFromPostingsState(spark, stateDir,
        b1.filter(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"),
        "doc_id", deleteTag = Some(1L))
      stream.addData(b2.select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val terms = Seq("dup", "vector", "window")
    val fromState = graft.ext.Index
      .bm25TopKFromState(spark, stateDir, terms, k = 10, idCol = "doc_id")
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Long)].collect().toSet
    val survivors = docs.filter(
      col("doc_id") >= 250 || pmod(col("doc_id"), lit(5)) =!= 2)
    val direct = graft.ext.Index
      .bm25TopK(survivors, "doc_id", "text", terms, k = 10)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Long)].collect().toSet
    assert(fromState == direct && fromState.nonEmpty)
    assert(!fromState.exists(r => r._1 < 250 && r._1 % 5 == 2))
  }

  test("streaming postings ingest: state answers == batch BM25 over the history") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_ingest").toString
    val stateDir = s"$dir/state"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = IndexStream.postingsIngest(
      stream.toDS().toDF("doc_id", "text"), stateDir,
      "doc_id", "text", checkpointDir = s"$dir/ckpt")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val (b1, b2) = (docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250))
    try {
      stream.addData(b1.select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      stream.addData(b2.select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val terms = Seq("dup", "vector", "window")
    val fromState = graft.ext.Index
      .bm25TopKFromState(spark, stateDir, terms, k = 10, idCol = "doc_id")
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Long)].collect().toSet
    val direct = graft.ext.Index
      .bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Long)].collect().toSet
    assert(fromState == direct && fromState.nonEmpty)
    // each micro-batch landed as its own tagged partition set
    assert(new java.io.File(s"$stateDir/postings/batch_id=0").exists())
    assert(new java.io.File(s"$stateDir/postings/batch_id=1").exists())
  }

  test("streaming stats ingest: report == batch fold; each micro-batch its own tag") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_ingest").toString
    val stateDir = s"$dir/state"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val q = ProfileStream.statsIngest(
      stream.toDS().toDF("doc_id", "text", "source"), stateDir,
      "text", "source", checkpointDir = s"$dir/ckpt")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val (b1, b2) = (docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250))
    try {
      stream.addData(b1.as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
      stream.addData(b2.as[(Long, String, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def fold(f: org.apache.spark.sql.DataFrame) =
      f.select("grp", "n_docs", "tokens")
        .as[(String, Long, Long)].collect().toSet
    val batchState = s"$dir/batch_state"
    graft.ext.Profile.appendStatsState(docs, batchState, "text", "source",
      Some(1L))
    assert(fold(graft.ext.Profile.statsReport(spark, stateDir)) ==
      fold(graft.ext.Profile.statsReport(spark, batchState)))
    assert(new java.io.File(s"$stateDir/stats/batch_id=0").exists())
    assert(new java.io.File(s"$stateDir/stats/batch_id=1").exists())
  }

  test("streaming tokenizer ingest: first batch trains+freezes, budgets == batch path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_ingest").toString
    val stateDir = s"$dir/state"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = BpeStream.tokenizerIngest(
      stream.toDS().toDF("doc_id", "text"), stateDir,
      "doc_id", "text", numMerges = 3, checkpointDir = s"$dir/ckpt")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val (b1, b2) = (docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250))
    try {
      stream.addData(b1.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      stream.addData(b2.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the batch twin: train on the SAME first batch, then encode batch 2
    // against the frozen merges
    val batchState = s"$dir/batch_state"
    graft.ext.Bpe.appendTokenizerState(b1, batchState, "doc_id", "text",
      numMerges = 3, batchTag = Some(1L))
    graft.ext.Bpe.appendTokenizerState(b2, batchState, "doc_id", "text",
      numMerges = 3, batchTag = Some(2L))
    val quality = docs.select(col("doc_id"),
      length(col("text")).cast("double").as("q"))
    def budget(d: String) =
      graft.ext.Bpe.tokenBudgetFromState(spark, d, quality, "doc_id", "q",
          budget = 9000L)
        .select("doc_id", "cum_tokens")
        .as[(Long, Long)].collect().toSet
    assert(budget(stateDir) == budget(batchState) && budget(stateDir).nonEmpty)
    // frozen merges: identical lists on both paths
    assert(graft.ext.Bpe.readMerges(spark, stateDir) ==
      graft.ext.Bpe.readMerges(spark, batchState))
  }

  test("streaming simhash dedup suppresses reordered near-dups, keeps distinct docs") {
    import java.sql.Timestamp
    // doc B is a token reordering of doc A → identical simhash (votes are
    // order-independent over the distinct token set); doc C is unrelated
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "zeta epsilon delta gamma beta alpha"
    val c = "totally different content with other words"
    val rows = Seq(
      (1L, a, new Timestamp(1700000000000L)),
      (2L, b, new Timestamp(1700000001000L)),
      (3L, c, new Timestamp(1700000002000L)))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = DedupStream.simhashFirstArrivals(
      stream.toDS().toDF("doc_id", "text", "ts"), "ts", "text", horizon = "1 hour")
    val q = out.writeStream.format("memory").queryName("simhash_first")
      .outputMode("append").start()
    try {
      rows.foreach { r => stream.addData(r); q.processAllAvailable() }
      val kept = spark.table("simhash_first")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L)) // reordered near-dup 2 suppressed
    } finally q.stop()
  }

  test("streaming media metadata ingest: streamed table == batch dispatcher; " +
      "replay overwrites in place") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_media_meta").toString
    implicit val sqlCtx = spark.sqlContext
    // mixed crawl shape: MP3s, MP4s, and junk the dispatcher must type
    // as `bin` — all synthesized by the x167/x172 fixture arithmetic
    def payload(id: Long): Array[Byte] =
      if (id % 5 == 4) s"junk $id".getBytes("UTF-8")
      else if (id % 2 == 0) graft.queries.Extensions.syntheticMp3(id)
      else graft.queries.Extensions.syntheticMp4(id)
    val b0 = (0L until 8L).map(id => (id, payload(id)))
    val b1 = (8L until 14L).map(id => (id, payload(id)))
    val stream = MemoryStream[(Long, Array[Byte])]
    val q = MediaStream.metadataIngest(
      stream.toDS().toDF("doc_id", "payload"), s"$dir/meta",
      "doc_id", "payload", s"$dir/ckpt")
    def streamedRows: Set[org.apache.spark.sql.Row] =
      spark.read.parquet(s"$dir/meta").drop("batch_id").collect().toSet
    try {
      stream.addData(b0); q.processAllAvailable()
      stream.addData(b1); q.processAllAvailable()
      val batchRows = graft.ext.Multimodal.mediaMetaBatch(
        (b0 ++ b1).toDF("doc_id", "payload")).toDF().collect().toSet
      assert(streamedRows == batchRows,
        "streamed metadata must equal the batch dispatcher over the union")
      // every modality actually landed (junk rows typed, not dropped)
      val types = spark.read.parquet(s"$dir/meta")
        .select("media_type").as[String].collect().toSet
      assert(types == Set("mp3", "mp4", "bin"), types)
    } finally q.stop()
    // at-least-once replay: re-landing batch 1's partition recomputes
    // identical rows in place — no duplicates, no drift
    val before = streamedRows
    graft.ext.Multimodal.mediaMetaBatch(b1.toDF("doc_id", "payload"))
      .toDF().write.mode("overwrite").parquet(s"$dir/meta/batch_id=1")
    assert(streamedRows == before, "replayed partition must be idempotent")
  }

  test("stateless text-pipeline ops run unchanged on a stream == batch results") {
    // quality scoring, language ID, split assignment and token counting are
    // pure column expressions — the SAME operator code must work under
    // readStream with no modification, and agree with the batch run row-wise
    val base = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().take(30).toSeq

    def enrich(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Sampling.splitAssign(
          df.select((col("doc_id") +:
            (graft.ext.TextAnalysis.langScores(col("text")) ++
              graft.ext.TextAnalysis.qualityColumns(col("text")))): _*)
            .withColumn("predicted", graft.ext.TextAnalysis.predictedLang),
          "doc_id", Seq("train" -> 0.9))
        .select("doc_id", "predicted", "split")

    val expected = enrich(base.toDF("doc_id", "text")).collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = enrich(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_enrich")
      .outputMode("append").start()
    try {
      base.grouped(10).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
      assert(spark.table("stream_enrich").collect().toSet == expected)
    } finally q.stop()
  }

  test("streaming graph maintenance: streamed graph == whole rebuild; " +
      "per-batch tagged appends") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_graph_ingest").toString
    val ivfDir = s"$dir/ivf"; val graphDir = s"$dir/graph"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = GraphStream.graphMaintainIngest(
      stream.toDS().toDF("vec_id", "embedding"), ivfDir, graphDir,
      "vec_id", "embedding", checkpointDir = s"$dir/ckpt",
      k = 4, iters = 2, graphK = 3, nProbe = 2)
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    try {
      // an EMPTY leading micro-batch must not train or build
      stream.addData(Seq.empty[(Long, Seq[Float])])
      q.processAllAvailable()
      assert(!new java.io.File(s"$graphDir/edges").exists())
      stream.addData(emb.filter(_._1 < 150).toSeq)
      q.processAllAvailable()
      // first data batch trained + built the graph whole
      assert(new java.io.File(s"$graphDir/edges").exists())
      stream.addData(emb.filter(t => t._1 >= 150 && t._1 < 300).toSeq)
      q.processAllAvailable()
      // a DELETE wave lands between micro-batches (a takedown, a dedup
      // removal): the next micro-batch must retract its edges in-stream
      // (delete delta, then batch delta) — not refuse, not rebuild
      graft.ext.Similarity.deleteFromIvfState(spark, ivfDir,
        emb.filter(t => t._1 < 300 && t._1 % 11 == 3).map(_._1).toSeq
          .toDF("vec_id"),
        "vec_id", deleteTag = Some(1L))
      stream.addData(emb.filter(_._1 >= 300).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the maintained graph IS the from-scratch whole rebuild (which
    // reads live cells — the post-delete truth)
    def edges(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("neighbor_id"), col("rank").cast("int"),
        round(col("cos"), 9))
      .as[(Long, Long, Int, Double)].collect().toSet
    val inc = edges(graft.ext.Similarity.readKnnGraphState(spark, graphDir))
    val full = edges(graft.ext.Similarity.knnGraphFromState(
      spark, ivfDir, k = 3, nProbe = 2))
    assert(inc == full && inc.nonEmpty)
    // no edge touches a deleted id in either direction
    assert(!inc.exists(e => (e._1 < 300 && e._1 % 11 == 3) ||
      (e._2 < 300 && e._2 % 11 == 3)))
    // each micro-batch landed as its own tagged IVF partition (tag =
    // batchId + 1; batch 0 was empty so tag 1 holds nothing trained —
    // the first DATA batch is tag 2)
    assert(new java.io.File(s"$ivfDir/cells/batch_id=2").exists())
    assert(new java.io.File(s"$ivfDir/cells/batch_id=4").exists())
    // watermark advanced to the last applied tag
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$graphDir/_graph_upto")).trim == "4")
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
