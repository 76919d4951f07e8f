package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-case semantics for the temporal operators: backward as-of join
  * (AsOf) and binned point-in-interval join (RangeJoin). */
class AsOfRangeSpec extends SparkSpec {

  import spark.implicits._

  test("asof backward: latest at-or-before match, inclusive ties, null when none") {
    val left = Seq(
      (1L, "u", 100L), // after two right rows -> latest (ts=90) wins
      (2L, "u", 50L),  // exactly ON a right ts -> inclusive
      (3L, "u", 10L),  // before every right row -> null
      (4L, "v", 100L)  // other key: its own timeline
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u", 50L, "r50"), ("u", 90L, "r90"), ("u", 200L, "r200"),
      ("v", 70L, "s70")
    ).toDF("k", "rts", "tag")

    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", "rts")
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "r90", 2L -> "r50", 3L -> null, 4L -> "s70"))
  }

  test("asof payload columns all come from the SAME matched right row") {
    val left = Seq((1L, "u", 100L)).toDF("id", "k", "ts")
    // the later row has a NULL in one payload column: a per-column
    // last(ignoreNulls) would mix b=20 from the older row into the match
    val right = Seq(
      ("u", 10L, Some(10L), Some(20L)),
      ("u", 90L, Some(11L), None)
    ).toDF("k", "rts", "a", "b")
    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", "rts")
      .select("a", "b").as[(Option[Long], Option[Long])].collect().head
    assert(got == (Some(11L), None))
  }

  test("asof rejects payload/left column collisions") {
    val l = Seq((1L, "u", 1L)).toDF("id", "k", "ts")
    val r = Seq(("u", 1L, 2L)).toDF("k", "rts", "id")
    val e = intercept[IllegalArgumentException](
      AsOf.joinBackward(l, r, Seq("k"), "ts", "rts"))
    assert(e.getMessage.contains("id"))
  }

  test("range join: half-open bounds, cross-bin intervals, exactly-once matches") {
    val points = Seq(
      ("u", 100L, 1L), ("u", 150L, 2L), ("u", 199L, 3L), ("u", 200L, 4L),
      ("u", 99L, 5L), ("v", 150L, 6L)
    ).toDF("k", "ts", "pid")
    // [100, 200) with binWidth 60 spans bins 1..3 — a matching point in the
    // middle bin must appear exactly once
    val intervals = Seq(("u", 100L, 200L, 7L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "ts", "s", "e", binWidth = 60L)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L)) // 100 in (inclusive), 200 out (exclusive),
                                   // 99 out, other key out, no duplicates
  }

  test("range join matches the naive theta-join on random data") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(300)(i => ("k" + rnd.nextInt(3), rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "pid")
    val intervals = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(900).toLong
      ("k" + rnd.nextInt(3), s, s + 1 + rnd.nextInt(200), i.toLong)
    }.toDF("k", "s", "e", "iid")
    val binned = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "ts", "s", "e", binWidth = 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
  }
}
