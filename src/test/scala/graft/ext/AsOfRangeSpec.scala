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

  test("asof forward: earliest at-or-after match, inclusive ties, null when none") {
    val left = Seq(
      (1L, "u", 100L), // before two right rows -> earliest (ts=200) wins
      (2L, "u", 200L), // exactly ON a right ts -> inclusive
      (3L, "u", 300L), // after every right row -> null
      (4L, "v", 10L)   // other key: its own timeline
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u", 50L, "r50"), ("u", 200L, "r200"), ("u", 250L, "r250"),
      ("v", 70L, "s70")
    ).toDF("k", "rts", "tag")

    val got = AsOf.join(left, right, Seq("k"), "ts", "rts", "forward")
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "r200", 2L -> "r200", 3L -> null, 4L -> "s70"))
  }

  test("asof nearest: least absolute delta, ties go backward, one-sided fallbacks") {
    val left = Seq(
      (1L, "u", 100L), // back at 90 (d=10), fwd at 130 (d=30) -> back
      (2L, "u", 120L), // back at 90 (d=30), fwd at 130 (d=10) -> fwd
      (3L, "u", 110L), // exact tie (d=20 both) -> backward wins
      (4L, "u", 5L),   // nothing before -> forward fallback
      (5L, "u", 500L)  // nothing after -> backward fallback
    ).toDF("id", "k", "ts")
    val right = Seq(("u", 90L, "r90"), ("u", 130L, "r130"))
      .toDF("k", "rts", "tag")

    val got = AsOf.join(left, right, Seq("k"), "ts", "rts", "nearest")
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "r90", 2L -> "r130", 3L -> "r90",
      4L -> "r90", 5L -> "r130"))
  }

  test("asof tolerance nulls out matches beyond the bound, inclusive at it") {
    val left = Seq(
      (1L, "u", 100L), // back match at 90, delta 10 <= 10 -> kept
      (2L, "u", 105L), // back match at 90, delta 15 > 10 -> nulled
      (3L, "u", 90L)   // exact hit, delta 0 -> kept
    ).toDF("id", "k", "ts")
    val right = Seq(("u", 90L, "r90")).toDF("k", "rts", "tag")

    val got = AsOf.join(left, right, Seq("k"), "ts", "rts", "backward",
        tolerance = Some(lit(10L)))
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "r90", 2L -> null, 3L -> "r90"))

    // nearest + tolerance: each side's candidate filtered by the SAME bound
    val l2 = Seq((1L, "u", 100L)).toDF("id", "k", "ts") // back d=10, fwd d=3
    val r2 = Seq(("u", 90L, "b"), ("u", 103L, "f")).toDF("k", "rts", "tag")
    val got2 = AsOf.join(l2, r2, Seq("k"), "ts", "rts", "nearest",
        tolerance = Some(lit(5L)))
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got2 == Map(1L -> "f"))
  }

  test("asof stays correct when one key owns half the rows (hot-key skew)") {
    // "hot" owns 50% of left rows and most right rows; correctness must
    // not depend on the key distribution (speed mitigations are scaladoc'd)
    val left = (Seq.tabulate(500)(i => (i.toLong, "hot", (i * 2 + 1).toLong)) ++
      Seq.tabulate(500)(i => ((1000 + i).toLong, "k" + (i % 50), (i * 2 + 1).toLong)))
      .toDF("id", "k", "ts")
    val right = (Seq.tabulate(300)(i => ("hot", (i * 3).toLong, i.toLong)) ++
      Seq.tabulate(100)(i => ("k" + (i % 50), (i * 5).toLong, (1000 + i).toLong)))
      .toDF("k", "rts", "tag")

    val got = AsOf.join(left, right, Seq("k"), "ts", "rts", "backward")
      .select("id", "k", "ts", "tag").as[(Long, String, Long, Option[Long])]
      .collect()
    assert(got.length == 1000)
    // oracle: per-row max right ts <= left ts, computed naively
    val byKey = Seq.tabulate(300)(i => ("hot", (i * 3).toLong, i.toLong))
      .++(Seq.tabulate(100)(i => ("k" + (i % 50), (i * 5).toLong, (1000 + i).toLong)))
      .groupBy(_._1)
    got.foreach { case (_, k, ts, tag) =>
      val expect = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(tag == expect, s"key=$k ts=$ts")
    }
  }

  test("asof salted (numSlices) == unsalted byte-for-byte under 50% hot key") {
    // same shape as the hot-key test: "hot" owns half of everything; the
    // salted path must return the IDENTICAL result for every direction,
    // with and without tolerance, including all-null and boundary rows
    val left = (Seq.tabulate(500)(i => (i.toLong, "hot", (i * 2 + 1).toLong)) ++
      Seq.tabulate(500)(i => ((1000 + i).toLong, "k" + (i % 50), (i * 2 + 1).toLong)))
      .toDF("id", "k", "ts")
    val right = (Seq.tabulate(300)(i => ("hot", (i * 3).toLong, i.toLong)) ++
      Seq.tabulate(100)(i => ("k" + (i % 50), (i * 5).toLong, (1000 + i).toLong)))
      .toDF("k", "rts", "tag")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(lit(25L)))) {
      val plain = AsOf.join(left, right, Seq("k"), "ts", "rts", dir, tol)
        .select("id", "tag").as[(Long, Option[Long])].collect().toMap
      val salted = AsOf.join(left, right, Seq("k"), "ts", "rts", dir, tol,
          numSlices = 7)
        .select("id", "tag").as[(Long, Option[Long])].collect().toMap
      assert(salted == plain, s"divergence at dir=$dir tol=$tol")
      assert(salted.size == 1000)
    }
  }

  test("asof salted: seed rows cross empty and right-free slices") {
    // one key, right rows clustered at the START of the timeline, left
    // probes at the END: with 8 slices the later slices hold no right
    // rows at all — matches must come entirely from carried seeds
    val left = Seq.tabulate(20)(i => (i.toLong, "u", (900 + i).toLong))
      .toDF("id", "k", "ts")
    val right = Seq(("u", 5L, "early"), ("u", 9L, "late"))
      .toDF("k", "rts", "tag")
    val got = AsOf.join(left, right, Seq("k"), "ts", "rts", "backward",
        None, numSlices = 8)
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got.size == 20)
    assert(got.values.forall(_ == "late"))
    // forward from the far side: nothing at-or-after -> all null
    val fwd = AsOf.join(left, right, Seq("k"), "ts", "rts", "forward",
        None, numSlices = 8)
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(fwd.values.forall(_.isEmpty))
  }

  test("asof all directions match a naive in-memory oracle on random data") {
    val rnd = new scala.util.Random(23)
    val left = Seq.tabulate(400)(i =>
      (i.toLong, "k" + rnd.nextInt(8), rnd.nextInt(1000).toLong))
      .toDF("id", "k", "ts")
    val rightRows = Seq.tabulate(150)(i =>
      ("k" + rnd.nextInt(8), rnd.nextInt(1000).toLong * 2 + 1, i.toLong))
    val right = rightRows.toDF("k", "rts", "tag")
    val byKey = rightRows.groupBy(_._1)

    def oracle(k: String, ts: Long, dir: String): Option[Long] = {
      val rs = byKey.getOrElse(k, Nil)
      val back = rs.filter(_._2 <= ts).sortBy(r => (r._2, r._3)).lastOption
      val fwd = rs.filter(_._2 >= ts).sortBy(r => (r._2, r._3)).headOption
      (dir match {
        case "backward" => back
        case "forward" => fwd
        case "nearest" => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (ts - b._2 <= f._2 - ts) Some(b) else Some(f)
          case _ => back.orElse(fwd)
        }
      }).map(_._3)
    }
    // equal-(k, rts) right rows make the pick arbitrary by contract, so
    // keys containing them are skipped in the assertion below
    Seq("backward", "forward", "nearest").foreach { dir =>
      val got = AsOf.join(left, right, Seq("k"), "ts", "rts", dir)
        .select("id", "k", "ts", "tag")
        .as[(Long, String, Long, Option[Long])].collect()
      got.foreach { case (_, k, ts, tag) =>
        val rs = byKey.getOrElse(k, Nil)
        val uniqueTs = rs.groupBy(_._2).forall(_._2.size == 1)
        if (uniqueTs) // ambiguous equal-ts right rows excluded by contract
          assert(tag == oracle(k, ts, dir), s"dir=$dir k=$k ts=$ts")
      }
    }
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

  test("left range join keeps zero-match intervals with null point payload") {
    val points = Seq(("u", 100L, 1L), ("u", 150L, 2L)).toDF("k", "ts", "pid")
    val intervals = Seq(
      ("u", 100L, 200L, 7L), // matches both points
      ("u", 300L, 400L, 8L), // matches none -> must survive with nulls
      ("w", 0L, 1000L, 9L)   // key with no points at all -> survives too
    ).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointInIntervalLeft(
        points, intervals, Seq("k"), "ts", "s", "e", 60L, Seq("iid"))
      .select("iid", "pid").as[(Long, Option[Long])].collect().toSet
    assert(got == Set((7L, Some(1L)), (7L, Some(2L)), (8L, None), (9L, None)))
    // per-interval count(point) semantics: 0 for empty, no join-back needed
    val counts = RangeJoin.pointInIntervalLeft(
        points, intervals, Seq("k"), "ts", "s", "e", 60L, Seq("iid"))
      .groupBy("iid").agg(count(col("pid")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(7L -> 2L, 8L -> 0L, 9L -> 0L))
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
