package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: the fact-fact join shuffle disappears when
  * both sides are bucketed by the join key with the same bucket count. */
class BucketingSpec extends SparkSpec {

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    val lineitem = graft.Tables(spark, sf, "lineitem")
    val orders = graft.Tables(spark, sf, "orders")

    Bucketing.writeBucketed(lineitem, "lineitem_b", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(orders, "orders_b", 8, Seq("o_orderkey"))

    // at sf0.001 the planner would broadcast the tiny orders side, which
    // proves nothing about bucketing — force the merge join the fact-fact
    // shape takes at real scale
    val joined = Bucketing.readBucketed(spark, "lineitem_b").hint("merge")
      .join(Bucketing.readBucketed(spark, "orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("qty"))

    val plan = graft.Plans.capturePlan(joined)
    // the join consumes the bucketed scans in place: no exchange may
    // partition by a JOIN key (the final aggregation's exchange on
    // o_orderstatus is expected and fine)
    assert(plan.contains("SortMergeJoin"), s"no merge join in plan:\n$plan")
    assert(!plan.contains("hashpartitioning(l_orderkey") &&
      !plan.contains("hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles its inputs:\n$plan")

    // and the result matches the unbucketed join
    val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(got == expect)
  }
}
