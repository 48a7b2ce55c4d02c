package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) join: both fact tables bucketed on the join
  * key eliminate the shuffle entirely — the physical plan must contain
  * a SortMergeJoin with NO Exchange on either side. This is the
  * pre-partitioning strategy SURVEY §7 prescribes for repeated big-big
  * joins at 100 TB (bucket once at ingest, join shuffle-free forever).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    // explicit external-table paths: warehouse.dir is a static conf
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.sources.Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    graft.sources.Tables.lineitem(spark, sf0001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the only exchange allowed is the one for the final groupBy —
      // the join itself must read both sides pre-partitioned
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle:\n$joinSection")
      // and the result must match the unbucketed join
      val expected = graft.sources.Tables.orders(spark, sf0001)
        .join(graft.sources.Tables.lineitem(spark, sf0001),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed multimodal alignment join (documents x embeddings) is shuffle-free") {
    // substantiates mmClipFilter's scale claim: bucket both sides of
    // the paired text/embedding corpus on the id once at ingest and
    // the alignment join never shuffles again
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_mm").toString
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_embs")
    graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang")
      .write.bucketBy(4, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/b_docs").saveAsTable("b_docs")
    graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label")
      .write.bucketBy(4, "vec_id").sortBy("vec_id")
      .option("path", s"$wh/b_embs").saveAsTable("b_embs")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_docs")
        .join(spark.table("b_embs"), $"doc_id" === $"vec_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.substring(plan.indexOf("SortMergeJoin")).contains("Exchange"),
        s"bucketed alignment join must not shuffle:\n$plan")
      assert(joined.count() ==
        graft.sources.Tables.documents(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_embs")
    }
  }
}
