package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Degenerate-input totality: the r6 verdict/advice items on 0/0 rate
  * columns (attrition, q38), the epoch planner's empty-corpus case,
  * and SQ8 search's zero-norm cosines. Each guarded expression must
  * produce its DEFINED value (zeros), never NaN/null — NaN is
  * engine-dependent in DuckDB (`ieee_floating_point_ops`), so a NaN
  * that leaks is a broken hash contract waiting for an empty
  * partition.
  */
class DegenerateInputSpec extends SparkSpec {

  /** A star-schema dir whose documents/events tables are EMPTY but
    * carry the production schemas (events.ts as raw nanos-long, which
    * is what Tables.events reads via nanosAsLong). */
  private lazy val emptyDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    docs.write.parquet(s"$d/documents.parquet")
    val events = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    events.write.parquet(s"$d/events.parquet")
    val lineitem = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
        StructField("l_suppkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
        StructField("l_returnflag", StringType),
        StructField("l_linestatus", StringType),
        StructField("l_shipdate", TimestampType))))
    lineitem.write.parquet(s"$d/lineitem.parquet")
    val orders = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampType),
        StructField("o_orderpriority", StringType))))
    orders.write.parquet(s"$d/orders.parquet")
    val supplier = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("s_suppkey", LongType), StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType))))
    supplier.write.parquet(s"$d/supplier.parquet")
    val nation = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))))
    nation.write.parquet(s"$d/nation.parquet")
    val customer = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType))))
    customer.write.parquet(s"$d/customer.parquet")
    val embeddings = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
    embeddings.write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("wave-13..18 document/event ops are total on an empty corpus") {
    import graft.llm.{Dedup, Multimodal, Pipeline, Sampling}
    // plan-only ops: empty in -> empty out, never an exception/NaN row
    assert(Pipeline.manifest(spark, emptyDir).collect().isEmpty)
    assert(Pipeline.compaction(spark, emptyDir).collect().isEmpty)
    assert(Pipeline.cdcMerge(spark, emptyDir).collect().isEmpty)
    assert(Sampling.sampleBootstrap(spark, emptyDir).collect().isEmpty)
    assert(Multimodal.mmMagicRouter(spark, emptyDir).collect().isEmpty)
    assert(Dedup.ddSourceSketchOverlap(spark, emptyDir).collect().isEmpty)
    assert(graft.streaming.WindowQueries.stLatenessAudit(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stWindowedDistinct(spark, emptyDir)
      .collect().isEmpty)
    // skipping aggregates to a 2-row layout report even when empty; its
    // rates must be DEFINED (null, from 0/NULL division guarded by the
    // engine), never NaN
    val skip = Pipeline.skipping(spark, emptyDir).collect()
    skip.foreach { r =>
      assert(r.getLong(1) == 0L, "no files on an empty corpus")
      assert(r.isNullAt(4) || !r.getDouble(4).isNaN,
        "skip_rate must never be NaN")
    }
  }

  test("round-10 document ops are total on an empty corpus") {
    import graft.llm.{Dedup, Multimodal, Pipeline, Sampling, TextAnalysis}
    assert(Sampling.samplePps(spark, emptyDir).collect().isEmpty)
    assert(TextAnalysis.taVocabGrowth(spark, emptyDir).collect().isEmpty)
    assert(Dedup.ddDupLengthBias(spark, emptyDir).collect().isEmpty)
    assert(Pipeline.quotaFill(spark, emptyDir).collect().isEmpty)
    // frame dedup aggregates to one summary row even on zero videos;
    // its fractions must be defined (null from guarded division), not NaN
    Multimodal.mmFrameDedup(spark, emptyDir).collect().foreach { r =>
      assert(r.getAs[Long]("n_videos") == 0L)
      (Seq("mean_within_dup_frac", "cross_video_share")).foreach { c =>
        val i = r.fieldIndex(c)
        assert(r.isNullAt(i) || !r.getDouble(i).isNaN, s"$c must not be NaN")
      }
    }
  }

  test("wave-30 ops are total on empty/single-class corpora") {
    // dow anomaly: no events -> no hours -> no flags (and no 0/0 z)
    assert(graft.streaming.WindowQueries.stDowAnomaly(spark, emptyDir)
      .collect().isEmpty)
    // AUC on an empty corpus has no positive/negative pair to rank:
    // the defined result is EMPTY (never a NaN row — the n_pos/n_neg
    // guard), same contract as a single-class labeled corpus
    assert(graft.llm.Models.auc(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.mcnemar(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.psi(spark, emptyDir).collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q84BenfordAudit(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Graph.powerlawAlpha(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.hosmer(spark, emptyDir).collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q85Gini(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.TextAnalysis.taBigramEntropy(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q86Anova(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Sampling.sampleHt(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Similarity.ssSilhouette(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Models.gains(spark, emptyDir).collect().isEmpty)
    assert(graft.streaming.WindowQueries.stValueDrift(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q87ColumnProfile(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Graph.bfsHops(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Dedup.ddShingleSweep(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q88RepeatBusiness(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.bootstrapAuc(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Similarity.ssQueryHardness(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stNewVsReturning(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.operators.RelationalQueries
      .q89SalesOpportunity(spark, emptyDir).collect().isEmpty)
    assert(graft.operators.FunctionQueries
      .q90HigherOrderFuncs(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Sampling.sampleTemperatureSweep(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Dedup.ddClusterDepth(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stTypeMixDrift(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stAcf(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Models.prSummary(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.brier(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.ks(spark, emptyDir).collect().isEmpty)
    assert(graft.streaming.WindowQueries.stBurstEpisodes(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stConcurrency(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Multimodal.mmSceneSegments(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.TextAnalysis.taSourceSimilarity(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Models.confusion(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Sampling.sampleDeff(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Sampling.sampleAllocVariance(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Pipeline.ivmCost(spark, emptyDir).collect().isEmpty)
    assert(graft.llm.Models.learningCurve(spark, emptyDir).collect().isEmpty)
    assert(graft.streaming.WindowQueries.stDispersion(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.TextAnalysis.taSourceLexicalHealth(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Models.thresholdSweep(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.streaming.WindowQueries.stWhaleMass(spark, emptyDir)
      .collect().isEmpty)
    // agreement on an empty corpus: both detectors empty -> all-zero row
    val ag = graft.llm.Dedup.ddDetectorAgreement(spark, emptyDir)
      .collect().head
    assert(ag.getAs[Long]("n_minhash") == 0L &&
      ag.getAs[Long]("n_simhash") == 0L)
    assert(ag.getAs[Double]("jaccard") == 0.0)
    assert(graft.streaming.WindowQueries.stSessionTypeLift(spark, emptyDir)
      .collect().isEmpty)
    // wave-31: no days -> no cusum track; no payloads -> no size rows
    assert(graft.streaming.WindowQueries.stCusumDrift(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Multimodal.mmSizePercentiles(spark, emptyDir)
      .collect().isEmpty)
    // wave-32: no docs -> no deciles / no rate table / no facet rows
    assert(graft.llm.Dedup.ddNoveltyCurve(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Sampling.sampleClipSweep(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.TextAnalysis.taSimpson(spark, emptyDir)
      .collect().isEmpty)
    // wave-33 document-side ops
    assert(graft.llm.Dedup.ddPolicyMixShift(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Multimodal.mmSourceMix(spark, emptyDir)
      .collect().isEmpty)
    // wave-35
    assert(graft.llm.Dedup.ddDfSpectrum(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Pipeline.shardAffinity(spark, emptyDir)
      .collect().isEmpty)
    // wave-37
    assert(graft.streaming.WindowQueries.stValuePercentiles(spark, emptyDir)
      .collect().isEmpty)
    assert(graft.llm.Sampling.sampleDedupWeights(spark, emptyDir)
      .collect().isEmpty)
  }

  test("attrition reports defined zero rates on an empty corpus") {
    val rows = graft.llm.Pipeline.attrition(spark, emptyDir)
      .orderBy("stage").collect()
    assert(rows.length == 5, "the 5-stage report must exist even when empty")
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(!r.getDouble(4).isNaN, s"NaN drop_rate at stage ${r.getInt(0)}")
      assert(r.getDouble(4) == 0.0)
    }
  }

  test("q38 funnel emits vacuous 0.0 conversions on an empty event set") {
    val rows = graft.streaming.WindowQueries.q38Funnel(spark, emptyDir)
      .orderBy("stage").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 0L, 0L))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.0, 0.0, 0.0),
      "empty prior stages must convert at the defined 0.0, not NaN")
  }

  test("epoch planner is total on an empty corpus") {
    assert(graft.llm.Pipeline.epochPlan(spark, emptyDir).collect().isEmpty,
      "no sources -> no plan rows (not a null/NaN row)")
  }

  test("sq8 search defines cosine 0 for zero-norm vectors, never NaN") {
    // All-zero corpus: every dimension has mx = mn = 0, the dequantized
    // vectors have norm 0, and the query vectors themselves have norm 0
    // — the double-degenerate corner. The audit convention (code 0 at
    // mx = mn) extends to the search: cosine is 0, rows keep flowing
    // through the top-k window on the deterministic id tie-break.
    val d = java.nio.file.Files.createTempDirectory("graft_zero_vec").toString
    val rows = (0L until 8L).map(i =>
      Row(i, Seq.fill(4)(0.0f), 0))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
    emb.write.parquet(s"$d/embeddings.parquet")
    val got = graft.llm.Similarity.ssSq8Search(spark, d).collect()
    assert(got.length == 15, s"5 queries x top-3 expected, got ${got.length}")
    got.foreach { r =>
      val c = r.getDouble(2)
      assert(!c.isNaN && c == 0.0, s"expected defined 0.0 cosine, got $c")
    }
  }
}
