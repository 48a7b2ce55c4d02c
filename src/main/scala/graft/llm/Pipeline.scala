package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import TextAnalysis.{h60, h60Sql}

/** End-to-end curation pipeline over `documents` — the composition the
  * individual operators exist FOR, as one declarative query:
  *
  *   1. duplicate-cluster canonicalization (keep cluster minimum —
  *      [[Dedup.ddCluster]]),
  *   2. heuristic quality floor ([[TextAnalysis.taQuality]] ≥ 0.5),
  *   3. language-ID agreement filter ([[TextAnalysis.taLangId]]),
  *   4. deterministic 50% content-hash split ([[Sampling]] h60 rule).
  *
  * Each stage is the same DataFrame the standalone query returns, so
  * the pipeline inherits every stage's scale shape (narrow scoring
  * scans; the CC join; equi-joins on doc_id for composition — all
  * partial-aggregable or broadcastable). Catalyst fuses the three
  * narrow scoring scans of `documents` into whole-stage-codegen'd
  * passes over the same cached scan; only the cluster stage shuffles.
  * The point of the query is the compositional contract: a user can
  * run the whole curation as ONE plan and get engine-verified results.
  */
object Pipeline {

  def curate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val canonical = Dedup.ddCluster(spark, dir)
      .filter($"doc_id" === $"cluster_id")
      .select($"doc_id", $"cluster_size")
    val quality = TextAnalysis.taQuality(spark, dir)
      .filter($"quality" >= 0.5)
      .select($"doc_id", $"quality")
    val lang = TextAnalysis.taLangId(spark, dir)
      .filter($"is_correct")
      .select($"doc_id", $"pred_lang")
    val split = Tables.documents(spark, dir)
      .select($"doc_id", (h60($"text") % 100).as("bucket"))
      .filter($"bucket" < 50)
    canonical
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(split, Seq("doc_id"))
      .select($"doc_id", $"pred_lang", $"quality", $"cluster_size", $"bucket")
      .orderBy($"doc_id")
  }

  // Stage CTEs embed the standalone oracles verbatim (nested WITH /
  // WITH RECURSIVE), so the composed oracle is definitionally the
  // composition of the verified stages.
  val curateSql: String =
    s"""WITH cc AS (${Dedup.ddClusterSql}),
       |q AS (${TextAnalysis.taQualitySql}),
       |l AS (${TextAnalysis.taLangIdSql}),
       |sp AS (SELECT doc_id, ${h60Sql("text")} % 100 AS bucket
       |  FROM documents WHERE ${h60Sql("text")} % 100 < 50)
       |SELECT cc.doc_id, l.pred_lang, q.quality, cc.cluster_size, sp.bucket
       |FROM cc
       |JOIN q ON cc.doc_id = q.doc_id
       |JOIN l ON cc.doc_id = l.doc_id
       |JOIN sp ON cc.doc_id = sp.doc_id
       |WHERE cc.doc_id = cc.cluster_id AND q.quality >= 0.5 AND l.is_correct
       |ORDER BY cc.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // llm_pipeline_pack: training-shard packing — assign documents to
  // fixed token-budget shards (next-fit by running total), the step
  // that materializes a curated corpus into pretraining shards.
  // Deterministic: docs are salted into W buckets by doc_id and packed
  // within each bucket in doc_id order; a doc goes to the shard where
  // its bucket's running total starts. The running-total window
  // partitions on the BUCKET key (W ≈ cluster parallelism, uniform by
  // construction — never a data-dependent skew key), which is how a
  // global "cumulative sum" survives 100 TB: one bounded sequential
  // scan per bucket instead of one global sort task.
  private val PackBudget = 2000L
  private val PackBuckets = 8L

  def pack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select($"doc_id",
        size(split($"text", " ")).cast("long").as("n_toks"),
        pmod($"doc_id", lit(PackBuckets)).as("bucket"))
    val w = Window.partitionBy($"bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum_toks", sum($"n_toks").over(w))
      .select($"doc_id", $"n_toks", $"bucket",
        expr(s"(cum_toks - n_toks) div $PackBudget").as("shard"),
        $"cum_toks")
      .orderBy($"doc_id")
  }

  val packSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    doc_id % $PackBuckets AS bucket
       |  FROM documents),
       |c AS (SELECT doc_id, n_toks, bucket,
       |    CAST(SUM(n_toks) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_toks
       |  FROM t)
       |SELECT doc_id, n_toks, bucket,
       |  CAST((cum_toks - n_toks) // $PackBudget AS BIGINT) AS shard,
       |  cum_toks
       |FROM c ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // llm_pipeline_split: LEAKAGE-SAFE train/val/test assignment — the
  // split key is the duplicate-CLUSTER id, not the document id, so
  // near-duplicate documents always land in the same split (a doc-id
  // hash split leaks: a train doc's near-copy lands in test and
  // inflates eval). 80/10/10 by the deterministic content-family hash
  // h60(cluster_id); every member of a cluster inherits its
  // assignment. Scale shape: ddCluster's output + one narrow hash
  // projection — no new shuffle beyond the cluster computation itself.
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.ddCluster(spark, dir)
      .withColumn("bucket", h60($"cluster_id".cast("string")) % 100)
      .select($"doc_id", $"cluster_id",
        when($"bucket" < 80, "train")
          .when($"bucket" < 90, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  val splitSql: String =
    s"""WITH cc AS (${Dedup.ddClusterSql}),
       |b AS (SELECT doc_id, cluster_id,
       |    ${h60Sql("CAST(cluster_id AS VARCHAR)")} % 100 AS bucket
       |  FROM cc)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // llm_pipeline_e2e: the COMPLETE corpus→training-shards
  // materialization as one declarative plan — curate (CC-dedup ∧
  // quality ∧ lang ∧ hash-split), context-window chunking of the
  // surviving documents, then token-budget shard packing of the
  // chunks. This is the query a pretraining data job actually runs;
  // every stage is the same DataFrame its standalone verified query
  // returns, so the plan inherits each stage's scale shape: the only
  // wide ops are the curation joins, the CC stage inside them, and
  // the bucket-partitioned running total — chunking is a narrow
  // generator in between, and a doc's chunks stay contiguous in
  // (bucket, doc_id, chunk_id) order so shards hold runs of
  // consecutive context windows.
  def e2e(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val curated = curate(spark, dir).select($"doc_id")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .join(curated, "doc_id")
    val chunks = TextAnalysis.chunkOf(docs)
      .select($"doc_id", $"chunk_id",
        size($"chunk").cast("long").as("n_toks"),
        pmod($"doc_id", lit(PackBuckets)).as("bucket"))
    val w = Window.partitionBy($"bucket").orderBy($"doc_id", $"chunk_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum_toks", sum($"n_toks").over(w))
      .select($"doc_id", $"chunk_id", $"n_toks", $"bucket",
        expr(s"(cum_toks - n_toks) div $PackBudget").as("shard"),
        $"cum_toks")
      .orderBy($"doc_id", $"chunk_id")
  }

  val e2eSql: String =
    s"""WITH cur AS ($curateSql),
       |t AS (SELECT d.doc_id, string_split(d.text, ' ') AS toks
       |  FROM documents d JOIN cur ON d.doc_id = cur.doc_id),
       |s AS (SELECT doc_id, toks,
       |    unnest(range(0, len(toks), 48)) AS start FROM t),
       |c AS (SELECT doc_id,
       |    CAST(start // 48 AS BIGINT) AS chunk_id,
       |    CAST(len(list_slice(toks, start + 1, start + 64)) AS BIGINT) AS n_toks,
       |    doc_id % $PackBuckets AS bucket
       |  FROM s),
       |w AS (SELECT doc_id, chunk_id, n_toks, bucket,
       |    CAST(SUM(n_toks) OVER (PARTITION BY bucket
       |      ORDER BY doc_id, chunk_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_toks
       |  FROM c)
       |SELECT doc_id, chunk_id, n_toks, bucket,
       |  CAST((cum_toks - n_toks) // $PackBudget AS BIGINT) AS shard,
       |  cum_toks
       |FROM w ORDER BY doc_id, chunk_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_pipeline_curate" -> (curate _),
    "llm_pipeline_pack" -> (pack _),
    "llm_pipeline_split" -> (leakageSafeSplit _),
    "llm_pipeline_e2e" -> (e2e _),
  )

  val oracles: Map[String, String] = Map(
    "llm_pipeline_curate" -> curateSql,
    "llm_pipeline_pack" -> packSql,
    "llm_pipeline_split" -> splitSql,
    "llm_pipeline_e2e" -> e2eSql,
  )
}
