package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import TextAnalysis.{h60, h60Sql}

/** Deterministic sampling operators for a training-data pipeline, over
  * `documents`. Random sampling (`Dataset.sample`) is not reproducible
  * across engines or re-runs; content-hash sampling is — the sample is
  * a pure function of the data, so a 100 TB re-run (or a second engine)
  * selects the same rows, which is what ablation / holdout splits need.
  *
  * Scale design: both operators are narrow per-row work plus (for the
  * stratified form) one shuffle on the stratum key — no global sort,
  * no driver-side state. The hash is the repo-wide md5-derived 60-bit
  * primitive ([[TextAnalysis.h60]]), reproducible in ANSI SQL.
  */
object Sampling {

  // --------------------------------------------------------------------
  // llm_sample_hash: deterministic ~5% sample — keep a row iff
  // h60(text) mod 100 < 5. The standard "stable holdout" selector: the
  // decision depends only on content, never on partitioning or order.
  def sampleHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", (h60($"text") % 100).as("bucket"))
      .filter($"bucket" < 5)
      .orderBy($"doc_id")
  }

  val sampleHashSql: String =
    s"""SELECT doc_id, source, ${h60Sql("text")} % 100 AS bucket
       |FROM documents
       |WHERE ${h60Sql("text")} % 100 < 5
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // llm_sample_stratified: deterministic top-2 per source stratum,
  // ranked by content hash (doc_id tie-break) — per-group quota
  // sampling with one shuffle on the stratum key. At 100 TB the same
  // plan holds: rank within stratum is a window, partial nothing, no
  // skew beyond the strata themselves.
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", h60($"text").as("h"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"source", $"doc_id", $"rn")
      .orderBy($"source", $"rn")
  }

  val sampleStratifiedSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, ${h60Sql("text")} AS h FROM documents),
       |r AS (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
       |  FROM t)
       |SELECT source, doc_id, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 2 ORDER BY source, rn""".stripMargin

  // --------------------------------------------------------------------
  // llm_sample_weighted: quality-proportional downsampling — keep a
  // document with probability equal to its quality score, decided by
  // the content hash (h60(text) mod 10⁶ < quality × 10⁶). How a
  // pipeline up-weights high-quality data WITHOUT randomness: the
  // accept decision is a pure function of content, so re-runs and
  // other engines select identical rows, and the acceptance rate per
  // quality stratum converges to the score itself. Narrow scoring
  // scans plus one doc_id equi-join.
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = TextAnalysis.taQuality(spark, dir).select($"doc_id", $"quality")
    Tables.documents(spark, dir)
      .select($"doc_id", (h60($"text") % 1000000L).as("draw"))
      .join(q, "doc_id")
      .filter($"draw" < $"quality" * 1000000.0)
      .select($"doc_id", $"draw", $"quality")
      .orderBy($"doc_id")
  }

  val sampleWeightedSql: String =
    s"""WITH q AS (${TextAnalysis.taQualitySql}),
       |d AS (SELECT doc_id, ${h60Sql("text")} % 1000000 AS draw FROM documents)
       |SELECT d.doc_id, d.draw, q.quality
       |FROM d JOIN q ON d.doc_id = q.doc_id
       |WHERE d.draw < q.quality * 1000000.0
       |ORDER BY d.doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_sample_hash" -> (sampleHash _),
    "llm_sample_stratified" -> (sampleStratified _),
    "llm_sample_weighted" -> (sampleWeighted _),
  )

  val oracles: Map[String, String] = Map(
    "llm_sample_hash" -> sampleHashSql,
    "llm_sample_stratified" -> sampleStratifiedSql,
    "llm_sample_weighted" -> sampleWeightedSql,
  )
}
