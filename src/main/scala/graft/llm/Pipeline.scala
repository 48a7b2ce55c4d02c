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

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_pipeline_curate" -> (curate _),
  )

  val oracles: Map[String, String] = Map(
    "llm_pipeline_curate" -> curateSql,
  )
}
