package graft

import org.apache.spark.sql.functions._

/** File-format scan breadth (SURVEY §2.7 row 1): the engine's tables
  * round-trip through csv and json sources with explicit schemas —
  * parquet and text are exercised everywhere else (Tables, BenchIngest,
  * BenchSinks).
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = graft.sources.Tables.events(spark, sf0001)
    .select($"event_id", $"user_id", $"event_type", $"value")
    .orderBy($"event_id").limit(200)

  test("csv source round-trips with explicit schema and header") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .option("header", "true").csv(dir)
    assert(back.orderBy($"event_id").collect().toSeq ==
      sample.collect().toSeq)
  }

  test("json source round-trips with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(dir)
    assert(back.orderBy($"event_id").collect().toSeq ==
      sample.collect().toSeq)
  }
}
