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

  test("orc source round-trips losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy($"event_id").collect().toSeq ==
      sample.collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    sample.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter($"event_type" === "click")
    // partition pruning: the physical scan must select only the
    // matching partition directory
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(one.count() == sample.filter($"event_type" === "click").count())
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), s"no partition filter in:\n$scan")
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

  test("sessionCached memoizes and supports nested builds") {
    import graft.sources.Tables
    // nested: a cached build may itself resolve cached inputs (the LSH
    // band table builds from the class/shingle tables) — this used to
    // trip ConcurrentHashMap's recursive-update check
    var outerBuilds, innerBuilds = 0
    val outer = Tables.sessionCached(spark, "spec#outer") {
      outerBuilds += 1
      val inner = Tables.sessionCached(spark, "spec#inner") {
        innerBuilds += 1; spark.range(3).toDF()
      }
      inner.withColumn("x", org.apache.spark.sql.functions.lit(1))
    }
    assert(outer.count() == 3)
    val again = Tables.sessionCached(spark, "spec#outer") {
      outerBuilds += 1; spark.range(99).toDF()
    }
    assert(again eq outer, "second lookup must return the memoized frame")
    assert(outerBuilds == 1 && innerBuilds == 1)
    assert(Tables.sessionCached(spark, "spec#inner") {
      innerBuilds += 1; spark.range(99).toDF()
    }.count() == 3)
    assert(innerBuilds == 1)
  }

  test("reliable cache mode writes artifacts to disk and survives block loss") {
    import graft.sources.Tables
    // SPARK_GRAFT_TABLE_CACHE=reliable (here via the sys-prop alias):
    // derived artifacts checkpoint to the reliable checkpoint FS
    // instead of executor block storage, so on a real cluster an
    // executor loss doesn't strand a warm pipeline mid-job. Local
    // proof: the checkpoint files exist on disk, and after dropping
    // every cached block the frame still answers from those files.
    sys.props("graft.tableCache") = "reliable"
    try {
      val df = Tables.materialize(
        spark.range(10).toDF("x").withColumn("y", col("x") * 2))
      val ckDir = spark.sparkContext.getCheckpointDir
      assert(ckDir.isDefined, "reliable mode must set a checkpoint dir")
      val local = new java.io.File(
        new java.net.URI(ckDir.get).getPath)
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      assert(walk(local).nonEmpty,
        s"no checkpoint files under ${local.getPath}")
      // simulate executor loss: unpersist every block behind the plan
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = true)
        case _ => ()
      }
      assert(df.count() == 10, "reliable artifact unreadable after block loss")
      // and the no-op path for already-materialized loop artifacts
      assert(Tables.persistArtifact(df).count() == 10)
    } finally sys.props.remove("graft.tableCache")
  }

  test("snapshot token invalidates cached tables when the dir is rewritten") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    spark.range(3).toDF("doc_id").write.parquet(s"$dir/t.parquet")
    assert(Tables.table(spark, dir, "t").count() == 3)
    // rewrite within the same session: the dir listing changes, so the
    // stamped key misses and the table is re-resolved (pre-fix this
    // silently served the stale 3-row frame)
    spark.range(5).toDF("doc_id").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.table(spark, dir, "t").count() == 5)
  }
}
