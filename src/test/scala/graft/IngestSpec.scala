package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.sources.{BenchFixture, BenchIngest}

/** Ingest parity with the reference (ports of
  * file_generator_test.go:49-65 plus the edge cases its suite lacks,
  * SURVEY.md §5).
  */
class IngestSpec extends SparkSpec {

  lazy val fact = BenchIngest
    .ingest(spark, BenchFixture.shared, Seq("sql", "sql/parser", "util/cache"))
    .cache()

  test("golden line parses with zero-default MB/s (reference test 1)") {
    // file_generator_test.go:55-64: N=1328086, B=183965, A=2317, M=0.
    val rows = fact.filter("test = 'BenchmarkBank2_Cockroach-8' AND date = DATE '2015-01-01'")
      .select("pkg", "ns_per_op", "allocs_per_op", "bytes_per_op", "mb_per_s")
      .collect()
    assert(rows.toSeq == Seq(Row("sql", 1328086L, 2317L, 183965L, 0.0)))
  }

  test("FAIL lines and non-Benchmark lines are dropped (P1)") {
    assert(fact.filter("test LIKE 'BenchmarkFailing%'").count() == 0)
    assert(fact.filter("test = 'PASS' OR test LIKE 'goos%' OR test LIKE 'ok%'").count() == 0)
  }

  test("file glob excludes non test.stdout files (S3)") {
    assert(fact.filter("test = 'BenchmarkGhost-8'").count() == 0)
  }

  test("unknown pkg dirs and invalid date dirs are pruned (S2/P2)") {
    assert(fact.filter("test LIKE 'BenchmarkNope%'").count() == 0)
  }

  test("duplicate (pkg,test,date) resolves last-write-wins (A1)") {
    // a.test.stdout has 100, b.test.stdout has 150 then 200:
    // lexicographically-last file, then last line, must win.
    val ns = fact.filter("test = 'BenchmarkDup-8'").select("ns_per_op").collect()
    assert(ns.toSeq == Seq(Row(200L)))
  }

  test("MB/s parses when present (P3)") {
    val m = fact.filter("test = 'BenchmarkParse-4'").select("mb_per_s").collect()
    assert(m.toSeq == Seq(Row(12.34)))
  }

  test("reference MB/s regex quirk: single-digit '5 MB/s' does not match") {
    // SURVEY §2.3: the reference regex [0-9]+\.?[0-9]+ needs >=2 digit
    // chars — replicated, so a bare '5 MB/s' yields the zero default.
    val dir = Files.createTempDirectory("quirk").toString
    BenchFixture.write(dir) // base tree (unused pkg filter keeps it out)
    val p = java.nio.file.Paths.get(dir, "05-05-2015/cockroach/kv/kv.test.stdout")
    Files.createDirectories(p.getParent)
    Files.write(p, "BenchmarkQuirk-8 \t 10 \t 77 ns/op \t 5 MB/s".getBytes)
    val f = BenchIngest.ingest(spark, dir, Seq("kv"))
    val rows = f.select("test", "ns_per_op", "mb_per_s").collect()
    assert(rows.toSeq == Seq(Row("BenchmarkQuirk-8", 77L, 0.0)))
  }

  test("dates are typed and sorted natively (O1)") {
    val dates = fact.filter("test = 'BenchmarkBank2_Cockroach-8'")
      .orderBy("date").select("date").collect().map(_.getDate(0).toString)
    assert(dates.toSeq == Seq("2015-01-01", "2015-01-02", "2015-03-15"))
  }

  test("snapshot-stamped fact cache sees files added DEEP in the stdout tree") {
    import graft.sources.Tables
    // The live incremental-ingest shape: a new day's stdout lands
    // nested at <date>/cockroach/<pkg>/<file> — two levels below the
    // root, where neither the root's entry count nor the root's
    // entry mtimes change. Tables.snapshot must recurse, or the
    // session-cached fact silently serves the stale pre-drop answer
    // (the r6 verdict's top finding).
    val root = Files.createTempDirectory("graft_deepsnap").toString
    def fact() = Tables.sessionCached(spark,
        Tables.stamped(spark, root, "deep_fact")) {
      BenchIngest.ingest(spark, root, Seq("sql")).localCheckpoint()
    }
    val d1 = java.nio.file.Paths.get(root, "01-01-2015", "cockroach", "sql")
    Files.createDirectories(d1)
    Files.write(d1.resolve("a.test.stdout"),
      "BenchmarkDeepA-8 \t 1000 \t 500 ns/op".getBytes("UTF-8"))
    assert(fact().count() == 1)
    // new file two directory levels below root, pre-existing date dir
    Files.write(d1.resolve("b.test.stdout"),
      "BenchmarkDeepB-8 \t 1000 \t 700 ns/op".getBytes("UTF-8"))
    assert(fact().count() == 2,
      "deep-tree change did not re-key the session-cached fact")
    // and a whole new nested day, also below the top level
    val d2 = java.nio.file.Paths.get(root, "02-01-2015", "cockroach", "sql")
    Files.createDirectories(d2)
    Files.write(d2.resolve("c.test.stdout"),
      "BenchmarkDeepA-8 \t 1000 \t 400 ns/op".getBytes("UTF-8"))
    assert(fact().count() == 3,
      "new nested date dir did not re-key the session-cached fact")
  }
}
