package graft

import org.apache.spark.sql.functions._

import graft.operators.{BenchQueries, BenchSinks}

/** Sink round-trip (port of TestGenerateJSONFiles,
  * file_generator_test.go:75-93): the written JSON must carry the
  * date-keyed {N,A,B,M} map per (pkg,test), partitioned by pkg.
  */
class BenchSinksSpec extends SparkSpec {

  test("series JSON sink round-trips the golden series (S5)") {
    val out = "/root/repo/target/test_sink_series"
    val fact = BenchQueries.fact(spark)
    BenchSinks.writeSeriesJson(fact, out)
    val back = spark.read.json(out)
    assert(back.count() == 4) // 4 distinct (pkg,test) series
    val golden = back
      .filter("pkg = 'sql' AND test = 'BenchmarkBank2_Cockroach-8'")
      .select(col("series.`01-01-2015`.N"), col("series.`01-01-2015`.A"),
        col("series.`01-01-2015`.B"), col("series.`01-01-2015`.M"))
      .collect()(0)
    assert((golden.getLong(0), golden.getLong(1), golden.getLong(2), golden.getDouble(3)) ==
      ((1328086L, 2317L, 183965L, 0.0)))
    // partitioned layout: one dir per pkg (S5's partition contract)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("pkg=")))
  }

  test("catalog JSON sink writes {pkg, tests} rows (S6)") {
    val out = "/root/repo/target/test_sink_catalog"
    BenchSinks.writeCatalogJson(BenchQueries.fact(spark), out)
    val back = spark.read.json(out)
    assert(back.columns.sorted.toSeq == Seq("pkg", "tests"))
    assert(back.count() == 3)
    val sqlTests = back.filter("pkg = 'sql'").select("tests").collect()(0).getSeq[String](0)
    assert(sqlTests == Seq("BenchmarkBank2_Cockroach-8", "BenchmarkDup-8"))
  }
}
