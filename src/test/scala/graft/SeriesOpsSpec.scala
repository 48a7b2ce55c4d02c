package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{BenchQueries, SeriesOps}

class SeriesOpsSpec extends SparkSpec {

  lazy val fact = BenchQueries.fact(spark).cache()

  test("alignment preserves one-row-per-date invariant (J1)") {
    // generate_benchmark_plot.js:141-143 — per-date uniqueness.
    val aligned = SeriesOps.alignSeries(fact, "sql",
      "BenchmarkBank2_Cockroach-8", "BenchmarkDup-8")
    assert(aligned.groupBy("date").count().filter("count > 1").count() == 0)
    // missing cells are nulls, not zeros (frontend-model parity, §1.4)
    assert(aligned.filter("b_ns_per_op IS NULL").count() == 2)
  }

  test("catalog lists each pkg once with sorted tests (A3)") {
    val cat = SeriesOps.catalog(fact).collect()
    assert(cat.length == 3)
    val sqlTests = cat.find(_.getString(0) == "sql").get.getSeq[String](1)
    assert(sqlTests == sqlTests.sorted)
  }

  test("unpivot yields 4 metric rows per observation (J2)") {
    val n = fact.count()
    assert(SeriesOps.unpivotMetrics(fact).count() == 4 * n)
  }

  test("reference priority list: 32 names, reverse-generation order (O3)") {
    val p = SeriesOps.ReferencePriorities
    assert(p.length == 32)
    // last generated = first in priority: Insert x Multinode x 1000
    assert(p.head == "BenchmarkInsert1000Multinode_Cockroach-16")
    assert(p.last == "BenchmarkScan1_Cockroach-16")
    assert(p.contains("BenchmarkDelete100_Cockroach-16"))
  }

  test("priority order ranks present rows only, then alphabetical (O3/O4)") {
    val ranked = SeriesOps.priorityOrder(SeriesOps.catalog(fact),
      Seq("BenchmarkDup-8") ++ SeriesOps.ReferencePriorities).collect()
    val sql = ranked.filter(_.getString(0) == "sql").map(r => (r.getString(1), r.getInt(2)))
    assert(sql.toSeq == Seq(("BenchmarkDup-8", 1), ("BenchmarkBank2_Cockroach-8", 2)))
    // no phantom rows for absent priority names (documented divergence)
    assert(!ranked.exists(_.getString(1).startsWith("BenchmarkInsert")))
  }

  test("series ratio restricts to dates both series measured") {
    val rows = BenchQueries.seriesRatioQ(spark, "").collect()
    // only 2015-01-01 has both series; missing-point dates drop, not 0
    assert(rows.length == 1)
    assert(rows.head.getDate(0).toString == "2015-01-01")
    val expected = BigDecimal(200.0 / 1328086.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).doubleValue
    assert(rows.head.getDouble(3) == expected)
  }

  test("pivotWide: one column per test, nulls for missing cells (J1-N)") {
    val wide = SeriesOps.pivotWide(fact, "sql",
      Seq("BenchmarkBank2_Cockroach-8", "BenchmarkDup-8"))
    assert(wide.columns.toSeq ==
      Seq("date", "BenchmarkBank2_Cockroach-8", "BenchmarkDup-8"))
    assert(wide.count() == 3)
  }

  test("changepoint: CUSUM peaks at the step, constant series scores 0") {
    import spark.implicits._
    // clean half-way step: 10 points at 100 then 10 at 200 — the CUSUM
    // |S| peak sits on the LAST pre-step point and the normalized
    // score is its theoretical 0.25 (n·δ·f(1-f) / n·δ with f=1/2)
    val step = (1 to 20).map(i =>
      ("p", "step", java.sql.Date.valueOf(f"2015-01-$i%02d"),
        if (i <= 10) 100L else 200L))
    // constant series: x_range 0 → vacuous score 0.0, never 0/0
    val const = (1 to 5).map(i =>
      ("p", "const", java.sql.Date.valueOf(f"2015-02-$i%02d"), 42L))
    val f = (step ++ const).toDF("pkg", "test", "date", "ns_per_op")
    val out = BenchQueries.changepointOn(f).collect()
      .map(r => r.getString(1) -> r).toMap
    val s = out("step")
    assert(s.getDate(3).toString == "2015-01-10", s.toString)
    assert(s.getDouble(4) == 0.25, s.toString)
    assert(s.getBoolean(5), s.toString)
    val c = out("const")
    assert(c.getDouble(4) == 0.0, c.toString)
    assert(!c.getBoolean(5), c.toString)
  }

  test("gap audit reports per-series missing dates against the corpus spine") {
    val out = BenchQueries.gapAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // Bank2 observes all 3 corpus dates — complete series, empty gap list
    val full = out(("sql", "BenchmarkBank2_Cockroach-8"))
    assert(full.getLong(2) == 3 && full.getLong(3) == 0)
    assert(full.getString(4) == "")
    // BenchmarkDup-8 reports only 2015-01-01 — missing the other two
    val dup = out(("sql", "BenchmarkDup-8"))
    assert(dup.getLong(2) == 1 && dup.getLong(3) == 2)
    assert(dup.getString(4) == "2015-01-02,2015-03-15")
    // invariant: n_present + n_missing = |spine| for every series
    out.values.foreach(r => assert(r.getLong(2) + r.getLong(3) == 3))
  }

  test("alert digest fires all three detector types on a synthetic fact") {
    import spark.implicits._
    // one series per detector: a +20% day-over-day jump (regression,
    // and with 20 points the jump is also a MAD spike), a step shift
    // (changepoint), and a flat control that must stay silent
    val spike = (1 to 20).map(i =>
      ("p", "spiky", java.sql.Date.valueOf(f"2015-03-$i%02d"),
        if (i == 15) 200L else 100L))
    val step = (1 to 20).map(i =>
      ("p", "stepper", java.sql.Date.valueOf(f"2015-03-$i%02d"),
        if (i <= 10) 100L else 200L))
    val flat = (1 to 20).map(i =>
      ("p", "flat", java.sql.Date.valueOf(f"2015-03-$i%02d"), 100L))
    val f = (spike ++ step ++ flat).toDF("pkg", "test", "date", "ns_per_op")
    val out = BenchQueries.alertsOn(f).collect()
      .map(r => (r.getString(0), r.getString(2), r.getDate(3).toString))
    assert(out.contains(("regression", "spiky", "2015-03-15")),
      s"missing the spike regression in ${out.toSeq}")
    assert(out.contains(("anomaly", "spiky", "2015-03-15")),
      s"missing the MAD anomaly in ${out.toSeq}")
    assert(out.exists { case (t, s, _) => t == "changepoint" && s == "stepper" },
      s"missing the step changepoint in ${out.toSeq}")
    assert(!out.exists(_._2 == "flat"), "flat series must stay silent")
  }

  test("alert digest carries exactly the detectors' flagged rows") {
    val alerts = BenchQueries.alerts(spark, sf0001).collect()
    val nReg = BenchQueries.regressionFlags(spark, sf0001)
      .filter("is_regression").count()
    val nAnom = BenchQueries.anomalyMad(spark, sf0001)
      .filter("is_anomaly").count()
    val nCp = BenchQueries.changepoint(spark, sf0001)
      .filter("is_shift").count()
    assert(alerts.length == nReg + nAnom + nCp)
    // the golden fixture's Bank2 decline trips the CUSUM detector
    val cp = alerts.filter(_.getString(0) == "changepoint")
    assert(cp.length == nCp && nCp >= 1)
    assert(cp.exists(r => r.getString(2) == "BenchmarkBank2_Cockroach-8"))
  }

  test("ewma matches the hand-computed exponential weighting on the golden series") {
    val rows = BenchQueries.ewma(spark, sf0001).collect()
      .filter(r => r.getString(0) == "sql"
        && r.getString(1) == "BenchmarkBank2_Cockroach-8")
      .sortBy(_.getDate(2).toString)
    assert(rows.length == 3)
    // golden values 1328086, 1200000, 1100000; w_j = 0.7^j
    val xs = Seq(1328086.0, 1200000.0, 1100000.0)
    val expected = Seq(
      xs(0),
      (xs(1) + 0.7 * xs(0)) / 1.7,
      (xs(2) + 0.7 * xs(1) + 0.49 * xs(0)) / 2.19)
    rows.zip(expected).zipWithIndex.foreach { case ((r, e), i) =>
      assert(r.getInt(4) == i + 1, s"n_pts at $i: $r")
      assert(math.abs(r.getDouble(5) - e) <= 1e-6,
        s"ewma[$i] = ${r.getDouble(5)}, expected $e")
    }
    // a single-point series is its own EWMA (no seed bias)
    val dup = BenchQueries.ewma(spark, sf0001).collect()
      .filter(r => r.getString(1) == "BenchmarkDup-8")
    assert(dup.length == 1 && dup.head.getDouble(5) == 200.0)
  }

  test("ewma equals the sequential reference on random series (incl. K truncation)") {
    import spark.implicits._
    // seeded random series longer than K=10 so the truncated-window
    // path is exercised; the reference mirrors the query's arithmetic
    // exactly (exact BigDecimal weight sums, double division, HALF_UP
    // round) so equality is bit-for-bit
    val rnd = new scala.util.Random(7)
    val rows = (0 until 6).flatMap { s =>
      val len = 1 + rnd.nextInt(25)
      (0 until len).map { i =>
        ("p", s"series$s", java.sql.Date.valueOf(
          java.time.LocalDate.of(2015, 1, 1).plusDays(i)),
          rnd.nextInt(1000000000).toLong)
      }
    }
    val f = rows.toDF("pkg", "test", "date", "ns_per_op")
    val got = BenchQueries.ewmaOn(spark, f).collect()
      .map(r => (r.getString(1), r.getDate(2).toString) ->
        (r.getInt(4), r.getDouble(5))).toMap
    val w = (0 until 10).scanLeft(java.math.BigDecimal.ONE)(
      (acc, _) => acc.multiply(new java.math.BigDecimal("0.7"))).take(10)
    rows.groupBy(_._2).foreach { case (series, rs) =>
      val sorted = rs.sortBy(_._3.toString)
      val xs = sorted.map(_._4)
      xs.indices.foreach { t =>
        val window = (0 until math.min(10, t + 1)).map(j => (xs(t - j), w(j)))
        val num = window.map { case (x, wj) =>
          new java.math.BigDecimal(x).multiply(wj) }
          .reduce(_.add(_))
        val den = window.map(_._2).reduce(_.add(_))
        val want = BigDecimal(num.doubleValue() / den.doubleValue())
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (nPts, gotV) = got((series, sorted(t)._3.toString))
        assert(nPts == window.size, s"$series t=$t n_pts")
        assert(gotV == want, s"$series t=$t: got $gotV want $want")
      }
    }
  }
}
