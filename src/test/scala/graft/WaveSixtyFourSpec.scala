package graft

import org.apache.spark.sql.functions._

/** Wave-64 invariants: phash Hamming histogram, expected calibration
  * error, weekly stickiness. Each test pins the identity that ties the
  * new op to the existing op it summarizes or justifies.
  */
class WaveSixtyFourSpec extends SparkSpec {
  import spark.implicits._

  test("hamming_hist: mass at hamming <= 3 equals the mm_phash pair list") {
    val hist = graft.llm.Multimodal.mmHammingHist(spark, sf0001).collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      val h = r.getInt(0)
      assert(h >= 0 && h <= 60, s"hamming $h out of the 60-block range")
      assert(r.getLong(2) >= r.getLong(1),
        "doc-pair mass below value-pair count")
    }
    // the <= 3 slice of the histogram IS llm_mm_phash's output mass —
    // the histogram justifies the threshold the pair list hard-codes
    val nearMass = hist.filter(_.getInt(0) <= 3).map(_.getLong(2)).sum
    val pairList = graft.llm.Multimodal.mmPhash(spark, sf0001).count()
    assert(nearMass == pairList,
      s"histogram mass $nearMass vs mm_phash pair count $pairList")
    graft.sources.Tables.releaseTransients(spark)
  }

  test("ece: reduces calibration's reliability curve exactly") {
    val eceRow = graft.llm.Models.ece(spark, sf0001).head()
    val cal = graft.llm.Models.calibration(spark, sf0001).collect()
    assert(eceRow.getLong(1) == cal.length.toLong, "bin counts differ")
    val n = cal.map(_.getLong(1)).sum
    assert(eceRow.getLong(0) == n)
    // recompute from calibration's (rounded) per-bin gaps: agreement
    // within the 1e-6 rounding budget of both queries
    val ece = cal.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    val mce = cal.map(_.getDouble(4)).max
    assert(math.abs(ece - eceRow.getDouble(2)) < 2e-6,
      s"ece ${eceRow.getDouble(2)} vs calibration-derived $ece")
    assert(math.abs(mce - eceRow.getDouble(3)) < 2e-6,
      s"mce ${eceRow.getDouble(3)} vs calibration-derived $mce")
    graft.sources.Tables.releaseTransients(spark)
  }

  test("stickiness: daily actives bound weekly actives; recount one week") {
    val rows = graft.streaming.WindowQueries.stStickiness(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wau, days, peak) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(days >= 1 && days <= 7, s"$days active days in a week")
      assert(peak <= wau, "peak DAU exceeds WAU")
      assert(r.getDouble(4) <= peak.toDouble + 1e-9, "avg DAU above peak")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0 + 1e-9,
        s"stickiness ${r.getDouble(5)} outside (0, 1]")
    }
    // independent recount of the first week from the raw events
    val week = rows.head.getDate(0)
    val ud = graft.sources.Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day"))
      .filter(date_trunc("week", $"day").cast("date") === week)
      .distinct()
    val wau = ud.select($"user_id").distinct().count()
    assert(wau == rows.head.getLong(1), s"week $week WAU recount mismatch")
    graft.sources.Tables.releaseTransients(spark)
  }
}
