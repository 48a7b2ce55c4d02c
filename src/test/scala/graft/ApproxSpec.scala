package graft

import org.apache.spark.sql.functions._

/** The approximate aggregates are the 100 TB substitutes for their
  * exact twins (HLL++ for countDistinct, t-digest for percentile) —
  * sketch values are engine-specific so they get no DuckDB oracle;
  * instead they are bounded against the exact results here.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on events.user_id") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val row = ev.agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id").as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact) <= math.max(1L, exact / 20),
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile within 2% of exact interpolated median") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02,
      s"exact=$exact approx=$approx")
  }
}
