package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Event-time windowing over `events` in BATCH form — the exact same
  * window()/session_window() expressions Structured Streaming executes
  * incrementally (StreamPipelines wires them to readStream/writeStream;
  * batch form is what the DuckDB oracle can verify).
  *
  * Timestamps are projected to epoch microseconds (integers) at the
  * output boundary so the oracle compare is exact, never tz/precision
  * dependent. Money-ish double sums go through DECIMAL(18,6) — the
  * established pattern in this repo for order-independent sums.
  */
object WindowQueries {

  private def sumVal = round(
    sum(col("value").cast(DecimalType(18, 6))).cast("double"), 6)

  // --------------------------------------------------------------------
  // st_tumbling: 1-hour tumbling windows per event_type.
  def stTumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sumVal.as("sum_value"))
      .select(unix_micros($"w.start").as("w_start_us"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start_us", $"event_type")
  }

  val stTumblingSql: String =
    """SELECT epoch_us(date_trunc('hour', ts)) AS w_start_us, event_type,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // st_sliding: 1-hour windows sliding every 30 minutes — each event
  // lands in exactly 2 windows. Oracle reproduces Spark's window
  // assignment arithmetically: starts are the two 30-minute grid
  // points s with s <= ts < s + 1h.
  def stSliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sumVal.as("sum_value"))
      .select(unix_micros($"w.start").as("w_start_us"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start_us", $"event_type")
  }

  val stSlidingSql: String =
    """WITH g AS (
      |  SELECT *, (epoch_us(ts) // 1800000000) * 1800000000 AS grid FROM events),
      |x AS (
      |  SELECT event_type, value, unnest([grid, grid - 1800000000]) AS w_start_us
      |  FROM g)
      |SELECT w_start_us, event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------
  // st_session: 30-minute-gap session windows per user
  // (session_window semantics: session end = last event + gap).
  // Oracle is the classic gaps-and-islands rewrite.
  def stSession(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sumVal.as("sum_value"))
      .select($"user_id",
        unix_micros($"w.start").as("session_start_us"),
        unix_micros($"w.end").as("session_end_us"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start_us")
  }

  val stSessionSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
      |      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT *, SUM(new_session) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM o)
      |SELECT user_id,
      |  epoch_us(MIN(ts)) AS session_start_us,
      |  epoch_us(MAX(ts)) + 1800000000 AS session_end_us,
      |  COUNT(*) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start_us""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_tumbling" -> (stTumbling _),
    "st_sliding" -> (stSliding _),
    "st_session" -> (stSession _),
  )

  val oracles: Map[String, String] = Map(
    "st_tumbling" -> stTumblingSql,
    "st_sliding" -> stSlidingSql,
    "st_session" -> stSessionSql,
  )
}
