package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scope measurement harness for the q42 WAU decomposition: the
  * round-6 verdict flagged the range-join form (distinct (day,user)
  * pairs BroadcastNestedLoopJoined against the day spine — |pairs| ×
  * |days| predicate evaluations) as a calendar-scaling liability; the
  * shipped form explodes each pair into its ≤7 trailing windows
  * (7 × |pairs| rows, calendar-independent). This main times both on a
  * long-calendar fixture (tools-generated 10-year events) and asserts
  * row-identical results. Run:
  *
  *   sbt "Test/runMain graft.WauScaleBench target/longcal"
  *
  * Results go to SURVEY.md §6 as a measured record, not a claim.
  */
object WauScaleBench {

  /** The round-6 range-join formulation, verbatim, kept here ONLY as
    * the measurement baseline. */
  private def wauRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val du = graft.sources.Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
      .localCheckpoint()
    val days = du.select($"d".as("day")).distinct()
    val dau = du.groupBy($"d".as("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .join(broadcast(days), $"d" >= date_sub($"day", 6) && $"d" <= $"day")
      .select($"day", $"user_id").distinct()
      .groupBy($"day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select($"day", $"dau", $"wau",
        round($"dau".cast("double") / $"wau", 6).as("stickiness"))
      .orderBy($"day")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/longcal")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, f: => DataFrame): Array[org.apache.spark.sql.Row] = {
      f.count() // warm (JIT + table resolution)
      val draws = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s median ${draws.sorted.apply(1)}%.2f s  draws ${draws.map(d => f"$d%.2f").mkString(", ")}")
      f.collect()
    }

    val explodeRows = time("explode", graft.streaming.WindowQueries.q42ActiveUsers(spark, dir))
    val rangeRows = time("range-join", wauRangeJoin(spark, dir))
    require(explodeRows.toSeq == rangeRows.toSeq,
      s"forms disagree: ${explodeRows.length} vs ${rangeRows.length} rows")
    println(s"results identical over ${explodeRows.length} days")
    spark.stop()
  }
}
