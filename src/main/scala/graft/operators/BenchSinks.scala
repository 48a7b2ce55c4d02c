package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's JSON sinks (SURVEY.md §2.1 S5/S6) as partitioned
  * Spark writes.
  */
object BenchSinks {

  /** S5 (file_generator.go:177-190): per-(pkg,test) series JSON. The
    * reference writes `{date: {N,A,B,M}}` per test file; the engine
    * writes one JSON row per (pkg,test) carrying the same date-keyed
    * map, partitioned by pkg — same information layout, but a
    * distributed write (no driver-side materialization of the cube).
    * Dates render as DD-MM-YYYY strings to preserve the reference's
    * key contract (README.md:31-33).
    */
  def writeSeriesJson(fact: DataFrame, outDir: String): Unit =
    fact
      .groupBy(col("pkg"), col("test"))
      .agg(map_from_entries(array_sort(collect_list(struct(
        date_format(col("date"), "dd-MM-yyyy").as("date"),
        struct(
          col("ns_per_op").as("N"),
          col("allocs_per_op").as("A"),
          col("bytes_per_op").as("B"),
          col("mb_per_s").as("M")).as("stats"))))).as("series"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pkg")
      .json(outDir)

  /** S6 (file_generator.go:192-208): the `test_names.json` catalog —
    * `{pkg: [test...]}`. Single small file by contract (`coalesce(1)`
    * is correct here: the catalog is distinct (pkg,test) pairs, tiny
    * at any scale).
    */
  def writeCatalogJson(fact: DataFrame, outDir: String): Unit =
    SeriesOps.catalog(fact)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .json(outDir)
}
