package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema at `/root/testdata/<sf>/`
  * (TESTDATA.md / FIXTURES.md §2). One parquet file per table.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed catalog
  * tables; `spark.read.parquet(dir)` keeps the scan declarative so
  * Catalyst applies column pruning + filter pushdown regardless of the
  * physical layout (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every query path starts here, so it's the chokepoint that makes
    // the engine's native functions (h60, vec_dot) resolvable by name
    graft.functions.H60.register(spark)
    graft.functions.VecDot.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md §2), which the
    * vectorized reader rejects; read nanos as long and convert to a
    * micros timestamp (truncation — sub-microsecond precision is not
    * used by any query semantics here).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
