package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Parquet star-schema loader for the driver's testdata layout
  * (TESTDATA.md): one parquet file per table under an sf directory.
  *
  * Mirrors the reference's dataset ingestion role (kmeans.java:203-239
  * `readDataset`) but Spark-first: data stays a distributed DataFrame,
  * never a driver-side array.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table; column pruning / predicate pushdown is left to
    * Catalyst (the caller's select/filter reaches the parquet scan).
    *
    * events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; sessions must set
    * spark.sql.legacy.parquet.nanosAsLong=true (Verify/Bench do), and
    * we convert the raw nanos to a microsecond timestamp here. Integer
    * `div` keeps full precision (nanos ~1.7e18 exceed a double's 2^53).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
