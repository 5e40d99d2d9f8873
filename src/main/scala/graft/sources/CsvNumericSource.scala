package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Source for the reference's native input format: headerless CSV of
  * doubles, one point per line (kmeans.java:203-239 readDataset).
  * A user of the reference can point this at the same dataset files
  * (iris.txt, wine.txt, ...) and run every clustering operator.
  *
  * Produces the engine's standard point layout: a stable `pid` (line
  * order within each file — zipWithIndex over the text RDD, which is
  * deterministic for a given file set) plus x1..xD double columns, so
  * KMeans/GKA/PSO run on it unchanged.
  */
object CsvNumericSource {

  /** Read a numeric CSV into (pid, x1..xD). Blank lines are skipped
    * like the reference does (kmeans.java:216). */
  def read(spark: SparkSession, path: String, numDims: Int): DataFrame = {
    val schema = StructType(
      (1 to numDims).map(i => StructField(s"x$i", DoubleType, nullable = false)))
    val lines = spark.sparkContext.textFile(path)
      .filter(_.trim.nonEmpty)
      .zipWithIndex()
    val rows = lines.map { case (line, idx) =>
      // take the dims FIRST: trailing columns (e.g. class labels) must
      // not be parsed; then fail loudly on genuinely short lines
      val fields = line.split(",").take(numDims)
      require(fields.length == numDims,
        s"line ${idx + 1} has ${fields.length} fields, expected >= $numDims: $line")
      org.apache.spark.sql.Row.fromSeq(idx +: fields.map(_.trim.toDouble).toSeq)
    }
    val full = StructType(StructField("pid", org.apache.spark.sql.types.LongType,
      nullable = false) +: schema.fields)
    spark.createDataFrame(rows, full)
  }

  /** Per-dimension min/max + count, as the reference computes on read
    * (kmeans.java:219-230). */
  def stats(df: DataFrame, numDims: Int): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      (1 to numDims).flatMap(i =>
        Seq(min(col(s"x$i")).as(s"min_x$i"), max(col(s"x$i")).as(s"max_x$i"))): _*)
}
