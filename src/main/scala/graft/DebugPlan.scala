package graft
import org.apache.spark.sql.SparkSession
// scratch diagnostic, deleted before commit
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.text.CorpusStats.qKnLogprob(spark, "/root/testdata/sf0.1")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("### ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).length)
    println("### Exchange lines:")
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan parquet"))
      .foreach(l => println("### " + l.trim.take(150)))
    spark.stop()
  }
}
