package graft.sources

import graft.clustering.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: a user who only speaks SQL can drive the
  * engine — tables as temp views, queries as spark.sql strings, and
  * the library's native expressions (hamming / cosine_sim /
  * intersect_size, injected via SparkSessionExtensions) callable from
  * SQL text. Results must agree with the Column-API formulations the
  * oracles verify. */
class SqlFrontDoorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    graft.Tables.t(spark, sf, name).createOrReplaceTempView(name)

  test("a SQL-only user can run a star join over temp views") {
    Seq("orders", "customer", "nation").foreach(view)
    val viaSql = spark.sql(
      """SELECT n_name, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect()
    assert(viaSql.nonEmpty)
    assert(viaSql.map(_.getLong(1)).sum ==
      graft.Tables.t(spark, sf, "orders").count())
  }

  test("native expressions work from SQL text and match the Column API") {
    view("documents")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  intersect_size(split(text, ' '), array('the', 'data', 'spark')) AS k
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin).collect()
    import org.apache.spark.sql.functions._
    val viaApi = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.intersectSize(
          split(col("text"), " "),
          array(lit("the"), lit("data"), lit("spark"))).as("k"))
      .orderBy("doc_id").limit(20).collect()
    assert(viaSql.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      viaApi.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    // hamming + cosine_sim parse and evaluate from SQL too
    assert(spark.sql("SELECT hamming('0101', '0110') AS h").head().getInt(0) == 2)
    val cs = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(cs - 1.0) < 1e-12)
  }

  test("a registered query's SQL-expressed twin matches the Column-API result") {
    view("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 1) AS DOUBLE) AS sum_base,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - CAST(l_discount AS DECIMAL(4,2)))), 1) AS DOUBLE) AS sum_disc,
        |  count(*) AS cnt
        |FROM lineitem WHERE l_discount <= 0.08
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    val viaApi = graft.relational.Relational.q1Agg(spark, sf)
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    assert(viaSql.toSeq == viaApi.toSeq)
  }
}
