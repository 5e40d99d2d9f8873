package graft.functions

import graft.clustering.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native intersect_size expression must be indistinguishable from
  * size(array_intersect(a, b)) — including duplicate elements (count
  * once), NULL elements (intersect only with a NULL on the other
  * side), NULL arrays (NULL out), and empty arrays — in both the
  * interpreted (eval) and codegen paths. */
class IntersectSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val cases: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq("a", "a", "b"), Seq("a", "b", "b")), // dups count once
    (Seq("a", "b"), Seq("c", "d")), // disjoint
    (Seq(), Seq("a")), // empty left
    (Seq("a"), Seq()), // empty right
    (Seq(null, "a"), Seq("a", "b")), // null only on one side
    (Seq(null, "a", null), Seq(null, "b")), // null both sides, counted once
    (Seq("x"), Seq("x")))

  test("intersect_size equals size(array_intersect) on crafted edge cases") {
    val df = cases.toDF("a", "b")
      .withColumn("native", GraftFunctions.intersectSize(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    val rows = df.select("native", "builtin").collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on $c: native ${r.getInt(0)} vs ${r.getInt(1)}")
    }
  }

  test("intersect_size equals size(array_intersect) on real word sets (codegen path)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    val pairs = docs.select(col("doc_id").as("ia"), col("ws").as("wa"))
      .join(docs.select(col("doc_id").as("ib"), col("ws").as("wb")),
        col("ib") === col("ia") + 1)
      .withColumn("native", GraftFunctions.intersectSize(col("wa"), col("wb")))
      .withColumn("builtin", size(array_intersect(col("wa"), col("wb"))))
    val rows = pairs.collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getInt(r.fieldIndex("native")) == r.getInt(r.fieldIndex("builtin"))))
    // and the projection computing intersect_size runs inside a
    // whole-stage-codegen stage (the *(n) marker in the final plan)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      plan.linesIterator.exists(l => l.contains("intersect_size") && l.contains("*(")),
      plan.take(300))
  }

  test("NULL array inputs null out like the builtin") {
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]]),
      (Option.empty[Seq[String]], Some(Seq("a"))))
      .toDF("a", "b")
      .withColumn("native", GraftFunctions.intersectSize(col("a"), col("b")))
    assert(df.filter(col("native").isNotNull).count() == 0)
  }

  test("sql-registered intersect_size works through the extension") {
    val r = spark.sql("SELECT intersect_size(array('a','b'), array('b','c')) AS i").head()
    assert(r.getInt(0) == 1)
  }
}
