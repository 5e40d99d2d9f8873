package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.clustering.{ClusterSql, KMeans, Points}

/** Product quantization (PQ) ANN — the classic FAISS-style memory path
  * for billion-vector search, from its public description (Jégou et
  * al., "Product Quantization for Nearest Neighbor Search"): split each
  * 64-dim vector into M=8 subvectors, k-means each subspace into 16
  * centroids, store each vector as 8 small codes (8 bytes instead of
  * 256 — a 32x index compression), and score queries against the codes
  * with an ADC lookup table (one squared-distance table per query,
  * M x K' entries, computed once per query on the driver).
  *
  * Scale shape: training touches only K'*D doubles per subspace on the
  * driver (at 100 TB you train the codebooks on a sample — the corpus
  * never leaves the executors); the encode pass is one projection; the
  * scored search is a broadcast of QN tiny lookup tables against the
  * codes table — per corpus row, 8 array lookups + 7 adds, no vector
  * math at query time at all.
  *
  * Fully deterministic (first-K init, fixed iteration count, round-6
  * center means), so the ENTIRE pipeline — training, encoding, ADC
  * scoring — is oracled in generated SQL, like simsearch_ivf.
  * An empty training class keeps NaN centers on the Spark side and
  * NULL-center columns in SQL: both render the class unassignable
  * (NaN sorts above any real distance in array_min; the oracle
  * coalesces NULL distances to +infinity), so the two engines agree.
  */
object PQ {

  private val QN = 5 // query vectors: vec_id <= QN (the simsearch set)
  private val M = 8 // subspaces
  private val SUBD = 8 // dims per subspace
  private val PQ_K = 16 // centroids per subspace codebook
  private val PQ_TOPK = 5

  private def sub(s: Int): Seq[String] = Points.embedDims.slice(s * SUBD, (s + 1) * SUBD)

  /** Subspace codebook training: first-K init + 1 Lloyd iteration per
    * subspace (the same generic operators the clustering engine
    * exposes). Job-count discipline: pid is unique, so ONE TakeOrdered
    * collect yields every subspace's first-K init (identical values to
    * 8 per-subspace firstKCenters calls); ONE shared assign pass tags
    * all 8 subspace memberships; the 8 per-subspace mean-updates are
    * independent small aggregates, launched as CONCURRENT jobs over
    * the shared cached assignment — 3 job waves instead of 16
    * sequential driver round-trips. Shared by PQ and IVFPQ. */
  private[search] def trainCodebooks(pts: DataFrame,
                                     k: Int = PQ_K): Array[Array[Array[Double]]] = {
    val first = pts.orderBy(col("pid") +: Points.embedDims.map(col): _*).limit(k)
      .select(Points.embedDims.map(col): _*).collect()
      .map(r => Points.embedDims.indices.map(r.getDouble).toArray)
    val inits = Array.tabulate(M)(s =>
      Array.tabulate(k)(j => first(j).slice(s * SUBD, (s + 1) * SUBD)))
    val assigned = pts.select(
      (Points.embedDims.map(col) :+
        graft.functions.GraftFunctions
          .pqEncode(array(Points.embedDims.map(col): _*), inits).as("__t")): _*)
      .cache()
    assigned.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val codebookFuts = (0 until M).map { s =>
      Future {
        val sd = sub(s)
        // exactly KMeans.update's math over this subspace's assignment
        val byK = KMeans.update(
          assigned.select(element_at(col("__t"), s + 1).as("k") +: sd.map(col): _*), sd)
          .collect()
          .map(r => r.getAs[Int]("k") -> sd.indices.map(i => r.getDouble(2 + i)).toArray)
          .toMap
        Array.tabulate(k)(j => byK.getOrElse(j, Array.fill(SUBD)(Double.NaN)))
      }
    }
    val codebooks = codebookFuts.map(Await.result(_, Duration.Inf)).toArray
    assigned.unpersist()
    codebooks
  }

  /** The 8-codes-per-vector encode projection (the PQ index shape),
    * via the native PQEncode expression — one fused pass instead of
    * M x K unrolled Catalyst distance trees (PQSpec proves the codes
    * bitwise-equal to the composed KMeans.assign formulation the
    * oracle mirrors). */
  private[search] def encodeCodes(pts: DataFrame,
                                  codebooks: Array[Array[Array[Double]]]): DataFrame =
    pts.select(col("pid"),
      graft.functions.GraftFunctions
        .pqEncode(array(Points.embedDims.map(col): _*), codebooks).as("__codes"))
      .select(col("pid") +: (0 until M).map(s =>
        element_at(col("__codes"), s + 1).as(s"code_$s")): _*)

  /** The declarative encode (M x K unrolled assigns) — the formulation
    * the SQL oracle mirrors; kept as the equivalence reference for
    * PQSpec. */
  private[search] def encodeCodesDeclarative(pts: DataFrame,
                                             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    var enc = pts
    for (s <- 0 until M)
      enc = KMeans.assign(enc, codebooks(s), sub(s))
        .withColumnRenamed("k", s"code_$s").drop("dist")
    enc.select(col("pid") +: (0 until M).map(s => col(s"code_$s")): _*)
  }

  /** Driver-side ADC lookup tables: per query, M x PQ_K squared
    * partial distances, left-fold add order identical to the oracle. */
  private[search] def adcRows(qvecs: Array[(Long, Array[Double])],
                              codebooks: Array[Array[Array[Double]]]): Seq[(Long, Seq[Seq[Double]])] = {
    // shape derives from the codebooks, so larger-K' sweep configs
    // (IvfPqSweep) ride the same code path the defaults are oracled on
    val (m, k, subd) = (codebooks.length, codebooks.head.length, codebooks.head.head.length)
    qvecs.toSeq.map { case (qid, v) =>
      val dtab = (0 until m).map { s =>
        (0 until k).map { j =>
          (0 until subd).map { d =>
            val df = v(s * subd + d) - codebooks(s)(j)(d); df * df
          }.reduce(_ + _)
        }
      }
      (qid, dtab)
    }
  }

  /** ADC score column: per (query, vector), 8 table lookups + an add
    * chain; approx distance = sqrt of the summed partials. Expects a
    * `dtab` column and the code_0..code_{M-1} columns in scope. */
  private[search] def adScore: org.apache.spark.sql.Column =
    sqrt((0 until M).map(s =>
      element_at(element_at(col("dtab"), s + 1), col(s"code_$s") + 1)).reduce(_ + _))

  /** The default (non-residual) codebooks trained once per (JVM, dir)
    * — shared by PQ and IVFPQ exactly as a deployment shares one
    * trained codebook across its indexes; deterministic, so staging
    * cannot change results. M x PQ_K x SUBD doubles of driver memory.
    * The residual variant trains on per-cell residuals and is NOT
    * staged (different input frame). */
  private val codebooksStaged =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()
  private[search] def stagedCodebooks(pts: DataFrame, dir: String): Array[Array[Array[Double]]] =
    codebooksStaged.computeIfAbsent(dir, { _ =>
      graft.Memo.miss(); trainCodebooks(pts)
    })

  def qPq(spark: SparkSession, dir: String): DataFrame = {
    val pts = Points.embeddings64(spark, dir).cache()
    // 1. train the codebooks (tiny driver state only)
    val codebooks = stagedCodebooks(pts, dir)
    // 2. encode: MATERIALIZED — this is the PQ index (8 bytes/vector),
    //    and caching it keeps the 8x16-center distance trees out of
    //    the downstream join/window plan
    val codes = encodeCodes(pts, codebooks).cache()
    codes.count()
    pts.unpersist()
    // 3+4. ADC tables + scoring
    val qRows = adcRows(SimSearch.queryVecs(spark, dir), codebooks)
    import spark.implicits._
    val qdf = broadcast(qRows.toDF("q_id", "dtab"))
    val scored = codes.crossJoin(qdf).filter(col("pid") =!= col("q_id"))
      .select(col("q_id"), col("pid").as("vec_id"), adScore.as("ad"))
    val w = Window.partitionBy("q_id").orderBy(col("ad").asc, col("vec_id").asc)
    val result = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= PQ_TOPK)
      .select("q_id", "vec_id", "rank", "ad")
    // literal-frame return (KMeans.lloyd's trick) so the codes cache is
    // released now instead of leaking for the session's lifetime
    val rows = result.collect()
    val schema = result.schema
    codes.unpersist()
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Train+encode CTE chain (c0_s .. enc_s per subspace, then the
    * joined `codes` table) over any (pid, e1..e64) point CTE `src`
    * (raw points for PQ, coarse residuals for residual IVFPQ).
    * Shared by the PQ and IVFPQ oracles. */
  private[search] def pqTrainSql(src: String = "pts"): String = {
    val train = (0 until M).map { s =>
      val sd = sub(s)
      // u1_s is read by BOTH the encode widen and the qtab widen —
      // materialize so each subspace's training runs once
      s"""${ClusterSql.c0Sql(PQ_K, Points.embedPtsSql, sd, s"c0_$s", src)},
         |${ClusterSql.widenSql(PQ_K, s"c0_$s", s"c0w_$s", sd)},
         |${ClusterSql.assignSql(PQ_K, s"c0w_$s", s"a1_$s", src, sd)},
         |${ClusterSql.updateSql(s"a1_$s", s"u1_$s", sd, mat = true)},
         |${ClusterSql.widenSql(PQ_K, s"u1_$s", s"cw_$s", sd)},
         |${ClusterSql.assignSql(PQ_K, s"cw_$s", s"enc_$s", src, sd)}""".stripMargin
    }.mkString(",\n")
    val codes = "codes AS (SELECT e0.pid, " +
      (0 until M).map(s => s"e$s.k AS code_$s").mkString(", ") +
      " FROM " + (0 until M).map(s => s"enc_$s e$s").mkString(", ") +
      " WHERE " + (1 until M).map(s => s"e0.pid = e$s.pid").mkString(" AND ") + ")"
    s"$train,\n$codes"
  }

  /** The per-query ADC table CTE (`qtab`): one widened copy of each
    * codebook with a per-subspace column prefix, so all 8 can share
    * one scope. Expects the u1_s CTEs plus a query-point CTE `src`
    * carrying (e1..e64 + the `keySelect` columns); residual IVFPQ
    * passes its per-(query, cell) residual CTE. */
  private[search] def pqQtabSql(src: String = "pts",
                                keySelect: String = "pid AS q_id",
                                where: String = s"WHERE pid <= $QN"): String = {
    val qWidens = (0 until M).map(s =>
      ClusterSql.widenSql(PQ_K, s"u1_$s", s"cwq_$s", sub(s), s"q${s}x")).mkString(",\n")
    val qtabCols = (0 until M).flatMap { s =>
      val sd = sub(s)
      (0 until PQ_K).map { j =>
        sd.zipWithIndex.map { case (d, pos) =>
          s"($d - q${s}x${j}_${pos + 1}) * ($d - q${s}x${j}_${pos + 1})"
        }.mkString(" + ") + s" AS pd_${s}_$j"
      }
    }.mkString(",\n    ")
    s"""$qWidens,
       |qtab AS (SELECT $keySelect,
       |    $qtabCols
       |  FROM $src ${(0 until M).map(s => s"CROSS JOIN cwq_$s").mkString(" ")}
       |  $where)""".stripMargin
  }

  /** The ADC distance expression over a codes row `c` and a qtab row
    * `q` — explicit left-fold order, identical to adScore. */
  private[search] def pqAdCaseSql: String =
    (0 until M).map { s =>
      s"(CASE c.code_$s " +
        (0 until PQ_K).map(j => s"WHEN $j THEN q.pd_${s}_$j").mkString(" ") + " END)"
    }.mkString(" + ")

  /** The whole pipeline as one generated SQL statement: per subspace,
    * init + 1 Lloyd iteration + encode; then the ADC table per query
    * and the scored top-k. */
  private def pqOracle: String = {
    val adExpr = pqAdCaseSql
    s"""WITH pts AS (${Points.embedPtsSql}),
       |${pqTrainSql()},
       |${pqQtabSql()},
       |scored AS (SELECT q.q_id, c.pid AS vec_id, sqrt($adExpr) AS ad
       |  FROM codes c CROSS JOIN qtab q WHERE c.pid != q.q_id)
       |SELECT q_id, vec_id, rank, ad FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY ad ASC, vec_id ASC) AS INT) AS rank
       |  FROM scored) WHERE rank <= $PQ_TOPK""".stripMargin
  }

  /** PQ distortion report — the index-quality metric a vector-search
    * deployment tracks per build: mean squared quantization error per
    * subspace (how much of each 8-dim slice the 4-bit code throws
    * away) plus the subspace's share of total distortion. Rising MSE
    * on re-train means the corpus drifted from the codebooks. One
    * projection computes all M per-subspace assigned distances via
    * the native PQMinDists expression (the fused triple loop the
    * encoder uses — the declarative array_min-over-128-distance-trees
    * form blew janino's 64 KB method limit and ran the whole stage
    * interpreted), ONE aggregate folds the M means — no per-subspace
    * jobs, no shuffle beyond the final 1-row agg. Rides the staged
    * codebooks. */
  def qPqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Points.embeddings64(spark, dir)
    val codebooks = stagedCodebooks(pts, dir)
    val aggs = (0 until M).map(s =>
      round(avg(element_at(col("__d"), s + 1) * element_at(col("__d"), s + 1)), 6)
        .as(s"mse_$s"))
    val row = pts.select(
      graft.functions.GraftFunctions
        .pqMinDists(array(Points.embedDims.map(col): _*), codebooks).as("__d"))
      .agg(aggs.head, aggs.tail: _*).head()
    val mses = (0 until M).map(row.getDouble)
    val total = mses.sum
    (0 until M).map(s => (s, mses(s),
      BigDecimal(mses(s) / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("subspace", "mse", "share")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simsearch_pq" -> (qPq _),
    "simsearch_pq_distortion" -> (qPqDistortion _))

  val oracleSql: Map[String, String] = Map(
    "simsearch_pq" -> pqOracle,
    "simsearch_pq_distortion" -> {
      val rows = (0 until M).map(s =>
        s"SELECT $s AS subspace, round(avg(dist * dist), 6) AS mse FROM enc_$s")
        .mkString(" UNION ALL ")
      s"""WITH pts AS (${Points.embedPtsSql}),
         |${pqTrainSql()},
         |m AS ($rows),
         |t AS (SELECT sum(mse) AS total FROM m)
         |SELECT subspace, mse, round(mse / total, 6) AS share
         |FROM m CROSS JOIN t""".stripMargin
    })
}
