package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Embedding covariance + spectral diagnostics — the anisotropy
  * report a vector-search deployment reads before trusting cosine
  * geometry (a collapsed spectrum means every query looks like every
  * other; whitening/recentering decisions start from exactly these
  * numbers — the public embedding-quality literature's "dominant
  * direction" diagnostic).
  *
  * Scale shape: the covariance reduces to ONE pass accumulating the
  * d(d+1)/2 upper-triangle product sums per partition in a dense
  * double array (a mapPartitions kernel — justified under the §6
  * last-resort rule because this is a pure numeric Gram accumulation:
  * the declarative alternative explodes n x 2080 product rows through
  * generic tuple machinery for the identical arithmetic, and public
  * Spark ML computes its Gram/covariance matrices with the same
  * treeAggregate-style dense accumulation). Partial arrays merge
  * pairwise — O(partitions x 2080) driver work — and everything
  * after (the 64 x 64 eigen step) is bounded driver math on the
  * ROUNDED matrix, the lloyd literal-frame pattern.
  *
  * Determinism: raw sums are order-dependent doubles, so covariance
  * entries round 6 (the §4 aggregated-double rule) and the power
  * iteration runs on the ROUNDED matrix with every iterate re-rounded
  * 6 — both engines then walk bit-identical trajectories, exactly the
  * k-means center discipline. */
object Spectrum {

  private val D = 64
  private val P = D * (D + 1) / 2
  private val ITERS = 15

  /** (per-dim sums, upper-triangle product sums, row count), staged
    * once per (JVM, dir). */
  private val covStaged =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Array[Double], Long)]()

  private def stagedSums(spark: SparkSession, dir: String)
      : (Array[Double], Array[Double], Long) =
    covStaged.computeIfAbsent(dir, { _ =>
      t(spark, dir, "embeddings").select("embedding").rdd.mapPartitions { it =>
        val sums = new Array[Double](D)
        val prods = new Array[Double](P)
        var n = 0L
        it.foreach { row =>
          val a = row.getSeq[Float](0)
          require(a.length == D, s"expected $D dims, got ${a.length}")
          n += 1
          var i = 0
          var p = 0
          while (i < D) {
            val xi = a(i).toDouble
            sums(i) += xi
            var j = i
            while (j < D) { prods(p) += xi * a(j).toDouble; p += 1; j += 1 }
            i += 1
          }
        }
        Iterator.single((sums, prods, n))
      }.reduce { case ((s1, p1, n1), (s2, p2, n2)) =>
        var i = 0
        while (i < D) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < P) { p1(i) += p2(i); i += 1 }
        (s1, p1, n1 + n2)
      }
    })

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The rounded covariance matrix (full, symmetric). */
  private def covMatrix(spark: SparkSession, dir: String): (Array[Array[Double]], Long) = {
    val (sums, prods, n) = stagedSums(spark, dir)
    val c = Array.ofDim[Double](D, D)
    var p = 0
    var i = 0
    while (i < D) {
      var j = i
      while (j < D) {
        val cov = r6(prods(p) / n - (sums(i) / n) * (sums(j) / n))
        c(i)(j) = cov
        c(j)(i) = cov
        p += 1; j += 1
      }
      i += 1
    }
    (c, n)
  }

  /** Upper-triangle covariance entries (i <= j), rounded 6. */
  def qCovariance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, _) = covMatrix(spark, dir)
    (for (i <- 0 until D; j <- i until D) yield (i, j, c(i)(j)))
      .toDF("i", "j", "cov")
  }

  /** One-row spectral summary: trace, dominant eigenvalue by ITERS
    * power iterations from the exactly-representable uniform start
    * 1/8, and the top direction's explained variance share. */
  /** Every input of the power-iteration sums is a ROUND-6 grid value,
    * so each sum's TRUE value lies on the 1e-12 decimal grid — which
    * contains the 0.5e-6 rounding midpoints. A raw double sum sits
    * within sub-ulp of that exact value, and when the exact value IS
    * a midpoint, summation-order noise decides the rounded result: a
    * structural cross-engine (and run-to-run) coin flip, observed live
    * on embed_spectrum's Rayleigh numerator at sf0.01. The fix is the
    * OLS DECIMAL-exact-moments pattern: recover each factor's exact
    * decimal (setScale 6 of a value that IS a 6-decimal), sum the
    * exact scale-12 products in BigDecimal (order-free), and only then
    * round half-up — deterministically, because the decision happens
    * on the exact decimal, not a nearby double. The oracle mirrors
    * with DECIMAL(18,6) casts and DECIMAL sums. Divisions and sqrt
    * then act on bit-identical doubles in both engines (a binary
    * double can never equal a scale-7 decimal midpoint, so identical
    * doubles always round identically). */
  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def gridDot(a: Array[Double], b: Array[Double]): BigDecimal =
    a.indices.map(i => d6(a(i)) * d6(b(i))).sum

  /** ITERS power iterations over a round-6 grid matrix + final
    * Rayleigh quotient, all grid sums decimal-exact. */
  private def powerIterate(c: Array[Array[Double]]): Double = {
    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(D)(i => gridDot(c(i), v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    var v = Array.fill(D)(0.125)
    for (_ <- 1 to ITERS) {
      val u = matvec(v)
      val nrm = math.sqrt(gridDot(u, u).toDouble)
      v = u.map(x => r6(x / nrm))
    }
    val u = matvec(v)
    r6(gridDot(u, v).toDouble / gridDot(v, v).toDouble)
  }

  def qSpectrum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, n) = covMatrix(spark, dir)
    val lam = powerIterate(c)
    val trace = (0 until D).map(i => d6(c(i)(i))).sum.toDouble
    Seq((n, D, trace, lam, r6(lam / trace)))
      .toDF("n_vecs", "dim", "trace", "top_eig", "explained_share")
  }

  /** Correlation-spectrum summary — the post-standardization
    * anisotropy check: divide the covariance by the per-dimension
    * scales (corr_ij = cov_ij / sqrt(var_i var_j)) and re-run the
    * power iteration. If the RAW dominant share was driven by a few
    * high-variance dimensions, diagonal standardization (the cheap
    * half of whitening) collapses it; a share that SURVIVES here is
    * genuine correlated structure only a full rotation can remove —
    * the number that decides between per-dim scaling and PCA
    * whitening. The correlation trace is exactly D (each rounded
    * diagonal divides by itself), so the share is top_eig / D. All
    * driver math on the rounded matrix; same staged Gram sums. */
  def qCorrSpectrum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, n) = covMatrix(spark, dir)
    (0 until D).foreach(i => require(c(i)(i) > 0.0, s"zero variance in dim $i"))
    val cr = Array.tabulate(D, D)((i, j) =>
      r6(c(i)(j) / math.sqrt(c(i)(i) * c(j)(j))))
    val lam = powerIterate(cr)
    // lam/64 is a grid value scaled by a power of two — its exact
    // decimal terminates at scale 12, so the share rounds on the
    // exact decimal too (lam/64 lands on a midpoint whenever the
    // grid integer is 32 mod 64 — a 1/64 structural tie as a double)
    val share = (d6(lam) * BigDecimal("0.015625"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((n, D, lam, share))
      .toDF("n_vecs", "dim", "top_eig", "explained_share")
  }

  /** Per-dimension standardization APPLIED — the action the spectrum
    * diagnostics decide on (corr-spectrum share low => per-dim scaling
    * suffices; this is that scaling): z = (x - mean_d) / sd_d with the
    * mean rounded 6 and sd = sqrt of the round-6 variance, so the
    * transform itself is bit-identical cross-engine, then ONE
    * verification pass recomputes each scaled dimension's mean and
    * variance from the transformed data (var_after == 1 within round-6
    * is the proof the applied transform matches the diagnosed moments).
    * Scale shape: rides the staged Gram sums (no new first pass); the
    * verification is one shuffle-free 128-aggregate pass. */
  def qStandardize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (sums, _, n) = stagedSums(spark, dir)
    val (c, _) = covMatrix(spark, dir)
    val mean = Array.tabulate(D)(i => r6(sums(i) / n))
    val sd = Array.tabulate(D)(i => math.sqrt(c(i)(i)))
    (0 until D).foreach(i => require(sd(i) > 0.0, s"zero variance in dim $i"))
    val e = graft.Tables.t(spark, dir, "embeddings")
    val sExprs = (0 until D).map(d =>
      expr(s"(CAST(element_at(embedding, ${d + 1}) AS DOUBLE) - ${mean(d)}) / ${sd(d)}"))
    val aggs = (0 until D).flatMap(d => Seq(
      sum(sExprs(d)).as(s"s$d"), sum(sExprs(d) * sExprs(d)).as(s"ss$d")))
    val r = e.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = (0 until D).map { d =>
      val s = r.getDouble(2 * d); val ss = r.getDouble(2 * d + 1)
      (d, mean(d), c(d)(d),
        r6(s / n), r6(ss / n - (s / n) * (s / n)))
    }
    rows.toDF("dim", "mean", "var_before", "mean_after", "var_after")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_covariance" -> (qCovariance _),
    "embed_spectrum" -> (qSpectrum _),
    "embed_corr_spectrum" -> (qCorrSpectrum _),
    "embed_standardize" -> (qStandardize _))

  /** Shared covariance CTE: per-pair product sums via a dimension
    * range join (the oracle pays generic tuple machinery for the
    * same arithmetic the Spark kernel fuses). */
  private val covSql =
    s"""e AS (SELECT embedding FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM e),
       |prods AS (SELECT ii.i AS i, jj.j AS j,
       |    sum(CAST(embedding[ii.i + 1] AS DOUBLE)
       |      * CAST(embedding[jj.j + 1] AS DOUBLE)) AS sxy
       |  FROM e, range(0, $D) ii(i), range(0, $D) jj(j)
       |  WHERE jj.j >= ii.i GROUP BY ii.i, jj.j),
       |means AS (SELECT ii.i AS i, sum(CAST(embedding[ii.i + 1] AS DOUBLE)) AS sx
       |  FROM e, range(0, $D) ii(i) GROUP BY ii.i),
       |cov AS MATERIALIZED (SELECT prods.i, prods.j,
       |    round(sxy / n - (mi.sx / n) * (mj.sx / n), 6) AS cov
       |  FROM prods JOIN means mi ON mi.i = prods.i
       |             JOIN means mj ON mj.i = prods.j
       |             CROSS JOIN nn)""".stripMargin

  /** The power-iteration CTE chain over whatever `m` matrix the
    * caller's WITH-prefix defined; shared by both spectrum oracles.
    * Grid-input sums run DECIMAL-exact (see [[powerIterate]]'s doc):
    * CAST(x AS DECIMAL(18,6)) recovers the exact decimal of a round-6
    * double, products are exact scale-12 decimals, DECIMAL sums are
    * order-free, and round(DECIMAL, 6) ties away from zero exactly
    * like BigDecimal HALF_UP — so both engines make every rounding
    * decision on the same exact number. */
  private def decDot(a: String, b: String): String =
    s"sum(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6)))"
  private def iterChainSql: String = {
    val iter = (k: Int) =>
      s"""u$k AS MATERIALIZED (SELECT m.i,
         |    CAST(round(${decDot("m.cov", "v.v")}, 6) AS DOUBLE) AS u
         |  FROM m JOIN v${k - 1} v ON v.i = m.j GROUP BY m.i),
         |v$k AS MATERIALIZED (SELECT i,
         |    round(u / sqrt(CAST((SELECT ${decDot("u", "u")} FROM u$k) AS DOUBLE)), 6) AS v
         |  FROM u$k)""".stripMargin
    val iters = (1 to ITERS).map(iter).mkString(",\n")
    s"""v0 AS (SELECT ii.i AS i, CAST(0.125 AS DOUBLE) AS v FROM range(0, $D) ii(i)),
       |$iters,
       |fu AS (SELECT m.i, CAST(round(${decDot("m.cov", "v.v")}, 6) AS DOUBLE) AS u
       |  FROM m JOIN v$ITERS v ON v.i = m.j GROUP BY m.i),
       |lam AS (SELECT round(CAST(${decDot("fu.u", "v.v")} AS DOUBLE)
       |    / CAST(${decDot("v.v", "v.v")} AS DOUBLE), 6) AS top_eig
       |  FROM fu JOIN v$ITERS v USING (i))""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "embed_standardize" ->
      s"""WITH $covSql,
         |mn AS MATERIALIZED (SELECT means.i,
         |    round(sx / n, 6) AS mean,
         |    sqrt((SELECT cov FROM cov c WHERE c.i = means.i AND c.j = means.i)) AS sd
         |  FROM means CROSS JOIN nn),
         |sdim AS (SELECT mn.i AS d,
         |    (CAST(embedding[mn.i + 1] AS DOUBLE) - mn.mean) / mn.sd AS s
         |  FROM e CROSS JOIN mn),
         |ver AS (SELECT d,
         |    round(sum(s) / count(*), 6) AS mean_after,
         |    round(sum(s * s) / count(*)
         |      - (sum(s) / count(*)) * (sum(s) / count(*)), 6) AS var_after
         |  FROM sdim GROUP BY d)
         |SELECT CAST(ver.d AS INT) AS dim, mn.mean,
         |  (SELECT cov FROM cov c WHERE c.i = ver.d AND c.j = ver.d) AS var_before,
         |  mean_after, var_after
         |FROM ver JOIN mn ON mn.i = ver.d""".stripMargin,
    "embed_corr_spectrum" ->
      s"""WITH $covSql,
         |corr AS MATERIALIZED (SELECT a.i, a.j,
         |    round(a.cov / sqrt(di.cov * dj.cov), 6) AS cov
         |  FROM cov a JOIN cov di ON di.i = a.i AND di.j = a.i
         |             JOIN cov dj ON dj.i = a.j AND dj.j = a.j),
         |m AS MATERIALIZED (SELECT i, j, cov FROM corr
         |      UNION ALL SELECT j, i, cov FROM corr WHERE i != j),
         |$iterChainSql
         |SELECT n AS n_vecs, $D AS dim, top_eig,
         |  CAST(round(CAST(top_eig AS DECIMAL(18,6)) * 0.015625, 6) AS DOUBLE) AS explained_share
         |FROM nn CROSS JOIN lam""".stripMargin,
    "embed_covariance" ->
      s"""WITH $covSql
         |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, cov FROM cov""".stripMargin,
    "embed_spectrum" ->
      s"""WITH $covSql,
         |m AS MATERIALIZED (SELECT i, j, cov FROM cov
         |      UNION ALL SELECT j, i, cov FROM cov WHERE i != j),
         |$iterChainSql,
         |tr AS (SELECT CAST(sum(CAST(cov AS DECIMAL(18,6))) AS DOUBLE) AS trace
         |  FROM cov WHERE i = j)
         |SELECT n AS n_vecs, $D AS dim, trace, top_eig,
         |  round(top_eig / trace, 6) AS explained_share
         |FROM nn CROSS JOIN tr CROSS JOIN lam""".stripMargin)
}
