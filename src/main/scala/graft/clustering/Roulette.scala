package graft.clustering

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Distributed roulette-wheel gene pick for GKA mutation
  * (gka.java:206-236): find the row, in rid order, where the running
  * sum of weights crosses a target.
  *
  * The reference builds the whole cumulative wheel in one driver array
  * (gka.java:212-214). A single-partition window would be the Spark
  * equivalent — and a scale-killer. Instead: range-partition by rid,
  * per-partition presums (one tiny collect), broadcast the offsets,
  * then scan only the one partition containing the target.
  */
object Roulette {

  /** In-place variant: prefix order = (partition index, row order
    * within the cached partition) — deterministic for a cached input,
    * and NO shuffle/sort at all: two narrow passes. Weight-proportional
    * selection only needs *a* fixed order, not a sorted one. */
  def pickByPrefixInPlace(df: DataFrame, ridCol: String, wCol: String,
                          target: Double): Long = {
    val slim = df.select(col(ridCol).cast("long").as("rid"), col(wCol).cast("double").as("w"))
    val sums = slim.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0.0; var n = 0L
        it.foreach { r => s += r.getDouble(1); n += 1 }
        Iterator((i, s, n))
      }.collect().sortBy(_._1)
    val offsets = sums.scanLeft(0.0)(_ + _._2)
    val pi = sums.indices
      .find(i => sums(i)._3 > 0 && offsets(i + 1) > target)
      .getOrElse(sums.indices.reverse.find(sums(_)._3 > 0).getOrElse(0))
    val base = offsets(pi)
    slim.rdd.mapPartitionsWithIndex { case (i, it) =>
      if (i != pi) Iterator.empty
      else {
        var acc = base; var res = -1L; var last = -1L
        while (it.hasNext && res < 0) {
          val r = it.next(); acc += r.getDouble(1); last = r.getLong(0)
          if (acc > target) res = last
        }
        Iterator(if (res >= 0) res else last)
      }
    }.collect().headOption.getOrElse(-1L)
  }

  /** Batched variant: all of a generation's darts in TWO narrow passes
    * total (one multi-column presum, one scan of only the partitions
    * that host a dart) instead of two passes PER dart. Each dart j has
    * its own weight column wCols(j) and target targets(j); per-column
    * accumulation order is identical to pickByPrefixInPlace, so the
    * picked rids match the one-at-a-time results exactly. */
  def pickManyByPrefixInPlace(df: DataFrame, ridCol: String,
                              wCols: Seq[String],
                              targets: Seq[Double]): Seq[Long] = {
    require(wCols.length == targets.length)
    val m = wCols.length
    if (m == 0) return Seq.empty
    val slim = df.select(col(ridCol).cast("long").as("rid") +:
      wCols.zipWithIndex.map { case (c, j) => col(c).cast("double").as(s"w$j") }: _*)
    val sums = slim.rdd.mapPartitionsWithIndex { case (pi, it) =>
      val s = new Array[Double](m); var n = 0L
      it.foreach { r =>
        var j = 0; while (j < m) { s(j) += r.getDouble(1 + j); j += 1 }; n += 1
      }
      Iterator((pi, s, n))
    }.collect().sortBy(_._1)
    // per dart: partition containing its crossing + prefix base
    val placed = targets.indices.map { j =>
      val offsets = sums.scanLeft(0.0)(_ + _._2(j))
      val pi = sums.indices
        .find(i => sums(i)._3 > 0 && offsets(i + 1) > targets(j))
        .getOrElse(sums.indices.reverse.find(sums(_)._3 > 0).getOrElse(0))
      (j, pi, offsets(pi))
    }
    val byPart = placed.groupBy(_._2)
    val targetArr = targets.toArray
    val found = slim.rdd.mapPartitionsWithIndex { case (pi, it) =>
      byPart.get(pi) match {
        case None => Iterator.empty
        case Some(darts) =>
          val js = darts.map(_._1).toArray
          val acc = darts.map(_._3).toArray
          val res = Array.fill(js.length)(-1L)
          var remaining = js.length
          var last = -1L
          while (it.hasNext && remaining > 0) {
            val r = it.next(); last = r.getLong(0)
            var a = 0
            while (a < js.length) {
              if (res(a) < 0) {
                acc(a) += r.getDouble(1 + js(a))
                if (acc(a) > targetArr(js(a))) { res(a) = last; remaining -= 1 }
              }
              a += 1
            }
          }
          js.indices.iterator.map(a => (js(a), if (res(a) >= 0) res(a) else last))
      }
    }.collect().toMap
    targets.indices.map(j => found.getOrElse(j, -1L))
  }

  /** @return rid of the first row (by rid order) whose prefix sum of
    *         `wCol` exceeds target; the last rid if none does. */
  def pickByPrefix(df: DataFrame, ridCol: String, wCol: String,
                   target: Double, parts: Int = 32): Long = {
    val sorted = df.select(col(ridCol).cast("long").as("rid"), col(wCol).cast("double").as("w"))
      .repartitionByRange(parts, col("rid"))
      .sortWithinPartitions("rid")
      .cache()
    try {
      val sums = sorted.rdd
        .mapPartitionsWithIndex { case (i, it) =>
          var s = 0.0; var n = 0L
          it.foreach { r => s += r.getDouble(1); n += 1 }
          Iterator((i, s, n))
        }.collect().sortBy(_._1)
      val offsets = sums.scanLeft(0.0)(_ + _._2)
      val pi = sums.indices
        .find(i => sums(i)._3 > 0 && offsets(i + 1) > target)
        .getOrElse(sums.indices.reverse.find(sums(_)._3 > 0).getOrElse(0))
      val base = offsets(pi)
      sorted.rdd.mapPartitionsWithIndex { case (i, it) =>
        if (i != pi) Iterator.empty
        else {
          var acc = base; var res = -1L; var last = -1L
          while (it.hasNext && res < 0) {
            val r = it.next(); acc += r.getDouble(1); last = r.getLong(0)
            if (acc > target) res = last
          }
          Iterator(if (res >= 0) res else last)
        }
      }.collect().headOption.getOrElse(-1L)
    } finally sorted.unpersist()
  }
}
