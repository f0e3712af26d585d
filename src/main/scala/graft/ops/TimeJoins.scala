package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins, in their scalable shapes.
  *
  * As-of join: Spark has no ASOF operator (DuckDB/kdb do). The naive
  * formulations — a non-equi join (nested-loop, quadratic per key) or a
  * per-key `collect_list` + UDF (heap-bound) — both die at scale. The
  * scalable shape is UNION + WINDOW: tag both sides, union them on the
  * series key, and carry the most recent right-side row forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding row frame. One
  * hash exchange + one in-partition sort, no join node in the plan at
  * all; cost is that of a single window pass over |left| + |right|.
  *
  * Range join: a raw `point BETWEEN lo AND hi` predicate plans as a
  * nested-loop join. Binning restores an equi-join: intervals explode to
  * the fixed-width bins they overlap, points map to exactly ONE bin, so
  * the bin equi-join (plus the exact BETWEEN post-filter) finds every
  * pair exactly once — no dedup needed. Bin width tunes the explode
  * factor vs selectivity tradeoff (pick ≈ the median interval length).
  */
object TimeJoins {

  /** Latest-at-or-before join. For each `left` row, attach the most
    * recent `right` row of the same key with `right.tsCol <= left` ts
    * (inclusive ties — a right row AT the left timestamp matches), or
    * nulls when none qualifies (left-outer semantics; `tolerance` µs, if
    * set, nulls out matches staler than the horizon).
    *
    * `rightCols` (the right ts column first) appear in the output under
    * their own names — rename on the right side before calling if they
    * collide with left columns. Right (keys, ts) pairs should be unique
    * (the standard as-of precondition); equal-ts right rows would
    * otherwise tie-break arbitrarily. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val rightCols = rightTs +: payload
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs).cast("long"))
    val r = right.select((keys.map(col) :+
        col(rightTs).cast("long").as("__ts")) ++
        rightCols.map(col): _*)
      .withColumn("__side", lit(0))
    // right rows sort BEFORE left rows at equal __ts → inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the whole right row as ONE nullable struct: null payload
    // FIELDS inside a right row must not make the carry skip to an
    // older row, so nullability lives on the struct, not the fields
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(
        when(col("__side") === 0, struct(rightCols.map(col): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val horizonOk = tolerance match {
      case Some(t) => col("__asof").isNotNull &&
        col("__ts") - col("__asof").getField(rightTs) <= t
      case None => col("__asof").isNotNull
    }
    val out = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(horizonOk, col("__asof").getField(c)))
    }
    out.drop("__side", "__ts", "__asof")
  }

  /** Interval containment join: every (point, interval) pair of the same
    * key with `loCol <= pointCol <= hiCol` (inclusive both ends), found
    * via the bin equi-join described above. Interval columns keep their
    * names; rename before calling on collision.
    *
    * Reversed intervals (hi < lo) are dropped up front — they can match
    * nothing, and a descending `sequence` would only burn rows. A single
    * interval wider than `maxBinsPerInterval` bins fails the job loudly
    * (sequence-length error) instead of silently exploding a skewed
    * task; widen the bin or raise the cap deliberately. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 100000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val pts = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binWidth))
    val loBin = floor(col(loCol).cast("long") / binWidth)
    val hiBin = floor(col(hiCol).cast("long") / binWidth)
    val ivs = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__nbins", hiBin - loBin + 1)
      .withColumn("__bin", explode(when(
        col("__nbins") <= maxBinsPerInterval, sequence(loBin, hiBin))
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval spans more than $maxBinsPerInterval "
            + "bins ("), col("__nbins"),
          lit(s"); widen binWidth=$binWidth or raise the cap"))))))
      .drop("__nbins")
    pts.join(ivs, keys :+ "__bin")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
