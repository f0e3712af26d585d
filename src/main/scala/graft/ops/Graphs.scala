package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics over edge frames — the
  * companion to `text.Dedup.connectedComponents` (min-label +
  * pointer-jumping) for WEIGHTED influence propagation.
  *
  * PageRank here follows the repo's deterministic-iteration
  * discipline (LloydKmeans, the HMM decode): every iteration is pure
  * fixed-order IEEE arithmetic with exact-decimal contribution sums,
  * so a fixed-iteration run is bit-reproducible by an unrolled SQL
  * oracle — per-edge contribution pr·(w/outw) (two IEEE ops, weights
  * exact integer counts), per-node accumulation through
  * DECIMAL(38,18) (aggregation-order-free), and the damping constants
  * written as the SAME parsed literals on both sides (never computed
  * as 1−d, which lands on a different double).
  *
  * Scale shape: the textbook distributed PageRank — ONE groupBy(dst)
  * shuffle per iteration; the out-weight table joins in (broadcast for
  * dimension-sized graphs, hash otherwise) and nothing driver-side
  * ever holds more than the scalar node count. */
object Graphs {

  /** `iters` damped PageRank iterations over `edges(src, dst, w)`
    * (integer weights, multi-edges pre-aggregated). Nodes = src ∪ dst;
    * uniform init 1/N; dangling mass is dropped (documented contract —
    * ranks then sum to < 1, as in the sparse formulation most engines
    * use). Returns `(v, pr)`.
    *
    * `checkpointEvery` > 0 truncates the rank frame's lineage every
    * that-many iterations (eager localCheckpoint) — without it a
    * deep run re-analyzes an O(iters)-tall plan per iteration and the
    * driver, not the cluster, becomes the bottleneck (the same
    * per-round truncation `Dedup.connectedComponents` does).
    * Checkpointing only cuts lineage; the numbers are bit-identical
    * either way (spec-locked). */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, base: Double = 0.15,
      checkpointEvery: Int = 0): DataFrame = {
    // base must be the literal counterpart of 1 − damping (same parsed
    // literals on both engine and oracle side — never the COMPUTED
    // difference, which lands on a different double). The tolerance
    // absorbs exactly that literal-vs-computed ulp gap while refusing a
    // caller who overrides damping but forgets base — that iteration is
    // no longer stochastic and its ranks stop approximating PageRank.
    require(math.abs(base - (1.0 - damping)) < 1e-9,
      s"base ($base) must be the literal counterpart of 1 - damping " +
        s"(${1.0 - damping}); override both together")
    // hoist the loop-INVARIANT frames out of the iteration: the node
    // set (union + distinct — a shuffle), and the out-weight-
    // normalized edge fractions (edges ⋈ outw — another shuffle) were
    // re-derived EVERY round; materialized once, each round is one
    // fraction⋈rank join + one groupBy(dst) + the node left-join.
    // frac = w/ow is the same IEEE division the loop computed per
    // round, and pr·frac the same product — bit-identical ranks.
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count()
    val fracs = edges
      .join(edges.groupBy("src")
        .agg(sum(col("w")).cast("long").as("ow")), Seq("src"))
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("ow")).as("frac"))
      .localCheckpoint()
    var pr = nodes.select(col("v"), (lit(1.0) / n).as("pr"))
    for (i <- 1 to iters) {
      val contrib = fracs
        .join(pr.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"),
          (col("pr") * col("frac"))
            .cast("decimal(38,18)").as("c"))
        .groupBy("v").agg(sum(col("c")).cast("double").as("insum"))
      pr = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"), (lit(base) / n + lit(damping)
          * coalesce(col("insum"), lit(0.0))).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr
  }

  /** Unrolled DuckDB oracle for [[pageRank]]: expects CTEs
    * `gedges(src, dst, w)` already defined; emits `gnodes`/`gn`/
    * `goutw` and `gpr_0 … gpr_$iters(v, pr)` with identical
    * arithmetic. */
  def pageRankOracleSql(iters: Int, damping: Double = 0.85,
      base: Double = 0.15): String = {
    val init = s"""
      gnodes AS (
        SELECT src AS v FROM gedges UNION SELECT dst FROM gedges),
      gn AS (SELECT count(*) AS n FROM gnodes),
      goutw AS (
        SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM gedges
        GROUP BY 1),
      gpr_0 AS (
        SELECT v, CAST(1 AS DOUBLE) / (SELECT n FROM gn) AS pr
        FROM gnodes)"""
    val steps = (1 to iters).map { i =>
      val p = i - 1
      s"""
      gc_$i AS (
        SELECT e.dst AS v,
               CAST(sum(CAST(p.pr * (CAST(e.w AS DOUBLE) / o.ow)
                 AS DECIMAL(38,18))) AS DOUBLE) AS insum
        FROM gedges e JOIN goutw o ON e.src = o.src
                      JOIN gpr_$p p ON e.src = p.v
        GROUP BY 1),
      gpr_$i AS (
        SELECT n.v, CAST($base AS DOUBLE) / (SELECT n FROM gn)
               + CAST($damping AS DOUBLE) * coalesce(c.insum, 0.0) AS pr
        FROM gnodes n LEFT JOIN gc_$i c ON n.v = c.v)"""
    }.mkString(",")
    init + "," + steps
  }
}
