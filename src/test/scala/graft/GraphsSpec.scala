package graft

import org.apache.spark.sql.functions._
import graft.ops.Graphs

/** PageRank contracts (q_pagerank_trade): rank-mass conservation under
  * the dropped-dangling-mass formulation, convergence toward the known
  * stationary distribution on a closed 2-cycle, and bit-parity of
  * deep runs with and without lineage truncation. */
class GraphsSpec extends SparkSpec {

  private def edges(rows: (Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("ranks stay positive and bounded; no dangling → mass ≈ 1") {
    // closed 3-cycle: every node has out-edges, so no mass is dropped
    val pr = Graphs.pageRank(
      edges((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)), iters = 8)
      .collect().map(_.getDouble(1))
    assert(pr.forall(p => p > 0 && p < 1))
    assert(math.abs(pr.sum - 1.0) < 1e-9, s"mass ${pr.sum}")
  }

  test("a feeder node ranks lowest; the cycle absorbs its mass") {
    // 0 ⇄ 1 cycle plus a feeder 2 → 1: node 2 keeps only the base
    // mass, the cycle nodes split the rest (their individual ordering
    // oscillates with iteration parity — a 2-cycle property, so only
    // the feeder relation is asserted)
    val pr = Graphs.pageRank(
      edges((0L, 1L, 1L), (1L, 0L, 1L), (2L, 1L, 1L)), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(0L) > 5 * pr(2L) && pr(1L) > 5 * pr(2L), s"ranks $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(math.abs(pr(2L) - 0.05) < 1e-12) // exactly the base share
  }

  test("deep run with lineage truncation is bit-identical") {
    val e = edges((0L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 3L),
      (0L, 2L, 1L), (2L, 1L, 1L))
    val plain = Graphs.pageRank(e, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val trunc = Graphs.pageRank(e, iters = 10, checkpointEvery = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == trunc,
      "checkpointing changed PageRank values — must only cut lineage")
  }
}
