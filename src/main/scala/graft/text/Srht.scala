package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic structured rotation (signed Hadamard transform):
  * R = (1/√d)·H·D with H the d×d Walsh–Hadamard matrix (d a power of
  * two; H[j][i] = (−1)^popcount(j AND i)) and D a ±1 diagonal derived
  * from the portable md5 parity (the RandomProjection sign scheme).
  *
  * R is EXACTLY orthogonal and its entries are ±1/√d — for d = 64
  * exactly ±0.125, a power-of-two scale, so each product x·r is a
  * bit-exact double. This is the OPQ lever in its structured form
  * (Ge et al. 2013 learn a free rotation to balance per-subspace
  * variance before product quantization; the randomized Hadamard
  * transform — Ailon & Chazelle 2009's FJLT core — achieves the same
  * energy-spreading deterministically and is the standard cheap
  * production substitute): rotating before the subspace split
  * decorrelates coordinate blocks so no PQ subspace is starved.
  * Cosine ranking is preserved (orthogonality), so exact re-rank can
  * stay in the ORIGINAL space.
  *
  * Cluster-deterministic like every stochastic engine step: the
  * rotation rides the plan as d literal coefficient arrays feeding
  * the codegen'd dot product — map-only, no shuffle, no model state —
  * and the oracle re-derives H from bit_count and D from the same md5
  * parity. Rotated coordinates round-6 at the seam (the
  * RandomProjection discipline) so downstream chains see identical
  * doubles on both engines. */
object Srht {

  /** ±1 diagonal entry for dim `i` (md5 parity of "opq_i"). */
  def diagSign(i: Int): Int =
    if (RandomProjection.hashMod(s"opq_$i") % 2 == 0) 1 else -1

  /** The d×d rotation matrix rows: R[j][i] = H[j][i]·D[i]/√d. */
  def matrix(d: Int): IndexedSeq[Array[Double]] = {
    require(d > 0 && (d & (d - 1)) == 0, s"SRHT needs a power of 2, got $d")
    val s = 1.0 / math.sqrt(d.toDouble)
    IndexedSeq.tabulate(d) { j =>
      Array.tabulate(d) { i =>
        val h = if (Integer.bitCount(j & i) % 2 == 0) 1 else -1
        h * diagSign(i) * s
      }
    }
  }

  /** Rotated vector (array<double> length d → length d), each
    * coordinate round-6 (the cross-engine seam). */
  def rotate(vec: Column, d: Int): Column = {
    val m = matrix(d)
    array(m.map(row => round(graft.functions.VecOps.dot(vec,
      array(row.toSeq.map(lit): _*)), 6)): _*)
  }

  /** DuckDB twin ending at `${pfx}rotex(vec_id, i, x)` — the rotated
    * exploded frame in the `ndex` shape, from an exploded source
    * `srcCte(vec_id, i, x)`. `hsqlMod` must be the engine's portable
    * md5 hash (TextOps.hsqlMod-rendered expression over the dim
    * index). */
  def oracleCtes(d: Int, srcCte: String, pfx: String,
      hsqlMod: String => String): String = {
    val s = 1.0 / math.sqrt(d.toDouble)
    s"""
      ${pfx}rsgn AS (
        SELECT i, CASE WHEN ${hsqlMod("'opq_' || i")} % 2 = 0
          THEN 1 ELSE -1 END AS sgn
        FROM range($d) t(i)),
      ${pfx}rmat AS (
        SELECT j, g.i,
               (CASE WHEN bit_count(CAST(j AS BIGINT) & g.i) % 2 = 0
                 THEN $s ELSE ${-s} END) * sgn AS r
        FROM range($d) t(j) CROSS JOIN ${pfx}rsgn g),
      ${pfx}rotex AS MATERIALIZED (
        SELECT e.vec_id, m.j AS i,
               round(CAST(sum(CAST(e.x * m.r AS DECIMAL(38,18)))
                 AS DOUBLE), 6) AS x
        FROM $srcCte e JOIN ${pfx}rmat m ON e.i = m.i
        GROUP BY 1, 2)"""
  }
}
