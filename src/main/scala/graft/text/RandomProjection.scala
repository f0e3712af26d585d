package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1
  * variant): reduce an embedding column from `dIn` to `dOut`
  * dimensions with y_j = ⟨x, R_j⟩ where R entries are ±1/√dOut — the
  * cheap pre-ANN dimensionality reduction (distance-preserving in
  * expectation: E‖y_a−y_b‖² = ‖x_a−x_b‖², relative distortion
  * concentrating as O(√(1/dOut))).
  *
  * The sign matrix is DERIVED, not drawn: sign(j,i) = parity of the
  * portable md5 hash of "rp_j_i" — the same hash scheme every other
  * stochastic engine step uses (MinHash permutations, Gumbel draws),
  * so the projection is cluster-deterministic and the whole operator
  * — matrix included — has an exact SQL oracle. The matrix rides the
  * plan as dOut LITERAL coefficient arrays feeding the codegen'd
  * `VecOps.dot`, so projection is map-only: no shuffle, no model
  * state, identical on batch and streaming frames.
  */
object RandomProjection {

  /** Scala twin of TextOps.md5Hash64/hashMod (first 15 hex digits of
    * the md5 of the UTF-8 bytes → int64 → mod prime) — bit-identical
    * to both the Spark `md5()` path and the DuckDB oracle. */
  def hashMod(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % TextOps.HashPrime
  }

  /** The dOut × dIn sign matrix, rows scaled by 1/√dOut. */
  def matrix(dIn: Int, dOut: Int): IndexedSeq[Array[Double]] = {
    val s = 1.0 / math.sqrt(dOut.toDouble)
    IndexedSeq.tabulate(dOut) { j =>
      Array.tabulate(dIn) { i =>
        if (hashMod(s"rp_${j}_$i") % 2 == 0) s else -s
      }
    }
  }

  /** Projected vector as dOut dot-product columns collected into one
    * array column (map-only; `vec` must be array<double> of length
    * dIn). */
  def project(vec: Column, dIn: Int, dOut: Int): Column = {
    val m = matrix(dIn, dOut)
    array(m.map(row => graft.functions.VecOps.dot(vec,
      array(row.toSeq.map(lit): _*))): _*)
  }
}
