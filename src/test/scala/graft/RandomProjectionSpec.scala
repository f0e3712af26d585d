package graft

import org.apache.spark.sql.functions._
import graft.text.RandomProjection

/** J-L random projection (text.RandomProjection) — the DuckDB
  * bit-parity is driver-checked (q_e_rp_norms / q_e_rp_distortion);
  * here the ALGORITHM invariants: matrix determinism and scaling,
  * hash parity with the Spark-side md5 scheme, linearity of the
  * projection, and norm preservation in expectation. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val (dIn, dOut) = (64, 16)

  test("sign matrix is deterministic, ±1/√d-valued, and its parity " +
      "matches the engine md5 scheme") {
    val m1 = RandomProjection.matrix(dIn, dOut)
    val m2 = RandomProjection.matrix(dIn, dOut)
    assert(m1.map(_.toSeq) == m2.map(_.toSeq))
    val s = 1.0 / math.sqrt(dOut.toDouble)
    assert(m1.flatten.forall(v => v == s || v == -s))
    // parity twin: the Spark md5 path computes the identical hash
    val got = spark.range(1).select(
      graft.text.TextOps.hashMod(lit("rp_3_7"))).as[Long].head()
    assert(got == RandomProjection.hashMod("rp_3_7"))
    // signs are roughly balanced (md5 uniformity): no row all-one-sign
    m1.foreach { row =>
      val pos = row.count(_ > 0)
      assert(pos > dIn / 4 && pos < 3 * dIn / 4, s"skewed row: $pos")
    }
  }

  test("projection is linear and preserves norms in expectation") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("v"))
    val proj = RandomProjection.project(col("v"), dIn, dOut)
    val rows = emb.select(col("vec_id"), col("v"), proj.as("y"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    assert(rows.forall(_._3.length == dOut))
    // linearity: y(2x) == 2*y(x) up to fp
    val doubled = emb.select(col("vec_id"),
        RandomProjection.project(transform(col("v"), x => x * 2),
          dIn, dOut).as("y2"))
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, _, y) =>
      y.zip(doubled(id)).foreach { case (a, b) =>
        assert(math.abs(2 * a - b) < 1e-9) }
    }
    // norm preservation in expectation over the corpus
    val ratios = rows.map { case (_, v, y) =>
      y.map(t => t * t).sum / v.map(t => t * t).sum
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.9 && mean < 1.1, s"mean norm ratio $mean")
  }
}
