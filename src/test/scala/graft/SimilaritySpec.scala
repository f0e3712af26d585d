package graft

import org.apache.spark.sql.functions._
import graft.text.Similarity

/** IVF ANN contracts: probing every cell is exactly brute force; fewer
  * probes return a subset whose similarities never beat the exact
  * winners' ranks. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF with nProbe = nCells equals brute-force top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val exact = Similarity.cosineTopK(emb, pred, 5)
      .select("qid", "vid", "cos_sim", "rnk")
    val ivf = Similarity.ivfTopK(emb, pred, 5, nCells = 8, nProbe = 8)
      .select("qid", "vid", "cos_sim", "rnk")
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty,
      "full-probe IVF must equal brute force")
  }

  test("partial-probe IVF returns k ranked candidates bounded by exact") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val exactBest = Similarity.cosineTopK(emb, pred, 1)
      .select(col("qid"), col("cos_sim").as("best"))
    val ivf = Similarity.ivfTopK(emb, pred, 5, nCells = 16, nProbe = 4)
    val got = ivf.groupBy("qid").agg(count(lit(1)).as("n"),
      max("cos_sim").as("ivf_best"))
    assert(got.filter(col("n") > 5).count() == 0)
    // a candidate can never beat the exact global best
    val joined = got.join(exactBest, "qid")
    assert(joined.filter(col("ivf_best") > col("best")).count() == 0)
    assert(ivf.filter(col("qid") === col("vid")).count() == 0)
  }
}
