package graft

import org.apache.spark.sql.functions._
import graft.text.{NnDescent, Similarity}

/** NN-Descent semantics: the md5 init must be self-loop-free,
  * k-bounded and deterministic; the built graph must be a valid
  * top-k-per-node edge list (dense ranks, similarity-descending);
  * and the local-join rounds must strictly improve recall against
  * the brute-force truth on the fixture embeddings. */
class NnDescentSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") < 120)

  test("init edges: no self loops, at most k per node, deterministic") {
    val e1 = NnDescent.initEdges(emb, 5, 120).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val e2 = NnDescent.initEdges(emb, 5, 120).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(e1.sameElements(e2), "md5 init must be deterministic")
    assert(e1.forall { case (n, b) => n != b }, "no self loops")
    val perNode = e1.groupBy(_._1).view.mapValues(_.length)
    assert(perNode.values.forall(_ <= 5))
    assert(e1.forall { case (_, b) => b >= 0 && b < 120 },
      "neighbors must be in-range vec_ids")
  }

  test("built graph is a valid top-k edge list: dense ranks, " +
      "similarity-descending, k-bounded") {
    val g = NnDescent.build(emb, k = 5, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    val byNode = g.groupBy(_._1)
    assert(byNode.size == 120)
    byNode.foreach { case (n, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length),
        s"node $n ranks not dense")
      assert(sorted.length <= 5)
      // ranks follow (cos desc, nbr asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"node $n rank order violated")
        case _ =>
      }
    }
  }

  test("local-join rounds strictly improve recall over the init graph") {
    val truth = Similarity.cosineTopK(emb, lit(true), 5)
      .select(col("qid"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rounds: Int): Double = {
      val g = NnDescent.build(emb, k = 5, rounds = rounds)
        .select("node", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      g.count(truth.contains).toDouble / truth.size
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 > r0,
      s"rounds must improve recall: init $r0 vs 2-round $r2")
  }

  test("beam serving: monotone in hops, scored-candidate count " +
      "bounded by beam·(k+1)·hops + beam") {
    val graph = NnDescent.build(emb, k = 5, rounds = 2)
    val truth = Similarity.cosineTopK(emb, col("vec_id") < 8, 3)
      .select(col("qid"), col("vid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def served(hops: Int) = NnDescent
      .serve(emb, graph, col("vec_id") < 8, k = 3, beam = 6,
        hops = hops)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val h0 = served(0)
    val h3 = served(3)
    def rec(rows: Array[(Long, Long, Long)]) =
      rows.count { case (q, v, _) => truth((q, v)) }.toDouble /
        truth.size
    assert(rec(h3) >= rec(h0),
      s"hops must not hurt recall: ${rec(h0)} vs ${rec(h3)}")
    // the served cost bound: entries (≤ beam) + hops rounds of
    // ≤ beam·(k+1) candidates each
    val bound = 6 + 3 * 6 * (5 + 1)
    assert(h3.forall(_._3 <= bound),
      s"n_scored exceeded the beam·(k+1)·hops bound $bound")
    // serving is deterministic
    assert(served(3).sortBy(r => (r._1, r._2))
      .sameElements(h3.sortBy(r => (r._1, r._2))))
  }
}
