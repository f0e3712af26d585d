package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** NN-Descent approximate kNN-GRAPH construction (Dong, Moses & Li,
  * WWW 2011, "Efficient K-Nearest Neighbor Graph Construction for
  * Generic Similarity Measures") — the graph-building member of the
  * ANN family: where the IVF/PQ ladder serves point queries against an
  * index, NN-Descent builds the ALL-nodes neighborhood graph that
  * semantic-dedup clustering and graph-ANN serving start from.
  *
  * Algorithm (the paper's local join, deterministic variant):
  *  - INIT: each node samples `k` pseudo-random neighbors via the
  *    engine's portable md5 hash — h(node:j) mod N, self-hits dropped
  *    (so a node may start with < k edges; the oracle mirrors the
  *    same rule).
  *  - ROUND: the GENERAL neighborhood B(p) = out-neighbors ∪
  *    reverse-neighbors of the current graph; every pair (u, v) of
  *    distinct members of some B(p) becomes a candidate ("a neighbor
  *    of my neighbor is my neighbor candidate" — the local join),
  *    plus the general edges themselves. Candidates are scored by
  *    cosine and each node keeps the top-k of old ∪ new by
  *    (cos_sim desc, nbr asc).
  *  - Fixed `rounds` rounds (the unrolled-oracle contract — no
  *    early-exit on the paper's update-counter).
  *
  * Determinism pins: cosine is ROUNDED to 6 decimals before any
  * ranking (the cosineTopK convention — the dot is the engine's
  * sequential VecDot fold vs the oracle's sum(), and round-6 absorbs
  * the reassociation noise), ties break on neighbor id, and the
  * md5-derived init is bit-portable.
  *
  * Scale shape: state is the N·k edge list; each round's candidate
  * set is bounded by N·(2k)² pivot-local pairs (bucket-blocked
  * fanout — NO all-pairs step anywhere), scored in one equi-join
  * wave against the vector table, then one top-k window keyed by
  * node. The paper's empirical convergence is O(log N)-ish rounds —
  * at 100 TB the round count is the knob, and each round is
  * two self-joins of a k-bounded edge list plus one scoring join.
  * The exact-recall metric is confined to the fixture (it IS the
  * brute-force baseline NN-Descent exists to avoid). */
object NnDescent {

  /** Deterministic pseudo-random init edges: for j ∈ 1..k,
    * nbr = md5(node:j) mod n, self-hits dropped, duplicates
    * collapsed. */
  def initEdges(emb: DataFrame, k: Int, n: Long): DataFrame =
    emb.select(col("vec_id").as("node"))
      .select(col("node"),
        explode(array((1 to k).map(lit(_)): _*)).as("j"))
      .withColumn("nbr",
        TextOps.md5Hash64(concat_ws(":", col("node"), col("j"))) % n)
      .filter(col("nbr") =!= col("node"))
      .select("node", "nbr").distinct()

  /** Score an edge list by 6-decimal-rounded cosine against the
    * (vec_id, v, nrm) vector frame. */
  private def score(edges: DataFrame, vecs: DataFrame): DataFrame =
    edges
      .join(vecs.select(col("vec_id").as("node"), col("v").as("va"),
        col("nrm").as("na")), Seq("node"))
      .join(vecs.select(col("vec_id").as("nbr"), col("v").as("vb"),
        col("nrm").as("nb")), Seq("nbr"))
      .select(col("node"), col("nbr"),
        round(Similarity.cosinePre(col("va"), col("vb"), col("na"),
          col("nb")), 6).as("cos_sim"))

  /** Top-k window over a ≤ N·(2k)²-row scored frame, coalesced to a
    * handful of partitions: every round runs several actions over
    * these SMALL frames (the corpus never enters the loop), so
    * fixture-scale task-launch overhead dominates at the default
    * shuffle width — the Bpe.learn coalesce(8) argument. At real
    * scale the window's own hash exchange re-widens the plan. */
  private def topK(edges: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("node")
      .orderBy(col("cos_sim").desc, col("nbr"))
    edges.distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .coalesce(8)
  }

  /** Build the approximate kNN graph: returns (node, nbr, cos_sim,
    * rnk) with rnk 1..≤k per node. One localCheckpoint per round
    * keeps the plan O(1) across rounds (the iterative-lineage
    * discipline). */
  def build(emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    val n = emb.count()
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .localCheckpoint()
    var knn = topK(score(initEdges(emb, k, n), vecs), k)
      .select("node", "nbr", "cos_sim").localCheckpoint()
    for (_ <- 1 to rounds) {
      val b = knn.select("node", "nbr")
        .unionByName(knn.select(col("nbr").as("node"),
          col("node").as("nbr")))
        .distinct()
      val pairs = b.as("x").join(b.as("y"),
          col("x.node") === col("y.node")
            && col("x.nbr") =!= col("y.nbr"))
        .select(col("x.nbr").as("node"), col("y.nbr").as("nbr"))
      val cands = pairs.unionByName(b).distinct()
      knn = topK(
        knn.unionByName(score(cands, vecs)), k)
        .select("node", "nbr", "cos_sim").localCheckpoint()
    }
    topK(knn, k)
  }

  /** Graph-ANN SERVING over a built graph — beam search (the search
    * layer graph indexes like HNSW descend from, run here on the flat
    * NN-Descent graph): md5-seeded entry nodes per query, then `hops`
    * expansion rounds — candidates = beam ∪ out-neighbors of the beam,
    * scored by cosine against the query, top-`beam` kept (monotone:
    * the beam is retained in its own candidate set, so quality never
    * regresses). Returns the final top-k per query plus `n_scored`,
    * the count of DISTINCT candidates ever scored — the served cost
    * (vs N for brute force: the whole point of graph serving).
    *
    * Scale shape: per hop each query scores ≤ beam·(k+1) candidates —
    * query-local joins against the k-bounded edge list, never a pass
    * over the corpus. */
  def serve(emb: DataFrame, graph: DataFrame, queryPred: Column,
      k: Int, beam: Int, hops: Int): DataFrame = {
    val n = emb.count()
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .localCheckpoint()
    val q = vecs.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm")).localCheckpoint()
    def scoreQ(cands: DataFrame): DataFrame = cands
      .join(broadcast(q), Seq("qid"))
      .join(vecs.select(col("vec_id").as("node"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("node"))
      .select(col("qid"), col("node"),
        round(Similarity.cosinePre(col("qv"), col("nv"), col("qnrm"),
          col("nn")), 6).as("cos_sim"))
    def topB(scored: DataFrame, b: Int): DataFrame = {
      val w = Window.partitionBy("qid")
        .orderBy(col("cos_sim").desc, col("node"))
      scored.distinct()
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= b)
        .select("qid", "node", "cos_sim")
    }
    val entries = q.select(col("qid"))
      .select(col("qid"),
        explode(array((1 to beam).map(lit(_)): _*)).as("j"))
      .withColumn("node",
        TextOps.md5Hash64(concat_ws(":", lit("sv"), col("qid"),
          col("j"))) % n)
      .filter(col("node") =!= col("qid"))
      .select("qid", "node").distinct()
    val edges = graph.select(col("node"), col("nbr"))
      .localCheckpoint()
    var state = topB(scoreQ(entries), beam).localCheckpoint()
    var scoredSet = entries.localCheckpoint()
    for (_ <- 1 to hops) {
      val cands = state.select("qid", "node")
        .join(edges, Seq("node"))
        .select(col("qid"), col("nbr").as("node"))
        .unionByName(state.select("qid", "node"))
        .filter(col("node") =!= col("qid"))
        .distinct()
      state = topB(scoreQ(cands), beam).localCheckpoint()
      scoredSet = scoredSet.unionByName(cands).distinct()
        .localCheckpoint()
    }
    val nScored = scoredSet.groupBy("qid")
      .agg(count(lit(1)).as("n_scored"))
    topB(state, k)
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cos_sim").desc, col("node"))))
      .join(nScored, Seq("qid"))
      .select(col("qid"), col("node").as("vid"), col("cos_sim"),
        col("rnk"), col("n_scored"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: exploded vectors + norms, md5 init, one unrolled
  // local-join round per rank.
  // ------------------------------------------------------------------

  private def hsql(e: String) = TextOps.hsqlRaw(e)

  /** One edge-set scoring block `$out(node, nbr, cos_sim)` over the
    * shared `ndex`/`ndnrm` CTEs. */
  private def scoreBlock(src: String, out: String): String = s"""
      ${out}_d AS (
        SELECT c.node, c.nbr, sum(ea.x * eb.x) AS dot
        FROM $src c JOIN ndex ea ON ea.vec_id = c.node
                    JOIN ndex eb ON eb.vec_id = c.nbr
                      AND eb.i = ea.i
        GROUP BY 1, 2),
      $out AS MATERIALIZED (
        SELECT d.node, d.nbr,
               round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM ${out}_d d JOIN ndnrm na ON na.vec_id = d.node
                        JOIN ndnrm nb ON nb.vec_id = d.nbr)"""

  /** The full chain over `embeddings`: shared `ndex`/`ndnrm`
    * (exploded dims + norms), `nde0` (md5 init edges), `ndk0` (init
    * top-k), per-round `ndb$r` (general neighbors), `ndc$r`
    * (local-join candidates), `nds$r` (scored), `ndk$r` (new top-k).
    * Ends at `ndk$rounds(node, nbr, cos_sim)`. */
  def oracleCtes(k: Int, rounds: Int): String = {
    val pieces = Seq.newBuilder[String]
    pieces += s"""
      ndex AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      ndnrm AS MATERIALIZED (
        SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ndex GROUP BY 1),
      ndnn AS (SELECT count(*) AS n FROM embeddings),
      nde0 AS (
        SELECT DISTINCT node, nbr FROM (
          SELECT e.vec_id AS node,
                 ${hsql("e.vec_id::VARCHAR || ':' || r.j::VARCHAR")}
                   % nn.n AS nbr
          FROM embeddings e, range(1, $k + 1) r(j), ndnn nn)
        WHERE nbr <> node)"""
    pieces += scoreBlock("nde0", "nds0")
    pieces += s"""
      ndk0 AS MATERIALIZED (
        SELECT node, nbr, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY node
            ORDER BY cos_sim DESC, nbr) AS rnk
          FROM nds0) WHERE rnk <= $k)"""
    for (r <- 1 to rounds) {
      val prev = s"ndk${r - 1}"
      pieces += s"""
      ndb$r AS MATERIALIZED (
        SELECT DISTINCT node, nbr FROM (
          SELECT node, nbr FROM $prev
          UNION ALL
          SELECT nbr AS node, node AS nbr FROM $prev))"""
      pieces += s"""
      ndc$r AS MATERIALIZED (
        SELECT DISTINCT node, nbr FROM (
          SELECT x.nbr AS node, y.nbr AS nbr
          FROM ndb$r x JOIN ndb$r y
            ON x.node = y.node AND x.nbr <> y.nbr
          UNION ALL
          SELECT node, nbr FROM ndb$r))"""
      pieces += scoreBlock(s"ndc$r", s"nds$r")
      pieces += s"""
      ndk$r AS MATERIALIZED (
        SELECT node, nbr, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY node
            ORDER BY cos_sim DESC, nbr) AS rnk
          FROM (SELECT DISTINCT node, nbr, cos_sim FROM (
            SELECT node, nbr, cos_sim FROM $prev
            UNION ALL
            SELECT node, nbr, cos_sim FROM nds$r)))
        WHERE rnk <= $k)"""
    }
    pieces.result().mkString(",")
  }

  /** Beam-search serving chain over the [[oracleCtes]] graph
    * (requires `ndex`/`ndnrm`/`ndk$rounds` in the same WITH): query
    * set `nsq`, md5 entry nodes `nse0`, per-hop candidate/score/beam
    * blocks, the distinct scored-candidate count `nsall`, ending at
    * `nsrv(qid, vid, cos_sim, rnk, n_scored)`. */
  def oracleServeCtes(rounds: Int, k: Int, beam: Int, hops: Int,
      queryFilter: String = "vec_id < 8"): String = {
    val pieces = Seq.newBuilder[String]
    def scoreBlockQ(src: String, out: String): String = s"""
      ${out}_d AS (
        SELECT c.qid, c.node, sum(qa.x * eb.x) AS dot
        FROM $src c JOIN ndex qa ON qa.vec_id = c.qid
                    JOIN ndex eb ON eb.vec_id = c.node
                      AND eb.i = qa.i
        GROUP BY 1, 2),
      $out AS MATERIALIZED (
        SELECT d.qid, d.node,
               round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM ${out}_d d JOIN ndnrm na ON na.vec_id = d.qid
                        JOIN ndnrm nb ON nb.vec_id = d.node)"""
    def topBBlock(src: String, out: String, b: Int): String = s"""
      $out AS MATERIALIZED (
        SELECT qid, node, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cos_sim DESC, node) AS rnk
          FROM (SELECT DISTINCT qid, node, cos_sim FROM $src))
        WHERE rnk <= $b)"""
    pieces += s"""
      nsq AS (SELECT vec_id AS qid FROM embeddings
              WHERE $queryFilter),
      nse0 AS (
        SELECT DISTINCT qid, node FROM (
          SELECT q.qid,
                 ${hsql("'sv:' || q.qid::VARCHAR || ':' || r.j::VARCHAR")}
                   % nn.n AS node
          FROM nsq q, range(1, $beam + 1) r(j), ndnn nn)
        WHERE node <> qid)"""
    pieces += scoreBlockQ("nse0", "nss0")
    pieces += topBBlock("nss0", "nsb0", beam)
    for (h <- 1 to hops) {
      pieces += s"""
      nsc$h AS MATERIALIZED (
        SELECT DISTINCT qid, node FROM (
          SELECT s.qid, g.nbr AS node
          FROM nsb${h - 1} s JOIN ndk$rounds g ON g.node = s.node
          UNION ALL
          SELECT qid, node FROM nsb${h - 1})
        WHERE node <> qid)"""
      pieces += scoreBlockQ(s"nsc$h", s"nss$h")
      pieces += topBBlock(s"nss$h", s"nsb$h", beam)
    }
    val scoredUnion = (s"SELECT qid, node FROM nse0" +:
      (1 to hops).map(h => s"SELECT qid, node FROM nsc$h"))
      .mkString("\n          UNION ALL ")
    pieces += s"""
      nsall AS (
        SELECT qid, CAST(count(*) AS BIGINT) AS n_scored FROM (
          SELECT DISTINCT qid, node FROM (
          $scoredUnion))
        GROUP BY 1)"""
    pieces += s"""
      nsrv AS MATERIALIZED (
        SELECT b.qid, b.node AS vid, b.cos_sim,
               CAST(b.rnk AS BIGINT) AS rnk, a.n_scored
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY cos_sim DESC, node) AS rnk
              FROM nsb$hops) b
        JOIN nsall a ON a.qid = b.qid
        WHERE b.rnk <= $k)"""
    pieces.result().mkString(",")
  }

  /** Brute-force all-nodes top-k truth CTE `ndt(node, nbr)` (the
    * recall denominator — fixture-scale only; requires `ndex`/`ndnrm`
    * from [[oracleCtes]] in the same WITH). */
  def oracleTruthCte(k: Int): String = s"""
      ndt_d AS (
        SELECT a.vec_id AS node, b.vec_id AS nbr, sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        GROUP BY 1, 2),
      ndt AS MATERIALIZED (
        SELECT node, nbr FROM (
          SELECT d.node, d.nbr,
                 row_number() OVER (PARTITION BY d.node
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.nbr) AS rnk
          FROM ndt_d d JOIN ndnrm na ON na.vec_id = d.node
                       JOIN ndnrm nb ON nb.vec_id = d.nbr)
        WHERE rnk <= $k)"""
}
