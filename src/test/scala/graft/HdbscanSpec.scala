package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Hdbscan

/** Semantic locks for the driver-side HDBSCAN fit (M4): density-cluster
  * recovery with noise, min_cluster_size floor, and the
  * allow_single_cluster=False root rule. Pure algorithm — no Spark
  * session needed. */
class HdbscanSpec extends AnyFunSuite {

  private def blob(rnd: scala.util.Random, cx: Double, cy: Double,
      m: Int, sd: Double = 0.5): Array[Array[Double]] =
    Array.fill(m)(Array(cx + rnd.nextGaussian() * sd,
      cy + rnd.nextGaussian() * sd))

  test("recovers three separated blobs; uniform noise labels -1") {
    val rnd = new scala.util.Random(3)
    val pts = blob(rnd, 0, 0, 60) ++ blob(rnd, 10, 10, 60) ++
      blob(rnd, -10, 10, 60) ++
      Array.fill(30)(Array(rnd.nextDouble() * 40 - 20,
        rnd.nextDouble() * 40 - 20))
    val labels = Hdbscan.fitPredict(pts, minClusterSize = 5)
    val blobLabels = (0 until 3).map(b => labels.slice(b * 60, (b + 1) * 60))
    val doms = blobLabels.map { ls =>
      ls.filter(_ >= 0).groupBy(identity).maxBy(_._2.length)._1
    }
    assert(doms.distinct.size == 3, s"blob labels collapsed: $doms")
    blobLabels.zip(doms).foreach { case (ls, dom) =>
      assert(ls.count(_ == dom) >= 48,
        s"blob purity too low: ${ls.count(_ == dom)}/60")
    }
    // uniform points with a large enough core distance fall out of the
    // (unselectable) root → -1; those landing near a blob legitimately
    // attach below its birth level as border members — real HDBSCAN
    // absorbs them the same way, so require a majority, not all, noise
    val noise = labels.slice(180, 210)
    assert(noise.count(_ == -1) >= 15,
      s"uniform noise mostly unlabeled expected: ${noise.toSeq}")
  }

  test("a group smaller than min_cluster_size stays noise") {
    val rnd = new scala.util.Random(7)
    // two real blobs + a far triple: 3 < min_cluster_size=5 can never
    // form a condensed cluster, so the triple must label -1
    val pts = blob(rnd, 0, 0, 30) ++ blob(rnd, 12, 0, 30) ++
      blob(rnd, -30, -30, 3, sd = 0.05)
    val labels = Hdbscan.fitPredict(pts, minClusterSize = 5)
    assert(labels.slice(60, 63).forall(_ == -1),
      s"undersized group was labeled: ${labels.slice(60, 63).toSeq}")
    assert(labels.slice(0, 30).exists(_ >= 0)
      && labels.slice(30, 60).exists(_ >= 0))
    assert(labels.slice(0, 30).filter(_ >= 0).distinct.toSet
      != labels.slice(30, 60).filter(_ >= 0).distinct.toSet)
  }

  test("single diffuse blob yields all noise (root not selectable)") {
    val rnd = new scala.util.Random(11)
    val pts = blob(rnd, 0, 0, 50)
    val labels = Hdbscan.fitPredict(pts, minClusterSize = 25)
    // allow_single_cluster=False: with no real split at min_cluster_size
    // the only candidate is the root, which is never selected
    assert(labels.forall(_ == -1), s"root selected: ${labels.toSeq}")
  }
}
