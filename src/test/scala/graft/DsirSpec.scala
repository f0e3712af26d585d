package graft

import org.apache.spark.sql.functions._
import graft.text.Dsir

/** DSIR importance resampling (text.Dsir) — the DuckDB bit-parity is
  * driver-checked (q_t_dsir_weights / q_t_dsir_sample); here the
  * ALGORITHM invariants are locked: the feature stream's gram
  * accounting, the log-ratio model's sign behavior (target-enriched
  * buckets score positive), the target slice scoring higher than the
  * rest ON AVERAGE (the selection signal exists), and determinism of
  * the Gumbel draw. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private val B = 64

  test("feature stream emits one bucket per unigram and per bigram") {
    val counted = Dsir.features(docs, B)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val expected = docs.select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("nt"))
      .as[(Long, Int)].collect()
    expected.foreach { case (id, nt) =>
      val want = nt + math.max(nt - 1, 0)
      assert(counted(id) == want,
        s"doc $id: $nt tokens should yield $want grams, got ${counted(id)}")
    }
    // bucket ids live in [0, B)
    val range = Dsir.features(docs, B)
      .agg(min("bk"), max("bk")).as[(Long, Long)].head()
    assert(range._1 >= 0 && range._2 < B)
  }

  test("log-ratio model: smoothed probabilities on each side sum to 1") {
    val feat = Dsir.features(docs, B)
    val ratio = Dsir.bucketLogRatio(feat, B, "en")
      .as[(Long, Double)].collect().toMap
    // reconstruct the two smoothed distributions independently and
    // check diff = log p_t - log q_r bucket by bucket
    val raw = feat.groupBy("bk").count().as[(Long, Long)].collect().toMap
    val tgt = feat.filter(col("lang") === "en").groupBy("bk").count()
      .as[(Long, Long)].collect().toMap
    val rn = raw.values.sum.toDouble
    val tn = tgt.values.sum.toDouble
    raw.keys.foreach { bk =>
      val p = (tgt.getOrElse(bk, 0L) + 1.0) / (tn + B)
      val q = (raw(bk) + 1.0) / (rn + B)
      assert(math.abs(ratio(bk) - (math.log(p) - math.log(q))) < 1e-12)
    }
    // smoothed masses over OBSERVED buckets stay below 1 (the add-1
    // floor reserves mass for unseen buckets) and close to it
    val pSum = raw.keys.map(bk => (tgt.getOrElse(bk, 0L) + 1.0) / (tn + B)).sum
    val qSum = raw.keys.map(bk => (raw(bk) + 1.0) / (rn + B)).sum
    assert(pSum <= 1.0 && qSum <= 1.0 && qSum > 0.9)
  }

  test("target-slice docs outscore the rest on average (the selection " +
      "signal) and weights are finite") {
    val w = Dsir.logWeights(docs, B, "en")
      .select(col("lang"), col("logw")).as[(String, Double)].collect()
    assert(w.forall { case (_, lw) => !lw.isNaN && !lw.isInfinite })
    val en = w.collect { case ("en", lw) => lw }
    val rest = w.collect { case (l, lw) if l != "en" => lw }
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.size > rest.sum / rest.size,
      s"mean target logw ${en.sum / en.size} should exceed " +
        s"mean non-target ${rest.sum / rest.size}")
  }

  test("Gumbel draw is deterministic, id-keyed, and in a sane range") {
    val g1 = docs.select(col("doc_id"), Dsir.gumbel(col("doc_id")).as("g"))
      .as[(Long, Double)].collect().toMap
    val g2 = docs.select(col("doc_id"), Dsir.gumbel(col("doc_id")).as("g"))
      .as[(Long, Double)].collect().toMap
    assert(g1 == g2)
    // Gumbel(0,1) support is all of R but md5 uniforms keep it off the
    // asymptotes; distinct ids draw distinct noise
    assert(g1.values.toSeq.distinct.size > g1.size / 2)
    assert(g1.values.forall(g => g > -10 && g < 30))
  }
}
