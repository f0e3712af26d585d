package graft

import org.apache.spark.sql.functions._
import graft.text.Cdc

/** Content-defined chunking (text.Cdc) — the DuckDB bit-parity is
  * driver-checked (q_d_cdc_chunks / q_d_cdc_dup); here the ALGORITHM
  * invariants are locked: chunks tile each document exactly, and the
  * family's reason to exist — boundary LOCALITY: prepending bytes to a
  * document shifts every offset, yet all chunks after the first
  * content boundary survive with identical fingerprints (a fixed-width
  * blocker loses every block after an insertion). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val D = 32

  /** Deterministic pseudo-random ASCII text (seeded LCG — no
    * Math.random in tests either). */
  private def randText(n: Int, seed: Long): String = {
    val sb = new StringBuilder
    var s = seed
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    (1 to n).foreach { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L)
      sb += alpha(((s >>> 33) % alpha.length).toInt)
    }
    sb.toString
  }

  private def chunksOf(rows: Seq[(Long, String)]) =
    Cdc.chunks(rows.toDF("doc_id", "text"), K, D)
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"),
        col("chunk_len"), col("chunk_fp"))
      .as[(Long, Int, Int, Int, Long)].collect()

  test("chunks tile the document: contiguous, gap-free, full-length") {
    val text = randText(500, seed = 7)
    val ch = chunksOf(Seq((1L, text))).sortBy(_._2)
    assert(ch.map(_._2).toSeq == (1 to ch.length))
    assert(ch.head._3 == 0)
    ch.sliding(2).foreach {
      case Array(a, b) => assert(a._3 + a._4 == b._3, "gap between chunks")
      case _ =>
    }
    assert(ch.map(_._4).sum == text.length)
    assert(ch.forall(_._4 > 0))
  }

  test("boundary locality: a prefix insertion preserves every chunk " +
      "after the first content cut (fingerprint identity)") {
    val base = randText(600, seed = 42)
    val shifted = randText(37, seed = 9) + base
    val ch = chunksOf(Seq((1L, base), (2L, shifted)))
    val baseCh = ch.filter(_._1 == 1L).sortBy(_._2)
    val shiftFps = ch.filter(_._1 == 2L).map(_._5).toSet
    // enough boundaries to make the test meaningful
    assert(baseCh.length >= 5, s"only ${baseCh.length} chunks")
    // every base chunk except the first (its left bound is the doc
    // start, which the insertion destroys) must reappear verbatim in
    // the shifted doc despite every offset moving by 37
    baseCh.drop(1).foreach { c =>
      assert(shiftFps.contains(c._5),
        s"chunk at ${c._3} len ${c._4} lost after prefix insertion")
    }
  }

  test("identical documents share every chunk fingerprint and " +
      "dedupStats charges the later doc for all of them") {
    val text = randText(400, seed = 3)
    val df = Seq((10L, text), (20L, text)).toDF("doc_id", "text")
    val stats = Cdc.dedupStats(Cdc.chunks(df, K, D))
      .select(col("doc_id"), col("n_bytes"), col("dup_bytes"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(stats(0)._3 == 0, "keeper doc charged dup bytes")
    assert(stats(1)._3 == stats(1)._2, "exact dup not fully charged")
  }
}
