package graft

import org.apache.spark.sql.functions._
import graft.text.WordPiece

/** WordPiece tokenizer semantics: greedy encode must take the LONGEST
  * vocabulary piece at each position with `##` continuation prefixes,
  * a word with any unmatched position must become `[UNK]` whole (the
  * all-or-nothing rule), learning must rank merges by the likelihood
  * score cnt(ab)/(cnt(a)·cnt(b)) — not raw pair frequency — under the
  * merged-content-length cap, the fit must refuse a corpus beyond the
  * greedy unroll bound, and the rowwise serving encode must be
  * identical on a batch frame and a Structured Streaming micro-batch. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def greedy(word: String, vocab: Seq[String], L: Int = 8)
      : (Seq[String], Boolean) = {
    val r = Seq(Tuple1(word)).toDF("w")
      .select(WordPiece.greedyStruct(col("w"), vocab, L).as("g"))
      .select(col("g.segs"), col("g.is_unk")).head()
    (r.getSeq[String](0), r.getBoolean(1))
  }

  test("greedy encode: longest match first, ## continuation prefixes") {
    val v = Seq("a", "b", "c", "##a", "##b", "##c", "ab", "##bc")
    // pos 1: "ab" (len 2) beats "a"; pos 3: interior "##c"
    assert(greedy("abc", v) == (Seq("ab", "##c"), false))
    // pos 1: "a" only (no "ab.." longer match from "ac"); pos 2: "##c"
    assert(greedy("ac", v) == (Seq("a", "##c"), false))
    assert(greedy("abcc", v) == (Seq("ab", "##c", "##c"), false))
    // interior longest: "a" then "##bc" (len 2) beats "##b"
    assert(greedy("abc", Seq("a", "##bc", "##b", "##c")) ==
      (Seq("a", "##bc"), false))
  }

  test("spec lock: all-or-nothing [UNK] — any unmatched position " +
      "marks the WHOLE word, matched prefixes are discarded") {
    val v = Seq("a", "##b", "ab")
    // 'z' is never in vocab: even though "ab" matched first
    assert(greedy("abz", v) == (Seq("[UNK]"), true))
    assert(greedy("zab", v) == (Seq("[UNK]"), true))
    // fully coverable word stays segmented
    assert(greedy("abb", v) == (Seq("ab", "##b"), false))
  }

  test("learning ranks by likelihood score, not pair frequency — " +
      "the WordPiece-vs-BPE distinguishing case") {
    // (a,##b) occurs 10×, but 'a' is very common (30 weighted occs):
    // score = 10/(30·10) ≈ 0.033. (c,##d) occurs only 2× with rare
    // symbols: score = 2/(2·2) = 0.5 → WordPiece merges (c,##d)
    // first; a frequency-ranked BPE would pick (a,##b).
    val docs = Seq(
      (1L, (Seq.fill(10)("ab") ++ Seq.fill(20)("a") ++
        Seq.fill(20)("b") ++ Seq.fill(2)("cd")).mkString(" ")))
      .toDF("doc_id", "text")
    val fit = WordPiece.learn(docs, nMerges = 1, maxPieceLen = 8,
      maxWordLen = 12)
    val m = fit.merges.head
    assert((m.left, m.right, m.merged) == ("c", "##d", "cd"),
      s"likelihood ranking must pick the rare-symbol pair: $m")
    assert(m.cnt == 2L && m.ca == 2L && m.cb == 2L)
    assert(math.abs(m.score - 0.5) < 1e-12)
    // the vocabulary keeps the full alphabet plus the merge
    assert(fit.vocab.contains("cd") && fit.vocab.contains("a")
      && fit.vocab.contains("##b"))
  }

  test("merged-content-length cap excludes candidates and the fit " +
      "throws when admissible pairs are exhausted") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    // round 1 under cap 2: (##b,##c) ties (a,##b) at score 1 and
    // wins the (a, b) tie-break ('#' < 'a'); round 2's only pair
    // (a, ##bc) would merge to content 3 > cap → exhausted
    val fit1 = WordPiece.learn(docs, nMerges = 1, maxPieceLen = 2,
      maxWordLen = 12)
    assert(fit1.merges.head.merged == "##bc")
    val e = intercept[IllegalArgumentException] {
      WordPiece.learn(docs, nMerges = 2, maxPieceLen = 2,
        maxWordLen = 12)
    }
    assert(e.getMessage.contains("exhausted"))
  }

  test("left-to-right non-overlapping merge apply and greedy serving " +
      "agree on repeated-symbol words") {
    // "aaaa" → syms [a,##a,##a,##a]; symbol counts a:1, ##a:3; pair
    // scores (a,##a)=1/3 > (##a,##a)=2/9 → merge 1 is (a,##a)→"aa"
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val fit = WordPiece.learn(docs, nMerges = 1, maxPieceLen = 8,
      maxWordLen = 12)
    assert(fit.merges.head.merged == "aa")
    // greedy under {a,##a,aa}: "aa" at pos 1, then interior singles
    val segs = fit.wordSegs.filter(col("word") === "aaaa")
      .head().getSeq[String](2)
    assert(segs == Seq("aa", "##a", "##a"))
  }

  test("fit refuses a corpus whose longest word exceeds max_word_len " +
      "(the greedy-unroll oracle-shape contract)") {
    val docs = Seq((1L, "abcdefghijklmn ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      WordPiece.learn(docs, nMerges = 1, maxPieceLen = 8,
        maxWordLen = 8)
    }
  }

  test("encodeRowwise: stream ≡ batch, and the rowwise counts equal " +
      "the word-table join path") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 150).select("doc_id", "text")
    val fit = WordPiece.learn(docs, nMerges = 8, maxPieceLen = 8,
      maxWordLen = 12)
    val batch = WordPiece.encodeRowwise(docs, fit.vocab, 8)
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        col("n_unk_words"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // join path (the registered q_t_wordpiece_encode shape) agrees
    val joined = docs.select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(fit.wordSegs.select(col("word"),
        size(col("segs")).as("np"),
        col("is_unk").cast("long").as("u")), Seq("word"))
      .groupBy("doc_id").agg(count(lit(1)).as("nw"),
        sum("np").cast("long").as("np"), sum("u").cast("long").as("u"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(batch == joined, "rowwise greedy must equal the join path")
    // no [UNK] on the training corpus itself (alphabet coverage)
    assert(batch.values.forall(_._3 == 0L))
    val rows = docs.as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val sd = java.nio.file.Files.createTempDirectory("graft-wp")
    b1.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(sd.resolve("p1").toString)
    b2.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(sd.resolve("p2").toString)
    val src = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$sd/p*")
    val q = WordPiece.encodeRowwise(src, fit.vocab, 8)
      .select("doc_id", "n_words", "n_pieces", "n_unk_words")
      .writeStream.outputMode("append").format("memory")
      .queryName("wp_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("wp_stream_test")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == batch, "stream must equal batch exactly")
  }
}
