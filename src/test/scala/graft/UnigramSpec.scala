package graft

import org.apache.spark.sql.functions._
import graft.text.Unigram

/** Unigram-LM tokenizer semantics: the Viterbi DP must pick the
  * max-probability segmentation with the documented (dp, len)
  * tie-break, unseen characters must fall back to single-char floor
  * pieces (serving never throws), the prune rule must keep every
  * single char and cap multi-char pieces by usage rank, and the
  * rowwise serving encode must be identical on a batch frame and a
  * Structured Streaming micro-batch. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def segs(word: String, vocab: Map[String, Double],
      L: Int = 4, unk: Double = -20.0): Seq[String] =
    Seq(Tuple1(word)).toDF("w")
      .select(Unigram.segsCol(col("w"), vocab, L, unk).as("s"))
      .head().getSeq[String](0)

  test("Viterbi picks the max-probability segmentation") {
    // [ab] at -2 beats [a][b] at -1 + -2 = -3
    val v1 = Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.0)
    assert(segs("ab", v1) == Seq("ab"))
    // but cheap singles beat an expensive pair: [a][b] = -2.2 > -3
    val v2 = Map("a" -> -1.0, "b" -> -1.2, "ab" -> -3.0)
    assert(segs("ab", v2) == Seq("a", "b"))
    // mixed: "aab" best is [a][ab] (-1 + -2 = -3) over [a][a][b] (-4)
    assert(segs("aab", v1) == Seq("a", "ab"))
    // piece length > 2 participates up to maxPieceLen
    val v3 = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0,
      "abc" -> -1.5)
    assert(segs("abc", v3) == Seq("abc"))
  }

  test("spec lock: equal-dp ties break to the LONGER piece") {
    // [ab] = -2 exactly equals [a][b] = -1 + -1 = -2 → plen wins
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(segs("ab", v) == Seq("ab"),
      "tie at equal dp must prefer the longer piece")
    // chain of ties: "abab" — [ab][ab] (-4) vs [a][b][ab] (-4) vs
    // four singles (-4): every prefix tie resolves long-first
    assert(segs("abab", v) == Seq("ab", "ab"))
  }

  test("spec lock: unseen characters fall back to single-char floor " +
      "pieces — serving never throws, known substrings still match") {
    val v = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.5)
    // 'z' and 'q' are not in the vocabulary
    assert(segs("zab", v) == Seq("z", "ab"))
    assert(segs("zq", v) == Seq("z", "q"))
    // the floor is a real log-prob: a known single is preferred over
    // riding unk (unk = -20 < any vocab lp), but unk still completes
    // an otherwise unreachable position
    assert(segs("azb", v) == Seq("a", "z", "b"))
  }

  test("spec lock: prune keeps every single char, caps multi-char " +
      "pieces at prune_keep by (usage desc, piece asc)") {
    val docs = Seq(
      (1L, "abab abab cdcd dede fgfg abab cdcd"),
      (2L, "abab cdcd abab hij")).toDF("doc_id", "text")
    val fit = Unigram.learn(docs, seedK = 10, maxPieceLen = 4,
      emRounds = 2, pruneKeep = 2, unkLp = -20.0, maxWordLen = 12)
    val (chars, multi) = fit.vocab.keys.toSeq.partition(_.length == 1)
    // every corpus character survives the prune
    val alphabet = "abcdefghij".map(_.toString).toSet
    assert(chars.toSet == alphabet,
      s"single chars must all be kept: ${chars.sorted}")
    assert(multi.size <= 2, s"multi-char cap exceeded: $multi")
    // kept multis are the top-usage ones among the final EM round's
    // usage table — nothing with zero usage outranks a used piece
    val usages = multi.map(fit.usage)
    assert(usages.forall(_ >= 0) && fit.usage.keySet == fit.vocab.keySet)
    // the fit refuses a corpus whose longest word exceeds the DP
    // unroll bound (the oracle-shape contract)
    intercept[IllegalArgumentException] {
      Unigram.learn(docs, 10, 4, 1, 2, -20.0, maxWordLen = 3)
    }
  }

  test("encodeRowwise: stream ≡ batch on the same micro-batched " +
      "corpus, and the rowwise counts equal the word-table join path") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 150).select("doc_id", "text")
    val fit = Unigram.learn(docs, seedK = 20, maxPieceLen = 4,
      emRounds = 2, pruneKeep = 12, unkLp = -20.0, maxWordLen = 12)
    val batch = Unigram.encodeRowwise(docs, fit.vocab, 4, -20.0)
      .select(col("doc_id"), col("n_words"), col("n_pieces"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // join path (the registered q_t_unigram_encode shape) agrees
    val joined = docs.select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(fit.wordSegs.select(col("word"),
        size(col("segs")).as("np")), Seq("word"))
      .groupBy("doc_id").agg(count(lit(1)).as("nw"),
        sum("np").cast("long").as("np"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(batch == joined, "rowwise DP must equal the join path")
    // stream the same rows in two files; the stateless map-only
    // encode must emit identical accounting
    val rows = docs.as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val sd = java.nio.file.Files.createTempDirectory("graft-uni")
    b1.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(sd.resolve("p1").toString)
    b2.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(sd.resolve("p2").toString)
    val src = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$sd/p*")
    val q = Unigram.encodeRowwise(src, fit.vocab, 4, -20.0)
      .select("doc_id", "n_words", "n_pieces")
      .writeStream.outputMode("append").format("memory")
      .queryName("uni_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("uni_stream_test")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == batch, "stream must equal batch exactly")
  }
}
