package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE merge-table learning + encode semantics on hand-built corpora:
  * the deterministic (count desc, pair asc) winner rule, the
  * left-to-right NON-overlapping apply (the "aaa" case), multi-round
  * chaining onto previously-merged symbols, and the whitespace-run
  * tokenizer boundary. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("winner rule: highest weighted pair count, ties break pair-asc") {
    // "ab" x2 gives (a,b) count 2; "cd" x2 gives (c,d) count 2 — the
    // tie breaks to (a,b); round 2 then picks (c,d)
    val d = docs(1L -> "ab ab cd cd")
    val (merges, _) = Bpe.learn(d, 2)
    assert(merges.map(m => (m.rank, m.left, m.right, m.count)) ==
      Seq((1, "a", "b", 2L), (2, "c", "d", 2L)))
  }

  test("apply is left-to-right non-overlapping: aaaa under (a,a) " +
      "becomes [aa, aa], aaa becomes [aa, a]") {
    val d = docs(1L -> "aaaa aaa")
    val (merges, vocab) = Bpe.learn(d, 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    // aaaa has 3 (a,a) pairs, aaa has 2 → count 5
    assert(merges.head.count == 5L)
    val syms = vocab.select(col("word"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("aaaa") == Seq("aa", "aa"))
    assert(syms("aaa") == Seq("aa", "a"))
  }

  test("later rounds merge onto previously-merged symbols") {
    // freq: "abab" x3 → round 1 (a,b) count 6 (2 per word x3);
    // round 2 then sees [ab, ab] and merges (ab, ab)
    val d = docs(1L -> "abab abab abab")
    val (merges, vocab) = Bpe.learn(d, 2)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "ab")))
    val syms = vocab.filter(col("word") === "abab")
      .select("syms").head.getSeq[String](0)
    assert(syms == Seq("abab"))
  }

  test("word frequencies weight the counts; single-char words " +
      "contribute no pairs") {
    val d = docs(1L -> "xy xy xy z z z z")
    val (merges, vocab) = Bpe.learn(d, 1)
    assert(merges.head == Bpe.Merge(1, "x", "y", 3L))
    val zSyms = vocab.filter(col("word") === "z")
      .select("syms").head.getSeq[String](0)
    assert(zSyms == Seq("z"))
  }

  test("learn throws when the corpus runs out of pairs — the unrolled " +
      "oracle has no early exit, so the engine must not shorten") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException] { Bpe.learn(d, 1) }
  }

  test("applyMerges on the training words reproduces the learned " +
      "vocabulary exactly; unseen words encode with the same rule") {
    val d = docs(1L -> "abab abab low lower lowest aaaa")
    val (merges, vocab) = Bpe.learn(d, 4)
    val applied = Bpe.applyMerges(
      vocab.select("word"), merges)
    val a = applied.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val v = vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a == v, "frozen-merge apply must equal the learn output " +
      "on training words")
    // an UNSEEN word built from seen pairs encodes by the same rule
    import spark.implicits._
    val oov = Bpe.applyMerges(
        Seq("ababab", "zq").toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // (a,b) merges everywhere; whether 'abab' forms depends on the
    // learned table — at minimum no single chars of a/b remain split
    assert(oov("ababab").forall(s => s != "a" && s != "b"))
    assert(oov("zq") == Seq("z", "q"),
      "chars never seen adjacent stay unmerged")
  }

  test("wordTable splits on whitespace runs and drops boundary empties") {
    val d = docs(1L -> " ab\t\tab\ncd ")
    val wt = Bpe.wordTable(d).orderBy("word").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(wt.toSeq == Seq("ab" -> 2L, "cd" -> 1L))
  }

  test("learnBatched with batch_m = 1 degenerates to sequential learn " +
      "(same merges, same final vocabulary)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
    val (seq6, vocabSeq) = Bpe.learn(d, 6)
    val (bat6, vocabBat) = Bpe.learnBatched(d, nRounds = 6, batchM = 1)
    assert(bat6.map(m => (m.left, m.right, m.count)) ==
      seq6.map(m => (m.left, m.right, m.count)),
      "m=1 batching must reproduce the sequential merge table")
    assert(bat6.map(_.slot).forall(_ == 1))
    val vs = vocabSeq.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val vb = vocabBat.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vs == vb, "final vocabularies must match")
  }

  test("learnBatched exact conflicts: positional interaction blocks, " +
      "shared-symbol-without-interaction admits, exhausted round is " +
      "a no-op") {
    // words: "abc"×5, "zb"×4 → round-1 candidates (a,b):5, (b,c):5,
    // (z,b):4. (a,b) wins slot 1 on the asc tie-break. (b,c) matches
    // "abc" at j=1 adjacent to (a,b)'s match at j=0 → positional
    // interaction → blocked. (z,b) SHARES symbol b with (a,b) but the
    // two are never adjacent in any word ((a,b) only in "abc", (z,b)
    // only in "zb") → the exact rule ADMITS it where the legacy
    // symbol-sharing rule blocked it.
    val d = docs(1L -> "abc abc abc abc abc zb zb zb zb")
    val (merges, vocab) = Bpe.learnBatched(d, nRounds = 1, batchM = 3)
    val r1 = merges.filter(_.round == 1)
    assert(r1.map(m => (m.slot, m.left, m.right)) ==
      Seq((1, "a", "b"), (2, "z", "b")),
      s"exact rule must admit (a,b) and (z,b), block (b,c): $r1")
    // the round's vocabulary reflects both admitted merges
    val vs = vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vs("abc") == Seq("ab", "c") && vs("zb") == Seq("zb"))
    // the LEGACY rule on the same corpus blocks (z,b) too — the A/B
    // the admission-rate measurement reads
    val (legacy, _) = Bpe.learnBatched(d, nRounds = 1, batchM = 3,
      exactConflicts = false)
    assert(legacy.map(m => (m.left, m.right)) == Seq(("a", "b")),
      s"legacy rule must admit only the top slot here: $legacy")
    // tiny corpus exhausts: a later round admitting nothing must not
    // throw and must leave earlier merges intact
    val (m2, _) = Bpe.learnBatched(docs(1L -> "ab"), 3, 4)
    assert(m2.nonEmpty && m2.forall(_.round <= 3))
  }

  test("learnBatched exact conflicts: overlapping-word interaction " +
      "blocks within a round; multi-char-symbol candidates in later " +
      "rounds admit when they never share a word") {
    // round 1: (a,b):17 tops; (a,a):5 matches "aab" at j=0 adjacent
    // to (a,b)'s match at j=1 → blocked. Round 2 runs over merged
    // symbols: (a,"ab"):5 (from "aab") and ("ab",q):3 (from "abq")
    // live in different words, and (a+"ab")="aab" is no candidate's
    // symbol → both admit and both counts stay exact at apply time.
    val d = docs(1L -> (Seq.fill(9)("ab").mkString(" ") + " " +
      Seq.fill(5)("aab").mkString(" ") + " " +
      Seq.fill(3)("abq").mkString(" ")))
    val (merges, vocab) = Bpe.learnBatched(d, nRounds = 2, batchM = 2)
    val r1 = merges.filter(_.round == 1)
    // round 1: (a,b):17 wins; (a,a):5 interacts with it in "aab"
    // (j=0 vs j=1) → blocked
    assert(r1.map(m => (m.slot, m.left, m.right)) ==
      Seq((1, "a", "b")), s"round 1: $r1")
    val r2 = merges.filter(_.round == 2)
    // round 2 vocab: "ab"→["ab"], "aab"→["a","ab"], "abq"→["ab","q"]
    // candidates: (a,"ab"):5, ("ab",q):3 — disjoint words, no
    // creation ((a+"ab")="aab" ≠ "ab","q") → BOTH admitted
    assert(r2.map(m => (m.slot, m.left, m.right)) ==
      Seq((1, "a", "ab"), (2, "ab", "q")), s"round 2: $r2")
    val vs = vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vs("aab") == Seq("aab") && vs("abq") == Seq("abq"))
  }

  test("byte-level remap is the GPT-2 table: printables identity, " +
      "the rest chr(256 + byte-order rank)") {
    // printable ASCII maps to itself
    assert(Bpe.ByteRemap('a'.toInt) == "a")
    assert(Bpe.ByteRemap('!'.toInt) == "!")
    assert(Bpe.ByteRemap('~'.toInt) == "~")
    // non-printables rank in byte order: 0x00 → chr(256), space
    // (0x20) → chr(256+32), DEL (0x7F) → chr(256+33)
    assert(Bpe.ByteRemap(0) == 256.toChar.toString)
    assert(Bpe.ByteRemap(32) == (256 + 32).toChar.toString)
    assert(Bpe.ByteRemap(127) == (256 + 33).toChar.toString)
    // beyond ASCII the table keeps GPT-2's full-range ranks (the
    // engine consumes ALL 256 entries over real UTF-8 bytes):
    // 0x80 is the 35th remapped byte
    assert(Bpe.ByteRemap(128) == (256 + 34).toChar.toString)
    assert(Bpe.ByteRemap(161) == 161.toChar.toString)
    assert(Bpe.ByteRemap(173) == (256 + 67).toChar.toString)
    assert(Bpe.ByteRemap(255) == 255.toChar.toString)
  }

  test("byte-level learn equals char-level on a printable-ASCII " +
      "corpus; control bytes still encode (no unk path exists)") {
    val d = docs(1L -> "abab abab cd cd ab")
    val (mc, _) = Bpe.learn(d, 2)
    val (mb, vb) = Bpe.learnBytes(d, 2)
    // identity remap on printables ⇒ identical merge tables
    assert(mc.map(m => (m.rank, m.left, m.right, m.count)) ==
      mb.map(m => (m.rank, m.left, m.right, m.count)))
    // EVERY byte string encodes under the byte alphabet: a word with
    // a control byte (0x01) the training corpus never saw still
    // segments — the control byte rides as its remapped symbol
    // chr(257), the learned (a,b) merge still applies — no
    // throw, no [UNK] (contrast: WordPiece's all-or-nothing rule)
    val unseen = Seq("\u0001ab").toDF("word")
    val segs = Bpe.applyMergesBytes(unseen, mb)
      .collect().head.getSeq[String](1)
    assert(segs == Seq(257.toChar.toString, "ab"),
      s"control-byte word must encode: $segs")
    assert(vb.select("word").count() == 3)
  }

  test("byteSyms iterates REAL UTF-8 bytes: one symbol per byte at " +
      "every UTF-8 width, zero sentinels, GPT-2 remap applied") {
    // 'é' = C3 A9 (2-byte), '€' = E2 82 AC (3-byte),
    // '😀' = F0 9F 98 80 (4-byte)
    val words = Seq("café", "€2", "a😀b").toDF("word")
    val syms = words.select(col("word"),
        Bpe.byteSyms(col("word")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def rm(b: Int) = Bpe.ByteRemap(b)
    assert(syms("café") ==
      Seq("c", "a", "f", rm(0xC3), rm(0xA9)), syms("café"))
    assert(syms("€2") ==
      Seq(rm(0xE2), rm(0x82), rm(0xAC), "2"), syms("€2"))
    assert(syms("a😀b") ==
      Seq("a", rm(0xF0), rm(0x9F), rm(0x98), rm(0x80), "b"),
      syms("a😀b"))
    // symbol count == UTF-8 byte count, and the alphabet is total —
    // no [NON_BYTE] sentinel can ever fire
    syms.foreach { case (w, s) =>
      assert(s.length == w.getBytes("UTF-8").length, s"$w: $s")
      assert(!s.contains("[NON_BYTE]"), s"$w: $s")
    }
  }

  test("learnBytes accepts a multilingual corpus and learns " +
      "multi-byte merges; every word encodes (no unk path)") {
    // "éé" dominates: its byte symbols are C3 A9 C3 A9 → the top
    // pair by weighted count is (remap(A9), remap(C3)) at freq 6 +
    // boundary-interior counts; the point locked here is that a
    // >0x7F corpus LEARNS (r13 refused it) and the merged symbols
    // are multi-byte remap strings
    val d = docs(1L -> "éé éé éé ab ab x")
    val (mb, vb) = Bpe.learnBytes(d, 2)
    assert(mb.length == 2)
    val c3 = Bpe.ByteRemap(0xC3)
    val a9 = Bpe.ByteRemap(0xA9)
    // round 1: within "éé" pairs (C3,A9) appears 2×/word and
    // (A9,C3) 1×/word → (c3,a9) wins at weighted count 6
    assert(mb.head.left == c3 && mb.head.right == a9,
      s"round-1 merge: ${mb.head}")
    val vs = vb.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vs.keySet == Set("éé", "ab", "x"))
    assert(vs("éé").nonEmpty &&
      vs.values.forall(s => !s.contains("[NON_BYTE]")))
  }
}
