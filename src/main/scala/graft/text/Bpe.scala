package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merge-table LEARNING (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the BPE algorithm GPT-2/Llama tokenizers descend
  * from) and corpus ENCODING with the learned merges. Replaces the
  * `ceil(len/4)` subword ESTIMATE the packing/chunking family budgeted
  * on (r9 verdict item 3) with real learned token counts.
  *
  * Algorithm (distributed shape):
  *  - The corpus collapses to a (word, freq) VOCABULARY table once —
  *    the classic BPE trick: merge statistics depend only on distinct
  *    words and their frequencies, so every round works on |vocab|
  *    rows, not corpus tokens.
  *  - Each of the V merge rounds is ONE pair-keyed aggregation
  *    (adjacent-symbol pairs weighted by word freq, map-side combined)
  *    + a TakeOrdered(1) for the winner under the deterministic
  *    (count desc, pair asc) tie-break, then a MAP-ONLY left-to-right
  *    non-overlapping merge apply (an array fold per word — no join,
  *    no shuffle). localCheckpoint per round keeps the plan O(1)
  *    across rounds (the iterative-Spark lineage discipline).
  *  - ENCODE is a broadcast equi-join of corpus tokens against the
  *    final word → symbol-list table — the "precomputed word
  *    encodings" cache real tokenizers serve frequent words from; at
  *    100 TB the vocab table is megabytes while the corpus streams
  *    map-side.
  *
  * Divergences from Sennrich 2016, stated: no end-of-word marker
  * (merges are within-word adjacent pairs either way; the marker only
  * distinguishes word-final subwords in the emitted vocabulary, which
  * the count/packing consumers here don't need), and characters are
  * the initial symbols for [[learn]] ([[learnBytes]] runs the same
  * algorithm over real UTF-8 bytes — the GPT-2 alphabet).
  *
  * Every step is oracle-expressible: the pair counts are integer sums,
  * the winner tie-break is total, and the merge apply has an exact SQL
  * twin (island-parity formulation of the same left-to-right
  * non-overlap rule — [[oracleCtes]]), so the ENTIRE iterative learn
  * is reproduced by an unrolled CTE chain per round, the
  * `LloydKmeans.oracleSqlFrom` discipline.
  */
object Bpe {

  /** One learned merge: rank (1-based round), the symbol pair, and the
    * weighted pair count that won the round. */
  final case class Merge(rank: Int, left: String, right: String,
    count: Long)

  /** Distinct-word frequency table (empty boundary tokens from
    * leading/trailing whitespace are not words). */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character symbols of a word (one split pass; Java split("")
    * yields no empties for non-empty input, but guard anyway — the
    * known trailing-"" trap). */
  def charSyms(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Apply a FROZEN merge table, in rank order, to a `word` column's
    * distinct-word frame — the encode path for text the tokenizer has
    * never seen (real tokenizers run exactly this on vocabulary cache
    * misses). One map-only [[applyMerge]] fold per rank, with a
    * localCheckpoint between ranks: chaining the folds into ONE
    * expression is a trap — each level references the previous
    * symbols column ~3×, so the expression DAG grows 3^V and Catalyst
    * analysis goes exponential (measured: a 12-merge chain hung the
    * planner). Per-rank checkpoints keep every plan O(1), exactly the
    * [[learn]] loop's lineage discipline. For words present in the
    * training corpus the result is identical to the learned
    * vocabulary's symbols (BpeSpec locks this). Returns
    * (word, syms). */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).foldLeft(
      words.select(col("word"), charSyms(col("word")).as("syms"))
        .localCheckpoint()) { (df, m) =>
      df.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
        .localCheckpoint()
    }

  /** Left-to-right NON-OVERLAPPING apply of one merge (a, b) → a||b to
    * a symbol array — the standard BPE apply rule ("aaa" under (a,a)
    * merges to ["aa","a"], not ["aa","aa"]): a single array fold whose
    * accumulator merges the incoming symbol into its own last element
    * when they form the pair. Map-only, no shuffle. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      slice(syms, 1, 1),
      (acc, x) =>
        when(element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** GPT-2 byte→printable-unicode remap (Radford et al. 2019,
    * encoder.py `bytes_to_unicode`): printable non-space bytes
    * (33–126, 161–172, 174–255) map to their own code point; every
    * other byte b maps to chr(256 + rank of b among the remapped, in
    * byte order) — so every byte has a visible single-character
    * symbol and the BPE alphabet covers ALL inputs ([UNK]-free by
    * construction, unlike WordPiece's all-or-nothing rule).
    * [[byteSyms]] consumes the FULL table over real UTF-8 bytes. */
  val ByteRemap: IndexedSeq[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    IndexedSeq.tabulate(256) { b =>
      if (keep(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }
  }

  /** Byte symbols of a word under [[ByteRemap]] — the byte-level
    * initial alphabet over REAL UTF-8 BYTES: `encode(word, 'UTF-8')`
    * is the char→byte seam, `hex` exposes each byte as a 2-char
    * uppercase pair, and the full 256-entry remap is keyed by that
    * pair (one map lookup per byte, no base conversion). A multi-byte
    * code point therefore yields one symbol PER BYTE ('é' → "Ã©"
    * under the GPT-2 remap) — the property that makes the alphabet
    * total: every input byte string segments, no [UNK] path exists.
    * All remap keys are present by construction; the sentinel
    * coalesce mirrors the oracle's LEFT JOIN so an impossible miss
    * would hash-fail loudly instead of silently mis-mapping. */
  def byteSyms(word: Column): Column = {
    val remap = map((0 to 255)
      .flatMap(b => Seq(lit(f"$b%02X"), lit(ByteRemap(b)))): _*)
    val h = hex(encode(word, "UTF-8"))
    // Degenerate guard: sequence(1, 0) defaults to step -1, so an
    // empty word would yield two bogus [NON_BYTE] symbols instead of
    // an empty array. Call sites currently filter empty words, but
    // this is a public helper on serving paths — make '' → [] total.
    when(length(h) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), (length(h) / 2).cast("int")),
        j => coalesce(element_at(remap, h.substr(j * 2 - 1, lit(2))),
          lit("[NON_BYTE]"))))
  }

  /** Deterministic multilingual derivation of an ASCII `text` column
    * — the byte-level fixture seam: the original text plus a mutated
    * prefix whose vowels become 2-byte (ä), 3-byte (€) and 4-byte
    * (😀) UTF-8 code points, so the byte queries exercise every
    * UTF-8 width while the original ASCII words all remain in the
    * corpus. [[multiTextSql]] is the DuckDB twin (replace/substring
    * are char-based and occurrence-total on both engines). */
  def multiText(text: Column): Column =
    concat(text, lit(" "),
      replace(replace(replace(substring(text, 1, 48),
        lit("a"), lit("ä")), lit("e"), lit("€")), lit("o"), lit("😀")))

  /** DuckDB twin of [[multiText]]. */
  val multiTextSql: String =
    "text || ' ' || replace(replace(replace(substring(text, 1, 48)," +
      " 'a', 'ä'), 'e', '€'), 'o', '😀')"

  /** Byte-level twin of [[applyMerges]]: frozen-merge apply over
    * [[byteSyms]] initial symbols — the serving path for unseen text
    * under the byte alphabet. Total by construction: every ASCII
    * byte has a base symbol, so every input segments (no [UNK] rule
    * anywhere — the byte-level selling point). */
  def applyMergesBytes(words: DataFrame, merges: Seq[Merge])
      : DataFrame =
    merges.sortBy(_.rank).foldLeft(
      words.select(col("word"), byteSyms(col("word")).as("syms"))
        .localCheckpoint()) { (df, m) =>
      df.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
        .localCheckpoint()
    }

  /** Learn `nMerges` merges over the BYTE-level alphabet — the GPT-2
    * production encoder's variant of [[learn]]: identical merge loop,
    * different initial symbols ([[byteSyms]] — real UTF-8 bytes under
    * the full 256-entry remap, so ANY corpus passes: multilingual
    * text, control bytes, every UTF-8 width). On a printable-ASCII
    * corpus the remap is the identity on every occurring byte and
    * the learned merges equal [[learn]]'s; on multi-byte input the
    * alphabet is per-byte symbols — total, [UNK]-free (BpeSpec locks
    * the control-byte, multi-byte and no-unk paths). */
  def learnBytes(docs: DataFrame, nMerges: Int)
      : (Seq[Merge], DataFrame) =
    learnLoop(wordTable(docs)
      .coalesce(graft.Settings.tuning.smallFrameParts)
      .withColumn("syms", byteSyms(col("word")))
      .localCheckpoint(), nMerges)

  /** Learn `nMerges` merges over `docs`. Returns the merge table and
    * the final (word, freq, syms) vocabulary — the word → subword
    * encoding every consumer joins against. Throws if the corpus runs
    * out of adjacent pairs before `nMerges` rounds (the unrolled
    * oracle has no early exit, so the engine must not silently
    * shorten the table either). */
  def learn(docs: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    // coalesce the vocabulary: every round runs 2 actions (winner +
    // checkpoint) over it, and a distinct-word table is tiny next to
    // the corpus — a handful of partitions cuts per-round task-launch
    // overhead while keeping the rounds parallel (width is the shared
    // `tuning.small_frame_parts` knob: the frame is vocab-bounded, so
    // a config constant is the right shape, unlike the corpus-sized
    // PCA frame which sizes adaptively)
    learnLoop(wordTable(docs)
      .coalesce(graft.Settings.tuning.smallFrameParts)
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint(), nMerges)
  }

  /** The shared merge loop over an initialized (word, freq, syms)
    * vocabulary — char-level ([[learn]]) and byte-level
    * ([[learnBytes]]) differ only in the initial alphabet. */
  private def learnLoop(init: DataFrame, nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    var words = init
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to nMerges) {
      val pairArr = when(size(col("syms")) >= 2,
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val top = words
        .select(col("freq"), explode(pairArr).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"bpe.n_merges=$nMerges exhausted the corpus at round $r")
      val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      merges += Merge(r, a, b, cnt)
      words = words
        .withColumn("syms", applyMerge(col("syms"), a, b))
        .localCheckpoint()
    }
    (merges.result(), words)
  }

  /** One batched-round merge: (round, slot-within-round, pair, count).
    * Slot numbering is the admitted order (by pair-count rank). */
  final case class BatchMerge(round: Int, slot: Int, left: String,
    right: String, count: Long)

  /** LEGACY symbol-sharing conflict rule (kept for the A/B
    * measurement path): two candidate pairs conflict when they share
    * a symbol OR when the higher-ranked pair's merged symbol equals
    * one of the lower pair's symbols. Conservative: (a,b)/(z,b) in
    * words that never put them adjacent are blocked anyway (measured
    * 51/80 admitted at m = 4 on the fixture corpus). Also asymmetric
    * — it never checks the LOWER pair's merged symbol against the
    * higher's symbols, so "disjoint ⇒ applications commute" was
    * wrong in a corner (higher ("cd","x") / lower ("c","d")); the
    * batched semantics have never depended on commutation (both
    * engines apply in fixed slot order), and the EXACT rule below
    * replaces this one as the default. */
  private def legacyConflicts(ha: String, hb: String, ca: String,
      cb: String): Boolean = {
    val m = ha + hb
    ha == ca || ha == cb || hb == ca || hb == cb || m == ca || m == cb
  }

  /** BATCHED learning — the production mitigation for [[learn]]'s
    * 2-driver-actions-per-merge round count (the standard top-m
    * batching of parallel BPE trainers): each of `nRounds` rounds
    * ranks the weighted pair counts once, considers the TOP `batchM`
    * candidates, and admits every candidate that does not CONFLICT
    * with ANY higher-ranked candidate in the window (a single-pass
    * deterministic rule — expressible as one anti-join on both
    * engines, unlike sequential greedy selection).
    *
    * The EXACT conflict test (default): higher h conflicts with
    * lower c iff (1) h's merged symbol is one of c's symbols —
    * applying h then CREATES c-occurrences c's pre-round count never
    * saw — or (2) some word has a raw adjacency match of h at
    * instance position i and of c at j with |i − j| ≤ 1 — applying h
    * there consumes a symbol instance of c's occurrence. Reasoning
    * on pre-round symbol INSTANCES makes the test stable under
    * earlier same-round merges (admitted merges touch disjoint
    * instances and create only symbols no admitted candidate uses),
    * so every admitted merge's reported pre-round count is its true
    * count at apply time. Positional interaction implies a shared
    * symbol, so this admits a superset of [[legacyConflicts]]'s
    * batch — pairs sharing a symbol but never adjacent in any word
    * (the (a,b)/(z,b) case) now land in one round. Cost: one extra
    * bounded action per round (a ≤ |window|-candidate match
    * self-join over the vocab), skipped entirely at batchM = 1.
    *
    * Admitted merges apply in fixed rank order within the round on
    * BOTH engines — slot order is the spec, no commutation claim.
    * Divergence from sequential BPE, stated: a round's lower slots
    * are admitted against PRE-ROUND counts, so the merge TABLE can
    * differ from [[learn]]'s order when a round-1 merge would have
    * promoted a new pair above a round-2 slot; with batchM = 1 the
    * rule degenerates to exactly [[learn]] (BpeSpec locks this). A
    * round whose window is empty (vocabulary exhausted) admits
    * nothing and is a no-op — fixed `nRounds` always run, matching
    * the unrolled oracle. Returns the admitted merge table and the
    * final vocabulary. */
  def learnBatched(docs: DataFrame, nRounds: Int, batchM: Int,
      exactConflicts: Boolean = true): (Seq[BatchMerge], DataFrame) = {
    var words = wordTable(docs)
      .coalesce(graft.Settings.tuning.smallFrameParts)
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[BatchMerge]
    for (r <- 1 to nRounds) {
      val pairArr = when(size(col("syms")) >= 2,
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val window = words
        .select(col("freq"), explode(pairArr).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(batchM).collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      // positional-interaction matrix for the exact rule: raw
      // adjacency matches of every window candidate, instance-indexed
      // per word, self-joined at |i − j| <= 1. The frame is the vocab
      // filtered to <= batchM literal pairs — tiny; collected as a
      // <= m(m−1)/2 driver set
      val interacting: Set[(Int, Int)] =
        if (!exactConflicts || window.length < 2) Set.empty
        else {
          val rnExpr = window.zipWithIndex.foldLeft(lit(-1)) {
            case (e, ((a, b, _), i)) =>
              when(col("x") === a && col("y") === b, lit(i)).otherwise(e)
          }
          val m = words
            .select(col("syms"),
              explode(when(size(col("syms")) >= 2,
                sequence(lit(0), size(col("syms")) - 2))
                .otherwise(array().cast("array<int>"))).as("j"),
              col("word"))
            .select(col("word"), col("j"),
              element_at(col("syms"), col("j") + 1).as("x"),
              element_at(col("syms"), col("j") + 2).as("y"))
            .withColumn("rn", rnExpr).filter(col("rn") >= 0)
            .select("word", "j", "rn")
          m.as("h").join(m.as("c"),
              col("h.word") === col("c.word")
                && col("h.rn") < col("c.rn")
                && abs(col("h.j") - col("c.j")) <= 1)
            .select(col("h.rn").as("hrn"), col("c.rn").as("crn"))
            .distinct().collect()
            .map(row => (row.getInt(0), row.getInt(1))).toSet
        }
      val admitted = window.zipWithIndex.collect {
        case ((a, b, cnt), i) if window.take(i).zipWithIndex.forall {
          case ((ha, hb, _), hi) =>
            if (exactConflicts)
              ha + hb != a && ha + hb != b && !interacting((hi, i))
            else !legacyConflicts(ha, hb, a, b)
        } => (a, b, cnt)
      }
      admitted.zipWithIndex.foreach { case ((a, b, cnt), s) =>
        merges += BatchMerge(r, s + 1, a, b, cnt)
      }
      if (admitted.nonEmpty) {
        words = admitted.foldLeft(words) { case (df, (a, b, _)) =>
          df.withColumn("syms", applyMerge(col("syms"), a, b))
        }.localCheckpoint()
      }
    }
    (merges.result(), words)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: one unrolled CTE block per merge round.
  // ------------------------------------------------------------------

  /** Tokenizer twin of TextOps.tokens for the oracle side. */
  val ToksSql = "regexp_split_to_array(text, '[[:space:]]+')"

  /** CTE chain reproducing [[learn]] bit-for-bit: `bw_0` is the
    * character-split vocabulary; each round r emits its weighted pair
    * counts (`bp$r`), the winning merge (`bm$r`, count desc / pair asc
    * LIMIT 1), and the merged vocabulary (`bw_$r`) via the
    * island-parity formulation of left-to-right non-overlap: among
    * consecutive positions matching (a,b), every SECOND match is a
    * merge start (a match overlapping a start is skipped — exactly the
    * fold rule); start positions emit a||b, the position after a start
    * is consumed. Ends with `bmerges` (the merge table) and
    * `bw_$nMerges` (the final word → symbols encoding). All windows
    * partition per WORD — bounded by word length, never vocab size. */
  /** One left-to-right non-overlapping APPLY block: merge `mergeCte`'s
    * (a, b) into `prev`'s symbol arrays, emitting `out`. Shared by the
    * learn rounds and the frozen-merge apply chain so the two can
    * never drift. CTE working names are suffixed `$tag`. */
  private def applyBlock(prev: String, out: String, mergeCte: String,
      tag: String): String = s"""
      bx$tag AS (
        SELECT e.word, e.freq, e.j, e.s[e.j + 1] AS sym, m.a, m.b,
               (e.j < len(e.s) - 1 AND e.s[e.j + 1] = m.a
                 AND e.s[e.j + 2] = m.b) AS mt
        FROM (SELECT word, freq, s, unnest(range(len(s))) AS j
              FROM $prev) e, $mergeCte m),
      bi$tag AS (
        SELECT *, j - row_number() OVER (PARTITION BY word, mt
          ORDER BY j) AS grp
        FROM bx$tag),
      bs$tag AS (
        SELECT *, mt AND ((j - min(j) OVER (PARTITION BY word, mt, grp))
          % 2 = 0) AS is_start
        FROM bi$tag),
      $out AS MATERIALIZED (
        SELECT word, any_value(freq) AS freq,
               list(CASE WHEN is_start THEN a || b ELSE sym END
                 ORDER BY j) AS s
        FROM (SELECT *, coalesce(lag(is_start) OVER (
                PARTITION BY word ORDER BY j), false) AS consumed
              FROM bs$tag)
        WHERE NOT consumed GROUP BY word)"""

  /** Character-split vocabulary CTE over (optionally filtered)
    * documents. */
  def vocabCte(name: String, docFilter: String = ""): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    s"""
      $name AS MATERIALIZED (
        SELECT word, count(*) AS freq, string_split(word, '') AS s
        FROM (SELECT unnest($ToksSql) AS word FROM documents$where)
        WHERE word <> '' GROUP BY word)"""
  }

  /** The unrolled merge-round chain shared by the char- and
    * byte-level learn oracles: from `${w}_0` (the initialized
    * vocabulary) through `${p}$r` (pair counts), `${m}$r` (winner),
    * `${w}_$r` (merged vocabulary), ending with `${mergesCte}` — the
    * merge table union. Names are parameterized so both alphabets'
    * chains can coexist in ONE WITH (the tokenizer A/B query). */
  private def learnRoundsCtes(nMerges: Int, p: String, m: String,
      w: String, tagPfx: String, mergesCte: String): String = {
    val rounds = (1 to nMerges).map { r =>
      val prev = s"${w}_${r - 1}"
      s"""
      $p$r AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
          SELECT freq, s[j + 1] AS a, s[j + 2] AS b FROM (
            SELECT freq, s, unnest(range(len(s) - 1)) AS j FROM $prev))
        GROUP BY 1, 2),
      $m$r AS MATERIALIZED (
        SELECT $r AS merge_rank, a, b, cnt FROM $p$r
        ORDER BY cnt DESC, a, b LIMIT 1),""" +
      applyBlock(prev, s"${w}_$r", s"$m$r", s"$tagPfx$r")
    }.mkString(",")
    val union = (1 to nMerges)
      .map(r => s"SELECT merge_rank, a, b, cnt FROM $m$r")
      .mkString("\n        UNION ALL ")
    s"""$rounds,
      $mergesCte AS (
        $union)"""
  }

  def oracleCtes(nMerges: Int, docFilter: String = ""): String =
    vocabCte("bw_0", docFilter) + "," +
      learnRoundsCtes(nMerges, "bp", "bm", "bw", "", "bmerges")

  /** Byte-alphabet vocabulary CTEs: the FULL 256-entry GPT-2 remap
    * table `bymap` keyed by the byte's 2-char uppercase hex pair
    * (`keep` bytes — 33–126, 161–172, 174–255 — map to their own
    * chr, the rest to chr(256 + byte-order rank among the remapped)),
    * then `byw_0(word, freq, s)` with each REAL UTF-8 BYTE of the
    * word (`hex(encode(word))` pair j — the engine's [[byteSyms]]
    * seam verbatim) mapped through it. All 256 keys exist, so the
    * LEFT JOIN's `[NON_BYTE]` sentinel is unreachable — kept so an
    * impossible miss hash-fails instead of silently mis-mapping.
    * `textSql` is the corpus text expression — defaults to the
    * [[multiTextSql]] multilingual derivation so the byte chain
    * exercises 2/3/4-byte UTF-8 on the ASCII fixture. */
  def byteVocabCtes(docFilter: String = "",
      textSql: String = multiTextSql): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    s"""
      bymap AS MATERIALIZED (
        SELECT b, printf('%02X', b) AS hx,
               CASE WHEN keep THEN chr(CAST(b AS INT))
                    ELSE chr(CAST(256 + row_number() OVER (
                      PARTITION BY keep ORDER BY b) - 1 AS INT))
               END AS sym
        FROM (SELECT b, (b BETWEEN 33 AND 126 OR b BETWEEN 161 AND 172
                         OR b BETWEEN 174 AND 255) AS keep
              FROM range(256) t(b))),
      bywt AS MATERIALIZED (
        SELECT word, count(*) AS freq
        FROM (SELECT unnest($ToksSql) AS word FROM
                (SELECT $textSql AS text FROM documents$where))
        WHERE word <> '' GROUP BY 1),
      bywc AS (
        SELECT word, j,
               substring(hex(encode(word)), 2 * j - 1, 2) AS hx
        FROM bywt,
             unnest(range(1, octet_length(encode(word)) + 1)) t(j)),
      byw_0 AS MATERIALIZED (
        SELECT c.word, any_value(t.freq) AS freq,
               list(coalesce(m.sym, '[NON_BYTE]') ORDER BY c.j) AS s
        FROM bywc c
        LEFT JOIN bymap m ON m.hx = c.hx
        JOIN bywt t ON t.word = c.word
        GROUP BY c.word)"""
  }

  /** Unrolled byte-level learn oracle — [[byteVocabCtes]] + the same
    * round chain as [[oracleCtes]] under `by*` names, ending at
    * `bymerges` and `byw_$nMerges`. */
  def oracleBytesCtes(nMerges: Int, docFilter: String = "",
      textSql: String = multiTextSql): String =
    byteVocabCtes(docFilter, textSql) + "," +
      learnRoundsCtes(nMerges, "byp", "bym", "byw", "by", "bymerges")

  /** Frozen-merge APPLY chain: run the already-learned bm1..bmN (from
    * an [[oracleCtes]] emitted earlier in the same WITH) over a
    * separate vocabulary `${prefix}_0` — the oracle twin of
    * [[applyMerges]] for encode-of-unseen-text. Ends at
    * `${prefix}_$nMerges`. */
  def oracleApplyCtes(nMerges: Int, prefix: String): String =
    (1 to nMerges).map { r =>
      applyBlock(s"${prefix}_${r - 1}", s"${prefix}_$r", s"bm$r",
        s"_$prefix$r")
    }.mkString(",")

  /** Unrolled oracle for [[learnBatched]] (exact conflict rule): per
    * round — the pair-count table, the ranked top-`batchM` candidate
    * window, the candidates' raw adjacency MATCH POSITIONS per word
    * (`bbx$r`, MATERIALIZED — referenced twice by the interaction
    * self-join), the positional-interaction pairs at |i − j| ≤ 1
    * (`bbcf$r`), the admission anti-join (NOT EXISTS against every
    * higher-ranked window candidate: merged-symbol creation OR a
    * positional interaction — the engine's exact test verbatim),
    * then one fixed apply SLOT per window position. A sentinel
    * chr(1)/chr(1) merge fills slots beyond the admitted count so
    * the CTE chain's SHAPE is independent of how many candidates
    * were admitted — chr(1) never occurs in document text, so the
    * sentinel matches no adjacent pair and its apply block is the
    * identity. Ends with `bbmerges` (round, slot, a, b, cnt). */
  def oracleBatchedCtes(nRounds: Int, batchM: Int): String = {
    val pieces = Seq.newBuilder[String]
    pieces += vocabCte("bbv0")
    var prev = "bbv0"
    for (r <- 1 to nRounds) {
      pieces += s"""
      bbp$r AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
          SELECT freq, s[j + 1] AS a, s[j + 2] AS b FROM (
            SELECT freq, s, unnest(range(len(s) - 1)) AS j FROM $prev))
        GROUP BY 1, 2)"""
      pieces += s"""
      bbc$r AS MATERIALIZED (
        SELECT * FROM (
          SELECT a, b, cnt,
                 row_number() OVER (ORDER BY cnt DESC, a, b) AS rn
          FROM bbp$r) WHERE rn <= $batchM)"""
      pieces += s"""
      bbx$r AS MATERIALIZED (
        SELECT c.rn, e.word, e.j
        FROM (SELECT word, s, unnest(range(len(s) - 1)) AS j
              FROM $prev) e
        JOIN bbc$r c ON e.s[e.j + 1] = c.a AND e.s[e.j + 2] = c.b)"""
      pieces += s"""
      bbcf$r AS MATERIALIZED (
        SELECT DISTINCT h.rn AS hrn, c.rn AS crn
        FROM bbx$r h JOIN bbx$r c
          ON h.word = c.word AND h.rn < c.rn
          AND abs(h.j - c.j) <= 1)"""
      pieces += s"""
      bba$r AS MATERIALIZED (
        SELECT c.a, c.b, c.cnt,
               row_number() OVER (ORDER BY c.rn) AS slot
        FROM bbc$r c WHERE NOT EXISTS (
          SELECT 1 FROM bbc$r h WHERE h.rn < c.rn AND (
            h.a || h.b = c.a OR h.a || h.b = c.b
            OR EXISTS (SELECT 1 FROM bbcf$r x
                       WHERE x.hrn = h.rn AND x.crn = c.rn))))"""
      for (i <- 1 to batchM) {
        val out = s"bbw_${r}_$i"
        pieces += s"""
      bbm_${r}_$i AS MATERIALIZED (
        SELECT a, b FROM bba$r WHERE slot = $i
        UNION ALL
        SELECT chr(1), chr(1)
        WHERE NOT EXISTS (SELECT 1 FROM bba$r WHERE slot = $i))"""
        pieces += applyBlock(prev, out, s"bbm_${r}_$i", s"bb${r}_$i")
        prev = out
      }
    }
    val union = (1 to nRounds)
      .map(r => s"SELECT $r AS round, slot, a, b, cnt FROM bba$r")
      .mkString("\n        UNION ALL ")
    pieces += s"""
      bbmerges AS (
        $union)"""
    pieces.result().mkString(",")
  }
}
