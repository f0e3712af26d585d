package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012, "Japanese and
  * Korean voice search"; the BERT tokenizer of Devlin et al. 2019 and
  * the likelihood-scored trainer popularized by the HuggingFace
  * `tokenizers` reimplementation) — the third production tokenizer
  * family next to BPE (frequency-ranked merges) and unigram-LM
  * (EM-pruned vocabulary):
  *
  *  - LEARNING is BPE's merge loop with a different ranking: round r
  *    merges the adjacent symbol pair maximizing
  *    score(a,b) = count(ab) / (count(a) · count(b)) — the pair whose
  *    merge most increases corpus likelihood under a unigram symbol
  *    model, not the most frequent pair. Symbols after the first
  *    character of a word carry the `##` continuation prefix; merging
  *    (a, ##b) emits a·b with b's prefix stripped, so a merged symbol
  *    is itself `##`-prefixed iff it starts a word's interior.
  *  - ENCODING is greedy longest-match-first (NOT merge replay — the
  *    production serving algorithm BERT ships): at each position take
  *    the LONGEST vocabulary piece (interior candidates get the `##`
  *    prefix); if no piece matches, the WHOLE word becomes `[UNK]` —
  *    the classic WordPiece all-or-nothing rule. Since the vocabulary
  *    keeps the full training alphabet, `[UNK]` only fires on
  *    characters the training corpus never saw (the serve-time
  *    unseen-input path, exercised by WordPieceSpec).
  *
  * Determinism pins (the hash-checkable-fit discipline of
  * Bpe/Unigram/QualityClf):
  *  - score is ONE fixed-parenthesization IEEE expression over exact
  *    integer counts — `CAST(cnt AS DOUBLE) / (CAST(ca AS DOUBLE) *
  *    CAST(cb AS DOUBLE))` — identical bits cross-engine, so the
  *    (score desc, a, b) winner order can never diverge; the emitted
  *    score column is rounded at the boundary only.
  *  - candidate pairs whose merged CONTENT length (## prefix excluded)
  *    exceeds `maxPieceLen` are excluded from the ranking — the
  *    `max_token_length` cap production WordPiece trainers expose,
  *    which here also bounds the oracle's greedy-encode candidate fan
  *    (data-independent CTE shape).
  *  - the greedy encode advances ≥ 1 character per step, so a word of
  *    ≤ `maxWordLen` characters finishes in ≤ `maxWordLen` steps; the
  *    engine REFUSES a corpus whose longest word exceeds the bound
  *    (the Unigram max_word_len contract — the oracle unrolls one
  *    greedy-step CTE block per position).
  *
  * Scale shape (the BPE trick, unchanged): every learning round runs
  * on the DISTINCT-WORD frequency table — two aggregations over
  * |vocab_words| rows (pair counts + symbol counts, map-side combined,
  * planned as ONE action via the join) and a map-only fold apply.
  * ENCODE joins corpus tokens against the word → pieces table (the
  * precomputed-encoding cache) or runs the same greedy fold rowwise on
  * a stream — map-only, stateless, stream ≡ batch (WordPieceSpec).
  *
  * Oracle: the ENTIRE fit — `##`-prefixed seeding, every round's pair
  * and symbol counts, the likelihood-ranked winner, the island-parity
  * merge apply, the alphabet ∪ merges vocabulary, and the greedy
  * longest-match segmentation — is reproduced by [[oracleCtes]]. */
object WordPiece {

  /** One learned merge: rank, the symbol pair, the emitted merged
    * symbol (b's `##` stripped), the pair/symbol counts behind the
    * score, and the RAW IEEE score (consumers round at the emit
    * boundary). */
  final case class Merge(rank: Int, left: String, right: String,
    merged: String, cnt: Long, ca: Long, cb: Long, score: Double)

  /** The fitted model: merge table, training alphabet (every initial
    * symbol, `##`-prefixed interiors included), full vocabulary
    * (alphabet ∪ merged symbols, sorted), and the word → greedy
    * pieces table (word, freq, segs, is_unk). */
  final case class Fit(merges: Seq[Merge], alphabet: Seq[String],
    vocab: Seq[String], wordSegs: DataFrame)

  /** Initial WordPiece symbols of a word: first character bare, every
    * interior character `##`-prefixed. */
  def charSyms(word: Column): Column = {
    val cs = filter(split(word, ""), s => s =!= "")
    transform(cs, (c, i) =>
      when(i === 0, c).otherwise(concat(lit("##"), c)))
  }

  /** Content length of a symbol — characters excluding the `##`
    * continuation prefix (the unit `maxPieceLen` bounds). */
  private def contentLen(c: Column): Column =
    when(c.startsWith("##"), length(c) - 2).otherwise(length(c))

  private def stripCont(b: String): String =
    if (b.startsWith("##")) b.substring(2) else b

  /** Left-to-right non-overlapping apply of one merge (a, b) → merged
    * (the Bpe.applyMerge fold with the merged symbol a parameter —
    * WordPiece strips b's `##`). Map-only, no shuffle. */
  private def applyMerge(syms: Column, a: String, b: String,
      merged: String): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      slice(syms, 1, 1),
      (acc, x) =>
        when(element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))

  /** Greedy longest-match segmentation state of one word under a
    * frozen vocabulary — a single `aggregate` fold over character
    * positions (map-only, no shuffle): the accumulator carries
    * (pos, segs, unk); each step matches the LONGEST in-vocab piece
    * at `pos` (interior candidates `##`-prefixed) or trips the
    * all-or-nothing unk flag. ≥ 1 char of progress per step, so
    * |word| fold steps always suffice. Returns
    * struct(segs — `['[UNK]']` when unk — , is_unk). */
  def greedyStruct(word: Column, vocab: Seq[String], maxPieceLen: Int)
      : Column = {
    val vmap = map(vocab.sorted.flatMap(p => Seq(lit(p), lit(1))): _*)
    val folded = aggregate(
      sequence(lit(1), length(word)),
      struct(lit(1).as("pos"),
        array().cast("array<string>").as("segs"),
        lit(false).as("unk")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val segs = acc.getField("segs")
        val unk = acc.getField("unk")
        val cands = filter(
          transform(sequence(lit(1),
            greatest(lit(1),
              least(lit(maxPieceLen), length(word) - pos + 1))), l => {
            val sub = word.substr(pos, l)
            val piece = when(pos === 1, sub)
              .otherwise(concat(lit("##"), sub))
            when(element_at(vmap, piece).isNotNull,
              struct(l.as("l"), piece.as("piece")))
          }), c => c.isNotNull)
        val best = array_max(cands)
        when(unk || pos > length(word), acc)
          .otherwise(when(size(cands) === 0,
            struct(pos.as("pos"), segs.as("segs"),
              lit(true).as("unk")))
            .otherwise(struct(
              (pos + best.getField("l")).as("pos"),
              concat(segs, array(best.getField("piece"))).as("segs"),
              lit(false).as("unk"))))
      })
    struct(
      when(folded.getField("unk"), array(lit("[UNK]")))
        .otherwise(folded.getField("segs")).as("segs"),
      folded.getField("unk").as("is_unk"))
  }

  /** Per-word greedy segmentation frame `(word, freq, segs, is_unk)`
    * under a frozen vocabulary. */
  def segmentWords(words: DataFrame, vocab: Seq[String],
      maxPieceLen: Int): DataFrame =
    words.select(col("word"), col("freq"),
        greedyStruct(col("word"), vocab, maxPieceLen).as("g"))
      .select(col("word"), col("freq"),
        col("g.segs").as("segs"), col("g.is_unk").as("is_unk"))

  /** Learn `nMerges` likelihood-ranked merges over `docs` (object
    * scaladoc has every determinism pin). Driver actions: 2 setup
    * (bound check + alphabet) + 2 per round (winner + checkpoint),
    * each collecting ≤ |alphabet| or 1 rows. Throws when the corpus
    * runs out of admissible pairs before `nMerges` rounds (the
    * unrolled oracle has no early exit) or a word exceeds
    * `maxWordLen` (the greedy-unroll bound). */
  def learn(docs: DataFrame, nMerges: Int, maxPieceLen: Int,
      maxWordLen: Int): Fit = {
    var words = Bpe.wordTable(docs)
      .coalesce(graft.Settings.tuning.smallFrameParts)
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint()
    val maxLen = words.agg(max(length(col("word")))).head().getInt(0)
    require(maxLen <= maxWordLen,
      s"wordpiece.max_word_len=$maxWordLen < corpus max word $maxLen " +
        "— raise the knob (the oracle unrolls one greedy block per " +
        "position)")
    val alphabet = words.select(explode(col("syms")).as("p"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to nMerges) {
      val pairArr = when(size(col("syms")) >= 2,
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val pairs = words
        .select(col("freq"), explode(pairArr).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .filter(contentLen(col("a")) + contentLen(col("b"))
          <= maxPieceLen)
      val syms = words
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum("freq").as("c"))
      val top = pairs
        .join(syms.select(col("sym").as("a"), col("c").as("ca")), "a")
        .join(syms.select(col("sym").as("b"), col("c").as("cb")), "b")
        .withColumn("score", col("cnt").cast("double")
          / (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(col("score").desc, col("a"), col("b"))
        .limit(1).select("a", "b", "cnt", "ca", "cb", "score")
        .collect()
      require(top.nonEmpty,
        s"wordpiece.n_merges=$nMerges exhausted the admissible pairs " +
          s"at round $r (max_piece_len=$maxPieceLen)")
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      val merged = a + stripCont(b)
      merges += Merge(r, a, b, merged, top(0).getLong(2),
        top(0).getLong(3), top(0).getLong(4), top(0).getDouble(5))
      words = words
        .withColumn("syms", applyMerge(col("syms"), a, b, merged))
        .localCheckpoint()
    }
    val ms = merges.result()
    val vocab = (alphabet ++ ms.map(_.merged)).distinct.sorted
    Fit(ms, alphabet, vocab,
      segmentWords(words.select("word", "freq"), vocab, maxPieceLen))
  }

  /** Rowwise serving encode — the stream ≡ batch half (the
    * Unigram.encodeRowwise contract): per-doc piece accounting with
    * the greedy fold applied to every token in place; `[UNK]` words
    * count 1 piece and increment `n_unk_words`. Map-only, stateless,
    * the frozen vocabulary rides the plan as a map literal. */
  def encodeRowwise(docs: DataFrame, vocab: Seq[String],
      maxPieceLen: Int): DataFrame = {
    val toks = filter(TextOps.tokens(col("text")), w => w =!= "")
    val gs = transform(toks, w => greedyStruct(w, vocab, maxPieceLen))
    docs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_pieces",
        aggregate(gs, lit(0L), (a, g) => a + size(g.getField("segs"))))
      .withColumn("n_unk_words",
        aggregate(gs, lit(0L),
          (a, g) => a + g.getField("is_unk").cast("long")))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 9))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: ##-seeded vocabulary, one unrolled likelihood-
  // ranked merge round per rank, alphabet ∪ merges vocabulary, greedy
  // longest-match encode (one CTE block per greedy step).
  // ------------------------------------------------------------------

  /** One island-parity apply block (the Bpe.applyBlock formulation
    * with the merged symbol read from the merge CTE): merge
    * `mergeCte`'s (a, b) → merged into `prev`, emitting `out`. */
  private def applyBlock(prev: String, out: String, mergeCte: String,
      tag: String): String = s"""
      wpx$tag AS (
        SELECT e.word, e.freq, e.j, e.s[e.j + 1] AS sym, m.merged,
               (e.j < len(e.s) - 1 AND e.s[e.j + 1] = m.a
                 AND e.s[e.j + 2] = m.b) AS mt
        FROM (SELECT word, freq, s, unnest(range(len(s))) AS j
              FROM $prev) e, $mergeCte m),
      wpi$tag AS (
        SELECT *, j - row_number() OVER (PARTITION BY word, mt
          ORDER BY j) AS grp
        FROM wpx$tag),
      wpst$tag AS (
        SELECT *, mt AND ((j - min(j) OVER (PARTITION BY word, mt, grp))
          % 2 = 0) AS is_start
        FROM wpi$tag),
      $out AS MATERIALIZED (
        SELECT word, any_value(freq) AS freq,
               list(CASE WHEN is_start THEN merged ELSE sym END
                 ORDER BY j) AS s
        FROM (SELECT *, coalesce(lag(is_start) OVER (
                PARTITION BY word ORDER BY j), false) AS consumed
              FROM wpst$tag)
        WHERE NOT consumed GROUP BY word)"""

  /** Greedy longest-match chain under the `wpvocab(piece)` CTE over
    * word table `wordsCte(word, freq)`: state blocks `${tag}_0 ..
    * ${tag}_$maxWordLen` carrying (pos, segs, unk), each step joining
    * the ≤ `maxPieceLen` position candidates against the vocabulary
    * and keeping the longest (the engine's array_max over (l, piece)
    * verbatim — at a fixed position the piece is determined by l, so
    * the argmax is total); a word with no match trips the
    * all-or-nothing unk flag. Candidate and pick blocks MATERIALIZED
    * (each referenced twice — the DuckDB CTE-inlining trap). Ends at
    * `${tag}_fin(word, freq, segs, is_unk)` with `['[UNK]']` segs for
    * unk words. The refusal contract lives INSIDE the oracle too: a
    * word still in progress after `maxWordLen` steps (possible only
    * if a caller skipped the engine-side max_word_len require) emits
    * the `['[GREEDY_UNROLL_EXHAUSTED]']` sentinel instead of its
    * partial segs, so the hash compare fails loudly rather than
    * passing a silently truncated segmentation. */
  def greedyCtes(tag: String, wordsCte: String, maxPieceLen: Int,
      maxWordLen: Int): String = {
    val pieces = Seq.newBuilder[String]
    pieces += s"""
      ${tag}_0 AS (
        SELECT word, freq, CAST(1 AS INT) AS pos,
               CAST([] AS VARCHAR[]) AS segs, false AS unk
        FROM $wordsCte)"""
    for (s <- 1 to maxWordLen) {
      val prev = s"${tag}_${s - 1}"
      pieces += s"""
      ${tag}_c$s AS MATERIALIZED (
        SELECT x.word, x.freq, x.pos, x.segs, x.l, x.piece FROM (
          SELECT p.word, p.freq, p.pos, p.segs, c.l,
                 CASE WHEN p.pos = 1
                      THEN substr(p.word, p.pos, CAST(c.l AS INT))
                      ELSE '##' ||
                        substr(p.word, p.pos, CAST(c.l AS INT)) END
                   AS piece
          FROM $prev p, range(1, $maxPieceLen + 1) c(l)
          WHERE NOT p.unk AND p.pos <= len(p.word)
            AND p.pos + c.l - 1 <= len(p.word)) x
        JOIN wpvocab v ON v.piece = x.piece)"""
      pieces += s"""
      ${tag}_p$s AS MATERIALIZED (
        SELECT word, freq, pos, segs, l, piece FROM (
          SELECT *, row_number() OVER (PARTITION BY word
            ORDER BY l DESC) AS rn
          FROM ${tag}_c$s) WHERE rn = 1)"""
      pieces += s"""
      ${tag}_$s AS MATERIALIZED (
        SELECT word, freq, CAST(pos + l AS INT) AS pos,
               list_append(segs, piece) AS segs, false AS unk
        FROM ${tag}_p$s
        UNION ALL
        SELECT p.word, p.freq, p.pos, p.segs, true AS unk
        FROM $prev p
        WHERE NOT p.unk AND p.pos <= len(p.word)
          AND NOT EXISTS (SELECT 1 FROM ${tag}_p$s q
                          WHERE q.word = p.word)
        UNION ALL
        SELECT p.word, p.freq, p.pos, p.segs, p.unk
        FROM $prev p
        WHERE p.unk OR p.pos > len(p.word))"""
    }
    pieces += s"""
      ${tag}_fin AS MATERIALIZED (
        SELECT word, freq,
               CASE WHEN NOT unk AND pos <= len(word)
                      THEN ['[GREEDY_UNROLL_EXHAUSTED]']
                    WHEN unk THEN ['[UNK]']
                    ELSE segs END AS segs,
               unk AS is_unk
        FROM ${tag}_$maxWordLen)"""
    pieces.result().mkString(",")
  }

  /** A second word table + frozen-vocab greedy chain over a DIFFERENT
    * document slice — the incremental-encode oracle half (requires an
    * [[oracleCtes]] chain earlier in the same WITH for `wpvocab`):
    * word table `${tag}w` over `documents WHERE $docFilter`, greedy
    * chain ending at `${tag}_fin(word, freq, segs, is_unk)`. Words
    * with characters the index vocabulary never saw ride the
    * all-or-nothing `[UNK]` rule exactly as in serving. */
  def oracleEncodeCtes(tag: String, docFilter: String,
      maxPieceLen: Int, maxWordLen: Int): String = s"""
      ${tag}w AS MATERIALIZED (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(${Bpe.ToksSql}) AS word
          FROM documents WHERE $docFilter)
        WHERE word <> '' GROUP BY 1),""" +
    greedyCtes(tag, s"${tag}w", maxPieceLen, maxWordLen)

  /** The full chain over `documents`: `wpv0` (##-seeded vocabulary),
    * per-round `wpp$r`/`wpsy$r`/`wpm$r` (pair counts, symbol counts,
    * the likelihood-ranked winner) + the apply block to `wpv$r`,
    * `wpmerges` (the merge table — the engine's Fit.merges verbatim),
    * `wpvocab` (alphabet ∪ merged symbols), and the greedy encode
    * chain ending at `wpenc_fin` (Fit.wordSegs). */
  def oracleCtes(nMerges: Int, maxPieceLen: Int, maxWordLen: Int,
      docFilter: String = ""): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    val pieces = Seq.newBuilder[String]
    pieces += s"""
      wpv0 AS MATERIALIZED (
        SELECT word, count(*) AS freq,
               list_transform(range(1, len(word) + 1),
                 i -> CASE WHEN i = 1
                           THEN substr(word, CAST(i AS INT), 1)
                           ELSE '##' ||
                             substr(word, CAST(i AS INT), 1) END) AS s
        FROM (SELECT unnest(${Bpe.ToksSql}) AS word
              FROM documents$where)
        WHERE word <> '' GROUP BY word)"""
    for (r <- 1 to nMerges) {
      val prev = s"wpv${r - 1}"
      pieces += s"""
      wpp$r AS (
        SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
          SELECT freq, s[j + 1] AS a, s[j + 2] AS b FROM (
            SELECT freq, s, unnest(range(len(s) - 1)) AS j FROM $prev))
        WHERE (CASE WHEN a LIKE '##%' THEN len(a) - 2
                    ELSE len(a) END)
            + (CASE WHEN b LIKE '##%' THEN len(b) - 2
                    ELSE len(b) END) <= $maxPieceLen
        GROUP BY 1, 2)"""
      pieces += s"""
      wpsy$r AS (
        SELECT sym, CAST(sum(freq) AS BIGINT) AS c FROM (
          SELECT freq, unnest(s) AS sym FROM $prev)
        GROUP BY 1)"""
      pieces += s"""
      wpm$r AS MATERIALIZED (
        SELECT $r AS merge_rank, p.a, p.b,
               p.a || (CASE WHEN p.b LIKE '##%' THEN substr(p.b, 3)
                            ELSE p.b END) AS merged,
               p.cnt, sa.c AS ca, sb.c AS cb,
               CAST(p.cnt AS DOUBLE)
                 / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE))
                 AS score
        FROM wpp$r p JOIN wpsy$r sa ON p.a = sa.sym
                     JOIN wpsy$r sb ON p.b = sb.sym
        ORDER BY score DESC, p.a, p.b LIMIT 1)"""
      pieces += applyBlock(prev, s"wpv$r", s"wpm$r", r.toString)
    }
    val union = (1 to nMerges)
      .map(r =>
        s"SELECT merge_rank, a, b, merged, cnt, ca, cb, score FROM wpm$r")
      .mkString("\n        UNION ALL ")
    pieces += s"""
      wpmerges AS (
        $union)"""
    pieces += s"""
      wpvocab AS MATERIALIZED (
        SELECT DISTINCT sym AS piece
        FROM (SELECT unnest(s) AS sym FROM wpv0)
        UNION
        SELECT merged FROM wpmerges)"""
    pieces += greedyCtes("wpenc",
      "(SELECT word, freq FROM wpv0)", maxPieceLen, maxWordLen)
    pieces.result().mkString(",")
  }
}
