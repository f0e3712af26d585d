package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model, the production tokenizer family
  * next to BPE): a vocabulary of PIECES with log-probabilities, a word
  * segmented as the Viterbi-best piece sequence
  * argmax Σ log p(piece_i), learned by EM from a seeded substring
  * vocabulary and pruned to size.
  *
  * Deterministic variant, stated (the hash-checkable-fit discipline of
  * QualityClf/LloydKmeans/Bpe):
  *  - E-step is VITERBI-EM (hard EM): each word contributes its single
  *    best segmentation's piece counts, weighted by word frequency —
  *    the per-word Viterbi the round's serving half runs anyway.
  *    Kudo's soft expected counts need forward-backward logsumexp,
  *    whose cross-engine float-order discipline buys nothing here (the
  *    fixture fits converge identically); the argmax form keeps every
  *    E-step count an exact integer.
  *  - M-step is add-one-smoothed renormalization over the CURRENT
  *    vocabulary: p(piece) = (usage + 1) / (total + |vocab|) — unused
  *    pieces stay finitely alive (the CTE shape must not depend on
  *    which pieces died), and ln() lands behind the family's round-9
  *    libm seam, so the log-probs are bit-identical cross-engine and
  *    the Viterbi argmax (compares of sums of round-9 values in fixed
  *    position order) can never diverge.
  *  - PRUNE (after the EM rounds): keep every single-character piece
  *    (coverage — any word stays encodable) plus the top `pruneKeep`
  *    multi-character pieces by final usage (count desc, piece asc),
  *    then renormalize over the kept set. Kudo prunes by likelihood
  *    loss percentile per round; usage-count pruning is the
  *    deterministic one-shot stand-in and is spec-locked.
  *  - UNSEEN-WORD fallback at encode: characters absent from the
  *    vocabulary segment as single-char pieces at the floor log-prob
  *    `unkLp` (SentencePiece's byte-fallback analog), so the DP total
  *    is always finite and serving never throws.
  *
  * Scale shape (the BPE trick): everything runs on the DISTINCT-WORD
  * frequency table, never corpus tokens — each EM round is ONE
  * map-only segmentation pass over |vocab_words| rows (the model rides
  * the plan as a ≤(seedK + alphabet)-entry map literal, the QualityClf
  * broadcast-fit shape) plus one piece-keyed count aggregation
  * collected to ≤|pieces| driver rows. ENCODE joins corpus tokens
  * against the word → pieces table (the precomputed-encoding cache) or
  * runs the same DP expression rowwise on a stream — map-only,
  * stateless, stream ≡ batch.
  *
  * Oracle: the ENTIRE fit — seeding, every EM round's Viterbi DP
  * (unrolled one MATERIALIZED CTE per character position, fixed
  * `maxWordLen` blocks so the chain shape is data-independent; the
  * engine asserts the corpus bound), usage counts, renormalizations,
  * prune — is reproduced by [[oracleCtes]], ending in the same final
  * vocabulary table the engine emits. */
object Unigram {

  /** piece → round-9 log-probability. */
  type Vocab = Map[String, Double]

  /** Driver-side round-9 (the PinnedGmm/lsh-tune convention: libm
    * output rounded before it enters any recursion or comparison). */
  def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def lpMapCol(vocab: Vocab): Column =
    map(vocab.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Viterbi segmentation of one word column under a frozen vocab —
    * a single `aggregate` fold over character positions (map-only, no
    * shuffle, no driver loop): the accumulator carries one
    * (dp, pieces-so-far) entry per position; position j's best
    * candidate maximizes (dp, piece_len) over the ≤ maxPieceLen
    * in-vocab suffix pieces, with the single-char unk floor keeping
    * the DP total finite on unseen characters. (dp, len) ties break to
    * the LONGER piece; at fixed end position the pair (dp, len)
    * determines the piece uniquely, so the argmax is total. Returns
    * the piece array. */
  def segsCol(word: Column, vocab: Vocab, maxPieceLen: Int,
      unkLp: Double): Column = {
    val lpMap = lpMapCol(vocab)
    val folded = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0.0).as("dp"),
        array().cast("array<string>").as("segs"))),
      (acc, j) => {
        val cands = filter(
          transform(sequence(lit(1), least(lit(maxPieceLen), j)), l => {
            val piece = word.substr(j - l + 1, l)
            val prevDp = element_at(acc, j - l + 1).getField("dp")
            val lp = element_at(lpMap, piece)
            val lpv = when(l === 1, coalesce(lp, lit(unkLp)))
              .otherwise(lp)
            when(lpv.isNotNull,
              struct((prevDp + lpv).as("dp"), l.as("plen"),
                piece.as("piece")))
          }), c => c.isNotNull)
        val best = array_max(cands)
        concat(acc, array(struct(best.getField("dp").as("dp"),
          concat(
            element_at(acc, j - best.getField("plen") + 1)
              .getField("segs"),
            array(best.getField("piece"))).as("segs"))))
      })
    element_at(folded, length(word) + 1).getField("segs")
  }

  /** Per-word segmentation frame `(word, freq, segs)` under a frozen
    * vocab. */
  def segmentWords(words: DataFrame, vocab: Vocab, maxPieceLen: Int,
      unkLp: Double): DataFrame =
    words.select(col("word"), col("freq"),
      segsCol(col("word"), vocab, maxPieceLen, unkLp).as("segs"))

  /** Frequency-weighted substring occurrence counts, lengths 1 ..
    * maxPieceLen — the seed-candidate table. Map-only explode +
    * one piece-keyed aggregation. */
  def substrCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("freq"), explode(flatten(
      transform(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")))), l =>
        transform(sequence(lit(1), length(col("word")) - l + 1), i =>
          col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** The fitted model: final vocab (piece → round-9 lp), the last EM
    * round's usage counts restricted to kept pieces, and the word →
    * pieces table under the final vocab. */
  final case class Fit(vocab: Vocab, usage: Map[String, Long],
    wordSegs: DataFrame)

  /** Learn a unigram-LM vocabulary over `docs` (see object scaladoc
    * for the algorithm and every determinism pin). Driver actions:
    * 1 (bound check) + 2 (seed) + emRounds + 0 — each collecting
    * ≤ |pieces| or ≤ 2 rows. Throws when a corpus word exceeds
    * `maxWordLen` (the oracle's DP unroll bound — a data-independent
    * CTE shape requires a declared bound, exactly the BPE
    * fixed-rounds contract). */
  def learn(docs: DataFrame, seedK: Int, maxPieceLen: Int,
      emRounds: Int, pruneKeep: Int, unkLp: Double, maxWordLen: Int)
      : Fit = {
    val words = Bpe.wordTable(docs)
      .coalesce(graft.Settings.tuning.smallFrameParts).localCheckpoint()
    val maxLen = words.agg(max(length(col("word")))).head().getInt(0)
    require(maxLen <= maxWordLen,
      s"unigram.max_word_len=$maxWordLen < corpus max word $maxLen — " +
        "raise the knob (the oracle unrolls one DP block per position)")
    val sc = substrCounts(words, maxPieceLen).localCheckpoint()
    val chars = sc.filter(length(col("piece")) === 1).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val multi = sc.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedK).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val seed = chars ++ multi
    val total = seed.map(_._2).sum.toDouble
    var vocab: Vocab = seed.map { case (p, c) =>
      p -> round9(math.log(c / total))
    }.toMap
    var usage = Map.empty[String, Long]
    for (_ <- 1 to emRounds) {
      usage = segmentWords(words, vocab, maxPieceLen, unkLp)
        .select(col("freq"), explode(col("segs")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("u")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val t = vocab.keysIterator.map(usage.getOrElse(_, 0L)).sum
      val v = vocab.size
      vocab = vocab.map { case (p, _) =>
        p -> round9(math.log((usage.getOrElse(p, 0L) + 1.0) / (t + v)))
      }
    }
    val (charPieces, multiPieces) =
      vocab.keys.toSeq.partition(_.length == 1)
    val kept = charPieces ++ multiPieces
      .sortBy(p => (-usage.getOrElse(p, 0L), p)).take(pruneKeep)
    val keptUsage = kept.map(p => p -> usage.getOrElse(p, 0L)).toMap
    val tK = keptUsage.valuesIterator.sum
    val vK = kept.size
    val finalVocab: Vocab = kept.map(p =>
      p -> round9(math.log((keptUsage(p) + 1.0) / (tK + vK)))).toMap
    Fit(finalVocab, keptUsage,
      segmentWords(words, finalVocab, maxPieceLen, unkLp))
  }

  /** Rowwise serving encode — the stream ≡ batch half: per-doc piece
    * accounting with the DP expression applied to every token
    * in-place (map-only, stateless, the frozen vocab rides the plan
    * as a map literal). Identical on a batch frame and a Structured
    * Streaming micro-batch; UnigramSpec locks the parity. Returns
    * doc_id/text plus `n_words`, `n_pieces`, `fertility`. */
  def encodeRowwise(docs: DataFrame, vocab: Vocab, maxPieceLen: Int,
      unkLp: Double): DataFrame = {
    val toks = filter(TextOps.tokens(col("text")), w => w =!= "")
    val pieceCounts = transform(toks, w =>
      size(segsCol(w, vocab, maxPieceLen, unkLp)))
    docs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_pieces",
        aggregate(pieceCounts, lit(0L), (a, x) => a + x))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 9))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: seeding, EM rounds (one unrolled Viterbi-DP CTE per
  // character position), prune, final vocabulary + segmentation.
  // ------------------------------------------------------------------

  /** One unrolled Viterbi chain under vocab CTE `lpCte(piece, lp)`
    * over the word table `uw(word, freq)`: blocks `${tag}_1 ..
    * ${tag}_$maxWordLen`, each selecting per word the best (dp DESC,
    * plen DESC) extension among the ≤ maxPieceLen suffix pieces (the
    * pair determines the piece uniquely at a fixed end position —
    * the engine's array_max tie-break verbatim); l = 1 LEFT-joins the
    * vocab with the `unkLp` floor, l ≥ 2 inner-joins (piece must
    * exist). Each block MATERIALIZED: later blocks reference it up to
    * maxPieceLen times (the DuckDB CTE-inlining trap). Ends with
    * `${tag}_fin(word, freq, segs)` — each word's row taken at its
    * own length. */
  private def viterbiCtes(tag: String, lpCte: String, maxPieceLen: Int,
      maxWordLen: Int, unkLp: Double, wordsCte: String = "uw")
      : String = {
    val blocks = (1 to maxWordLen).map { j =>
      val alts = (1 to math.min(maxPieceLen, j)).map { l =>
        val start = j - l + 1
        val piece = s"substr(p.word, $start, $l)"
        if (l == 1) s"""
        SELECT p.word, p.freq,
               p.dp + coalesce(v.lp, CAST($unkLp AS DOUBLE)) AS dp,
               1 AS plen, list_append(p.segs, $piece) AS segs
        FROM ${tag}_${j - 1} p LEFT JOIN $lpCte v ON v.piece = $piece
        WHERE len(p.word) >= $j"""
        else s"""
        SELECT p.word, p.freq, p.dp + v.lp AS dp,
               $l AS plen, list_append(p.segs, $piece) AS segs
        FROM ${tag}_${j - l} p JOIN $lpCte v ON v.piece = $piece
        WHERE len(p.word) >= $j"""
      }.mkString("\n        UNION ALL")
      s"""
      ${tag}_$j AS MATERIALIZED (
        SELECT word, freq, dp, segs FROM (
          SELECT *, row_number() OVER (PARTITION BY word
            ORDER BY dp DESC, plen DESC) AS rn
          FROM ($alts)) WHERE rn = 1)"""
    }
    val fin = (1 to maxWordLen)
      .map(j => s"SELECT word, freq, segs FROM ${tag}_$j " +
        s"WHERE len(word) = $j")
      .mkString("\n        UNION ALL ")
    s"""
      ${tag}_0 AS (
        SELECT word, freq, 0.0 AS dp, CAST([] AS VARCHAR[]) AS segs
        FROM $wordsCte),""" + blocks.mkString(",") + s""",
      ${tag}_fin AS MATERIALIZED (
        $fin)"""
  }

  /** The full learning chain over `documents`: ends at
    * `uvocab(piece, usage, lp)` (the final vocabulary — the engine's
    * Fit.vocab/usage verbatim) and `uenc_fin(word, freq, segs)` (the
    * final-vocab segmentation — Fit.wordSegs). */
  def oracleCtes(seedK: Int, maxPieceLen: Int, emRounds: Int,
      pruneKeep: Int, unkLp: Double, maxWordLen: Int,
      docFilter: String = ""): String = {
    val where = if (docFilter.isEmpty) "" else s" WHERE $docFilter"
    val pieces = Seq.newBuilder[String]
    pieces += s"""
      uw AS MATERIALIZED (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(regexp_split_to_array(text, '[[:space:]]+'))
            AS word
          FROM documents$where)
        WHERE word <> '' GROUP BY 1)"""
    pieces += s"""
      usub AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
          SELECT w.freq,
                 substr(w.word, CAST(i + 1 AS INT), CAST(l + 1 AS INT))
                   AS piece
          FROM uw w, range($maxPieceLen) r1(l),
               range($maxWordLen) r2(i)
          WHERE i + l + 1 <= len(w.word))
        GROUP BY 1)"""
    pieces += s"""
      useed AS MATERIALIZED (
        SELECT piece, cnt FROM usub WHERE len(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt,
                 row_number() OVER (ORDER BY cnt DESC, piece) AS rn
          FROM usub WHERE len(piece) > 1) WHERE rn <= $seedK)"""
    pieces += s"""
      ulp0 AS MATERIALIZED (
        SELECT piece,
               round(ln(CAST(cnt AS DOUBLE) /
                 (SELECT CAST(sum(cnt) AS DOUBLE) FROM useed)), 9)
                 AS lp
        FROM useed)"""
    for (r <- 1 to emRounds) {
      pieces += viterbiCtes(s"udp$r", s"ulp${r - 1}", maxPieceLen,
        maxWordLen, unkLp)
      pieces += s"""
      uuc$r AS MATERIALIZED (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS u
        FROM (SELECT freq, unnest(segs) AS piece FROM udp${r}_fin)
        GROUP BY 1)"""
      pieces += s"""
      utv$r AS MATERIALIZED (
        SELECT CAST(sum(coalesce(u.u, 0)) AS BIGINT) AS t,
               count(*) AS v
        FROM ulp${r - 1} p LEFT JOIN uuc$r u USING (piece))"""
      pieces += s"""
      ulp$r AS MATERIALIZED (
        SELECT p.piece,
               round(ln((coalesce(u.u, 0) + 1.0) / (tv.t + tv.v)), 9)
                 AS lp
        FROM ulp${r - 1} p LEFT JOIN uuc$r u USING (piece)
        CROSS JOIN utv$r tv)"""
    }
    val R = emRounds
    pieces += s"""
      ukeep AS MATERIALIZED (
        SELECT p.piece, coalesce(u.u, 0) AS u
        FROM ulp$R p LEFT JOIN uuc$R u USING (piece)
        WHERE len(p.piece) = 1
        UNION ALL
        SELECT piece, u FROM (
          SELECT p.piece, coalesce(u.u, 0) AS u,
                 row_number() OVER (ORDER BY coalesce(u.u, 0) DESC,
                   p.piece) AS rn
          FROM ulp$R p LEFT JOIN uuc$R u USING (piece)
          WHERE len(p.piece) > 1)
        WHERE rn <= $pruneKeep)"""
    pieces += s"""
      uvocab AS MATERIALIZED (
        SELECT piece, CAST(u AS BIGINT) AS usage,
               round(ln((u + 1.0) /
                 ((SELECT CAST(sum(u) AS BIGINT) FROM ukeep)
                   + (SELECT count(*) FROM ukeep))), 9) AS lp
        FROM ukeep)"""
    pieces += viterbiCtes("uenc", "uvocab", maxPieceLen, maxWordLen,
      unkLp)
    pieces.result().mkString(",")
  }

  /** A second word table + frozen-vocab Viterbi chain over a DIFFERENT
    * document slice — the incremental-encode oracle half (requires an
    * [[oracleCtes]] chain earlier in the same WITH for `uvocab`):
    * word table `${tag}w` over `documents WHERE $docFilter`, DP chain
    * ending at `${tag}_fin(word, freq, segs)`. Unknown characters ride
    * the `unkLp` floor exactly as in training — the unseen-word
    * fallback, exercised end-to-end by the oracle. */
  def oracleEncodeCtes(tag: String, docFilter: String,
      maxPieceLen: Int, maxWordLen: Int, unkLp: Double): String = s"""
      ${tag}w AS MATERIALIZED (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(regexp_split_to_array(text, '[[:space:]]+'))
            AS word
          FROM documents WHERE $docFilter)
        WHERE word <> '' GROUP BY 1),""" +
    viterbiCtes(tag, "uvocab", maxPieceLen, maxWordLen, unkLp,
      wordsCte = s"${tag}w")
}
