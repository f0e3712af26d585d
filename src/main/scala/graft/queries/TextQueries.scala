package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text.{Dedup, Similarity, TextOps}

/** LLM-training-data-pipeline operators over `documents` and `embeddings`:
  * text analysis (tokens, quality, language-ID, fingerprints), dedup
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash), and similarity search
  * (brute-force cosine top-k, LSH-bucketed ANN). All signatures use
  * portable md5-derived hashes, so every operator — including MinHash and
  * SimHash — has an exact SQL oracle.
  */
object TextQueries extends QueryModule {

  // ---- live Settings views (graft.Settings `ann:` / `dedup:` blocks):
  // defs, not vals, so an override re-interpolates BOTH the engine
  // plans and the oracle SQL below (the registry-as-def desync-proof
  // pattern the hardening/calibration families use). The memoized
  // fitted artifacts (codebooks, stages) are keyed per sf dir and are
  // NOT invalidated by an override — override before first use.
  private[queries] def AnnQ = graft.Settings.ann.nQueries
  private[queries] def AnnK = graft.Settings.ann.topK
  private[queries] def PqM = graft.Settings.ann.pqM
  private[queries] def PqSubK = graft.Settings.ann.pqSubK
  private[queries] def PqSubDim = graft.Settings.ann.pqSubDim
  private[queries] def IvfNCells = graft.Settings.ann.ivfNCells
  private[queries] def IvfNProbe = graft.Settings.ann.ivfNProbe
  private[queries] def CoarseIters = graft.Settings.ann.ivfCoarseIters
  private[queries] def IncrBase = graft.Settings.ann.incrBase
  private[queries] def JaccN = graft.Settings.dedup.jaccardNgramN
  private[queries] def JaccMaxFreq = graft.Settings.dedup.jaccardMaxFreq
  private[queries] def JaccMinSim = graft.Settings.dedup.jaccardMinSim
  private[queries] def SimhashRadius = graft.Settings.dedup.simhashRadius
  private[queries] def SubstrK = graft.Settings.dedup.substrK

  /** MinHash-LSH (bands, rowsPerBand), DERIVED from the live
    * `dedup.jaccard.min_jaccard` threshold via the S-curve
    * (Dedup.deriveBanding) — every banded consumer (the pair stage,
    * the component map, the incremental classifier) and every oracle
    * band CTE reads this ONE layout, so an override of the threshold
    * re-bands engine and oracle in lockstep. At the default 0.04
    * threshold this is (8, 1); the r8-r9 fixed (4, 2) layout was an
    * s ≈ 0.5 tuning. */
  private[queries] def LshLayout: (Int, Int) =
    Dedup.deriveBanding(TextOps.MinHashParams.size, JaccMinSim)

  /** Component-edge verification bar over the banded candidates (the
    * recall/precision split: banding recalls, est_sim verifies). */
  private[queries] def CompMinEst = graft.Settings.dedup.componentMinEst

  private[queries] def WinnowK = graft.Settings.dedup.winnowK
  private[queries] def WinnowW = graft.Settings.dedup.winnowWindow
  private[queries] def WinnowMaxFreq = graft.Settings.dedup.winnowMaxFreq
  private[queries] def WinnowStripMin =
    graft.Settings.dedup.winnowStripMinMatches
  private[queries] def WinnowMinShared =
    graft.Settings.dedup.winnowMinShared

  /** Shared winnowed-fingerprint stage (Winnow.fingerprints at the
    * live `dedup.winnow.*` knobs) — the stored per-doc artifact both
    * the fingerprint report and the overlap pairs read. */
  private[queries] def winnowFps(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "winnow_fps") {
      graft.text.Winnow.fingerprints(t(s, dir, "documents"),
        k = WinnowK, w = WinnowW)
    }

  /** Shared fingerprint-overlap pair stage (prune + holder expansion
    * at the live winnow knobs) — read by the pair report and the
    * alignment report so the expansion runs once. */
  private[queries] def winnowPairs(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "winnow_pairs") {
      graft.text.Winnow.fingerprintPairsFrom(winnowFps(s, dir),
        maxFreq = WinnowMaxFreq, minShared = WinnowMinShared)
    }

  private[queries] def CdcK = graft.Settings.dedup.cdcK
  private[queries] def CdcDivisor = graft.Settings.dedup.cdcDivisor

  /** Shared CDC chunk stage (Cdc.chunks at the live `dedup.cdc.*`
    * knobs) — the stored per-doc chunk-fingerprint artifact both the
    * chunk report and the dedup accounting read. */
  private[queries] def cdcChunks(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "cdc_chunks") {
      graft.text.Cdc.chunks(t(s, dir, "documents"),
        k = CdcK, divisor = CdcDivisor)
    }

  /** DuckDB CTE chain mirroring [[pplBucketed]]'s inputs (bigram-LM
    * per-doc perplexity + per-lang ceil-rank tercile cuts) — ends at
    * `pb_d(doc_id, lang, n_bigrams, ppl)` and `pb_cut(lang, cut1,
    * cut2)`; consumers apply [[pplBucketCase]]. Shared by the
    * q_t_ppl_buckets oracle and the dedup pipeline's quality stage. */
  private def pplCtes: String = s"""
      pb_b AS (
        SELECT doc_id, lang,
               regexp_split_to_array(text, '[[:space:]]+') AS t
        FROM documents),
      pb_tk AS (SELECT doc_id, unnest(t) AS tok FROM pb_b),
      pb_c1 AS (SELECT tok, count(*) AS c1 FROM pb_tk GROUP BY 1),
      pb_voc AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM pb_c1),
      pb_bg AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(len(t) - 1), i -> t[i+1]))
                 AS w1,
               unnest(list_transform(range(len(t) - 1),
                 i -> t[i+1] || ' ' || t[i+2])) AS bg
        FROM pb_b),
      pb_c2 AS (SELECT bg, count(*) AS c2 FROM pb_bg GROUP BY 1),
      pb_sc AS (
        SELECT g.doc_id, g.lang,
               ln((c2.c2 + 1.0) / (c1.c1 + voc.v)) AS lp
        FROM pb_bg g JOIN pb_c2 c2 ON g.bg = c2.bg
                     JOIN pb_c1 c1 ON g.w1 = c1.tok
        CROSS JOIN pb_voc voc),
      pb_d AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(exp(-avg(lp)), 6) AS ppl
        FROM pb_sc GROUP BY 1, 2),
      pb_r AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM pb_d),
      pb_cut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM pb_r GROUP BY 1)"""

  /** The bucket CASE over `pb_d d JOIN pb_cut c` aliases. */
  private def pplBucketCase: String = """
      CASE WHEN d.ppl <= c.cut1 THEN 'head'
           WHEN d.ppl <= c.cut2 THEN 'middle'
           ELSE 'tail' END""".trim

  /** Per-doc perplexity buckets `(doc_id, lang, n_bigrams, ppl,
    * ppl_bucket)` over the shared bigram-LM stage — read by the
    * q_t_ppl_buckets report AND the dedup pipeline's quality gate, so
    * the two can never drift. */
  private[queries] def pplBucketed(s: SparkSession, dir: String)
      : DataFrame = {
    val d = bigramLp(s, dir).select(col("doc_id"), col("lang"),
      col("n_bigrams"), round(exp(-col("avg_lp")), 6).as("ppl"))
    val cuts = d.groupBy("lang").agg(
      percentile_approx(col("ppl"), array(lit(1.0 / 3), lit(2.0 / 3)),
        lit(1000000)).as("qs"))
    d.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("ppl"),
        when(col("ppl") <= element_at(col("qs"), 1), "head")
          .when(col("ppl") <= element_at(col("qs"), 2), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** DuckDB CTE chain mirroring Cdc.chunks at the live knobs: per-char
    * code points (byte ≡ code point on the ASCII fixture — the
    * winnow/phash contract), per-position polynomial k-gram hashes via
    * the same coefficient table the O(len) rolling engine expression
    * realizes (the oracle pays the O(len·k) direct form), content cuts
    * where h % divisor = 0, spans via lead(), salted chunk-text
    * fingerprints. Ends at `cdck(doc_id, chunk_idx, start_pos,
    * chunk_len, chunk_fp)`. */
  private def cdcCtes: String = {
    val (k, d) = (CdcK, CdcDivisor)
    val coefs = {
      val out = new Array[Long](k)
      out(k - 1) = 1L
      for (j <- k - 2 to 0 by -1)
        out(j) = out(j + 1) * graft.functions.RollingHashes.Base %
          graft.functions.RollingHashes.Prime
      out.mkString(", ")
    }
    s"""
      cdch AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents),
      cdrh AS (
        SELECT a.doc_id, a.i AS pos,
               CAST(sum(CAST(b.cv AS BIGINT) * ([$coefs])[b.i - a.i + 1])
                 % 1000000007 AS BIGINT) AS h
        FROM cdch a JOIN cdch b ON a.doc_id = b.doc_id
          AND b.i BETWEEN a.i AND a.i + ${k - 1}
        WHERE a.i <= a.n - $k
        GROUP BY 1, 2),
      cdbnd AS (
        SELECT doc_id, 0 AS b FROM documents
        UNION
        SELECT doc_id, pos + $k AS b FROM cdrh WHERE h % $d = 0
        UNION
        SELECT doc_id, len(text) AS b FROM documents),
      cdsp AS (
        SELECT doc_id, b AS s,
               lead(b) OVER (PARTITION BY doc_id ORDER BY b) AS e
        FROM cdbnd),
      cdck AS (
        SELECT c.doc_id,
               CAST(row_number() OVER (PARTITION BY c.doc_id
                 ORDER BY c.s) AS INT) AS chunk_idx,
               CAST(c.s AS INT) AS start_pos,
               CAST(c.e - c.s AS INT) AS chunk_len,
               ${hsql(s"'cdc_' || substr(t.text, c.s + 1, c.e - c.s)")}
                 AS chunk_fp
        FROM cdsp c JOIN documents t USING (doc_id)
        WHERE c.e IS NOT NULL)"""
  }

  /** Live KN discount knob + shared Kneser-Ney scoring stage — read
    * by the KN report (q_t_kn_lp) and the KN perplexity bucketer
    * (q_t_ppl_buckets_kn) so the count shuffles run once. */
  private[queries] def KnDiscount = graft.Settings.lm.knDiscount
  private[queries] def knLp(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "kn_lp") {
      graft.text.KneserNey.scoreBigrams(t(s, dir, "documents"),
        KnDiscount)
    }

  /** Per-doc KN perplexity buckets `(doc_id, lang, n_bigrams, ppl,
    * ppl_bucket)` over the shared KN stage (per-language ceil-rank
    * terciles — the pplBucketed contract applied to the KN scorer) —
    * read by the KN bucket report, BOTH agreement matrices, and the
    * curation gate, so the four can never drift. */
  private[queries] def knBucketed(s: SparkSession, dir: String)
      : DataFrame = {
    val d = knLp(s, dir).select(col("doc_id"), col("lang"),
      col("n_bigrams"), round(exp(-col("avg_lp")), 6).as("ppl"))
    val cuts = d.groupBy("lang").agg(
      percentile_approx(col("ppl"), array(lit(1.0 / 3), lit(2.0 / 3)),
        lit(1000000)).as("qs"))
    d.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("ppl"),
        when(col("ppl") <= element_at(col("qs"), 1), "head")
          .when(col("ppl") <= element_at(col("qs"), 2), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Shared interpolated-KN TRIGRAM scoring stage (the KenLM order
    * family above the bigram rung) — read by the kn3 report and the
    * bigram-vs-trigram bucket-movement row. */
  private[queries] def kn3Lp(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "kn3_lp") {
      graft.text.KneserNey.scoreTrigrams(t(s, dir, "documents"),
        KnDiscount)
    }

  /** Pruned-table KN trigram scoring at count threshold θ (KenLM
    * filter — KneserNey.scoreTrigramsPruned), one stage per frontier
    * rung. */
  private[queries] def KnPruneRungs = graft.Settings.lm.knPruneRungs
  private[queries] def kn3PrunedLp(s: SparkSession, dir: String,
      theta: Long): DataFrame =
    Stage.cached(s, dir, s"kn3_pruned_$theta") {
      graft.text.KneserNey.scoreTrigramsPruned(t(s, dir, "documents"),
        KnDiscount, theta)
    }

  /** The trigram TYPE table — sized by the pruning frontier row. */
  private[queries] def kn3Counts(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "kn3_counts") {
      graft.text.KneserNey.trigramCounts(t(s, dir, "documents"))
    }

  /** Live Stupid-Backoff knobs + shared scoring stage: counts from
    * the standing index slice (doc_id % 5 ≠ 0, the family's batch
    * convention), scores over the incoming slice — read by the SB
    * report (q_t_sb_lp) and the backoff-mix row
    * (q_t_sb_backoff_mix) so the three count shuffles run once. */
  private[queries] def SbAlpha = graft.Settings.lm.sbAlpha
  private[queries] def SbUnk = graft.Settings.lm.sbUnk
  private[queries] def sbLp(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "sb_lp") {
      val docs = t(s, dir, "documents")
      graft.text.StupidBackoff.scoreTrigrams(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0), SbAlpha, SbUnk)
    }
  private[queries] def sbCtes: String =
    graft.text.StupidBackoff.oracleCtes(SbAlpha, SbUnk,
      "doc_id % 5 <> 0", "doc_id % 5 = 0")

  /** Shared bigram-LM per-doc scoring stage `(doc_id, lang, n_bigrams,
    * avg_lp, min_lp)` with RAW doubles (consumers round at the emit
    * boundary) — read by the bigram report (q_t_bigram_lp) and the
    * CCNet-style perplexity bucketer (q_t_ppl_buckets) so the two
    * count shuffles run once. */
  private[queries] def bigramLp(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "bigram_lp") {
      val b = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.tokens(col("text")).as("t"))
      val tk = b.select(col("doc_id"), explode(col("t")).as("tok"))
      val c1 = tk.groupBy("tok").agg(count(lit(1)).as("c1"))
      val voc = c1.agg(count(lit(1)).cast("double").as("v"))
      // sub-2-token docs have no bigrams (sequence would count down)
      val bgArr = when(size(col("t")) >= 2,
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("w1"),
            concat_ws(" ", element_at(col("t"), i + 1),
              element_at(col("t"), i + 2)).as("bg"))))
        .otherwise(array().cast("array<struct<w1:string,bg:string>>"))
      val bg = b.select(col("doc_id"), col("lang"), explode(bgArr).as("x"))
        .select(col("doc_id"), col("lang"), col("x.w1").as("w1"),
          col("x.bg").as("bg"))
      val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
      val lp = log((col("c2") + 1.0) / (col("c1") + col("v")))
      bg.join(c2, "bg").join(c1, col("w1") === col("tok"))
        .crossJoin(broadcast(voc))
        .groupBy("doc_id", "lang").agg(
          count(lit(1)).as("n_bigrams"),
          avg(lp).as("avg_lp"),
          min(lp).as("min_lp"))
    }

  /** DuckDB CTE chain mirroring Winnow.fingerprints: per-char code
    * points (byte ≡ code point on the ASCII fixture — the engine
    * hashes UTF-8 bytes, the phash/simhash contract), per-position
    * polynomial k-gram hashes via the same coefficient table the
    * O(len) rolling engine expression uses (the oracle pays the
    * O(len·k) direct form — fine at gate scale), robust-winnowing
    * window minima (ties → rightmost), distinct selections. */
  private def winnowCtes: String = {
    val (k, w) = (WinnowK, WinnowW)
    // B^(k-1-j) mod P for j = 0..k-1 — the exact coefficients the
    // rolling recurrence realizes
    val coefs = {
      val out = new Array[Long](k)
      out(k - 1) = 1L
      for (j <- k - 2 to 0 by -1)
        out(j) = out(j + 1) * graft.functions.RollingHashes.Base %
          graft.functions.RollingHashes.Prime
      out.mkString(", ")
    }
    s"""
      wch AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents),
      wrh AS (
        SELECT a.doc_id, a.i AS pos,
               CAST(sum(CAST(b.cv AS BIGINT)
                   * ([$coefs])[b.i - a.i + 1])
                 % 1000000007 AS BIGINT) AS h
        FROM wch a JOIN wch b ON a.doc_id = b.doc_id
          AND b.i BETWEEN a.i AND a.i + ${k - 1}
        WHERE a.i <= a.n - $k
        GROUP BY 1, 2),
      wcand AS (
        SELECT we.doc_id, we.e, r.h, r.pos
        FROM (SELECT doc_id, pos AS e FROM wrh WHERE pos >= ${w - 1}) we
        JOIN wrh r ON r.doc_id = we.doc_id
          AND r.pos BETWEEN we.e - ${w - 1} AND we.e),
      wfp AS (
        SELECT DISTINCT doc_id, pos AS fp_pos, h FROM (
          SELECT doc_id, e, h, pos,
                 row_number() OVER (PARTITION BY doc_id, e
                   ORDER BY h, pos DESC) AS rn
          FROM wcand) WHERE rn = 1)"""
  }

  private[queries] def BpeMerges = graft.Settings.bpe.nMerges

  /** Learned BPE artifacts (merge table + final word → symbols
    * vocabulary), memoized per sf dir like the fitted ANN codebooks —
    * a tokenizer is trained once and shipped to every consumer. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.text.Bpe.Merge], DataFrame)]
  private[queries] def bpeLearned(s: SparkSession, dir: String)
      : (Seq[graft.text.Bpe.Merge], DataFrame) =
    bpeMemo.getOrElseUpdate(dir,
      graft.text.Bpe.learn(t(s, dir, "documents"), BpeMerges))

  /** The word → subword-pieces table as a Stage-managed frame (it is
    * already localCheckpoint'd by the learn loop; registering it under
    * Stage lets warmup build it and Stage.clear release it). */
  private[queries] def bpeVocab(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "bpe_vocab") { bpeLearned(s, dir)._2 }

  /** The byte-level corpus: the ASCII documents text under the
    * deterministic multilingual derivation (Bpe.multiText — vowels of
    * a prefix become 2/3/4-byte UTF-8 code points), so the byte
    * family actually exercises multi-byte input. Every original
    * ASCII word remains present (the derivation APPENDS the mutated
    * prefix). */
  private[queries] def byteDocs(s: SparkSession, dir: String)
      : DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      graft.text.Bpe.multiText(col("text")).as("text"))

  /** Byte-level BPE artifacts (GPT-2 alphabet — Bpe.learnBytes over
    * real UTF-8 bytes of [[byteDocs]]), memoized per sf dir like the
    * char-level fit. */
  private val bpeBytesMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.text.Bpe.Merge], DataFrame)]
  private[queries] def bpeBytesLearned(s: SparkSession, dir: String)
      : (Seq[graft.text.Bpe.Merge], DataFrame) =
    bpeBytesMemo.getOrElseUpdate(dir,
      graft.text.Bpe.learnBytes(byteDocs(s, dir), BpeMerges))

  private[queries] def bpeBytesVocab(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "bpe_bytes_vocab") { bpeBytesLearned(s, dir)._2 }

  // ---- Unigram-LM (SentencePiece) tokenizer: live knobs, memoized
  // fit, oracle chain

  private[queries] def UniSeed = graft.Settings.unigram.seedMulti
  private[queries] def UniL = graft.Settings.unigram.maxPieceLen
  private[queries] def UniRounds = graft.Settings.unigram.emRounds
  private[queries] def UniKeep = graft.Settings.unigram.pruneKeep
  private[queries] def UniUnk = graft.Settings.unigram.unkLogprob
  private[queries] def UniMaxW = graft.Settings.unigram.maxWordLen

  /** Fitted unigram model, memoized per sf dir (the bpeLearned
    * contract — trained once, shipped to every consumer). */
  private val uniMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.text.Unigram.Fit]
  private[queries] def uniLearned(s: SparkSession, dir: String)
      : graft.text.Unigram.Fit =
    uniMemo.getOrElseUpdate(dir,
      graft.text.Unigram.learn(t(s, dir, "documents"), UniSeed, UniL,
        UniRounds, UniKeep, UniUnk, UniMaxW))

  private[queries] def unigramCtes: String =
    graft.text.Unigram.oracleCtes(UniSeed, UniL, UniRounds, UniKeep,
      UniUnk, UniMaxW)

  /** Index-slice unigram fit (doc_id % 5 ≠ 0 — the family's standing
    * batch convention) — the frozen artifact the incremental encode
    * serves from. */
  private val uniIncrMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.text.Unigram.Fit]
  private[queries] def uniIncrLearned(s: SparkSession, dir: String)
      : graft.text.Unigram.Fit =
    uniIncrMemo.getOrElseUpdate(dir,
      graft.text.Unigram.learn(
        t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0),
        UniSeed, UniL, UniRounds, UniKeep, UniUnk, UniMaxW))

  // ---- NN-Descent kNN graph: live knobs, shared stage, oracle chain

  private[queries] def NndK = graft.Settings.nndescent.k
  private[queries] def NndRounds = graft.Settings.nndescent.rounds

  /** Built NN-Descent graph (NnDescent.build at the live `nndescent.*`
    * knobs) — the stored kNN-graph artifact both the graph report and
    * the recall row read. */
  private[queries] def nndGraph(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "nnd_graph") {
      graft.text.NnDescent.build(t(s, dir, "embeddings"), NndK,
        NndRounds)
    }

  private[queries] def nndCtes: String =
    graft.text.NnDescent.oracleCtes(NndK, NndRounds)

  /** ALL-nodes exact top-k truth (the recall denominator — the
    * deliberately-quadratic fixture-only baseline), staged so the
    * recall row reads a cached artifact instead of re-running the
    * brute force per invocation. */
  private[queries] def nndTruth(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "nnd_truth") {
      graft.text.Similarity.cosineTopK(t(s, dir, "embeddings"),
        lit(true), NndK).select(col("qid").as("node"),
        col("vid").as("nbr"))
    }

  private[queries] def NndBeam = graft.Settings.nndescent.beam
  private[queries] def NndHops = graft.Settings.nndescent.hops

  private[queries] def MrlDims = graft.Settings.ann.mrlDims

  // ---- power-iteration PCA: live knobs, memoized fit, oracle chain

  private[queries] def PcaComps = graft.Settings.pca.components
  private[queries] def PcaIters = graft.Settings.pca.iters

  /** Fitted PCA, memoized per sf dir (the broadcast-fit contract —
    * trained once, shipped to every consumer). */
  private val pcaMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.ml.PowerPca.Fit]
  private[queries] def pcaFitted(s: SparkSession, dir: String)
      : graft.ml.PowerPca.Fit =
    pcaMemo.getOrElseUpdate(dir, {
      def fit() = graft.ml.PowerPca.fit(t(s, dir, "embeddings"),
        PcaComps, PcaIters,
        // pcaCtes unrolls the oracle for exactly this dimension —
        // the same silent-divergence coupling the dimred arm guards
        expectDims = Some(graft.Settings.ann.embeddingDim))
      // stored model artifact (exact text codec — hit and miss both
      // deserialize the stored bytes; the fit is the second-largest
      // warmup build, 35 s at sf0.1)
      if (Artifacts.enabledFor(dir))
        graft.ml.PowerPca.loadFit(
          Artifacts.persistedText(dir, "pca_fit")(
            graft.ml.PowerPca.saveFit(fit())))
      else fit()
    })

  private[queries] def pcaCtes: String =
    graft.ml.PowerPca.oracleCtes(PcaComps, PcaIters,
      dims = graft.Settings.ann.embeddingDim)

  // ---- dimred-consumed ANN A/B: live knobs, per-arm reduced frames,
  // staged IVF-flat results over each reduction

  private[queries] def DimredDim = graft.Settings.ann.dimredDim
  private[queries] def DimredPcaIters =
    graft.Settings.ann.dimredPcaIters

  /** PCA fit at the A/B's matched dimension (dimred.dim components ×
    * dimred.pca_iters rounds), memoized per sf dir. */
  private val pcaDrMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.ml.PowerPca.Fit]
  private[queries] def pcaDrFitted(s: SparkSession, dir: String)
      : graft.ml.PowerPca.Fit =
    pcaDrMemo.getOrElseUpdate(dir,
      graft.ml.PowerPca.fit(t(s, dir, "embeddings"), DimredDim,
        DimredPcaIters,
        expectDims = Some(graft.Settings.ann.embeddingDim)))

  /** The reduced (vec_id, rv) frame of one A/B arm at the matched
    * dimension — mrl: raw prefix slice; rp: md5-sign J-L projection,
    * round-6 seam; pca: fitted projections, round-6 seam. */
  private[queries] def dimredReduced(s: SparkSession, dir: String,
      method: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val dIn = graft.Settings.ann.embeddingDim
    method match {
      case "mrl" => emb.select(col("vec_id"),
        slice(col("embedding"), 1, DimredDim).cast("array<double>")
          .as("rv"))
      case "rp" => emb.select(col("vec_id"),
        transform(graft.text.RandomProjection.project(
          col("embedding").cast("array<double>"), dIn, DimredDim),
          y => round(y, 6)).as("rv"))
      case "pca" =>
        val fit = pcaDrFitted(s, dir)
        val proj = graft.ml.PowerPca.projectRowwise(emb, fit)
        proj.select(col("vec_id"),
          array((0 until DimredDim).map(c => col(s"p$c")): _*)
            .as("rv"))
    }
  }

  /** One A/B arm's IVF-flat serving over its reduced frame: Lloyd
    * coarse cells fitted IN the reduced space (seed-slice init,
    * hash-checkable), queries probe their n_probe nearest cells by
    * round-6 exact L2, exact reduced-space cosine inside probed
    * cells only, top-k — plus `n_cands`, the probed-candidate count
    * (the arm's serving cost). */
  private[queries] def dimredArm(s: SparkSession, dir: String,
      method: String): DataFrame =
    Stage.cached(s, dir, s"dimred_$method") {
      val spark = s
      import spark.implicits._
      val red = dimredReduced(s, dir, method).localCheckpoint()
      val (assign, cents) = graft.ml.LloydKmeans.fit(red, "vec_id",
        "rv", IvfNCells, CoarseIters)
      val centDf = cents.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "cv")
      val nr = red.withColumn("nrm",
        Similarity.norm(col("rv"))).localCheckpoint()
      val q = nr.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("rv").as("qrv"),
          col("nrm").as("qnrm"))
      val probe = q.crossJoin(broadcast(centDf))
        .withColumn("d2", graft.functions.VecOps.sqDist18(col("qrv"),
          col("cv")))
        .withColumn("rn", row_number().over(Window.partitionBy("qid")
          .orderBy(round(col("d2"), 6), col("cell"))))
        .filter(col("rn") <= IvfNProbe)
        .select("qid", "qrv", "qnrm", "cell")
      val cands = probe.join(
          assign.select(col("pid").as("vid"),
            col("cluster").as("cell")), Seq("cell"))
        .filter(col("vid") =!= col("qid"))
        .join(nr.select(col("vec_id").as("vid"), col("rv").as("vrv"),
          col("nrm").as("vnrm")), Seq("vid"))
      val scored = cands.select(col("qid"), col("vid"),
        round(Similarity.cosinePre(col("qrv"), col("vrv"),
          col("qnrm"), col("vnrm")), 6).as("cos_sim"))
      val nc = scored.groupBy("qid")
        .agg(count(lit(1)).as("n_cands"))
      scored.withColumn("rnk", row_number().over(
          Window.partitionBy("qid")
            .orderBy(col("cos_sim").desc, col("vid"))))
        .filter(col("rnk") <= AnnK)
        .join(nc, Seq("qid"))
        .select(col("qid"), col("vid"), col("cos_sim"), col("rnk"),
          col("n_cands"))
    }

  /** One arm's oracle chain over a reduced source CTE `src(pid, j,
    * x)`: norms, the unrolled Lloyd coarse fit (seed-slice init — the
    * engine's LloydKmeans verbatim via oracleSqlFrom), the query
    * probe (n_probe nearest cells by round-6 exact L2), probed-cell
    * candidates, reduced-space cosine, top-k and the candidate-count
    * cost. Ends at `${pfx}tk(qid, vid)` and `${pfx}nc(qid,
    * n_cands)`. */
  private def dimredArmCtes(pfx: String, src: String): String =
    s"""
      ${pfx}nr AS MATERIALIZED (
        SELECT pid, sqrt(sum(x*x)) AS nrm FROM $src GROUP BY 1),""" +
    graft.ml.LloydKmeans.oracleSqlFrom(src, IvfNCells, CoarseIters,
      pfx) +
    graft.ml.LloydKmeans.finalAssignSql(src, CoarseIters, pfx) + s""",
      ${pfx}pb AS (
        SELECT pid AS qid, c AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY pid
            ORDER BY round(d2, 6), c) AS rn
          FROM ${pfx}kd_fin WHERE pid < 8) WHERE rn <= $IvfNProbe),
      ${pfx}cd AS MATERIALIZED (
        SELECT p.qid, a.pid AS vid
        FROM ${pfx}pb p JOIN ${pfx}kassign a
          ON a.cluster = p.cell AND a.pid <> p.qid),
      ${pfx}nc AS (
        SELECT qid, CAST(count(*) AS BIGINT) AS n_cands
        FROM ${pfx}cd GROUP BY 1),
      ${pfx}dt AS (
        SELECT c.qid, c.vid, sum(qa.x * eb.x) AS dot
        FROM ${pfx}cd c JOIN $src qa ON qa.pid = c.qid
                        JOIN $src eb ON eb.pid = c.vid
                          AND eb.j = qa.j
        GROUP BY 1, 2),
      ${pfx}sc AS MATERIALIZED (
        SELECT d.qid, d.vid,
               round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM ${pfx}dt d JOIN ${pfx}nr na ON na.pid = d.qid
                        JOIN ${pfx}nr nb ON nb.pid = d.vid),
      ${pfx}tk AS MATERIALIZED (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY cos_sim DESC, vid) AS rn FROM ${pfx}sc)
        WHERE rn <= $AnnK)"""

  /** Served beam-search results over the built graph (qid, vid,
    * cos_sim, rnk, n_scored) — read by the serve row and the
    * recall-vs-cost row. */
  private[queries] def nndServed(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "nnd_served") {
      graft.text.NnDescent.serve(t(s, dir, "embeddings"),
        nndGraph(s, dir), col("vec_id") < 8, AnnK, NndBeam, NndHops)
    }

  private[queries] def nndServeCtes: String =
    graft.text.NnDescent.oracleServeCtes(NndRounds, AnnK, NndBeam,
      NndHops)

  // ---- HNSW-style hierarchy over the NN-Descent graph: live knobs,
  // staged layer graphs, staged hierarchical serve

  private[queries] def HnswRatio = graft.Settings.nndescent.hnswRatio
  private[queries] def HnswLevels = graft.Settings.nndescent.hnswLevels
  private[queries] def HnswUpRounds =
    graft.Settings.nndescent.hnswUpRounds
  private[queries] def HnswUpBeam = graft.Settings.nndescent.hnswUpBeam
  private[queries] def HnswUpHops = graft.Settings.nndescent.hnswUpHops
  private[queries] def HnswBeam = graft.Settings.nndescent.hnswBeam
  private[queries] def HnswHops = graft.Settings.nndescent.hnswHops

  /** Layer graphs 1..hnsw_levels (NnDescent.buildLayers), one Stage
    * artifact per level. */
  private[queries] def hnswLayers(s: SparkSession, dir: String)
      : Seq[DataFrame] =
    (1 to HnswLevels).map { l =>
      Stage.cached(s, dir, s"hnsw_layer$l") {
        graft.text.NnDescent.buildSubset(
          t(s, dir, "embeddings").filter(
            graft.text.NnDescent.layerPred(col("vec_id"), l,
              HnswRatio)),
          NndK, HnswUpRounds, salt = s"hnswb$l")
      }
    }

  /** Hierarchically-served results at explicit descent knobs (qid,
    * vid, cos_sim, rnk, n_scored), staged per rung — the frontier
    * rungs and the default serve share the layer graphs and, when a
    * rung equals the defaults, the same stage. */
  private[queries] def hnswServedAt(s: SparkSession, dir: String,
      ub: Int, uh: Int): DataFrame =
    Stage.cached(s, dir, s"hnsw_served_${ub}_$uh") {
      graft.text.NnDescent.serveHier(t(s, dir, "embeddings"),
        nndGraph(s, dir), hnswLayers(s, dir), col("vec_id") < 8,
        AnnK, ub, uh, HnswBeam, HnswHops, HnswRatio)
    }

  /** Hierarchically-served results at the LIVE knobs — read by the
    * serve row, the recall row, and the flat-vs-hier A/B. */
  private[queries] def hnswServed(s: SparkSession, dir: String)
      : DataFrame = hnswServedAt(s, dir, HnswUpBeam, HnswUpHops)

  /** DiskANN-style graph+PQ served results (NnDescent.serveHierPq —
    * the same hierarchical descent with every hop ADC-scored over the
    * PQ codes, exact re-rank of the final beam), read by the serve
    * row and the float-vs-PQ A/B. The traversal is guided by the
    * Lloyd-FITTED codebook (the consume-what-you-fitted discipline —
    * seed-slice ADC misguides the beam badly enough to halve
    * recall). */
  private[queries] def hnswPqServed(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "hnsw_pq_served") {
      graft.text.NnDescent.serveHierPq(t(s, dir, "embeddings"),
        nndGraph(s, dir), hnswLayers(s, dir), col("vec_id") < 8,
        AnnK, HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
        PqM, PqSubK, RerankR, codebook = Some(lloydCb(s, dir)))
    }

  private[queries] def hnswPqServeChainCtes: String =
    graft.text.NnDescent.oracleHierServePqCtes(NndRounds, AnnK,
      HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
      HnswLevels, HnswUpRounds, PqM, PqSubK, PqSubDim, RerankR,
      lloydIters = PqLloydIters)

  // ---- OPQ levers for the graph+PQ serve: a structured rotation
  // (Srht — energy-spreading before the subspace split, the Ge et al.
  // 2013 lever in its deterministic Hadamard form) and a wider-m rung
  // (2·pq.m subspaces = twice the bits/vector) ----

  /** The corpus under the SRHT rotation — same vec_ids, rotated
    * coordinates (round-6 seam). Only the PQ quantizer consumes this
    * frame; graph, entries and exact re-rank stay on the original. */
  private[queries] def opqRotated(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "opq_rotated") {
      val d = graft.Settings.ann.embeddingDim
      t(s, dir, "embeddings").select(col("vec_id"),
        graft.text.Srht.rotate(
          col("embedding").cast("array<double>"), d).as("embedding"))
    }

  private val lloydCbRotMemo = scala.collection.concurrent.TrieMap
    .empty[String, IndexedSeq[IndexedSeq[Array[Double]]]]
  private[queries] def lloydCbRot(s: SparkSession, dir: String)
      : IndexedSeq[IndexedSeq[Array[Double]]] =
    lloydCbRotMemo.getOrElseUpdate(dir,
      Similarity.lloydCodebook(opqRotated(s, dir), m = PqM,
        subK = PqSubK, iters = PqLloydIters))

  private val lloydCbWideMemo = scala.collection.concurrent.TrieMap
    .empty[String, IndexedSeq[IndexedSeq[Array[Double]]]]
  private[queries] def lloydCbWide(s: SparkSession, dir: String)
      : IndexedSeq[IndexedSeq[Array[Double]]] =
    lloydCbWideMemo.getOrElseUpdate(dir,
      Similarity.lloydCodebook(t(s, dir, "embeddings"), m = 2 * PqM,
        subK = PqSubK, iters = PqLloydIters))

  /** Graph+PQ serve with codes/ADC in the ROTATED space, exact
    * re-rank in the original (NnDescent.serveHierPqCoded). */
  private[queries] def hnswPqRotServed(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "hnsw_pq_rot_served") {
      graft.text.NnDescent.serveHierPqCoded(t(s, dir, "embeddings"),
        nndGraph(s, dir), hnswLayers(s, dir), opqRotated(s, dir),
        col("vec_id") < 8, AnnK, HnswUpBeam, HnswUpHops, HnswBeam,
        HnswHops, HnswRatio, RerankR, lloydCbRot(s, dir))
    }

  /** Graph+PQ serve at m = 2·pq.m (24 bits/vector at the defaults —
    * the bits-vs-recall rung). */
  private[queries] def hnswPqWideServed(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "hnsw_pq_wide_served") {
      graft.text.NnDescent.serveHierPq(t(s, dir, "embeddings"),
        nndGraph(s, dir), hnswLayers(s, dir), col("vec_id") < 8,
        AnnK, HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
        2 * PqM, PqSubK, RerankR,
        codebook = Some(lloydCbWide(s, dir)))
    }

  /** The rerank-budget rungs and the per-rung served frames (ONE
    * shared ADC traversal — the rerank pool does not affect it). */
  private[queries] def HnswPqRerankRungs =
    graft.Settings.nndescent.hnswPqRerankRungs
  private[queries] def hnswPqFrontierServed(s: SparkSession,
      dir: String): DataFrame =
    Stage.cached(s, dir, "hnsw_pq_frontier_served") {
      graft.text.NnDescent.serveHierPqFrontier(t(s, dir, "embeddings"),
        nndGraph(s, dir), hnswLayers(s, dir), col("vec_id") < 8,
        AnnK, HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
        PqM, PqSubK, HnswPqRerankRungs,
        codebook = Some(lloydCb(s, dir)))
    }

  private[queries] def HnswFrontierRungs =
    graft.Settings.nndescent.hnswFrontierRungs

  // ---- incremental NND graph maintenance: live knob, staged base
  // graph + incrementally-repaired graph

  private[queries] def NndIncrRounds =
    graft.Settings.nndescent.incrRounds

  /** Base graph on the standing index slice (vec_id < ann.incr_base —
    * the IVF family's split convention): the FROZEN artifact the
    * batch inserts against. The effective incr_base is part of the
    * stage NAME: ScaleStress overrides the knob around its
    * q_e_nnd_incr runs while Stage.cached keys only by
    * (spark, dir, name), so baking the knob into the name makes a
    * stale-stage reuse at a different base structurally impossible. */
  private[queries] def nndBaseGraph(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, s"nnd_base_graph_$IncrBase") {
      graft.text.NnDescent.build(
        t(s, dir, "embeddings").filter(col("vec_id") < IncrBase),
        NndK, NndRounds)
    }

  /** Incrementally-maintained graph: vec_id >= incr_base seeded by
    * beam search over the frozen base graph, then confined repair
    * rounds — read by the graph row and the drift row. Knob-keyed
    * name for the same reason as [[nndBaseGraph]]. */
  private[queries] def nndIncrGraph(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, s"nnd_incr_graph_$IncrBase") {
      graft.text.NnDescent.incrInsert(t(s, dir, "embeddings"),
        nndBaseGraph(s, dir), IncrBase, NndK, NndBeam, NndHops,
        NndIncrRounds)
    }

  private[queries] def nndIncrCtes: String =
    graft.text.NnDescent.oracleIncrCtes(NndK, NndRounds, NndBeam,
      NndHops, NndIncrRounds, IncrBase)

  /** FROZEN old-slice layer graphs — the hierarchy as it stood before
    * the batch (vec_id < incr_base members of each level), one Stage
    * artifact per level. Salted `hnswo$l`, independent of the
    * standing `hnswb$l` layers; incr_base is part of the stage name
    * (the [[nndBaseGraph]] knob-override rule). */
  private[queries] def hnswOldLayers(s: SparkSession, dir: String)
      : Seq[DataFrame] =
    (1 to HnswLevels).map { l =>
      Stage.cached(s, dir, s"hnsw_old_layer${l}_$IncrBase") {
        graft.text.NnDescent.buildSubset(
          t(s, dir, "embeddings").filter(col("vec_id") < IncrBase
            && graft.text.NnDescent.layerPred(col("vec_id"), l,
              HnswRatio)),
          NndK, HnswUpRounds, salt = s"hnswo$l")
      }
    }

  /** Incrementally-MAINTAINED layer graphs: each level's new members
    * (layerPred ∧ vec_id >= incr_base) seeded by beam search over the
    * frozen old layer graph (bucket-representative entries — sparse
    * layer ids), then confined repair rounds — the hierarchy after
    * the batch, read by the incr row, the drift row and the
    * incremental-serve spec lock. */
  private[queries] def hnswIncrLayers(s: SparkSession, dir: String)
      : Seq[DataFrame] = {
    val olds = hnswOldLayers(s, dir)
    (1 to HnswLevels).map { l =>
      Stage.cached(s, dir, s"hnsw_incr_layer${l}_$IncrBase") {
        graft.text.NnDescent.incrInsertLayer(
          t(s, dir, "embeddings").filter(
            graft.text.NnDescent.layerPred(col("vec_id"), l,
              HnswRatio)),
          olds(l - 1), IncrBase, NndK, NndBeam, NndHops,
          NndIncrRounds, salt = s"hnswi$l")
      }
    }
  }

  private[queries] def hnswIncrLayerCtes: String =
    (1 to HnswLevels).map(l => graft.text.NnDescent
      .oracleIncrLayerCtes(l, HnswRatio, NndK, HnswUpRounds, NndBeam,
        NndHops, NndIncrRounds, IncrBase).trim)
      .mkString(",\n      ")

  /** Hierarchical serving over the MAINTAINED hierarchy (incr base
    * graph + incr layer graphs) — the row that proves the
    * add-without-retrain index actually SERVES: new top-layer members
    * enter the coarse scan through the same layerPred rule the
    * standing serve uses. */
  private[queries] def hnswIncrServed(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, s"hnsw_incr_served_$IncrBase") {
      graft.text.NnDescent.serveHier(t(s, dir, "embeddings"),
        nndIncrGraph(s, dir), hnswIncrLayers(s, dir),
        col("vec_id") < 8, AnnK, HnswUpBeam, HnswUpHops, HnswBeam,
        HnswHops, HnswRatio)
    }

  private[queries] def hnswLayerCtes: String =
    (1 to HnswLevels).map(l => graft.text.NnDescent
      .oracleLayerCtes(l, HnswRatio, NndK, HnswUpRounds).trim)
      .mkString(",\n      ")

  private[queries] def hnswServeChainCtes: String =
    graft.text.NnDescent.oracleHierServeCtes(NndRounds, AnnK,
      HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
      HnswLevels, HnswUpRounds)

  // ---- WordPiece tokenizer: live knobs, memoized fit, oracle chain

  private[queries] def WpMerges = graft.Settings.wordpiece.nMerges
  private[queries] def WpMaxPiece = graft.Settings.wordpiece.maxPieceLen
  private[queries] def WpMaxW = graft.Settings.wordpiece.maxWordLen

  /** Fitted WordPiece model, memoized per sf dir (the bpeLearned
    * contract — trained once, shipped to every consumer). */
  private val wpMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.text.WordPiece.Fit]
  private[queries] def wpLearned(s: SparkSession, dir: String)
      : graft.text.WordPiece.Fit =
    wpMemo.getOrElseUpdate(dir,
      graft.text.WordPiece.learn(t(s, dir, "documents"), WpMerges,
        WpMaxPiece, WpMaxW))

  /** The word → greedy-pieces table as a Stage-managed frame (the
    * bpeVocab contract: warmup builds it, Stage.clear releases it). */
  private[queries] def wpSegs(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "wp_segs") { wpLearned(s, dir).wordSegs }

  private[queries] def wordpieceCtes: String =
    graft.text.WordPiece.oracleCtes(WpMerges, WpMaxPiece, WpMaxW)

  /** Index-slice WordPiece fit (doc_id % 5 ≠ 0, the family's standing
    * batch convention) — the frozen artifact the incremental encode
    * serves from. */
  private val wpIncrMemo = scala.collection.concurrent.TrieMap
    .empty[String, graft.text.WordPiece.Fit]
  private[queries] def wpIncrLearned(s: SparkSession, dir: String)
      : graft.text.WordPiece.Fit =
    wpIncrMemo.getOrElseUpdate(dir,
      graft.text.WordPiece.learn(
        t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0),
        WpMerges, WpMaxPiece, WpMaxW))

  /** The batch corpus's word → greedy-pieces table under the FROZEN
    * index-learned vocabulary. The greedy-unroll bound is enforced on
    * the BATCH slice too (the learn require only sees the index
    * slice): a longer batch word would fold to completion on the
    * engine but walk off the oracle's fixed-depth chain — the engine
    * must refuse, not silently diverge (the q_t_unigram_encode_incr
    * contract). */
  private[queries] def wpIncrSegs(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "wp_incr_segs") {
      val batchWords = graft.text.Bpe.wordTable(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0))
      val maxLen = batchWords.agg(max(length(col("word"))))
        .head().getInt(0)
      require(maxLen <= WpMaxW,
        s"batch word length $maxLen exceeds wordpiece.max_word_len")
      graft.text.WordPiece.segmentWords(batchWords,
        wpIncrLearned(s, dir).vocab, WpMaxPiece)
    }

  private[queries] def BpeBatchRounds = graft.Settings.bpe.batchRounds
  private[queries] def BpeBatchM = graft.Settings.bpe.batchM

  /** Batched-learning artifacts (Bpe.learnBatched at the live
    * `bpe.batch_*` knobs), memoized like [[bpeLearned]]. */
  private val bpeBatchMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.text.Bpe.BatchMerge], DataFrame)]
  private[queries] def bpeBatchLearned(s: SparkSession, dir: String)
      : (Seq[graft.text.Bpe.BatchMerge], DataFrame) =
    bpeBatchMemo.getOrElseUpdate(dir,
      graft.text.Bpe.learnBatched(t(s, dir, "documents"),
        BpeBatchRounds, BpeBatchM))

  /** INCREMENTAL tokenizer state: merges learned only on the standing
    * index corpus (doc_id % 5 ≠ 0 — the family's batch convention), the
    * frozen artifact new deliveries are encoded against. */
  private val bpeIncrMemo = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[graft.text.Bpe.Merge], DataFrame)]
  private[queries] def bpeIncrLearned(s: SparkSession, dir: String)
      : (Seq[graft.text.Bpe.Merge], DataFrame) =
    bpeIncrMemo.getOrElseUpdate(dir,
      graft.text.Bpe.learn(
        t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0),
        BpeMerges))
  private[queries] def bpeIncrVocab(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "bpe_incr_vocab") { bpeIncrLearned(s, dir)._2 }

  /** The batch corpus's word → pieces table under the FROZEN
    * index-learned merges (the apply loop is iterative — stage it so
    * the per-rank checkpoints run once per session). */
  private[queries] def batchAppliedVocab(s: SparkSession, dir: String,
      merges: Seq[graft.text.Bpe.Merge]): DataFrame =
    Stage.cached(s, dir, "bpe_batch_applied") {
      graft.text.Bpe.applyMerges(
        graft.text.Bpe.wordTable(
          t(s, dir, "documents").filter(col("doc_id") % 5 === 0)),
        merges)
    }

  /** (nProbe, rerank R) rungs of the ANN recall-vs-cost frontier
    * (q_e_ann_frontier), from the live `ann.frontier.rungs` setting —
    * default spans the serving envelope at the fixture's nCells = 8:
    * 1/8 of the corpus scanned up to all of it, R from the r9 default
    * 16 to 48. The promoted serving defaults (ann.ivfpq.n_probe /
    * ann.rerank_r) are chosen off this table; both the engine rungs
    * and the per-rung oracle probe tails re-interpolate an override. */
  private[queries] def FrontierRungs: Seq[(Int, Int)] =
    graft.Settings.ann.frontierRungs

  /** Shared per-doc MinHash signature stage (word-n-gram shingles, 8
    * components) — the stored artifact every dedup pass starts from:
    * self-dedup banding, component clustering, the dedup policy, and
    * the incremental batch classifier all read this one frame instead
    * of re-exploding the corpus into shingles per query. One row per
    * doc, so checkpointing it is bounded by corpus cardinality. */
  private[queries] def docSigs(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "doc_minhash_sigs") {
      Dedup.minhashSignatures(t(s, dir, "documents"), n = JaccN)
    }

  /** Shared covered-token-position stage for exact-substring dedup
    * (Dedup.duplicateCovered at the live `dedup.substr.k`): one row per
    * duplicated (doc_id, token_position), read by both the span report
    * and the strip query so the gram pass runs once. */
  private[queries] def substrCovered(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "doc_substr_covered") {
      Dedup.duplicateCovered(t(s, dir, "documents"), k = SubstrK)
    }

  /** Shared covered-position stage for the INCREMENTAL substring
    * dedup (standing gram index + delta batch at the %5 split): in
    * production the index gram set is a stored artifact of the
    * previous ingestion run, so the whole covered computation is
    * staged like substrCovered. */
  private[queries] def substrIncrCovered(s: SparkSession,
      dir: String): DataFrame =
    Stage.cached(s, dir, "doc_substr_incr_covered") {
      val docs = t(s, dir, "documents")
      Dedup.duplicateCoveredIncremental(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0), k = SubstrK)
    }

  /** DuckDB CTE chain mirroring Dedup.duplicateCovered at the live
    * `dedup.substr.k`: positional k-gram table → first-corpus-occurrence
    * keeper per gram (row_number over (doc_id, pos) ≡ the engine's
    * min(struct)) → k-wide expansion of every NON-first occurrence into
    * distinct covered token positions. */
  private def substrCovCtes: String = {
    val k = SubstrK
    val gram = (1 to k).map(i => s"t[pos+$i]").mkString(" || ' ' || ")
    s"""
      gp AS (
        SELECT doc_id, t, unnest(range(len(t) - ${k - 1})) AS pos
        FROM (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents)),
      g AS (SELECT doc_id, pos, $gram AS gram FROM gp),
      occ AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gram
                 ORDER BY doc_id, pos) AS rn
        FROM g),
      cov AS (
        SELECT DISTINCT doc_id, pos + j AS tp
        FROM occ, range($k) r(j) WHERE rn > 1)"""
  }

  /** DuckDB shingle CTE mirroring TextOps.shingles(text, n) at the
    * live `dedup.jaccard.ngram_n`. */
  private def shingleCte = {
    val n = JaccN
    val joined = (1 to n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"""
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(len(t) - ${n - 1}),
        i -> $joined))) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents))"""
  }

  /** Portable 60-bit md5 hash mod prime, SQL side (the shared
    * TextOps twin — one recipe, no drift). */
  private def hsql(e: String) = TextOps.hsqlMod(e)

  /** Shared banded-LSH CTE prefix (mirrors Similarity.lshBucketBand at
    * bits=8, nBands=2): per-dim explode → hyperplane projections →
    * per-band sign buckets → bucket occupancy. ONE definition so the
    * ann-pairs / semantic-dedup / bucket-stats oracles can never drift
    * from each other. */
  private def annBucketCtes: String = s"""
      ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      proj AS (
        SELECT vec_id, j // 8 AS band_idx, j % 8 AS bit,
               sum(x * (CASE WHEN
          ${hsql("'hp_' || j || '_' || i")} % 2 = 0
          THEN 1.0 ELSE -1.0 END)) AS p
        FROM ex, range(16) rj(j) GROUP BY 1, 2, 3),
      buckets AS (
        SELECT vec_id, band_idx, CAST(sum(CASE WHEN p > 0
          THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY 1, 2),
      bsz AS (SELECT band_idx, bucket, count(*) AS bn
              FROM buckets GROUP BY 1, 2)"""

  /** …plus hot-bucket cap → banded candidate equi-join → per-pair dots
    * (mirrors Similarity.annSelfJoinPairs at maxBucket=256). */
  private def annPairCtes: String = s"""$annBucketCtes,
      norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
      bk AS (SELECT b.* FROM buckets b JOIN bsz USING (band_idx, bucket)
             WHERE bsz.bn <= 256),
      pairs AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bk a JOIN bk b
          ON a.band_idx = b.band_idx AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id),
      dots AS (
        SELECT p.id_a, p.id_b, sum(ae.x * be.x) AS dot
        FROM pairs p JOIN ex ae ON ae.vec_id = p.id_a
                     JOIN ex be ON be.vec_id = p.id_b AND ae.i = be.i
        GROUP BY 1, 2)"""

  private val stop = "('the', 'a', 'of', 'and', 'to', 'in')"

  /** Exact-duplicate star edges (dup doc → md5-group keeper) for any doc
    * frame — one window on the text fingerprint, shared by the full and
    * index-side component builders. */
  private def fpPairs(d: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text").cast("binary")))
    d.select(col("doc_id"), min("doc_id").over(w).as("keep"))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("keep").as("d1"), col("doc_id").as("d2"))
  }

  /** Shared Spark-side duplicate-component stage: connected components
    * over exact-fingerprint star edges ∪ MinHash band candidate pairs —
    * the cluster map both the dedup report and the leakage-safe split
    * derive from. One row per doc. */
  private[queries] def docComponents(s: SparkSession,
      dir: String): DataFrame =
    Stage.cached(s, dir, "doc_components") {
      val docs = t(s, dir, "documents")
      // EDGES are est-VERIFIED near-dups, not raw banding candidates:
      // the derived recall-first banding would otherwise chain docs
      // that share a single minhash into mega-components
      val pairs = mhPairs(s, dir)
        .filter(col("est_sim") >= CompMinEst)
        .select("d1", "d2")
        .unionByName(fpPairs(docs)).distinct()
      Dedup.connectedComponents(docs, pairs)
    }

  /** Shared MinHash-LSH candidate-pair stage (band join over the
    * stored signatures) — the family's candidate artifact, read by
    * q_d_minhash / q_d_editdist / q_t_dedup_policy / q_d_lsh_quality
    * and the component-map builder so the band self-join runs once
    * per run. */
  private[queries] def mhPairs(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "minhash_lsh_pairs") {
      Dedup.minhashLshPairsFromSigs(docSigs(s, dir),
        rowsPerBand = LshLayout._2)
    }

  /** Shared exact (frequency-pruned) Jaccard pair stage at the live
    * dedup settings — the truth table q_d_jaccard reports and
    * q_d_lsh_quality grades the LSH candidates against. */
  private[queries] def jaccTruth(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "jaccard_pairs") {
      Dedup.jaccardPairs(t(s, dir, "documents"), n = JaccN,
        maxFreq = JaccMaxFreq, minJaccard = JaccMinSim)
    }

  /** Exact-Jaccard TRUTH components: connected components over the
    * frequency-pruned exact-Jaccard pairs at the live threshold ∪ the
    * same exact-fingerprint star edges docComponents uses — the
    * ground-truth cluster map the q_d_lsh_e2e report grades the
    * LSH-derived components against. */
  private[queries] def truthComponents(s: SparkSession,
      dir: String): DataFrame =
    Stage.cached(s, dir, "truth_components") {
      val docs = t(s, dir, "documents")
      val pairs = jaccTruth(s, dir).select("d1", "d2")
        .unionByName(fpPairs(docs)).distinct()
      Dedup.connectedComponents(docs, pairs)
    }

  /** Standing dedup-index state for the incremental-merge query
    * (q_d_components_incr): the index corpus's duplicate components
    * collapsed to star edges doc → cluster keeper. In production this
    * IS a stored artifact (the index's cluster map, written by the
    * previous ingestion run) — modeled, like docSigs/docComponents, as
    * a cached stage; the iterative index-side CC never reruns per
    * query. */
  private[queries] def idxStarEdges(s: SparkSession,
      dir: String): DataFrame =
    Stage.cached(s, dir, "idx_star_edges") {
      val docs = t(s, dir, "documents")
      val idx = docs.filter(col("doc_id") % 5 =!= 0)
      val idxPairs = Dedup
        .minhashLshPairsFromSigs(
          docSigs(s, dir).filter(col("doc_id") % 5 =!= 0),
          rowsPerBand = LshLayout._2)
        .filter(col("est_sim") >= CompMinEst)
        .select("d1", "d2").unionByName(fpPairs(idx)).distinct()
      Dedup.connectedComponents(idx, idxPairs)
        .filter(col("doc_id") =!= col("comp_id"))
        .select(col("comp_id").as("d1"), col("doc_id").as("d2"))
    }

  /** Shared ANN candidate-pair stage: the banded sign-LSH self-join at
    * maxBucket=256 / bits=8 / nBands=2 with NO similarity floor — built
    * once, consumed by q_e_ann_pairs (≥ 0 filter), q_e_sim_hist (full
    * range), and q_e_semantic_dedup (≥ τ filter). simFloor is a final
    * filter in Similarity.annSelfJoinPairs, so filtering the floor-free
    * superset is exactly equivalent. One row per candidate pair —
    * bounded by Σbucket², which the hot-bucket cap keeps linear. */
  private[queries] def annPairs(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "ann_pairs") {
      Similarity.annSelfJoinPairs(t(s, dir, "embeddings"),
        maxBucket = 256, simFloor = -1.0, bits = 8, nBands = 2)
    }

  /** Semantic-dedup cosine threshold (live `dedup.semantic.min_cos`,
    * interpolated into both engine plans and oracle `sem` CTEs). */
  private[queries] def SemMinCos = graft.Settings.dedup.semanticMinCos

  /** Shared semantic-dedup component map (ANN pairs ≥ the live τ →
    * min-label connected components over the embedding space) — read
    * by q_e_semantic_dedup and the end-to-end dedup pipeline so the
    * iterative CC runs once. */
  private[queries] def semComps(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "semantic_components") {
      val emb = t(s, dir, "embeddings")
      val pairs = annPairs(s, dir).filter(col("cos_sim") >= SemMinCos)
        .select(col("id_a").as("d1"), col("id_b").as("d2"))
      Dedup.connectedComponents(
          emb.select(col("vec_id").as("doc_id")), pairs)
        .select(col("doc_id").as("vec_id"), col("comp_id"),
          col("cluster_size"), col("is_canonical"))
    }

  /** Shared PQ top-5 stage (the ADC ranking both q_e_pq_topk and
    * q_e_pq_recall read): one row per (query, rank ≤ 5). */
  private[queries] def pqTop5(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "pq_top5") {
      Similarity.pqTopK(t(s, dir, "embeddings"), col("vec_id") < AnnQ,
        k = AnnK, m = PqM, subK = PqSubK)
    }

  /** Exact squared-L2 top-5 per query — the ground-truth side both PQ
    * recall queries rank against. A cached stage: ground-truth eval
    * sets are stored artifacts in production (recomputing the exact
    * scan per recall probe would defeat the point of the index). */
  private[queries] def exactTop5(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "exact_l2_top5") {
      val ex = t(s, dir, "embeddings").select(col("vec_id"),
        posexplode(Similarity.asDouble(col("embedding")))
          .as(Seq("i", "x")))
      val q = ex.filter(col("vec_id") < AnnQ)
        .select(col("vec_id").as("qid"), col("i").as("qi"),
          col("x").as("qx"))
      val d2full = ex.join(broadcast(q),
          col("i") === col("qi") && col("vec_id") =!= col("qid"))
        .groupBy(col("qid"), col("vec_id").as("vid"))
        .agg(round(sum(((col("x") - col("qx")) * (col("x") - col("qx")))
          .cast("decimal(38,18)")).cast("double"), 6).as("d2"))
      d2full.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("d2"), col("vid"))))
        .filter(col("rn") <= AnnK).select("qid", "vid")
    }

  /** Fitted per-subspace KMeans PQ codebook, one per sf dir — a stored
    * production artifact (codebooks are trained offline and shipped to
    * every encoder/server), memoized driver-side like the index
    * signatures. */
  private val kmCbMemo = scala.collection.concurrent.TrieMap
    .empty[String, IndexedSeq[IndexedSeq[Array[Double]]]]
  private[queries] def kmCodebook(s: SparkSession, dir: String)
      : IndexedSeq[IndexedSeq[Array[Double]]] =
    kmCbMemo.getOrElseUpdate(dir,
      Similarity.kmeansCodebook(t(s, dir, "embeddings"), m = PqM,
        subK = PqSubK))

  /** PQ top-5 under the FITTED codebook (the production-quality swap);
    * cached so the A/B recall query and any consumer share one build. */
  private[queries] def kmTop5(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "pq_km_top5") {
      Similarity.pqTopKCodebook(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, k = AnnK, kmCodebook(s, dir))
    }

  /** One mean-recall@5 summary row for a PQ ranking vs the exact-L2
    * ground truth (shared by the codebook A/B queries). */
  private[queries] def recallRow(exact5: DataFrame, pq5: DataFrame,
      variant: String): DataFrame =
    exact5.join(pq5.select(col("qid"), col("vid"), lit(1).as("hit")),
        Seq("qid", "vid"), "left")
      .agg(lit(variant).as("codebook"),
        countDistinct(col("qid")).as("n_queries"),
        round(count(col("hit")).cast("double")
          / count(lit(1)), 6).as("recall_at_5"))

  /** Lloyd iterations for the deterministic fitted codebook — small
    * because the oracle unrolls m × iters CTE chains, and 4 rounds from
    * the seed slices already separate fitted from unfitted recall. */
  private[queries] def PqLloydIters = graft.Settings.ann.pqLloydIters

  /** DETERMINISTIC fitted codebook (per-subspace `LloydKmeans`) — the
    * hash-checkable counterpart to [[kmCodebook]]; memoized per sf dir
    * like the other stored index artifacts. */
  private val lloydCbMemo = scala.collection.concurrent.TrieMap
    .empty[String, IndexedSeq[IndexedSeq[Array[Double]]]]
  private[queries] def lloydCb(s: SparkSession, dir: String)
      : IndexedSeq[IndexedSeq[Array[Double]]] =
    lloydCbMemo.getOrElseUpdate(dir,
      Similarity.lloydCodebook(t(s, dir, "embeddings"), m = PqM,
        subK = PqSubK, iters = PqLloydIters))

  /** PQ top-5 under the deterministic Lloyd codebook. */
  private[queries] def lloydTop5(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "pq_lloyd_top5") {
      Similarity.pqTopKCodebook(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, k = AnnK, lloydCb(s, dir))
    }

  /** Oracle CTEs for the Lloyd-fitted PQ path, appended after
    * [[pqCtes]]: one unrolled `LloydKmeans.oracleSqlFrom` chain per
    * subspace (prefix `s<m>_`) → fitted codebook union `lcent` → the
    * SAME encode/ADC/rank chain as the seed path (`ld2`/`lcodes`/
    * `lqd2`/`ladc`/`lranked`), so the fitted-codebook PQ ranking is
    * bit-reproduced end-to-end: iterative fit included. */
  private def lloydPqCtes: String = {
    val chains = (0 until PqM).map { mi =>
      s"""
      s${mi}_pts AS MATERIALIZED (
        SELECT vec_id AS pid, j, x FROM sub WHERE m = $mi),""" +
        graft.ml.LloydKmeans.oracleSqlFrom(
          s"s${mi}_pts", PqSubK, PqLloydIters, s"s${mi}_")
    }.mkString(",")
    val union = (0 until PqM).map(mi =>
      s"SELECT $mi AS m, c, j, y FROM s${mi}_cent_$PqLloydIters")
      .mkString("\n        UNION ALL ")
    s"""$chains,
      lcent AS (
        $union),
      ld2 AS (
        SELECT s.vec_id, s.m, c.c,
               CAST(sum(CAST((s.x - c.y) * (s.x - c.y) AS DECIMAL(38,18)))
                 AS DOUBLE) AS d2
        FROM sub s JOIN lcent c ON s.m = c.m AND s.j = c.j
        GROUP BY 1, 2, 3),
      lcodes AS (
        SELECT vec_id AS vid, m, c FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m
            ORDER BY round(d2, 6), c) AS rn FROM ld2) WHERE rn = 1),
      lqd2 AS (
        SELECT vec_id AS qid, m, c, d2 AS qd2 FROM ld2
        WHERE vec_id < $AnnQ),
      ladc AS (
        SELECT q.qid, k.vid,
               round(CAST(sum(CAST(q.qd2 AS DECIMAL(38,18))) AS DOUBLE),
                 6) AS adc
        FROM lcodes k JOIN lqd2 q ON k.m = q.m AND k.c = q.c
        GROUP BY 1, 2),
      lranked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc, vid) AS rnk
        FROM ladc WHERE qid <> vid)"""
  }

  /** Serving-index artifacts (coarse cells + codebook + the encoded
    * (vid, cell, codes) table) — the standing IVF-PQ index the
    * streaming/batch serving path queries. The table is a cached stage;
    * at 100 TB it is a stored table hash-partitioned by cell. */
  private val serveArtMemo = scala.collection.concurrent.TrieMap.empty[
    String, (graft.streaming.StreamingAnnServe.Cells,
      graft.streaming.StreamingEncode.Codebook)]
  private[queries] def serveArtifacts(s: SparkSession, dir: String)
      : (graft.streaming.StreamingAnnServe.Cells,
         graft.streaming.StreamingEncode.Codebook) =
    serveArtMemo.getOrElseUpdate(dir, {
      val emb = t(s, dir, "embeddings")
      (graft.streaming.StreamingAnnServe.seedCells(emb,
          nCells = IvfNCells),
        graft.streaming.StreamingEncode.seedCodebook(emb, m = PqM,
          subK = PqSubK))
    })
  private[queries] def annServeIndex(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ann_serve_index") {
      val (cells, cb) = serveArtifacts(s, dir)
      graft.streaming.StreamingAnnServe.indexOf(
        t(s, dir, "embeddings"), cells, cb)
    }

  /** ADC short-list length for the exact re-rank stage: several×k is
    * the production sweet spot (most of the recall@5 ADC lost sits just
    * below the ADC top-5 boundary). The shared short-list stages are
    * built at k = R and serve top_k from their rnk ≤ k prefix, which
    * is only sound when R ≥ top_k — a misconfigured override would
    * silently return fewer rows per query than the oracle ranks, so it
    * fails loudly here instead. */
  private[queries] def RerankR = {
    val r = graft.Settings.ann.rerankR
    require(r >= AnnK,
      s"ann.rerank_r $r < ann.top_k $AnnK: the shared ADC short list " +
        "serves top_k from its rnk <= rerank_r prefix")
    r
  }

  /** IVF-PQ ADC candidate short list (top-$RerankR per query) — one
    * build shared by the re-rank query (which re-scores it) and the
    * A/B gain query (whose ADC-top-5 baseline is its rnk <= 5
    * prefix). */
  private[queries] def ivfPqCands(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ivfpq_adc_cands") {
      Similarity.ivfPqTopK(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, k = RerankR, nCells = IvfNCells,
        nProbe = IvfNProbe, m = PqM, subK = PqSubK)
    }

  /** IVF-Flat top-k (MLlib coarse fit at nProbe = nCells ≡ brute
    * force) — staged because the KMeans fit is an index-build
    * artifact, not per-query work. Query count and k resolve through
    * the live `ann:` Settings like the rest of the family; nCells is
    * deliberately pinned at 16 (≠ ann.ivfpq.n_cells) because at
    * nProbe = nCells the cell count cannot change the answer — only
    * the brute-force contract matters, and a separate cell count keeps
    * this MLlib fit from aliasing the Lloyd coarse artifacts. */
  private[queries] def ivfTop5(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ivf_top5") {
      Similarity.ivfTopK(t(s, dir, "embeddings"), col("vec_id") < AnnQ,
        k = AnnK, nCells = 16, nProbe = 16)
    }

  /** Exact-re-ranked top-5 over the shared ADC short list. */
  private[queries] def rerankTop5(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "rerank_top5") {
      Similarity.rerankExact(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, ivfPqCands(s, dir), k = AnnK)
    }

  /** Residual-IVF-PQ index artifacts: the Lloyd-FITTED coarse cells
    * (what makes residuals small — a seed "centroid" is an arbitrary
    * vector and residual encoding against it LOSES recall, measured
    * 0.113→0.056 at sf0.01) plus the per-subspace Lloyd residual
    * codebook. Stored production artifacts, memoized per sf dir like
    * the other codebooks. */
  private val residArtMemo = scala.collection.concurrent.TrieMap.empty[
    String, (IndexedSeq[Array[Double]],
      IndexedSeq[IndexedSeq[Array[Double]]])]
  private[queries] def residArtifacts(s: SparkSession, dir: String)
      : (IndexedSeq[Array[Double]],
         IndexedSeq[IndexedSeq[Array[Double]]]) =
    residArtMemo.getOrElseUpdate(dir, {
      val emb = t(s, dir, "embeddings")
      val cells = Similarity.lloydCoarseCells(emb, IvfNCells, CoarseIters)
      (cells, Similarity.lloydResidualCodebook(emb, cells, PqM, PqSubK,
        PqLloydIters))
    })

  /** Residual-IVF-PQ ADC short list (top-$RerankR per query) — ONE
    * build shared by the top-5 query (its rnk ≤ k prefix), the exact
    * re-rank, and the A/B gain rows. */
  private[queries] def residCands(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ivfpq_res_cands") {
      val (cells, cb) = residArtifacts(s, dir)
      Similarity.ivfPqResidualTopK(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, k = RerankR, nProbe = IvfNProbe, cells, cb)
    }

  /** Standing residual serving index (vid, cell, residual codes) —
    * the [[residArtifacts]] twin of `annServeIndex`. */
  private[queries] def annServeResIndex(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ann_serve_res_index") {
      val (cells, cb) = residArtifacts(s, dir)
      graft.streaming.StreamingAnnServe.indexOfResidual(
        t(s, dir, "embeddings"), cells, cb)
    }

  /** Incremental-index artifacts: coarse cells + residual codebook
    * fit ONLY on the base snapshot (`vec_id < IncrBase`) — the frozen
    * state an append-only index grows against (faiss add-without-
    * train). Later batches are encoded with these, never refit. */
  private val incrArtMemo = scala.collection.concurrent.TrieMap.empty[
    String, (IndexedSeq[Array[Double]],
      IndexedSeq[IndexedSeq[Array[Double]]])]
  private[queries] def incrArtifacts(s: SparkSession, dir: String)
      : (IndexedSeq[Array[Double]],
         IndexedSeq[IndexedSeq[Array[Double]]]) =
    incrArtMemo.getOrElseUpdate(dir, {
      val base = t(s, dir, "embeddings")
        .filter(col("vec_id") < IncrBase)
      val cells = Similarity.lloydCoarseCells(base, IvfNCells,
        CoarseIters)
      (cells, Similarity.lloydResidualCodebook(base, cells, PqM, PqSubK,
        PqLloydIters))
    })

  /** The incrementally-grown standing index: the base batch encoded at
    * fit time UNION the delta batch append-encoded later against the
    * SAME frozen artifacts. Per-row encode means append ≡ rebuild
    * (locked in SimilaritySpec); at 100 TB the union is a partitioned
    * append to the stored index table — no refit, no re-encode of the
    * base. */
  private[queries] def annServeIncrIndex(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ann_serve_incr_index") {
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = incrArtifacts(s, dir)
      graft.streaming.StreamingAnnServe.indexOfResidual(
          emb.filter(col("vec_id") < IncrBase), cells, cb)
        .unionByName(graft.streaming.StreamingAnnServe.indexOfResidual(
          emb.filter(col("vec_id") >= IncrBase), cells, cb))
    }

  /** Exact-re-ranked top-k over the residual ADC short list. */
  private[queries] def residRerankTop5(s: SparkSession, dir: String)
      : DataFrame =
    Stage.cached(s, dir, "ivfpq_res_rerank_top5") {
      Similarity.rerankExact(t(s, dir, "embeddings"),
        col("vec_id") < AnnQ, residCands(s, dir), k = AnnK)
    }

  /** Shared product-quantization CTE chain (mirrors Similarity.pqTopK
    * at m=4 / subK=8 / queries vec_id < 32): per-dim explode →
    * subspace split → seed codebook → exact per-subspace squared
    * distances (per-term decimal sums) → argmin codes → ADC distances
    * → rank (`pqranked`). ONE definition so the pq-topk and pq-recall
    * oracles can never drift from each other. */
  private[queries] def exCte: String = """
      ex AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings)"""

  private def pqCtes: String = s"""$exCte,
      sub AS (
        SELECT vec_id, i // $PqSubDim AS m, i % $PqSubDim AS j, x FROM ex),
      cent AS (
        SELECT vec_id AS c, m, j, x AS y FROM sub
        WHERE vec_id < $PqSubK),
      d2 AS (
        SELECT s.vec_id, s.m, c.c,
               CAST(sum(CAST((s.x - c.y) * (s.x - c.y) AS DECIMAL(38,18)))
                 AS DOUBLE) AS d2
        FROM sub s JOIN cent c ON s.m = c.m AND s.j = c.j
        GROUP BY 1, 2, 3),
      codes AS (
        SELECT vec_id AS vid, m, c FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m
            ORDER BY round(d2, 6), c) AS rn FROM d2) WHERE rn = 1),
      qd2 AS (
        SELECT vec_id AS qid, m, c, d2 AS qd2 FROM d2
        WHERE vec_id < $AnnQ),
      adc AS (
        SELECT q.qid, k.vid,
               round(CAST(sum(CAST(q.qd2 AS DECIMAL(38,18))) AS DOUBLE),
                 6) AS adc
        FROM codes k JOIN qd2 q ON k.m = q.m AND k.c = q.c
        GROUP BY 1, 2),
      pqranked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc, vid) AS rnk
        FROM adc WHERE qid <> vid)"""

  /** IVF-PQ CTE chain (through the ADC ranking `ranked2`) — the shared
    * core of [[ivfPqOracle]] and the exact-re-rank oracles, which
    * compose further CTEs on top of the ranked candidate list. */
  private def ivfPqCtes: String = s"""$pqCtes,
      cellc AS (
        SELECT vec_id AS cell, i, x AS y FROM ex
        WHERE vec_id < $IvfNCells),
      celld2 AS (
        SELECT e.vec_id, c.cell,
               CAST(sum(CAST((e.x - c.y) * (e.x - c.y)
                 AS DECIMAL(38,18))) AS DOUBLE) AS d2
        FROM ex e JOIN cellc c ON e.i = c.i GROUP BY 1, 2),
      cells AS (
        SELECT vec_id AS vid, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY round(d2, 6), cell) AS rn FROM celld2)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS qid, cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY round(d2, 6), cell) AS rn
          FROM celld2 WHERE vec_id < $AnnQ)
        WHERE rn <= $IvfNProbe),
      cand AS (
        SELECT p.qid, s.vid FROM probes p JOIN cells s
          ON p.cell = s.cell AND p.qid <> s.vid),
      adc2 AS (
        SELECT ca.qid, ca.vid,
               round(CAST(sum(CAST(q.qd2 AS DECIMAL(38,18))) AS DOUBLE),
                 6) AS adc
        FROM cand ca JOIN codes k ON k.vid = ca.vid
             JOIN qd2 q ON q.qid = ca.qid AND q.m = k.m AND q.c = k.c
        GROUP BY 1, 2),
      ranked2 AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc, vid) AS rnk FROM adc2)"""

  /** DuckDB oracle for the IVF-PQ ANN shape — shared verbatim by
    * q_e_ann_ivfpq (the batch index) and q_e_ann_serve (the streaming
    * serving column program run in batch mode): both must reproduce the
    * same bit-exact answer. */
  private def ivfPqOracle: String = s"""
      WITH $ivfPqCtes
      SELECT qid, vid, adc, rnk FROM ranked2 WHERE rnk <= $AnnK
      ORDER BY qid, rnk"""

  /** Exact-re-rank CTEs on top of [[ivfPqCtes]]: the ADC top-$RerankR
    * short list joins the stored full vectors, exact squared-L2
    * (per-term decimal sums — the d2full/exact5 ground-truth
    * convention) re-scores it, and `rranked` orders by (round-6 d2,
    * vid). Shared by q_e_ann_rerank and q_e_rerank_gain. */
  private def rerankCtes: String = s"""
      adcR AS (
        SELECT qid, vid, adc FROM ranked2 WHERE rnk <= $RerankR),
      rqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex
        WHERE vec_id < $AnnQ),
      rr AS (
        SELECT a.qid, a.vid, a.adc,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM adcR a JOIN ex e ON e.vec_id = a.vid
             JOIN rqfull q ON q.qid = a.qid AND q.i = e.i
        GROUP BY 1, 2, 3),
      rranked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY d2, vid) AS rnk FROM rr)"""

  /** Residual-IVF-PQ oracle CTE chain (on top of [[exCte]]'s `ex`),
    * mirroring `Similarity.ivfPqResidualTopK` under the FITTED
    * artifacts: one `LloydKmeans.oracleSqlFrom` chain fits the coarse
    * cells on the full vectors (`cq_`), `cq_kassign`/`cq_kd_fin` give
    * assignment + probe order, residuals r = x − centroid(cell(x))
    * split into subspaces, one Lloyd chain per subspace fits the
    * residual codebook on SHIFTED ids (pid = vec_id − nCells, corpus
    * vec_id ≥ nCells — the cell-fit excludes nothing, only the
    * codebook init convention shifts), and ADC tables are keyed
    * (qid, cell, m, c) because a query's residual depends on the
    * probed cell. Ends at `resranked`. */
  private def residIvfPqCtes: String = residChainCtes(None)

  /** The [[residIvfPqCtes]] chain with the FITS (coarse cells +
    * residual codebooks) restricted to the base snapshot
    * `vec_id < fitMax` while assignment/encode/serve still cover the
    * whole corpus — the add-without-train contract of
    * q_e_index_incr/q_e_index_drift. `fitMax = None` reproduces the
    * full-corpus fit text verbatim. */
  private def residChainCtes(fitMax: Option[Int]): String =
    residFitCtes(fitMax) + "," + residProbeTail(IvfNProbe, "")

  /** The probe-INDEPENDENT half of the residual chain: coarse fit +
    * assignment, residual frame, per-subspace codebook fits, corpus
    * encode (`rcodes`), and the query-side probe RANKING
    * (`rprobes_all`, rn-carrying, unfiltered) — shared by the standard
    * chain and the frontier sweep, which appends one
    * [[residProbeTail]] per nProbe rung. */
  private def residFitCtes(fitMax: Option[Int]): String = {
    val sd = PqSubDim
    val fitW = fitMax.map(b => s" WHERE vec_id < $b").getOrElse("")
    val cbFit = fitMax.map(b => s" AND vec_id < $b").getOrElse("")
    val chains = (0 until PqM).map { mi =>
      s"""
      r${mi}_pts AS MATERIALIZED (
        SELECT vec_id - $IvfNCells AS pid, j, r AS x FROM rsub
        WHERE m = $mi AND vec_id >= $IvfNCells$cbFit),""" +
        graft.ml.LloydKmeans.oracleSqlFrom(
          s"r${mi}_pts", PqSubK, PqLloydIters, s"r${mi}_")
    }.mkString(",")
    val union = (0 until PqM).map(mi =>
      s"SELECT $mi AS m, c, j, y FROM r${mi}_cent_$PqLloydIters")
      .mkString("\n        UNION ALL ")
    // assignment source: the fit points when fitting on everything,
    // a separate all-vector CTE when the fit is base-restricted
    val assign = fitMax match {
      case None =>
        graft.ml.LloydKmeans.finalAssignSql("cqpts", CoarseIters, "cq_")
      case Some(_) =>
        s""",
      cqall AS (
        SELECT vec_id AS pid, i AS j, x FROM ex)""" +
        graft.ml.LloydKmeans.finalAssignSql("cqall", CoarseIters, "cq_")
    }
    s"""
      cqpts AS MATERIALIZED (
        SELECT vec_id AS pid, i AS j, x FROM ex$fitW),""" +
    graft.ml.LloydKmeans.oracleSqlFrom(
      "cqpts", IvfNCells, CoarseIters, "cq_") +
    assign +
    s""",
      rprobes_all AS MATERIALIZED (
        SELECT pid AS qid, c AS cell,
               row_number() OVER (PARTITION BY pid
                 ORDER BY round(d2, 6), c) AS rn
        FROM cq_kd_fin WHERE pid < $AnnQ),
      rresid AS MATERIALIZED (
        SELECT e.vec_id, s.cluster AS cell, e.i, e.x - c.y AS r
        FROM ex e JOIN cq_kassign s ON s.pid = e.vec_id
             JOIN cq_cent_$CoarseIters c
               ON c.c = s.cluster AND c.j = e.i),
      rsub AS MATERIALIZED (
        SELECT vec_id, cell, i // $sd AS m, i % $sd AS j, r
        FROM rresid),$chains,
      rcent AS MATERIALIZED (
        $union),
      rd2 AS (
        SELECT s.vec_id, s.m, c.c,
               CAST(sum(CAST((s.r - c.y) * (s.r - c.y) AS DECIMAL(38,18)))
                 AS DOUBLE) AS d2
        FROM rsub s JOIN rcent c ON s.m = c.m AND s.j = c.j
        GROUP BY 1, 2, 3),
      rcodes AS MATERIALIZED (
        SELECT vec_id AS vid, m, c FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m
            ORDER BY round(d2, 6), c) AS rn FROM rd2) WHERE rn = 1)"""
  }

  /** One nProbe rung of the residual serving path, CTE names suffixed
    * `$sfx`: probe set, per-probed-cell query residual ADC tables,
    * probed candidates, ADC ranking. `sfx = ""` at the live IvfNProbe
    * reproduces the standard chain the non-frontier queries read. */
  private def residProbeTail(nProbe: Int, sfx: String): String = {
    val sd = PqSubDim
    s"""
      rprobes$sfx AS (
        SELECT qid, cell FROM rprobes_all WHERE rn <= $nProbe),
      rqres$sfx AS (
        SELECT e.vec_id AS qid, p.cell, e.i // $sd AS m, e.i % $sd AS j,
               e.x - c.y AS qr
        FROM ex e JOIN rprobes$sfx p ON p.qid = e.vec_id
             JOIN cq_cent_$CoarseIters c ON c.c = p.cell AND c.j = e.i),
      rqd2$sfx AS MATERIALIZED (
        SELECT q.qid, q.cell, q.m, c.c,
               CAST(sum(CAST((q.qr - c.y) * (q.qr - c.y)
                 AS DECIMAL(38,18))) AS DOUBLE) AS qd2
        FROM rqres$sfx q JOIN rcent c ON q.m = c.m AND q.j = c.j
        GROUP BY 1, 2, 3, 4),
      rescand$sfx AS (
        SELECT p.qid, s.pid AS vid, p.cell
        FROM rprobes$sfx p JOIN cq_kassign s
          ON s.cluster = p.cell AND p.qid <> s.pid),
      radc$sfx AS (
        SELECT ca.qid, ca.vid,
               round(CAST(sum(CAST(q.qd2 AS DECIMAL(38,18))) AS DOUBLE),
                 6) AS adc
        FROM rescand$sfx ca JOIN rcodes k ON k.vid = ca.vid
             JOIN rqd2$sfx q ON q.qid = ca.qid AND q.cell = ca.cell
               AND q.m = k.m AND q.c = k.c
        GROUP BY 1, 2),
      resranked$sfx AS MATERIALIZED (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc, vid) AS rnk FROM radc$sfx)"""
  }

  /** Exact-re-rank CTEs over the residual ADC short list (the
    * residual twin of [[rerankCtes]]): `resranked`'s top-$RerankR join
    * stored full vectors, exact per-term-decimal squared-L2 re-scores,
    * `resrranked` orders by (round-6 d2, vid). */
  private def residRerankCtes: String = s"""
      resadcR AS (
        SELECT qid, vid, adc FROM resranked WHERE rnk <= $RerankR),
      resqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex
        WHERE vec_id < $AnnQ),
      resrr AS (
        SELECT a.qid, a.vid, a.adc,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM resadcR a JOIN ex e ON e.vec_id = a.vid
             JOIN resqfull q ON q.qid = a.qid AND q.i = e.i
        GROUP BY 1, 2, 3),
      resrranked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY d2, vid) AS rnk FROM resrr)"""

  /** CTE chain shingles → minhash signatures (`sig`) → LSH band keys →
    * candidate pairs (`mh_pairs`); shared by q_d_minhash and
    * q_d_components. */
  private def minhashCtes: String = {
    val minCols = TextOps.MinHashParams.zipWithIndex.map {
      case ((a, b), k) => s"min((h2 * $a + $b) % 1000000007) AS m$k"
    }.mkString(",\n               ")
    // band keys follow the DERIVED (bands, rowsPerBand) layout — the
    // same Dedup.deriveBanding the engine stages read, so a threshold
    // override re-bands both sides together
    val (nb, r) = LshLayout
    val bandKeys = (0 until nb).map { bd =>
      (bd * r until (bd + 1) * r).map(j => s"m$j")
        .mkString(" || '_' || ") + s" AS b$bd"
    }.mkString(", ")
    val bandCase = (0 until nb).map(bd =>
      s"WHEN $bd THEN b$bd").mkString("CASE band_idx ", " ", " END")
    s"""$shingleCte,
      h AS (SELECT doc_id, ${hsql("sh")} AS h2 FROM sh),
      sig AS (SELECT doc_id,
               $minCols
              FROM h GROUP BY 1),
      bands AS (SELECT doc_id, $bandKeys FROM sig),
      bx AS (SELECT doc_id, band_idx, $bandCase AS key
             FROM bands, range($nb) r(band_idx)),
      mh_pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bx a JOIN bx b ON a.band_idx = b.band_idx AND a.key = b.key
          AND a.doc_id < b.doc_id)"""
  }

  /** Recursive transitive-closure CTEs on top of [[minhashCtes]]:
    * exact-fingerprint star edges ∪ MinHash candidate pairs → `comp`
    * (doc_id, comp_id) — the oracle twin of [[docComponents]], shared
    * by q_d_components and q_t_split_leakfree so the two can't drift. */
  private def componentCtes: String = {
    val k = TextOps.MinHashParams.size
    val agree = (0 until k).map(j =>
      s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""$minhashCtes,
      fp_star AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM documents),
      fp_pairs AS (
        SELECT keep AS d1, doc_id AS d2 FROM fp_star
        WHERE doc_id <> keep),
      mh_est AS (
        SELECT p.d1, p.d2, CAST(($agree) AS DOUBLE) / $k AS est
        FROM mh_pairs p JOIN sig sa ON p.d1 = sa.doc_id
             JOIN sig sb ON p.d2 = sb.doc_id),
      all_pairs AS (
        SELECT d1, d2 FROM mh_est WHERE est >= $CompMinEst
        UNION SELECT d1, d2 FROM fp_pairs),
      edges AS (
        SELECT d1 AS a, d2 AS b FROM all_pairs
        UNION SELECT d2, d1 FROM all_pairs),
      reach (a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      comp AS (
        SELECT d.doc_id,
               least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS comp_id
        FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        GROUP BY d.doc_id)"""
  }

  def all: Seq[Q] = Seq(

    // Token counting (whitespace + distinct + long-token regex-ish count)
    Q("q_t_tokens", Some("""
      SELECT doc_id,
             len(regexp_split_to_array(text, '[[:space:]]+')) AS n_tokens,
             len(list_distinct(regexp_split_to_array(text, '[[:space:]]+'))) AS n_distinct,
             len(list_filter(regexp_split_to_array(text, '[[:space:]]+'), x -> len(x) >= 5))
               AS n_long,
             length(text) AS n_chars_calc
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          size(filter(toks, x => length(x) >= 5)).as("n_long"),
          length(col("text")).as("n_chars_calc"))
        .orderBy("doc_id")
    },

    // BPE-ish token accounting: GPT-2-style pre-tokenizer classes
    // (letter runs / digit runs / non-space-non-alnum runs) via
    // regexp_extract_all, plus the ceil(len/4) subword estimate the
    // packing heuristics use before a real tokenizer pass. Map-only
    // column program; the regex classes are RE2/Java-portable.
    Q("q_t_tokens_bpe", Some("""
      SELECT doc_id,
             len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_word_runs,
             len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]+'))
               AS n_other_runs,
             CAST(list_sum(list_transform(
               regexp_extract_all(text, '[a-zA-Z0-9]+'),
               x -> CAST(ceil(len(x) / 4.0) AS BIGINT))) AS BIGINT)
               AS est_subword_tokens
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      def runs(pat: String) =
        regexp_extract_all(col("text"), lit(pat), lit(0))
      t(s, dir, "documents").select(col("doc_id"),
          size(runs("[a-zA-Z]+")).as("n_word_runs"),
          size(runs("[0-9]+")).as("n_digit_runs"),
          size(runs("[^a-zA-Z0-9 ]+")).as("n_other_runs"),
          aggregate(
            transform(runs("[a-zA-Z0-9]+"),
              x => ceil(length(x) / 4.0).cast("long")),
            lit(0L), (acc, x) => acc + x).as("est_subword_tokens"))
        .orderBy("doc_id")
    },

    // REAL BPE, learn phase (Sennrich 2016): V rounds of distributed
    // adjacent-pair counting over the (word, freq) vocabulary — one
    // pair-keyed aggregation per round, deterministic (count desc,
    // pair asc) winner, map-only non-overlapping merge apply. The
    // oracle unrolls one CTE block per round (island-parity
    // formulation of the same left-to-right apply rule), so the whole
    // iterative learn is hash-checked, fit included.
    Q("q_t_bpe_learn", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges)}
      SELECT merge_rank, a AS left_sym, b AS right_sym,
             cnt AS pair_count
      FROM bmerges ORDER BY merge_rank""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      bpeLearned(s, dir)._1
        .map(m => (m.rank, m.left, m.right, m.count))
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
        .orderBy("merge_rank")
    },

    // BATCHED BPE learning (Bpe.learnBatched scaladoc): the top-m
    // non-conflicting-merges-per-round production mitigation of
    // learn()'s 2-driver-actions-per-merge round count — each round
    // ranks pair counts ONCE, admits every top-window candidate that
    // conflicts with no higher-ranked one under the EXACT test
    // (merged-symbol creation OR same-word raw matches at |i−j| ≤ 1;
    // single anti-join rule, deterministic on both engines; admitted
    // merges' pre-round counts are their true counts at apply time),
    // and applies the batch in fixed rank order. The oracle unrolls rounds ×
    // fixed apply slots with a sentinel no-op merge filling empty
    // slots, so the CTE shape never depends on how many were admitted.
    Q("q_t_bpe_learn_batched", Some(s"""
      WITH ${graft.text.Bpe.oracleBatchedCtes(BpeBatchRounds,
        BpeBatchM)}
      SELECT round, CAST(slot AS INT) AS slot, a AS left_sym,
             b AS right_sym, cnt AS pair_count
      FROM bbmerges ORDER BY round, slot""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      bpeBatchLearned(s, dir)._1
        .map(m => (m.round, m.slot, m.left, m.right, m.count))
        .toDF("round", "slot", "left_sym", "right_sym", "pair_count")
        .orderBy("round", "slot")
    },

    // REAL BPE, encode phase: per-doc subword token accounting by
    // joining corpus tokens against the learned word → pieces table —
    // the precomputed-encoding cache real tokenizers serve frequent
    // words from (megabytes of vocab vs a streaming corpus: the join
    // broadcasts). Replaces the ceil(len/4) estimate as the packing
    // family's budget source.
    Q("q_t_bpe_encode", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges)},
      tk AS (
        SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
        FROM documents),
      enc AS (
        SELECT t.doc_id, len(w.s) AS np
        FROM tk t JOIN bw_$BpeMerges w ON t.word = w.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_bpe_tokens,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS pieces_per_word
      FROM enc GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val tok = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val vocab = bpeVocab(s, dir)
        .select(col("word"), size(col("syms")).as("np"))
      tok.join(vocab, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_bpe_tokens"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("pieces_per_word"))
        .orderBy("doc_id")
    },

    // BYTE-LEVEL BPE, learn phase (the GPT-2 production encoder —
    // Radford et al. 2019: Sennrich's algorithm over REAL UTF-8
    // BYTES under the full 256-entry bytes_to_unicode remap, so the
    // base vocabulary covers EVERY input and no [UNK] path exists by
    // construction — the fourth tokenizer family arm). Same merge
    // loop, oracle-unrolled per round; the remap table itself is a
    // CTE the oracle derives from the same rank rule the engine
    // compiles, and both engines read bytes through the same
    // hex(encode(word)) seam. The corpus is the multilingual
    // derivation (Bpe.multiText — 2/3/4-byte code points injected
    // deterministically), so multi-byte symbols genuinely occur in
    // the learned table (control-byte, multi-byte and no-unk paths
    // are spec-locked in BpeSpec).
    Q("q_t_bpe_bytes_learn", Some(s"""
      WITH ${graft.text.Bpe.oracleBytesCtes(BpeMerges)}
      SELECT merge_rank, a AS left_sym, b AS right_sym,
             cnt AS pair_count
      FROM bymerges ORDER BY merge_rank""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      bpeBytesLearned(s, dir)._1
        .map(m => (m.rank, m.left, m.right, m.count))
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
        .orderBy("merge_rank")
    },

    // BYTE-LEVEL BPE, encode phase: per-doc piece accounting against
    // the byte-alphabet vocabulary (the q_t_bpe_encode shape — one
    // broadcast vocab join, megabytes of vocab vs a streaming
    // corpus). Tokens come from the SAME multilingual derivation the
    // vocabulary was trained on, so multi-byte words are encoded —
    // and every one joins (the alphabet is total).
    Q("q_t_bpe_bytes_encode", Some(s"""
      WITH ${graft.text.Bpe.oracleBytesCtes(BpeMerges)},
      bytk AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM (SELECT doc_id, ${graft.text.Bpe.multiTextSql} AS text
                FROM documents)) WHERE word <> ''),
      byenc AS (
        SELECT t.doc_id, len(w.s) AS np
        FROM bytk t JOIN byw_$BpeMerges w ON t.word = w.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_pieces,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS pieces_per_word
      FROM byenc GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val tok = byteDocs(s, dir).select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val vocab = bpeBytesVocab(s, dir)
        .select(col("word"), size(col("syms")).as("np"))
      tok.join(vocab, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_pieces"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("pieces_per_word"))
        .orderBy("doc_id")
    },

    // Tokenizer fertility per language (the mT5/XLM-R tokenizer-
    // fairness metric): pieces-per-word of the learned BPE by
    // language, plus chars-per-piece — the dial that shows which
    // languages pay more subwords for the same text under one shared
    // vocabulary. Same scale shape as the encode: one broadcast
    // vocabulary join, one per-lang aggregate; fertility is a ratio
    // of exact counts (bit-stable at any partitioning).
    Q("q_t_bpe_fertility", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges)},
      ftk AS (
        SELECT lang, unnest(${graft.text.Bpe.ToksSql}) AS word
        FROM documents),
      fenc AS (
        SELECT t.lang, len(t.word) AS nc, len(w.s) AS np
        FROM ftk t JOIN bw_$BpeMerges w ON t.word = w.word)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_bpe_tokens,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS fertility,
             round(CAST(sum(nc) AS DOUBLE) / sum(np), 9)
               AS chars_per_piece
      FROM fenc GROUP BY 1 ORDER BY lang""")) { (s, dir) =>
      val tok = t(s, dir, "documents").select(col("lang"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val vocab = bpeVocab(s, dir)
        .select(col("word"), size(col("syms")).as("np"))
      tok.join(vocab, Seq("word"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_bpe_tokens"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("fertility"),
          round(sum(length(col("word"))).cast("double") / sum("np"), 9)
            .as("chars_per_piece"))
        .orderBy("lang")
    },

    // Unigram-LM tokenizer LEARNING (Unigram scaladoc — SentencePiece,
    // Kudo 2018): substring seeding, Viterbi-EM rounds (hard-EM
    // expected counts, add-one M-step, every libm output behind the
    // round-9 seam so the DP argmax can never diverge cross-engine),
    // usage-count prune keeping all single chars. The oracle unrolls
    // ONE MATERIALIZED CTE per character position per round (fixed
    // max_word_len bound, the data-independent-shape contract) — the
    // TRAINED vocabulary itself is hash-checked, the
    // QualityClf/Lloyd/BPE discipline.
    Q("q_t_unigram_learn", Some(s"""
      WITH $unigramCtes
      SELECT piece, usage, lp FROM uvocab ORDER BY piece""")) {
      (s, dir) =>
      val spark = s
      import spark.implicits._
      val fit = uniLearned(s, dir)
      fit.vocab.keys.toSeq.sorted
        .map(p => (p, fit.usage(p), fit.vocab(p)))
        .toDF("piece", "usage", "lp")
        .orderBy("piece")
    },

    // Unigram-LM ENCODE — the serving half: per-doc piece accounting
    // by joining corpus tokens against the fitted word → pieces table
    // (the precomputed-encoding cache, the BPE-encode contract); the
    // oracle re-derives the same segmentation through its own final
    // Viterbi chain, so the DP itself is what's checked, not a frozen
    // dump. Rowwise stream ≡ batch parity is spec-locked in
    // UnigramSpec via Unigram.encodeRowwise.
    Q("q_t_unigram_encode", Some(s"""
      WITH $unigramCtes,
      xtk AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM documents) WHERE word <> ''),
      xenc AS (
        SELECT t.doc_id, len(w.segs) AS np
        FROM xtk t JOIN uenc_fin w ON t.word = w.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_pieces,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS fertility
      FROM xenc GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val tok = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val segs = uniLearned(s, dir).wordSegs
        .select(col("word"), size(col("segs")).as("np"))
      tok.join(segs, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_pieces"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("fertility"))
        .orderBy("doc_id")
    },

    // WordPiece tokenizer LEARNING (WordPiece scaladoc — Schuster &
    // Nakajima 2012, the BERT trainer): likelihood-ranked merges
    // score(a,b) = cnt(ab)/(cnt(a)·cnt(b)) over ##-prefixed symbols,
    // with the merged-content-length cap (max_token_length). The
    // score is one fixed-parenthesization IEEE expression over exact
    // integer counts, so the (score desc, a, b) winner order is
    // bit-stable cross-engine; the oracle unrolls one merge round per
    // rank — the TRAINED merge table itself is hash-checked, the
    // Bpe/Unigram discipline.
    Q("q_t_wordpiece_learn", Some(s"""
      WITH $wordpieceCtes
      SELECT merge_rank, a, b, merged, cnt, ca, cb,
             round(score, 9) AS score
      FROM wpmerges ORDER BY merge_rank""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      wpLearned(s, dir).merges
        .map(m => (m.rank, m.left, m.right, m.merged, m.cnt, m.ca,
          m.cb, graft.text.Unigram.round9(m.score)))
        .toDF("merge_rank", "a", "b", "merged", "cnt", "ca", "cb",
          "score")
        .orderBy("merge_rank")
    },

    // WordPiece ENCODE — greedy longest-match-first serving (the BERT
    // algorithm: NOT merge replay; a word with no matching piece is
    // [UNK] whole): per-doc piece accounting by joining corpus tokens
    // against the fitted word → greedy-pieces table, with the unk
    // count carried per doc. The oracle re-derives the segmentation
    // through its own greedy chain (one CTE block per step), so the
    // longest-match rule itself is what's checked. Rowwise stream ≡
    // batch parity is spec-locked in WordPieceSpec.
    Q("q_t_wordpiece_encode", Some(s"""
      WITH $wordpieceCtes,
      wptk AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM documents) WHERE word <> ''),
      wpe AS (
        SELECT t.doc_id, len(w.segs) AS np,
               CAST(w.is_unk AS INT) AS u
        FROM wptk t JOIN wpenc_fin w ON t.word = w.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_pieces,
             CAST(sum(u) AS BIGINT) AS n_unk_words,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS fertility
      FROM wpe GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val tok = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val segs = wpSegs(s, dir)
        .select(col("word"), size(col("segs")).as("np"),
          col("is_unk").cast("int").as("u"))
      tok.join(segs, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_pieces"),
          sum("u").cast("long").as("n_unk_words"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("fertility"))
        .orderBy("doc_id")
    },

    // INCREMENTAL WordPiece encode — the wordpiece twin of
    // q_t_bpe_encode_incr / q_t_unigram_encode_incr (the
    // add-without-retrain tokenizer lifecycle): the vocabulary is
    // fitted ONLY on the standing index corpus (doc_id % 5 ≠ 0),
    // frozen, and the new batch greedy-encodes under it — any word
    // touching a character the index never saw rides the
    // all-or-nothing [UNK] rule END-TO-END through the oracle's own
    // greedy chain (0 on the fixture, whose index alphabet covers
    // the batch; the synthetic-unk path is spec-locked in
    // WordPieceSpec).
    Q("q_t_wordpiece_encode_incr", Some(s"""
      WITH ${graft.text.WordPiece.oracleCtes(WpMerges, WpMaxPiece,
        WpMaxW, docFilter = "doc_id % 5 <> 0")},
      ${graft.text.WordPiece.oracleEncodeCtes("wpinc",
        "doc_id % 5 = 0", WpMaxPiece, WpMaxW).trim},
      wpitk AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM documents WHERE doc_id % 5 = 0) WHERE word <> ''),
      wpie AS (
        SELECT t.doc_id, len(w.segs) AS np,
               CAST(w.is_unk AS INT) AS u
        FROM wpitk t JOIN wpinc_fin w ON t.word = w.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(np) AS BIGINT) AS n_pieces,
             CAST(sum(u) AS BIGINT) AS n_unk_words,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS fertility
      FROM wpie GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      val segs = wpIncrSegs(s, dir)
        .select(col("word"), size(col("segs")).as("np"),
          col("is_unk").cast("int").as("u"))
      tok.join(segs, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_pieces"),
          sum("u").cast("long").as("n_unk_words"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("fertility"))
        .orderBy("doc_id")
    },

    // Tokenizer A/B/C/D — BPE vs byte-level BPE vs unigram-LM vs
    // WordPiece on the same corpus: emitted vocabulary size (distinct
    // pieces actually used), total word occurrences, total pieces,
    // fertility (pieces per word occurrence), and chars-per-piece
    // (compression). The row a tokenizer owner reads to pick the
    // family; all four tokenizations come from the SAME shared fitted
    // artifacts the learn/encode rows already hash-check. The byte
    // arm is trained on the multilingual derivation (its raison
    // d'être — the other three only see the ASCII corpus) while all
    // four arms are EVALUATED on the same plain-corpus tokens, every
    // one of which the byte vocabulary contains (the derivation
    // appends, never removes) — what the byte arm buys is the
    // [UNK]-free total alphabet, visible against wordpiece's n_unk
    // accounting.
    Q("q_t_tokenizer_ab", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges)},
      ${graft.text.Bpe.oracleBytesCtes(BpeMerges).trim},
      $unigramCtes,
      $wordpieceCtes,
      abtk AS (
        SELECT word FROM (
          SELECT unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM documents) WHERE word <> ''),
      abbpe AS (
        SELECT t.word, w.s AS pieces
        FROM abtk t JOIN bw_$BpeMerges w ON t.word = w.word),
      abbyt AS (
        SELECT t.word, w.s AS pieces
        FROM abtk t JOIN byw_$BpeMerges w ON t.word = w.word),
      abuni AS (
        SELECT t.word, w.segs AS pieces
        FROM abtk t JOIN uenc_fin w ON t.word = w.word),
      abwp AS (
        SELECT t.word, w.segs AS pieces
        FROM abtk t JOIN wpenc_fin w ON t.word = w.word),
      abstat AS (
        SELECT 'bpe_bytes' AS tokenizer,
               (SELECT count(DISTINCT piece) FROM
                 (SELECT unnest(pieces) AS piece FROM abbyt))
                 AS n_vocab_used,
               CAST(count(*) AS BIGINT) AS n_word_occurrences,
               CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
               round(CAST(sum(len(pieces)) AS DOUBLE) / count(*), 9)
                 AS fertility,
               round(CAST(sum(len(word)) AS DOUBLE)
                 / sum(len(pieces)), 9) AS chars_per_piece
        FROM abbyt
        UNION ALL
        SELECT 'bpe' AS tokenizer,
               (SELECT count(DISTINCT piece) FROM
                 (SELECT unnest(pieces) AS piece FROM abbpe))
                 AS n_vocab_used,
               CAST(count(*) AS BIGINT) AS n_word_occurrences,
               CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
               round(CAST(sum(len(pieces)) AS DOUBLE) / count(*), 9)
                 AS fertility,
               round(CAST(sum(len(word)) AS DOUBLE)
                 / sum(len(pieces)), 9) AS chars_per_piece
        FROM abbpe
        UNION ALL
        SELECT 'unigram',
               (SELECT count(DISTINCT piece) FROM
                 (SELECT unnest(pieces) AS piece FROM abuni)),
               CAST(count(*) AS BIGINT),
               CAST(sum(len(pieces)) AS BIGINT),
               round(CAST(sum(len(pieces)) AS DOUBLE) / count(*), 9),
               round(CAST(sum(len(word)) AS DOUBLE)
                 / sum(len(pieces)), 9)
        FROM abuni
        UNION ALL
        SELECT 'wordpiece',
               (SELECT count(DISTINCT piece) FROM
                 (SELECT unnest(pieces) AS piece FROM abwp)),
               CAST(count(*) AS BIGINT),
               CAST(sum(len(pieces)) AS BIGINT),
               round(CAST(sum(len(pieces)) AS DOUBLE) / count(*), 9),
               round(CAST(sum(len(word)) AS DOUBLE)
                 / sum(len(pieces)), 9)
        FROM abwp)
      SELECT * FROM abstat ORDER BY tokenizer""")) { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      def stats(name: String, table: DataFrame) = {
        val joined = tok.join(table, Seq("word"))
        val used = joined
          .select(explode(col("pieces")).as("piece"))
          .agg(countDistinct("piece").as("n_vocab_used"))
        joined.agg(
            count(lit(1)).as("n_word_occurrences"),
            sum(size(col("pieces"))).cast("long").as("n_pieces"),
            round(sum(size(col("pieces"))).cast("double")
              / count(lit(1)), 9).as("fertility"),
            round(sum(length(col("word"))).cast("double")
              / sum(size(col("pieces"))), 9).as("chars_per_piece"))
          .crossJoin(broadcast(used))
          .select(lit(name).as("tokenizer"), col("n_vocab_used"),
            col("n_word_occurrences"), col("n_pieces"),
            col("fertility"), col("chars_per_piece"))
      }
      val bpe = bpeVocab(s, dir)
        .select(col("word"), col("syms").as("pieces"))
      val byt = bpeBytesVocab(s, dir)
        .select(col("word"), col("syms").as("pieces"))
      val uni = uniLearned(s, dir).wordSegs
        .select(col("word"), col("segs").as("pieces"))
      val wp = wpSegs(s, dir)
        .select(col("word"), col("segs").as("pieces"))
      stats("bpe", bpe).unionByName(stats("bpe_bytes", byt))
        .unionByName(stats("unigram", uni))
        .unionByName(stats("wordpiece", wp))
        .orderBy("tokenizer")
    },

    // INCREMENTAL unigram encode — the unigram twin of
    // q_t_bpe_encode_incr (the add-without-retrain tokenizer
    // lifecycle): the vocabulary is fitted ONLY on the standing index
    // corpus (doc_id % 5 <> 0), frozen, and the new batch encodes
    // under it with the single-char unk-floor fallback carrying any
    // character the index never saw — the unseen-input path,
    // exercised END-TO-END by the oracle (not just spec-locked).
    // Per-doc piece accounting plus the count of floor-priced unk
    // pieces (pieces absent from the frozen vocabulary).
    Q("q_t_unigram_encode_incr", Some(s"""
      WITH ${graft.text.Unigram.oracleCtes(UniSeed, UniL, UniRounds,
        UniKeep, UniUnk, UniMaxW, docFilter = "doc_id % 5 <> 0")},
      ${graft.text.Unigram.oracleEncodeCtes("uinc",
        "doc_id % 5 = 0", UniL, UniMaxW, UniUnk).trim},
      ytk AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
          FROM documents WHERE doc_id % 5 = 0) WHERE word <> ''),
      ywp AS (
        SELECT t.doc_id, w.segs FROM ytk t
        JOIN uinc_fin w ON t.word = w.word),
      ypc AS (
        SELECT doc_id, unnest(segs) AS piece FROM ywp),
      yagg AS (
        SELECT p.doc_id, count(*) AS np,
               sum(CASE WHEN v.piece IS NULL THEN 1 ELSE 0 END)
                 AS nunk
        FROM ypc p LEFT JOIN uvocab v USING (piece) GROUP BY 1),
      ywc AS (SELECT doc_id, count(*) AS nw FROM ywp GROUP BY 1)
      SELECT w.doc_id, CAST(w.nw AS BIGINT) AS n_words,
             CAST(a.np AS BIGINT) AS n_pieces,
             CAST(a.nunk AS BIGINT) AS n_unk_pieces,
             round(CAST(a.np AS DOUBLE) / w.nw, 9) AS fertility
      FROM ywc w JOIN yagg a USING (doc_id)
      ORDER BY doc_id""")) { (s, dir) =>
      val fit = uniIncrLearned(s, dir)
      val batchDocs = t(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0)
      val batchWords = graft.text.Bpe.wordTable(batchDocs)
      val maxLen = batchWords.agg(max(length(col("word"))))
        .head().getInt(0)
      require(maxLen <= UniMaxW,
        s"batch word length $maxLen exceeds unigram.max_word_len")
      val lpMap = fit.vocab
      val segs = graft.text.Unigram.segmentWords(batchWords, lpMap,
          UniL, UniUnk)
        .select(col("word"), size(col("segs")).as("np"),
          size(filter(col("segs"),
            p => !p.isin(lpMap.keys.toSeq.map(lit): _*))).as("nunk"))
      batchDocs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .join(segs, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("np").cast("long").as("n_pieces"),
          sum("nunk").cast("long").as("n_unk_pieces"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("fertility"))
        .orderBy("doc_id")
    },

    // Perplexity-bucket AGREEMENT — add-one vs Kneser-Ney: the 3×3
    // confusion matrix of the two bucketings plus each cell's share,
    // the row a filter owner reads to see how much the smoothing
    // upgrade actually MOVES the CCNet gate (diagonal share = docs
    // whose head/middle/tail verdict is smoothing-invariant). Both
    // inputs are the already-hash-checked shared stages; one join on
    // doc_id, exact-count shares.
    Q("q_t_ppl_agreement", Some(s"""
      WITH $pplCtes,
      ${graft.text.KneserNey.oracleCtes(KnDiscount).trim},
      agg1 AS (
        SELECT d.doc_id, $pplBucketCase AS b1
        FROM pb_d d JOIN pb_cut c USING (lang)),
      knd2 AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl FROM knd),
      knr AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM knd2),
      kncut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM knr GROUP BY 1),
      agg2 AS (
        SELECT d.doc_id,
               CASE WHEN d.ppl <= c.cut1 THEN 'head'
                    WHEN d.ppl <= c.cut2 THEN 'middle'
                    ELSE 'tail' END AS b2
        FROM knd2 d JOIN kncut c USING (lang)),
      am AS (
        SELECT a.b1 AS bucket_addone, b.b2 AS bucket_kn,
               count(*) AS n_docs
        FROM agg1 a JOIN agg2 b USING (doc_id) GROUP BY 1, 2),
      at AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM am)
      SELECT bucket_addone, bucket_kn,
             CAST(n_docs AS BIGINT) AS n_docs,
             round(n_docs / at.tot, 9) AS share
      FROM am CROSS JOIN at
      ORDER BY bucket_addone, bucket_kn""")) { (s, dir) =>
      val a1 = pplBucketed(s, dir)
        .select(col("doc_id"), col("ppl_bucket").as("bucket_addone"))
      val a2 = knBucketed(s, dir)
        .select(col("doc_id"), col("ppl_bucket").as("bucket_kn"))
      val am = a1.join(a2, "doc_id")
        .groupBy("bucket_addone", "bucket_kn")
        .agg(count(lit(1)).as("n_docs"))
      val tot = am.agg(sum("n_docs").cast("double").as("tot"))
      am.crossJoin(broadcast(tot))
        .select(col("bucket_addone"), col("bucket_kn"), col("n_docs"),
          round(col("n_docs") / col("tot"), 9).as("share"))
        .orderBy("bucket_addone", "bucket_kn")
    },

    // INCREMENTAL BPE encode — the tokenizer analogue of the
    // add-without-train index lifecycle: merges learned ONLY on the
    // standing index corpus (doc_id % 5 <> 0) are the frozen artifact;
    // the new batch is encoded by APPLYING them in rank order
    // (Bpe.applyMerges fold chain — what a real tokenizer runs on
    // vocabulary cache misses), with per-doc OOV-word counts against
    // the index vocabulary. The oracle re-learns on the index slice
    // and runs the SAME island-parity apply rounds over the batch
    // vocabulary — fold and SQL formulations of one rule, both
    // hash-checked.
    Q("q_t_bpe_encode_incr", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges,
        docFilter = "doc_id % 5 <> 0")},
      ${graft.text.Bpe.vocabCte("ab_0",
        docFilter = "doc_id % 5 = 0").trim},
      ${graft.text.Bpe.oracleApplyCtes(BpeMerges, "ab").trim},
      btk AS (
        SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
        FROM documents WHERE doc_id % 5 = 0),
      enc AS (
        SELECT t.doc_id, len(w.s) AS np,
               (iv.word IS NULL) AS oov
        FROM btk t JOIN ab_$BpeMerges w ON t.word = w.word
             LEFT JOIN (SELECT word FROM bw_0) iv ON t.word = iv.word)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov_words,
             CAST(sum(np) AS BIGINT) AS n_bpe_tokens,
             round(CAST(sum(np) AS DOUBLE) / count(*), 9)
               AS pieces_per_word
      FROM enc GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val (merges, _) = bpeIncrLearned(s, dir)
      val batch = t(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0)
      val applied = batchAppliedVocab(s, dir, merges)
        .select(col("word"), size(col("syms")).as("np"))
      val tok = batch.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
      tok.join(applied, Seq("word"))
        .join(bpeIncrVocab(s, dir)
          .select(col("word"), lit(true).as("seen")), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("seen").isNull, 1L).otherwise(0L))
            .as("n_oov_words"),
          sum("np").cast("long").as("n_bpe_tokens"),
          round(sum("np").cast("double") / count(lit(1)), 9)
            .as("pieces_per_word"))
        .orderBy("doc_id")
    },

    // Quality scoring battery (length/stopword/digit ratios → score)
    Q("q_t_quality", Some(s"""
      WITH b AS (
        SELECT doc_id, text, regexp_split_to_array(text, '[[:space:]]+') AS t,
               length(text) AS nc FROM documents)
      SELECT doc_id,
             len(t) AS n_tokens,
             round(CAST(nc - (len(t) - 1) AS DOUBLE) / len(t), 9)
               AS mean_tok_len,
             round(CAST(len(list_filter(t, x -> x IN $stop)) AS DOUBLE)
               / len(t), 9) AS stop_ratio,
             round(CAST(nc - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE) / nc, 9) AS digit_ratio,
             round(0.4 * (CAST(least(nc, 400) AS DOUBLE) / 400.0)
               + 0.4 * (1.0 - CAST(nc - length(regexp_replace(text, '[0-9]',
                   '', 'g')) AS DOUBLE) / nc)
               + 0.2 * least((CAST(len(list_filter(t, x -> x IN $stop))
                   AS DOUBLE) / len(t)) * 4.0, 1.0), 9) AS quality_score
      FROM b ORDER BY doc_id""")) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id") +: TextOps.qualityFeatures(col("text")): _*)
        .orderBy("doc_id")
    },

    // Language-ID marker heuristic vs labeled lang
    Q("q_t_langid", Some {
      val scoreCols = TextOps.LangMarkers.map { case (l, ms) =>
        val in = ms.map(m => s"'$m'").mkString("(", ", ", ")")
        s"len(list_filter(t, x -> x IN $in)) AS score_$l"
      }.mkString(",\n             ")
      val langs = TextOps.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      val pred = langs.map(l => s"WHEN score_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      s"""
      WITH b AS (SELECT doc_id, lang, regexp_split_to_array(text, '[[:space:]]+') AS t
                 FROM documents),
      sc AS (SELECT doc_id, lang,
             $scoreCols
             FROM b)
      SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
             $pred AS predicted,
             ($pred) = lang AS is_correct
      FROM sc ORDER BY doc_id"""
    }) { (s, dir) =>
      val scored = t(s, dir, "documents")
        .select(Seq(col("doc_id"), col("lang"))
          ++ TextOps.langScores(col("text")): _*)
      scored
        .withColumn("predicted", TextOps.predictedLang)
        .withColumn("is_correct", col("predicted") === col("lang"))
        .orderBy("doc_id")
    },

    // Gopher-style repetition metrics: top-token share, distinct-token
    // ratio, duplicate-bigram fraction, and the repetitiveness flag —
    // the "repeated content" quality gate of a training-data pipeline.
    // One shuffle keyed by (doc_id, term) then doc_id; the bigram stats
    // are pure per-doc array programs.
    Q("q_t_repetition", Some("""
      WITH b AS (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t
                 FROM documents),
      tk AS (SELECT doc_id, unnest(t) AS term FROM b),
      tf AS (SELECT doc_id, term, count(*) AS c FROM tk GROUP BY 1, 2),
      ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                    CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(max(c) AS BIGINT) AS top_c
             FROM tf GROUP BY 1),
      bg AS (SELECT doc_id,
                    CAST(len(list_distinct(list_transform(
                      range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])))
                      AS BIGINT) AS n_bg_distinct
             FROM b)
      SELECT ts.doc_id, ts.n_tokens, ts.n_distinct,
             round(CAST(ts.top_c AS DOUBLE) / ts.n_tokens, 9)
               AS top_token_share,
             round(CAST(ts.n_distinct AS DOUBLE) / ts.n_tokens, 9)
               AS distinct_ratio,
             CASE WHEN ts.n_tokens >= 2 THEN
               round(1.0 - CAST(bg.n_bg_distinct AS DOUBLE)
                 / (ts.n_tokens - 1), 9) END AS dup_bigram_frac,
             (round(CAST(ts.top_c AS DOUBLE) / ts.n_tokens, 9) > 0.2
               OR coalesce(CASE WHEN ts.n_tokens >= 2 THEN
                    round(1.0 - CAST(bg.n_bg_distinct AS DOUBLE)
                      / (ts.n_tokens - 1), 9) END, 0.0) > 0.5)
               AS is_repetitive
      FROM ts JOIN bg ON ts.doc_id = bg.doc_id
      ORDER BY ts.doc_id""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tk = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val ts = tk.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
      val bg = docs.select(col("doc_id"),
        size(TextOps.shingles(col("text"), 2)).cast("long")
          .as("n_bg_distinct"))
      val topShare = round(col("top_c").cast("double") / col("n_tokens"), 9)
      val dupBg = when(col("n_tokens") >= 2,
        round(lit(1.0) - col("n_bg_distinct").cast("double")
          / (col("n_tokens") - 1), 9))
      ts.join(bg, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          topShare.as("top_token_share"),
          round(col("n_distinct").cast("double") / col("n_tokens"), 9)
            .as("distinct_ratio"),
          dupBg.as("dup_bigram_frac"),
          (topShare > 0.2 || coalesce(dupBg, lit(0.0)) > 0.5)
            .as("is_repetitive"))
        .orderBy("doc_id")
    },

    // End-to-end per-doc curation decision table: exact-dup keeper ∪
    // MinHash near-dup ∪ quality gates folded into one keep/drop
    // decision with a precedence-ordered reason — the operator a
    // production corpus pipeline actually materializes per document.
    Q("q_t_dedup_policy", Some(s"""
      WITH $minhashCtes,
      fp AS (
        SELECT doc_id,
               doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
                 AS exact_dup
        FROM documents),
      nd AS (SELECT DISTINCT d2 AS doc_id FROM mh_pairs),
      qf AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               round(0.4 * (CAST(least(nc, 400) AS DOUBLE) / 400.0)
                 + 0.4 * (1.0 - CAST(nc - length(regexp_replace(text,
                     '[0-9]', '', 'g')) AS DOUBLE) / nc)
                 + 0.2 * least((CAST(len(list_filter(t, x -> x IN $stop))
                     AS DOUBLE) / len(t)) * 4.0, 1.0), 9) AS quality_score,
               round(CAST(nc - length(regexp_replace(text, '[0-9]', '',
                 'g')) AS DOUBLE) / nc, 9) AS digit_ratio
        FROM (SELECT doc_id, text, regexp_split_to_array(text, '[[:space:]]+') AS t,
                     length(text) AS nc FROM documents)),
      dec AS (
        SELECT f.doc_id, f.exact_dup,
               nd.doc_id IS NOT NULL AS near_dup,
               (q.n_tokens >= 10 AND q.quality_score >= 0.5
                 AND q.digit_ratio <= 0.3) AS quality_pass
        FROM fp f LEFT JOIN nd ON f.doc_id = nd.doc_id
        JOIN qf q ON f.doc_id = q.doc_id)
      SELECT doc_id, exact_dup, near_dup, quality_pass,
             CASE WHEN exact_dup THEN 'drop_exact_dup'
                  WHEN near_dup THEN 'drop_near_dup'
                  WHEN NOT quality_pass THEN 'drop_quality'
                  ELSE 'keep' END AS decision
      FROM dec ORDER BY doc_id""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val fp = Dedup.exactDups(docs)
        .select(col("doc_id"), col("is_dup").as("exact_dup"))
      val nd = mhPairs(s, dir)
        .select(col("d2").as("doc_id")).distinct()
        .withColumn("near_dup", lit(true))
      val qf = docs
        .select(col("doc_id") +: TextOps.qualityFeatures(col("text")): _*)
        .select("doc_id", "n_tokens", "quality_score", "digit_ratio")
      fp.join(nd, Seq("doc_id"), "left")
        .join(qf, "doc_id")
        .withColumn("near_dup", coalesce(col("near_dup"), lit(false)))
        .withColumn("quality_pass",
          col("n_tokens") >= 10 && col("quality_score") >= 0.5
            && col("digit_ratio") <= 0.3)
        .select(col("doc_id"), col("exact_dup"), col("near_dup"),
          col("quality_pass"),
          when(col("exact_dup"), "drop_exact_dup")
            .when(col("near_dup"), "drop_near_dup")
            .when(!col("quality_pass"), "drop_quality")
            .otherwise("keep").as("decision"))
        .orderBy("doc_id")
    },

    // Content fingerprint + exact-dup flags (canonical keeper = min doc_id)
    Q("q_t_fingerprint", Some("""
      SELECT doc_id, md5(text) AS fp,
             count(*) OVER (PARTITION BY md5(text)) AS dup_n,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
             doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Dedup.exactDups(t(s, dir, "documents")).orderBy("doc_id")
    },

    // n-gram Jaccard near-dup pairs with shingle-frequency pruning
    Q("q_d_jaccard", Some(s"""
      WITH $shingleCte,
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM sh GROUP BY 1)
               WHERE c <= $JaccMaxFreq),
      pr AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON s.sh = r.sh),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM pr a JOIN pr b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, inter, s1.n_sh AS n1, s2.n_sh AS n2,
             round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter), 9)
               AS jaccard
      FROM shared
      JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      WHERE round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter), 9)
            >= $JaccMinSim
      ORDER BY d1, d2""")) { (s, dir) =>
      jaccTruth(s, dir).orderBy("d1", "d2")
    },

    // LSH quality harness — the dedup-family analogue of the ANN
    // recall ladder: candidate recall of MinHash banding against the
    // exact (frequency-pruned) Jaccard truth at the family's own
    // blocking policy, plus the signature estimate's MAE on the
    // pairs both methods see. One row; both sides reuse the family's
    // shared stages/CTEs so the A/B can never drift from the
    // operators it grades.
    Q("q_d_lsh_quality", Some {
      val agree = (0 until 8).map(j =>
        s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH $minhashCtes,
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM sh GROUP BY 1)
               WHERE c <= $JaccMaxFreq),
      pr AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON s.sh = r.sh),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM pr a JOIN pr b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS (
        SELECT d1, d2,
               round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter),
                 9) AS jac
        FROM shared JOIN sizes s1 ON d1 = s1.doc_id
             JOIN sizes s2 ON d2 = s2.doc_id
        WHERE round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter),
                9) >= $JaccMinSim),
      est AS (
        SELECT p.d1, p.d2, CAST(($agree) AS DOUBLE) / 8 AS est_sim
        FROM mh_pairs p JOIN sig sa ON p.d1 = sa.doc_id
             JOIN sig sb ON p.d2 = sb.doc_id),
      hit AS (
        SELECT count(*) AS n_hit,
               round(CAST(sum(CAST(abs(e.est_sim - t.jac)
                 AS DECIMAL(38,18))) AS DOUBLE) / count(*), 9) AS est_mae
        FROM truth t JOIN est e ON t.d1 = e.d1 AND t.d2 = e.d2)
      SELECT (SELECT count(*) FROM truth) AS n_true,
             (SELECT count(*) FROM est) AS n_cand,
             n_hit,
             round(CAST(n_hit AS DOUBLE)
               / (SELECT count(*) FROM truth), 9) AS recall,
             est_mae
      FROM hit"""
    }) { (s, dir) =>
      val truth = jaccTruth(s, dir)
        .select(col("d1"), col("d2"), col("jaccard").as("jac"))
      val est = mhPairs(s, dir)
        .select(col("d1"), col("d2"), col("est_sim"))
      val hit = truth.join(est, Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_hit"),
          round(sum(abs(col("est_sim") - col("jac"))
              .cast("decimal(38,18)")).cast("double")
            / count(lit(1)), 9).as("est_mae"))
      val nt = truth.agg(count(lit(1)).as("n_true"))
      val nc = est.agg(count(lit(1)).as("n_cand"))
      nt.crossJoin(broadcast(nc)).crossJoin(broadcast(hit))
        .select(col("n_true"), col("n_cand"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_true"), 9)
            .as("recall"),
          col("est_mae"))
    },

    // The S-curve banding TUNER'S report card: the layout
    // Dedup.deriveBanding picked for the live min_jaccard threshold
    // (bands, rows/band, the curve's transition point (1/b)^(1/r)),
    // with the measured candidate recall of that banding against the
    // exact Jaccard truth — overall (every pair ≥ the threshold) and
    // on the PLANTED near-dups (jac ≥ 0.5, far above the incidental-
    // overlap regime). One row; reuses the family's shared stages, so
    // the report grades exactly the banding the operators run.
    Q("q_d_lsh_tune", Some {
      val k = TextOps.MinHashParams.size
      val (nb, r) = LshLayout
      // curve threshold rounded driver-side and inlined as ONE literal
      // on both sides (pow is libm — last-ulp portable is not worth
      // proving when the value is a constant)
      val thr = BigDecimal(math.pow(1.0 / nb, 1.0 / r))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      s"""
      WITH $minhashCtes,
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM sh GROUP BY 1)
               WHERE c <= $JaccMaxFreq),
      pr AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON s.sh = r.sh),
      shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM pr a JOIN pr b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS (
        SELECT d1, d2,
               round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter),
                 9) AS jac
        FROM shared JOIN sizes s1 ON d1 = s1.doc_id
             JOIN sizes s2 ON d2 = s2.doc_id
        WHERE round(CAST(inter AS DOUBLE) / (s1.n_sh + s2.n_sh - inter),
                9) >= $JaccMinSim),
      gr AS (
        SELECT count(*) AS n_true,
               count(*) FILTER (c.d1 IS NOT NULL) AS n_hit,
               count(*) FILTER (jac >= 0.5) AS n_planted,
               count(*) FILTER (jac >= 0.5 AND c.d1 IS NOT NULL)
                 AS n_planted_hit
        FROM truth t LEFT JOIN mh_pairs c
          ON t.d1 = c.d1 AND t.d2 = c.d2)
      SELECT $k AS n_hashes, $nb AS bands, $r AS rows_per_band,
             CAST($thr AS DOUBLE) AS curve_threshold,
             (SELECT count(*) FROM mh_pairs) AS n_cand,
             n_true, n_hit,
             round(CAST(n_hit AS DOUBLE) / n_true, 9) AS recall,
             n_planted, n_planted_hit,
             round(CAST(n_planted_hit AS DOUBLE) / n_planted, 9)
               AS recall_planted
      FROM gr"""
    }) { (s, dir) =>
      val k = TextOps.MinHashParams.size
      val (nb, r) = LshLayout
      val thr = BigDecimal(math.pow(1.0 / nb, 1.0 / r))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val truth = jaccTruth(s, dir)
        .select(col("d1"), col("d2"), col("jaccard").as("jac"))
      val cand = mhPairs(s, dir)
        .select(col("d1"), col("d2"), lit(1).as("hit"))
      val gr = truth.join(cand, Seq("d1", "d2"), "left")
        .agg(count(lit(1)).as("n_true"),
          count(col("hit")).as("n_hit"),
          count(when(col("jac") >= 0.5, 1)).as("n_planted"),
          count(when(col("jac") >= 0.5, col("hit"))).as("n_planted_hit"))
      val nc = mhPairs(s, dir).agg(count(lit(1)).as("n_cand"))
      gr.crossJoin(broadcast(nc))
        .select(lit(k).as("n_hashes"), lit(nb).as("bands"),
          lit(r).as("rows_per_band"), lit(thr).as("curve_threshold"),
          col("n_cand"), col("n_true"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_true"), 9)
            .as("recall"),
          col("n_planted"), col("n_planted_hit"),
          round(col("n_planted_hit").cast("double") / col("n_planted"), 9)
            .as("recall_planted"))
    },

    // LSH recall at the operating point, END-TO-END: q_d_lsh_tune
    // grades candidate pairs, but what dedup actually consumes is the
    // COMPONENT map — this row reports pair-level component-membership
    // agreement between the LSH-derived components (est-verified band
    // candidates ∪ exact-fp star edges, the docComponents policy) and
    // the exact-Jaccard truth components at the same threshold.
    // comp_recall = of doc pairs the truth closure puts together, the
    // fraction the LSH closure also puts together (what end-to-end
    // dedup LOSES to banding); comp_precision = the converse (what it
    // over-merges). Same-component pair expansion is bounded by max
    // component size — the est-verification floor (the r10
    // mega-component fix) is exactly what keeps this feasible at
    // corpus scale. Settings guidance: dedup.component_min_est
    // scaladoc.
    Q("q_d_lsh_e2e", Some {
      val (nb, r) = LshLayout
      s"""
      WITH RECURSIVE $componentCtes,
      tsz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      trr AS (SELECT sh FROM (SELECT sh, count(*) AS c FROM sh
              GROUP BY 1) WHERE c <= $JaccMaxFreq),
      tpr AS (SELECT s.doc_id, s.sh FROM sh s JOIN trr r ON s.sh = r.sh),
      tsh AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        FROM tpr a JOIN tpr b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      ttr AS (
        SELECT d1, d2 FROM tsh
        JOIN tsz s1 ON d1 = s1.doc_id JOIN tsz s2 ON d2 = s2.doc_id
        WHERE round(CAST(inter AS DOUBLE)
          / (s1.n_sh + s2.n_sh - inter), 9) >= $JaccMinSim),
      tal AS (SELECT d1, d2 FROM ttr
              UNION SELECT d1, d2 FROM fp_pairs),
      ted AS (SELECT d1 AS a, d2 AS b FROM tal
              UNION SELECT d2, d1 FROM tal),
      trh (a, b) AS (
        SELECT a, b FROM ted
        UNION
        SELECT r.a, e.b FROM trh r JOIN ted e ON r.b = e.a),
      tcm AS (
        SELECT d.doc_id,
               least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS tcomp
        FROM documents d LEFT JOIN trh r ON r.a = d.doc_id
        GROUP BY d.doc_id),
      emm AS (
        SELECT c.doc_id, t.tcomp, c.comp_id AS lcomp
        FROM comp c JOIN tcm t USING (doc_id)),
      etp AS (
        SELECT a.lcomp = b.lcomp AS hit
        FROM emm a JOIN emm b
          ON a.tcomp = b.tcomp AND a.doc_id < b.doc_id),
      elp AS (
        SELECT a.tcomp = b.tcomp AS hit
        FROM emm a JOIN emm b
          ON a.lcomp = b.lcomp AND a.doc_id < b.doc_id)
      SELECT $nb AS bands, $r AS rows_per_band,
             CAST($CompMinEst AS DOUBLE) AS comp_min_est,
             (SELECT CAST(count(*) AS BIGINT) FROM emm) AS n_docs,
             (SELECT CAST(count(DISTINCT tcomp) AS BIGINT) FROM emm)
               AS n_truth_comps,
             (SELECT CAST(count(DISTINCT lcomp) AS BIGINT) FROM emm)
               AS n_lsh_comps,
             (SELECT CAST(count(*) AS BIGINT) FROM etp) AS n_truth_pairs,
             (SELECT CAST(count(*) FILTER (hit) AS BIGINT) FROM etp)
               AS n_pairs_hit,
             round(CASE WHEN (SELECT count(*) FROM etp) > 0
               THEN CAST((SELECT count(*) FILTER (hit) FROM etp)
                 AS DOUBLE) / (SELECT count(*) FROM etp) END, 9)
               AS comp_recall,
             (SELECT CAST(count(*) AS BIGINT) FROM elp) AS n_lsh_pairs,
             (SELECT CAST(count(*) FILTER (hit) AS BIGINT) FROM elp)
               AS n_lsh_hit,
             round(CASE WHEN (SELECT count(*) FROM elp) > 0
               THEN CAST((SELECT count(*) FILTER (hit) FROM elp)
                 AS DOUBLE) / (SELECT count(*) FROM elp) END, 9)
               AS comp_precision"""
    }) { (s, dir) =>
      val (nb, r) = LshLayout
      val m = docComponents(s, dir)
        .select(col("doc_id"), col("comp_id").as("lcomp"))
        .join(truthComponents(s, dir)
          .select(col("doc_id"), col("comp_id").as("tcomp")), "doc_id")
      val a = m.select(col("doc_id").as("da"), col("tcomp").as("ta"),
        col("lcomp").as("la"))
      val b = m.select(col("doc_id").as("db"), col("tcomp").as("tb"),
        col("lcomp").as("lb"))
      val tp = a.join(b, col("ta") === col("tb") && col("da") < col("db"))
        .agg(count(lit(1)).as("n_truth_pairs"),
          sum(when(col("la") === col("lb"), 1L).otherwise(0L))
            .as("n_pairs_hit"))
      val lp = a.join(b, col("la") === col("lb") && col("da") < col("db"))
        .agg(count(lit(1)).as("n_lsh_pairs"),
          sum(when(col("ta") === col("tb"), 1L).otherwise(0L))
            .as("n_lsh_hit"))
      val counts = m.agg(count(lit(1)).as("n_docs"),
        countDistinct("tcomp").as("n_truth_comps"),
        countDistinct("lcomp").as("n_lsh_comps"))
      counts.crossJoin(broadcast(tp)).crossJoin(broadcast(lp))
        .select(lit(nb).as("bands"), lit(r).as("rows_per_band"),
          lit(CompMinEst).as("comp_min_est"),
          col("n_docs"), col("n_truth_comps"), col("n_lsh_comps"),
          col("n_truth_pairs"), col("n_pairs_hit"),
          round(when(col("n_truth_pairs") > 0,
            col("n_pairs_hit").cast("double") / col("n_truth_pairs")), 9)
            .as("comp_recall"),
          col("n_lsh_pairs"), col("n_lsh_hit"),
          round(when(col("n_lsh_pairs") > 0,
            col("n_lsh_hit").cast("double") / col("n_lsh_pairs")), 9)
            .as("comp_precision"))
    },

    // MinHash + LSH banding candidate pairs with estimated similarity
    Q("q_d_minhash", Some {
      val agree = (0 until 8).map(j =>
        s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH $minhashCtes
      SELECT d1, d2, CAST(($agree) AS DOUBLE) / 8 AS est_sim
      FROM mh_pairs
      JOIN sig sa ON d1 = sa.doc_id JOIN sig sb ON d2 = sb.doc_id
      ORDER BY d1, d2"""
    }) { (s, dir) =>
      mhPairs(s, dir).orderBy("d1", "d2")
    },

    // Edit-distance refinement of the LSH candidate set: banding
    // recalls pairs, then the TRUE metric — Levenshtein on an 80-char
    // prefix — is paid only on |candidates| rows, never the n² corpus
    // (the same recall-then-refine shape as the ANN re-rank). Both
    // engines' levenshtein is the standard unit-cost edit distance, so
    // the verified flag is integer-exact.
    Q("q_d_editdist", Some(s"""
      WITH $minhashCtes,
      pfx AS (SELECT doc_id, substring(text, 1, 80) AS p
              FROM documents)
      SELECT d1, d2, levenshtein(a.p, b.p) AS lev,
             length(a.p) AS len1, length(b.p) AS len2,
             CASE WHEN levenshtein(a.p, b.p) <= 20 THEN 1 ELSE 0 END
               AS verified
      FROM mh_pairs
      JOIN pfx a ON d1 = a.doc_id JOIN pfx b ON d2 = b.doc_id
      ORDER BY d1, d2""")) { (s, dir) =>
      Dedup.editDistanceVerify(mhPairs(s, dir),
          t(s, dir, "documents"), prefixLen = 80, maxDist = 20)
        .orderBy("d1", "d2")
    },

    // Incremental (batch-vs-index) dedup: docs with doc_id % 5 = 0 play
    // the newly-delivered batch, the rest the standing index; each
    // batch doc is classified exact_dup / near_dup / novel with its
    // best index match. The oracle mirrors the same fingerprint join,
    // band-key join, and argmax-similarity tie-break.
    Q("q_t_incr_dedup", Some {
      val agree = (0 until 8).map(j =>
        s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH $minhashCtes,
      fpb AS (SELECT doc_id, md5(text) AS fp FROM documents
              WHERE doc_id % 5 = 0),
      fpi AS (SELECT md5(text) AS fp, min(doc_id) AS ex_id
              FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1),
      exact AS (SELECT fpb.doc_id, fpi.ex_id
                FROM fpb LEFT JOIN fpi USING (fp)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bx a JOIN bx b
                 ON a.band_idx = b.band_idx AND a.key = b.key
               WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
      sims AS (SELECT d1, d2, CAST(($agree) AS DOUBLE) / 8 AS est
               FROM cand
               JOIN sig sa ON d1 = sa.doc_id
               JOIN sig sb ON d2 = sb.doc_id),
      best AS (SELECT d1, d2, est, row_number() OVER (
                 PARTITION BY d1 ORDER BY est DESC, d2) AS rn
               FROM sims WHERE est >= 0.5)
      SELECT b.doc_id,
             CASE WHEN e.ex_id IS NOT NULL THEN 'exact_dup'
                  WHEN n.d2 IS NOT NULL THEN 'near_dup'
                  ELSE 'novel' END AS verdict,
             CASE WHEN e.ex_id IS NOT NULL THEN e.ex_id
                  ELSE n.d2 END AS match_id,
             CASE WHEN e.ex_id IS NULL THEN n.est END AS est_sim
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) b
      LEFT JOIN exact e ON e.doc_id = b.doc_id
      LEFT JOIN (SELECT * FROM best WHERE rn = 1) n ON n.d1 = b.doc_id
      ORDER BY b.doc_id"""
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val sigs = docSigs(s, dir)
      Dedup.incrementalClassifyFromSigs(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          sigs.filter(col("doc_id") % 5 =!= 0),
          sigs.filter(col("doc_id") % 5 === 0),
          minSim = 0.5, rowsPerBand = LshLayout._2)
        .orderBy("doc_id")
    },

    // Duplicate-cluster assignment: connected components over the union
    // of exact-fingerprint star edges and MinHash candidate pairs —
    // min-label propagation on the Spark side, recursive-CTE transitive
    // closure as the oracle; every doc gets (component, size, keeper)
    Q("q_d_components", Some(s"""
      WITH RECURSIVE $componentCtes
      SELECT doc_id, comp_id,
             count(*) OVER (PARTITION BY comp_id) AS cluster_size,
             doc_id = comp_id AS is_canonical
      FROM comp ORDER BY doc_id""")) { (s, dir) =>
      docComponents(s, dir).orderBy("doc_id")
    },

    // Leakage-safe train/heldout split: assignment hashes the duplicate
    // COMPONENT id, not the doc id, so every near-dup cluster lands
    // wholly on one side — the split you must use before eval-set
    // carve-out or memorization measurement (doc-hash splits leak
    // near-identical docs across the boundary).
    Q("q_t_split_leakfree", Some(s"""
      WITH RECURSIVE $componentCtes,
      sized AS (
        SELECT doc_id, comp_id,
               count(*) OVER (PARTITION BY comp_id) AS cluster_size
        FROM comp)
      SELECT doc_id, comp_id, cluster_size,
             CASE WHEN ${hsql("'split_' || comp_id")} % 10 < 9
                  THEN 'train' ELSE 'heldout' END AS split
      FROM sized ORDER BY doc_id""")) { (s, dir) =>
      docComponents(s, dir)
        .select(col("doc_id"), col("comp_id"), col("cluster_size"),
          when(TextOps.hashMod(
              concat(lit("split_"), col("comp_id"))) % 10 < 9,
            "train").otherwise("heldout").as("split"))
        .orderBy("doc_id")
    },

    // Incremental cluster merge: new batch docs (doc_id % 5 = 0) join
    // the standing index's duplicate clusters WITHOUT recomputing the
    // corpus graph — the index's components collapse to star edges
    // (doc → cluster keeper), only batch-involving candidate pairs are
    // generated, and one fast propagation merges. The oracle is the
    // FULL-corpus recompute restricted to batch docs: incremental
    // ingestion must land every doc in exactly the cluster a from-
    // scratch run would (labels = min doc_id of the merged cluster,
    // sizes count the whole merged cluster).
    Q("q_d_components_incr", Some(s"""
      WITH RECURSIVE $componentCtes,
      sized AS (
        SELECT doc_id, comp_id,
               count(*) OVER (PARTITION BY comp_id) AS cluster_size
        FROM comp)
      SELECT doc_id, comp_id, cluster_size FROM sized
      WHERE doc_id % 5 = 0 ORDER BY doc_id""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val sigs = docSigs(s, dir)
      val isBatch = col("doc_id") % 5 === 0
      // standing index state (stored, in production; here a cached
      // stage like docSigs/docComponents — the iterative index CC is
      // the expensive half and is exactly what a real deployment reads
      // from storage): clusters over the index corpus alone, collapsed
      // to star edges doc → cluster keeper
      val starEdges = idxStarEdges(s, dir)
      // the ingestion delta: every candidate pair touching a batch doc
      val batchPairs = Dedup.minhashLshPairsFromSigs(sigs,
          rowsPerBand = LshLayout._2)
        .filter(col("est_sim") >= CompMinEst)
        .select("d1", "d2").unionByName(fpPairs(docs))
        .filter(col("d1") % 5 === 0 || col("d2") % 5 === 0).distinct()
      Dedup.connectedComponents(docs,
          starEdges.unionByName(batchPairs).distinct())
        .filter(isBatch)
        .select("doc_id", "comp_id", "cluster_size")
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs: 64-bit signatures (one md5 per token × 16
    // bits), blocked at the layout Dedup.deriveSimhashBanding derives
    // from the radius (pigeonhole: nBands > r ⇒ perfect recall; widest
    // feasible bands ⇒ fewest incidental collisions) — the SAME
    // derivation site generates this SQL and drives the engine
    Q("q_d_simhash", Some {
      // four 16-bit band hashes = hex slices [4c, 4c+4) of ONE md5
      // (mirrors TextOps.simhash64)
      val (nBands, qPer) =
        graft.text.Dedup.deriveSimhashBanding(SimhashRadius)
      val hashCols = (0 until 4).map(c =>
        s"('0x' || substring(md5(tok), ${4 * c + 1}, 4))::BIGINT AS h$c")
        .mkString(",\n               ")
      val bitSums = (for (c <- 0 until 4; j <- 0 until 16) yield
        s"sum(CASE WHEN (h$c >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s${c}_$j")
        .mkString(",\n               ")
      val bands = (0 until 4).map { c =>
        val sum = (0 until 16).map(j =>
          s"CASE WHEN s${c}_$j > 0 THEN ${1L << j} ELSE 0 END")
          .mkString(" + ")
        s"CAST($sum AS BIGINT) AS b$c"
      }.mkString(",\n              ")
      val bandCase = (0 until nBands).map { g =>
        val key = (g * qPer until (g + 1) * qPer)
          .map(c => s"CAST(b$c AS VARCHAR)").mkString(" || '_' || ")
        s"WHEN $g THEN $key"
      }.mkString("CASE c ", " ", " END")
      val hamming = (0 until 4).map(c =>
        s"bit_count(xor(a.b$c, b.b$c))").mkString(" + ")
      s"""
      WITH toks AS (
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(text, '[[:space:]]+'))) AS tok
        FROM documents),
      h AS (SELECT doc_id,
               $hashCols
            FROM toks),
      sums AS (SELECT doc_id,
               $bitSums
              FROM h GROUP BY 1),
      sig AS (SELECT doc_id,
              $bands
              FROM sums),
      keyed AS (SELECT doc_id, b0, b1, b2, b3, c AS band_idx,
                       $bandCase AS band
                FROM sig, range($nBands) r(c)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               CAST($hamming AS INT) AS hamming
        FROM keyed a JOIN keyed b
          ON a.band_idx = b.band_idx AND a.band = b.band
          AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming FROM pairs WHERE hamming <= $SimhashRadius
      ORDER BY d1, d2"""
    }) { (s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"),
          maxHamming = SimhashRadius)
        .orderBy("d1", "d2")
    },

    // Winnowing document fingerprints (Schleimer et al. 2003 — MOSS):
    // polynomial rolling k-byte-gram hashes (ONE O(len) pass per doc
    // via the codegen'd graft.functions.RollingHash — per-position
    // direct hashing is the O(len·k) substr-trap shape), then each
    // w-window selects its minimum hash (ties → rightmost, "robust
    // winnowing"), distinct selections = the doc's fingerprints.
    // Guarantee: any verbatim match ≥ w+k−1 bytes shares a
    // fingerprint at ~2/(w+1) the density of the full gram set — the
    // positional-match fingerprint family MinHash can't provide.
    Q("q_t_winnow_fp", Some(s"""
      WITH $winnowCtes
      SELECT doc_id, fp_pos, h FROM wfp
      ORDER BY doc_id, fp_pos""")) { (s, dir) =>
      winnowFps(s, dir).orderBy("doc_id", "fp_pos")
    },

    // Fingerprint-overlap near-dup pairs: docs sharing >= min_shared
    // winnowed fingerprints, boilerplate fingerprints pruned at
    // max_freq holders, surviving holder lists expanded to pairs
    // map-side (the jaccard no-self-join idiom). The containment
    // column is the plagiarism-detector's score: shared fingerprints
    // over the smaller doc's set.
    Q("q_d_winnow_pairs", Some(s"""
      WITH $winnowCtes,
      wsets AS (SELECT DISTINCT doc_id, h FROM wfp),
      wsizes AS (SELECT doc_id, count(*) AS n_fp FROM wsets GROUP BY 1),
      wrare AS (SELECT h FROM (SELECT h, count(*) AS c FROM wsets
                GROUP BY 1) WHERE c BETWEEN 2 AND $WinnowMaxFreq),
      wpr AS (SELECT s.doc_id, s.h FROM wsets s JOIN wrare r
              ON s.h = r.h),
      wshared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
        FROM wpr a JOIN wpr b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, n_shared, s1.n_fp AS n1, s2.n_fp AS n2,
             round(CAST(n_shared AS DOUBLE)
               / least(s1.n_fp, s2.n_fp), 9) AS containment
      FROM wshared
      JOIN wsizes s1 ON d1 = s1.doc_id JOIN wsizes s2 ON d2 = s2.doc_id
      WHERE n_shared >= $WinnowMinShared
      ORDER BY d1, d2""")) { (s, dir) =>
      winnowPairs(s, dir).orderBy("d1", "d2")
    },

    // Winnowing ALIGNMENT report: every shared fingerprint of a
    // candidate pair, grouped by alignment offset (pos1 − pos2) —
    // matches from one contiguous verbatim span share an offset, so
    // the per-offset counts with their pos1 extent are the span
    // evidence (MOSS's match localization). Candidate-bounded: only
    // pairs the overlap stage already surfaced join their positions.
    Q("q_d_winnow_align", Some(s"""
      WITH $winnowCtes,
      wsets AS (SELECT DISTINCT doc_id, h FROM wfp),
      wrare AS (SELECT h FROM (SELECT h, count(*) AS c FROM wsets
                GROUP BY 1) WHERE c BETWEEN 2 AND $WinnowMaxFreq),
      wpr AS (SELECT s.doc_id, s.h FROM wsets s JOIN wrare r
              ON s.h = r.h),
      wpairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM wpr a JOIN wpr b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared)
      SELECT p.d1, p.d2, fa.fp_pos - fb.fp_pos AS align_offset,
             CAST(count(*) AS BIGINT) AS n_matches,
             CAST(min(fa.fp_pos) AS BIGINT) AS min_pos1,
             CAST(max(fa.fp_pos) AS BIGINT) AS max_pos1
      FROM wpairs p
      JOIN wfp fa ON fa.doc_id = p.d1
      JOIN wfp fb ON fb.doc_id = p.d2 AND fb.h = fa.h
      GROUP BY 1, 2, 3
      ORDER BY d1, d2, align_offset""")) { (s, dir) =>
      graft.text.Winnow.alignments(winnowPairs(s, dir),
          winnowFps(s, dir))
        .select(col("d1"), col("d2"),
          col("align_offset"), col("n_matches"),
          col("min_pos1").cast("long").as("min_pos1"),
          col("max_pos1").cast("long").as("max_pos1"))
        .orderBy("d1", "d2", "align_offset")
    },

    // Winnow-driven span STRIPPING (Winnow.stripSpans scaladoc): the
    // curation consumer of the SEGMENTED alignment — strip from the
    // later doc of each candidate pair every aligned segment with >=
    // strip_min_matches same-offset fingerprint matches (the
    // boilerplate/license-text counterpart of q_d_substr_strip, with
    // spans LOCALIZED by fingerprints instead of exact token grams).
    // Same-offset matches split into contiguity segments wherever
    // consecutive positions are > w+k apart (no contiguous verbatim
    // run is fingerprint-silent that long), so two disjoint shared
    // blocks at one offset — identical header+footer around unique
    // middles — never bridge into a span that deletes the middle.
    // Char-level accounting: covered positions merge to islands, the
    // strip folds over the <= islands+1 kept segments. The oracle
    // rebuilds clean_text per char (string_agg over uncovered
    // positions) — method differs, string equality is exact.
    Q("q_d_winnow_strip", Some(s"""
      WITH $winnowCtes,
      wsets AS (SELECT DISTINCT doc_id, h FROM wfp),
      wrare AS (SELECT h FROM (SELECT h, count(*) AS c FROM wsets
                GROUP BY 1) WHERE c BETWEEN 2 AND $WinnowMaxFreq),
      wpr AS (SELECT s.doc_id, s.h FROM wsets s JOIN wrare r
              ON s.h = r.h),
      wpairs AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM wpr a JOIN wpr b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared),
      wmatch AS (
        SELECT p.d1, p.d2, fa.fp_pos - fb.fp_pos AS off,
               fa.fp_pos AS pos1
        FROM wpairs p
        JOIN wfp fa ON fa.doc_id = p.d1
        JOIN wfp fb ON fb.doc_id = p.d2 AND fb.h = fa.h),
      wbrk AS (
        SELECT d1, d2, off, pos1,
               CASE WHEN pos1 - lag(pos1) OVER (
                     PARTITION BY d1, d2, off ORDER BY pos1)
                   > ${WinnowW + WinnowK} THEN 1 ELSE 0 END AS brk
        FROM wmatch),
      wseg AS (
        SELECT d1, d2, off, pos1,
               sum(brk) OVER (PARTITION BY d1, d2, off ORDER BY pos1
                   ROWS UNBOUNDED PRECEDING) AS seg
        FROM wbrk),
      walign AS (
        SELECT d1, d2, off, seg, count(*) AS n_matches,
               min(pos1) AS mn, max(pos1) AS mx
        FROM wseg GROUP BY 1, 2, 3, 4),
      wspan AS (
        SELECT d2 AS doc_id, mn - off AS s,
               mx - off + ${WinnowK - 1} AS e
        FROM walign WHERE n_matches >= $WinnowStripMin),
      wcovd AS (
        SELECT DISTINCT doc_id, cp FROM (
          SELECT doc_id, unnest(range(s, e + 1)) AS cp FROM wspan)),
      wisl AS (
        SELECT doc_id, min(cp) AS cs, max(cp) AS ce
        FROM (SELECT doc_id, cp,
                cp - row_number() OVER (PARTITION BY doc_id
                  ORDER BY cp) AS grp
              FROM wcovd)
        GROUP BY doc_id, grp),
      wcv AS (
        SELECT doc_id, sum(ce - cs + 1) AS covered,
               count(*) AS n_spans
        FROM wisl GROUP BY 1),
      wtk AS (
        SELECT doc_id, text, unnest(range(length(text))) AS i
        FROM documents),
      wcl AS (
        SELECT tk.doc_id,
               string_agg(substring(tk.text, CAST(tk.i + 1 AS INT), 1),
                 '' ORDER BY tk.i) AS clean_text
        FROM wtk tk LEFT JOIN wcovd c
          ON tk.doc_id = c.doc_id AND tk.i = c.cp
        WHERE c.cp IS NULL GROUP BY 1)
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
             CAST(coalesce(wcv.covered, 0) AS BIGINT) AS covered_chars,
             CAST(coalesce(wcv.n_spans, 0) AS BIGINT) AS n_spans,
             CASE WHEN length(d.text) > 0 THEN
               round(CAST(coalesce(wcv.covered, 0) AS DOUBLE)
                 / length(d.text), 9) END AS covered_frac,
             coalesce(wcl.clean_text, '') AS clean_text
      FROM documents d
      LEFT JOIN wcv ON d.doc_id = wcv.doc_id
      LEFT JOIN wcl ON d.doc_id = wcl.doc_id
      ORDER BY d.doc_id""")) { (s, dir) =>
      graft.text.Winnow.stripSpans(t(s, dir, "documents"),
          winnowPairs(s, dir), winnowFps(s, dir),
          k = WinnowK, w = WinnowW, minMatches = WinnowStripMin)
        .orderBy("doc_id")
    },

    // Content-defined chunking (LBFS/FastCDC family), chunk report:
    // cut positions are functions of local content (rolling k-gram
    // hash % divisor == 0), so insertions re-align only the chunks
    // they touch — the storage-dedup counterpart of the token-gram
    // families. One codegen'd O(len) rolling-hash pass + per-doc
    // array programs; NO shuffle at all in the chunking itself (the
    // report's order-by is presentation).
    Q("q_d_cdc_chunks", Some(s"""
      WITH $cdcCtes
      SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_fp
      FROM cdck ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      cdcChunks(s, dir)
        .select(col("doc_id"), col("chunk_idx").cast("int"),
          col("start_pos"), col("chunk_len"), col("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    },

    // CDC dedup accounting: per-doc duplicate-chunk and duplicate-byte
    // counts under the first-occurrence-keeper convention (a chunk
    // occurrence is DUP iff an earlier (doc_id, chunk_idx) holds the
    // same fingerprint — the exact-substring family's rule, computed
    // as a map-side-combined min(struct) per fingerprint). Exact dups
    // dedup to ~100% of their bytes; content-overlapping docs dedup
    // the shared blocks only. dup_ratio is a ratio of exact counts —
    // bit-stable at any partitioning.
    Q("q_d_cdc_dup", Some(s"""
      WITH $cdcCtes,
      cdflag AS (
        SELECT doc_id, chunk_len,
               (row_number() OVER (PARTITION BY chunk_fp
                 ORDER BY doc_id, chunk_idx) > 1) AS is_dup
        FROM cdck)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(chunk_len) AS BIGINT) AS n_bytes,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_chunks,
             CAST(sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
               AS BIGINT) AS dup_bytes,
             round(CAST(sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
               AS DOUBLE) / sum(chunk_len), 9) AS dup_ratio
      FROM cdflag GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      graft.text.Cdc.dedupStats(cdcChunks(s, dir))
        .select(col("doc_id"), col("n_chunks"), col("n_bytes"),
          col("dup_chunks"), col("dup_bytes"), col("dup_ratio"))
        .orderBy("doc_id")
    },

    // Exact-substring dedup, span report (the ExactSubstr method of
    // Lee et al. 2022): maximal runs of token positions covered by a
    // k-gram that already occurred earlier in (doc_id, pos) corpus
    // order. The one dedup-family member with NO pair join — cost is
    // linear in corpus tokens, keeper selection is a map-side-combined
    // groupBy min, and the islands window partitions PER DOC.
    Q("q_d_substr_spans", Some(s"""
      WITH $substrCovCtes,
      isl AS (
        SELECT doc_id, tp,
               tp - row_number() OVER (PARTITION BY doc_id
                 ORDER BY tp) AS grp
        FROM cov)
      SELECT doc_id, min(tp) AS span_start, max(tp) AS span_end,
             count(*) AS span_len
      FROM isl GROUP BY doc_id, grp
      ORDER BY doc_id, span_start""")) { (s, dir) =>
      Dedup.duplicateSpans(substrCovered(s, dir))
        .orderBy("doc_id", "span_start")
    },

    // Exact-substring STRIP: the cleaned corpus — covered tokens
    // removed (first corpus occurrence kept), per-doc duplication
    // counts. Shares the covered-position stage with the span report;
    // the strip itself is a map-only positional filter after one
    // per-doc rollup of covered positions.
    Q("q_d_substr_strip", Some(s"""
      WITH $substrCovCtes,
      d AS (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents),
      tk AS (SELECT doc_id, unnest(t) AS tok,
                    generate_subscripts(t, 1) - 1 AS i
             FROM d),
      cv AS (SELECT doc_id, count(*) AS n_dup FROM cov GROUP BY 1),
      cl AS (SELECT tk.doc_id, string_agg(tok, ' ' ORDER BY i)
                      AS clean_text
             FROM tk LEFT JOIN cov
               ON tk.doc_id = cov.doc_id AND tk.i = cov.tp
             WHERE cov.tp IS NULL GROUP BY tk.doc_id)
      SELECT d.doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(coalesce(cv.n_dup, 0) AS BIGINT) AS n_dup_tokens,
             round(CAST(coalesce(cv.n_dup, 0) AS DOUBLE) / len(t), 9)
               AS dup_frac,
             coalesce(cl.clean_text, '') AS clean_text
      FROM d LEFT JOIN cv ON d.doc_id = cv.doc_id
             LEFT JOIN cl ON d.doc_id = cl.doc_id
      ORDER BY d.doc_id""")) { (s, dir) =>
      Dedup.substringStrip(t(s, dir, "documents"), substrCovered(s, dir))
        .orderBy("doc_id")
    },

    // INCREMENTAL exact-substring dedup: the delta batch (doc_id % 5
    // = 0, the q_d_components_incr convention) deduped against the
    // standing corpus WITHOUT re-scanning the index for its own
    // duplicates — one gram join against the index + the batch's
    // internal first-occurrence pass. The oracle is the full-union
    // recompute under ingestion order (index strictly before batch),
    // restricted to batch docs: incremental ingestion must cover
    // exactly the positions a from-scratch run would.
    Q("q_d_substr_incr", Some {
      val k = SubstrK
      val gram = (1 to k).map(i => s"t[pos+$i]").mkString(" || ' ' || ")
      s"""
      WITH gp AS (
        SELECT doc_id, t, unnest(range(len(t) - ${k - 1})) AS pos
        FROM (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents)),
      g AS (SELECT doc_id, pos, $gram AS gram FROM gp),
      occ AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gram
                 ORDER BY doc_id % 5 = 0, doc_id, pos) AS rn
        FROM g),
      cov AS (
        SELECT DISTINCT doc_id, pos + j AS tp
        FROM occ, range($k) r(j)
        WHERE rn > 1 AND doc_id % 5 = 0),
      isl AS (
        SELECT doc_id, tp,
               tp - row_number() OVER (PARTITION BY doc_id
                 ORDER BY tp) AS grp
        FROM cov)
      SELECT doc_id, min(tp) AS span_start, max(tp) AS span_end,
             count(*) AS span_len
      FROM isl GROUP BY doc_id, grp
      ORDER BY doc_id, span_start"""
    }) { (s, dir) =>
      Dedup.duplicateSpans(substrIncrCovered(s, dir))
        .orderBy("doc_id", "span_start")
    },

    // Exact-substring DECONTAMINATION (Lee et al. 2022 run against an
    // eval suite): every train-doc token position covered by a k-gram
    // that appears anywhere in the benchmark slice (doc_id % 20 = 0,
    // the q_t_decontaminate convention) — token-level spans, i.e. the
    // thing you'd actually strip, where q_t_decontaminate only flags
    // the doc. No keeper pass: all benchmark overlap is contamination.
    // A real eval suite is a broadcast-sized gram set; the corpus
    // streams through map-side.
    Q("q_d_substr_decontam", Some {
      val k = SubstrK
      val gram = (1 to k).map(i => s"t[pos+$i]").mkString(" || ' ' || ")
      s"""
      WITH gp AS (
        SELECT doc_id, t, unnest(range(len(t) - ${k - 1})) AS pos
        FROM (SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents)),
      g AS (SELECT doc_id, pos, $gram AS gram FROM gp),
      bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
      cov AS (
        SELECT DISTINCT doc_id, pos + j AS tp
        FROM g JOIN bench USING (gram), range($k) r(j)
        WHERE doc_id % 20 <> 0),
      isl AS (
        SELECT doc_id, tp,
               tp - row_number() OVER (PARTITION BY doc_id
                 ORDER BY tp) AS grp
        FROM cov),
      sp AS (
        SELECT doc_id, count(*) AS span_len
        FROM isl GROUP BY doc_id, grp),
      pd AS (
        SELECT doc_id, count(*) AS n_spans,
               sum(span_len) AS n_contam_tokens,
               max(span_len) AS max_span_len
        FROM sp GROUP BY 1)
      SELECT d.doc_id,
             CAST(len(regexp_split_to_array(d.text, '[[:space:]]+')) AS BIGINT) AS n_tokens,
             CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(pd.n_contam_tokens, 0) AS BIGINT)
               AS n_contam_tokens,
             CAST(coalesce(pd.max_span_len, 0) AS BIGINT) AS max_span_len,
             round(CAST(coalesce(pd.n_contam_tokens, 0) AS DOUBLE)
               / len(regexp_split_to_array(d.text, '[[:space:]]+')), 9) AS contam_frac
      FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      WHERE d.doc_id % 20 <> 0
      ORDER BY d.doc_id"""
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 20 =!= 0)
      val bench = docs.filter(col("doc_id") % 20 === 0)
      val cov = Dedup.coveredByReference(train, bench, k = SubstrK)
      val perDoc = Dedup.duplicateSpans(cov)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum("span_len").cast("long").as("n_contam_tokens"),
          max("span_len").cast("long").as("max_span_len"))
      train.select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("n_contam_tokens"), lit(0L)).as("n_contam_tokens"),
          coalesce(col("max_span_len"), lit(0L)).as("max_span_len"),
          round(coalesce(col("n_contam_tokens"), lit(0L)).cast("double")
            / col("n_tokens"), 9).as("contam_frac"))
        .orderBy("doc_id")
    },

    // Unigram log-probability scoring (the cheap stand-in for a
    // perplexity quality filter): corpus-level add-1-smoothed unigram
    // model, per-doc mean and min token log-prob. Model fit is one
    // token-keyed count; scoring is a broadcast-sized join at real
    // vocab sizes.
    Q("q_t_unigram_lp", Some("""
      WITH tk AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '[[:space:]]+')) AS tok
        FROM documents),
      cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
                     CAST(count(*) AS DOUBLE) AS v FROM cnt)
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(ln((c + 1.0) / (tot.n + tot.v))), 9)
               AS avg_logprob,
             round(min(ln((c + 1.0) / (tot.n + tot.v))), 9)
               AS min_logprob
      FROM tk t JOIN cnt ON t.tok = cnt.tok CROSS JOIN tot
      GROUP BY t.doc_id ORDER BY t.doc_id""")) { (s, dir) =>
      val tk = t(s, dir, "documents").select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      val cnt = tk.groupBy("tok").agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum("c").cast("double").as("n"),
        count(lit(1)).cast("double").as("v"))
      val lp = log((col("c") + 1.0) / (col("n") + col("v")))
      tk.join(cnt, "tok").crossJoin(broadcast(tot))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          round(avg(lp), 9).as("avg_logprob"),
          round(min(lp), 9).as("min_logprob"))
        .orderBy("doc_id")
    },

    // Bigram-LM scoring — the next rung of the perplexity-quality-filter
    // ladder above q_t_unigram_lp: add-1-smoothed conditional
    // P(w2|w1) = (c(w1 w2)+1) / (c(w1)+V), per-doc mean and min log-prob
    // over its bigrams. Same scale shape as the unigram scorer: one
    // bigram-keyed and one token-keyed count shuffle, vocab total
    // broadcast; scoring is two count-table equi-joins.
    Q("q_t_bigram_lp", Some("""
      WITH b AS (
        SELECT doc_id, regexp_split_to_array(text, '[[:space:]]+') AS t FROM documents),
      tk AS (SELECT doc_id, unnest(t) AS tok FROM b),
      c1 AS (SELECT tok, count(*) AS c1 FROM tk GROUP BY 1),
      voc AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
      bg AS (
        SELECT doc_id,
               unnest(list_transform(range(len(t) - 1), i -> t[i+1]))
                 AS w1,
               unnest(list_transform(range(len(t) - 1),
                 i -> t[i+1] || ' ' || t[i+2])) AS bg
        FROM b),
      c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
      sc AS (
        SELECT g.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + voc.v)) AS lp
        FROM bg g JOIN c2 ON g.bg = c2.bg
                  JOIN c1 ON g.w1 = c1.tok
        CROSS JOIN voc)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(lp), 9) AS avg_logprob2,
             round(min(lp), 9) AS min_logprob2
      FROM sc GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      bigramLp(s, dir).select(col("doc_id"), col("n_bigrams"),
        round(col("avg_lp"), 9).as("avg_logprob2"),
        round(col("min_lp"), 9).as("min_logprob2"))
        .orderBy("doc_id")
    },

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): per-doc
    // bigram-LM perplexity exp(−avg log P(w2|w1)), cut into
    // head/middle/tail TERCILES PER LANGUAGE (CCNet's key design
    // point: one global cut would just rank languages by their LM
    // fit, so each language gets its own cutoffs). The cuts are the
    // values at rank ceil(n/3) and ceil(2n/3) — the discrete-quantile
    // pairing (percentile_approx at accuracy 10^6 ≡ ceil-rank
    // row_number) — so bucketing is a ≤ |langs| broadcast join + two
    // comparisons: at 100 TB the LM fit is the two count shuffles the
    // bigram stage already pays, and the bucket pass is map-only.
    Q("q_t_ppl_buckets", Some(s"""
      WITH $pplCtes
      SELECT d.doc_id, d.lang, d.n_bigrams, d.ppl,
             $pplBucketCase AS ppl_bucket
      FROM pb_d d JOIN pb_cut c USING (lang)
      ORDER BY doc_id""")) { (s, dir) =>
      pplBucketed(s, dir).orderBy("doc_id")
    },

    // Interpolated Kneser-Ney bigram scoring (KneserNey scaladoc) —
    // the smoothing CCNet's KenLM filter actually uses (Wenzek 2020),
    // replacing add-one as the production rung of the perplexity
    // ladder; q_t_bigram_lp stays as the A/B control. Discounted seen
    // mass redistributes by CONTINUATION counts (how many distinct
    // contexts a word follows), every count an exact aggregation, the
    // probability one fixed-parenthesization IEEE expression, ln
    // behind the emit round — same two-count-shuffle scale shape as
    // the add-one stage.
    Q("q_t_kn_lp", Some(s"""
      WITH ${graft.text.KneserNey.oracleCtes(KnDiscount)}
      SELECT doc_id, lang, n_bigrams,
             round(avg_lp, 9) AS avg_logprob_kn,
             round(min_lp, 9) AS min_logprob_kn
      FROM knd ORDER BY doc_id""")) { (s, dir) =>
      knLp(s, dir).select(col("doc_id"), col("lang"), col("n_bigrams"),
        round(col("avg_lp"), 9).as("avg_logprob_kn"),
        round(col("min_lp"), 9).as("min_logprob_kn"))
        .orderBy("doc_id")
    },

    // Stupid-Backoff trigram scoring (StupidBackoff scaladoc — Brants
    // et al. 2007, the distributed-counts LM with NO normalization
    // pass): counts from the standing index slice, scores over the
    // incoming slice — the train/score split that makes the backoff
    // ladder real (an in-corpus self-score never misses a trigram).
    // Per-doc average/min log-score plus the per-tier hit accounting
    // (tri/bi/uni/unk) a filter owner reads to see HOW a corpus is
    // being scored.
    Q("q_t_sb_lp", Some(s"""
      WITH $sbCtes
      SELECT doc_id, lang, n_trigrams, n_tri_hits, n_bi_hits,
             n_uni_hits, n_unk,
             round(avg_lp, 9) AS avg_logscore_sb,
             round(min_lp, 9) AS min_logscore_sb
      FROM sbd ORDER BY doc_id""")) { (s, dir) =>
      sbLp(s, dir).select(col("doc_id"), col("lang"),
        col("n_trigrams"), col("n_tri_hits"), col("n_bi_hits"),
        col("n_uni_hits"), col("n_unk"),
        round(col("avg_lp"), 9).as("avg_logscore_sb"),
        round(col("min_lp"), 9).as("min_logscore_sb"))
        .orderBy("doc_id")
    },

    // Backoff-mix observability: per-language shares of trigram
    // scores served at each tier (trigram hit / bigram backoff /
    // unigram backoff / unk floor) — the coverage dial of the scale
    // LM: a falling tri-share says the index counts no longer cover
    // the incoming distribution (the drift signal that triggers a
    // recount, the q_e_index_drift analog for the LM). Shares are
    // ratios of exact counts — bit-stable at any partitioning.
    Q("q_t_sb_backoff_mix", Some(s"""
      WITH $sbCtes
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_trigrams) AS BIGINT) AS n_trigrams,
             round(CAST(sum(n_tri_hits) AS DOUBLE)
               / sum(n_trigrams), 9) AS tri_share,
             round(CAST(sum(n_bi_hits) AS DOUBLE)
               / sum(n_trigrams), 9) AS bi_share,
             round(CAST(sum(n_uni_hits) AS DOUBLE)
               / sum(n_trigrams), 9) AS uni_share,
             round(CAST(sum(n_unk) AS DOUBLE)
               / sum(n_trigrams), 9) AS unk_share
      FROM sbd GROUP BY 1 ORDER BY lang""")) { (s, dir) =>
      sbLp(s, dir).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_trigrams").cast("long").as("n_trigrams"),
        round(sum("n_tri_hits").cast("double")
          / sum("n_trigrams"), 9).as("tri_share"),
        round(sum("n_bi_hits").cast("double")
          / sum("n_trigrams"), 9).as("bi_share"),
        round(sum("n_uni_hits").cast("double")
          / sum("n_trigrams"), 9).as("uni_share"),
        round(sum("n_unk").cast("double")
          / sum("n_trigrams"), 9).as("unk_share"))
        .orderBy("lang")
    },

    // CCNet perplexity buckets over the KN scorer — the production
    // pairing (Wenzek 2020 buckets on a KN-smoothed KenLM): per-doc
    // KN perplexity exp(−avg lp), per-language ceil-rank terciles,
    // same head/middle/tail contract as q_t_ppl_buckets (the add-one
    // control row) so the two bucketings A/B directly.
    Q("q_t_ppl_buckets_kn", Some(s"""
      WITH ${graft.text.KneserNey.oracleCtes(KnDiscount)},
      knd2 AS (
        SELECT doc_id, lang, n_bigrams,
               round(exp(-avg_lp), 6) AS ppl
        FROM knd),
      knr AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM knd2),
      kncut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM knr GROUP BY 1)
      SELECT d.doc_id, d.lang, d.n_bigrams, d.ppl,
             CASE WHEN d.ppl <= c.cut1 THEN 'head'
                  WHEN d.ppl <= c.cut2 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM knd2 d JOIN kncut c USING (lang)
      ORDER BY doc_id""")) { (s, dir) =>
      knBucketed(s, dir).orderBy("doc_id")
    },

    // Interpolated Kneser-Ney TRIGRAM scoring (KneserNey.scoreTrigrams
    // scaladoc — the actual KenLM order family: CCNet's filter is a
    // 5-gram KN model, and the trigram rung is where the
    // continuation-count construction starts composing across orders).
    // The middle order redistributes by trigram-type continuation
    // counts — KN's idea applied one order up — and both
    // interpolations telescope to Σ P = 1 (spec-locked). Same count-
    // table equi-join scale shape as the bigram rung, one more count
    // shuffle.
    Q("q_t_kn3_lp", Some(s"""
      WITH ${graft.text.KneserNey.oracleCtes3(KnDiscount)}
      SELECT doc_id, lang, n_trigrams,
             round(avg_lp, 9) AS avg_logprob_kn3,
             round(min_lp, 9) AS min_logprob_kn3
      FROM kn3d ORDER BY doc_id""")) { (s, dir) =>
      kn3Lp(s, dir).select(col("doc_id"), col("lang"),
        col("n_trigrams"),
        round(col("avg_lp"), 9).as("avg_logprob_kn3"),
        round(col("min_lp"), 9).as("min_logprob_kn3"))
        .orderBy("doc_id")
    },

    // KN bigram vs KN trigram bucket-movement matrix — the
    // q_t_ppl_agreement discipline applied WITHIN the KN family: how
    // much does the ORDER upgrade (not the smoothing) move the CCNet
    // gate. Docs with fewer than three tokens have no trigram score
    // and drop from the matrix (inner join — both verdicts must
    // exist to compare); each model buckets by its own per-language
    // ceil-rank terciles over its own scored population.
    Q("q_t_kn3_agreement", Some(s"""
      WITH ${graft.text.KneserNey.oracleCtes(KnDiscount)},
      ${graft.text.KneserNey.oracleCtes3(KnDiscount).trim},
      k2d AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl FROM knd),
      k2r AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM k2d),
      k2cut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM k2r GROUP BY 1),
      k2a AS (
        SELECT d.doc_id,
               CASE WHEN d.ppl <= c.cut1 THEN 'head'
                    WHEN d.ppl <= c.cut2 THEN 'middle'
                    ELSE 'tail' END AS b2
        FROM k2d d JOIN k2cut c USING (lang)),
      k3d2 AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl FROM kn3d),
      k3r AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM k3d2),
      k3cut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM k3r GROUP BY 1),
      k3a AS (
        SELECT d.doc_id,
               CASE WHEN d.ppl <= c.cut1 THEN 'head'
                    WHEN d.ppl <= c.cut2 THEN 'middle'
                    ELSE 'tail' END AS b3
        FROM k3d2 d JOIN k3cut c USING (lang)),
      k23m AS (
        SELECT a.b2 AS bucket_kn2, b.b3 AS bucket_kn3,
               count(*) AS n_docs
        FROM k2a a JOIN k3a b USING (doc_id) GROUP BY 1, 2),
      k23t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM k23m)
      SELECT bucket_kn2, bucket_kn3,
             CAST(n_docs AS BIGINT) AS n_docs,
             round(n_docs / k23t.tot, 9) AS share
      FROM k23m CROSS JOIN k23t
      ORDER BY bucket_kn2, bucket_kn3""")) { (s, dir) =>
      def bucketed(d: DataFrame, out: String): DataFrame = {
        val cuts = d.groupBy("lang").agg(
          percentile_approx(col("ppl"),
            array(lit(1.0 / 3), lit(2.0 / 3)), lit(1000000)).as("qs"))
        d.join(broadcast(cuts), "lang")
          .select(col("doc_id"),
            when(col("ppl") <= element_at(col("qs"), 1), "head")
              .when(col("ppl") <= element_at(col("qs"), 2), "middle")
              .otherwise("tail").as(out))
      }
      val a2 = knBucketed(s, dir)
        .select(col("doc_id"), col("ppl_bucket").as("bucket_kn2"))
      val a3 = bucketed(kn3Lp(s, dir).select(col("doc_id"),
        col("lang"), round(exp(-col("avg_lp")), 6).as("ppl")),
        "bucket_kn3")
      val m = a2.join(a3, "doc_id")
        .groupBy("bucket_kn2", "bucket_kn3")
        .agg(count(lit(1)).as("n_docs"))
      val tot = m.agg(sum("n_docs").cast("double").as("tot"))
      m.crossJoin(broadcast(tot))
        .select(col("bucket_kn2"), col("bucket_kn3"), col("n_docs"),
          round(col("n_docs") / col("tot"), 9).as("share"))
        .orderBy("bucket_kn2", "bucket_kn3")
    },

    // KN trigram table PRUNING frontier (the KenLM filter/--prune
    // convention — KneserNey.scoreTrigramsPruned): per count
    // threshold θ, drop trigram types with c3 < θ and reroute their
    // mass through the context's backoff weight (Σ P = 1 still
    // telescopes exactly — spec-locked), then price the trade the
    // ann-frontier way: stored-table size vs corpus perplexity vs
    // tercile-bucket movement against the unpruned model. The row an
    // LM owner reads to bound the table on a 100 TB corpus: the top
    // table is the one that grows with the data, and singleton
    // trigrams are most of it. θ = 1 is the baseline row (nothing
    // pruned, deltas zero by construction).
    Q("q_t_kn3_pruned_ab", Some {
      val rungChains = KnPruneRungs.zipWithIndex.map {
        case (th, i) => graft.text.KneserNey
          .oracleCtes3Pruned(KnDiscount, th, s"kp$i").trim
      }.mkString(",\n      ")
      def bucketSql(src: String, pfx: String, out: String) = s"""
      ${pfx}r AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM $src),
      ${pfx}cut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM ${pfx}r GROUP BY 1),
      ${pfx}a AS (
        SELECT d.doc_id,
               CASE WHEN d.ppl <= c.cut1 THEN 'head'
                    WHEN d.ppl <= c.cut2 THEN 'middle'
                    ELSE 'tail' END AS $out
        FROM $src d JOIN ${pfx}cut c USING (lang))"""
      val rungRows = KnPruneRungs.zipWithIndex.map { case (th, i) =>
        s"""
      kp${i}p AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl
        FROM kp${i}d),
      kp${i}avg AS (SELECT round(avg(ppl), 6) AS avg_ppl
                    FROM kp${i}p),
      kp${i}sz AS (
        SELECT CAST(count(*) AS BIGINT) AS n_types_full,
               CAST(count(CASE WHEN c3 >= $th THEN 1 END) AS BIGINT)
                 AS n_types_kept
        FROM k3c3),${bucketSql(s"kp${i}p", s"kp${i}b", "b1")},
      kp${i}mv AS (
        SELECT CAST(sum(CASE WHEN a.b0 <> p.b1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_moved,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM kb3ba a JOIN kp${i}ba p USING (doc_id)),
      kp${i}row AS (
        SELECT CAST($th AS BIGINT) AS threshold,
               z.n_types_full, z.n_types_kept,
               round(CAST(z.n_types_kept AS DOUBLE)
                 / z.n_types_full, 9) AS kept_frac,
               a.avg_ppl,
               round(a.avg_ppl - b.base_avg, 6) AS ppl_delta,
               m.n_moved,
               round(CAST(m.n_moved AS DOUBLE) / m.n_docs, 9)
                 AS moved_frac
        FROM kp${i}sz z, kp${i}avg a, kbavg b, kp${i}mv m)"""
      }.mkString(",")
      val union = ("SELECT * FROM kbrow" +:
        KnPruneRungs.indices.map(i => s"SELECT * FROM kp${i}row"))
        .mkString("\n        UNION ALL ")
      s"""
      WITH ${graft.text.KneserNey.oracleCtes3(KnDiscount).trim},
      $rungChains,
      kb3p AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl
        FROM kn3d),
      kbavg AS (SELECT round(avg(ppl), 6) AS base_avg FROM kb3p),
      ${bucketSql("kb3p", "kb3b", "b0").trim},
      kbrow AS (
        SELECT CAST(1 AS BIGINT) AS threshold,
               CAST(count(*) AS BIGINT) AS n_types_full,
               CAST(count(*) AS BIGINT) AS n_types_kept,
               CAST(1.0 AS DOUBLE) AS kept_frac,
               (SELECT base_avg FROM kbavg) AS avg_ppl,
               CAST(0.0 AS DOUBLE) AS ppl_delta,
               CAST(0 AS BIGINT) AS n_moved,
               CAST(0.0 AS DOUBLE) AS moved_frac
        FROM k3c3),
      $rungRows
      SELECT * FROM ($union)
      ORDER BY threshold"""
    }) { (s, dir) =>
      def pplOf(d: DataFrame): DataFrame =
        d.select(col("doc_id"), col("lang"),
          round(exp(-col("avg_lp")), 6).as("ppl"))
      def bucketed(d: DataFrame, out: String): DataFrame = {
        val cuts = d.groupBy("lang").agg(
          percentile_approx(col("ppl"),
            array(lit(1.0 / 3), lit(2.0 / 3)), lit(1000000)).as("qs"))
        d.join(broadcast(cuts), "lang")
          .select(col("doc_id"),
            when(col("ppl") <= element_at(col("qs"), 1), "head")
              .when(col("ppl") <= element_at(col("qs"), 2), "middle")
              .otherwise("tail").as(out))
      }
      val c3 = kn3Counts(s, dir)
      val basePpl = pplOf(kn3Lp(s, dir)).localCheckpoint()
      val baseB = bucketed(basePpl, "b0").localCheckpoint()
      val baseAvg = basePpl
        .agg(round(avg("ppl"), 6).as("base_avg"))
      val baseline = c3.agg(count(lit(1)).as("n_types_full"))
        .crossJoin(broadcast(baseAvg))
        .select(lit(1L).as("threshold"), col("n_types_full"),
          col("n_types_full").as("n_types_kept"),
          lit(1.0).as("kept_frac"),
          col("base_avg").as("avg_ppl"),
          lit(0.0).as("ppl_delta"), lit(0L).as("n_moved"),
          lit(0.0).as("moved_frac"))
      val rungs = KnPruneRungs.map { th =>
        val pr = pplOf(kn3PrunedLp(s, dir, th)).localCheckpoint()
        val sizes = c3.agg(count(lit(1)).as("n_types_full"),
          count(when(col("c3") >= th, lit(1))).as("n_types_kept"))
        val avgP = pr.agg(round(avg("ppl"), 6).as("avg_ppl"))
        val moved = baseB.join(bucketed(pr, "b1"), "doc_id")
          .agg(sum(when(col("b0") =!= col("b1"), 1L).otherwise(0L))
            .as("n_moved"), count(lit(1)).as("n_docs"))
        sizes.crossJoin(broadcast(avgP))
          .crossJoin(broadcast(baseAvg))
          .crossJoin(broadcast(moved))
          .select(lit(th).as("threshold"), col("n_types_full"),
            col("n_types_kept"),
            round(col("n_types_kept").cast("double")
              / col("n_types_full"), 9).as("kept_frac"),
            col("avg_ppl"),
            round(col("avg_ppl") - col("base_avg"), 6)
              .as("ppl_delta"),
            col("n_moved"),
            round(col("n_moved").cast("double") / col("n_docs"), 9)
              .as("moved_frac"))
      }
      (baseline +: rungs).reduce(_ unionByName _)
        .orderBy("threshold")
    },

    // UNIFIED CURATION GATE — the four MEASURED signals composed into
    // one sequential corpus-yield pipeline with per-stage accounting:
    // exact dedup keeper → trained classifier at the CALIBRATION-
    // CHOSEN threshold (q_t_quality_clf_threshold's operating point)
    // → Kneser-Ney perplexity bucket ≠ tail (the production CCNet
    // rung, per-language terciles) → DSIR importance weight > 0 (the
    // target-distribution gate). Every signal is an already-hash-
    // checked shared artifact (the q_t_filter_agreement stages, KN
    // instead of add-one); this row is their consumption — what the
    // corpus actually yields when the gates stack, in docs and
    // tokens, stage by stage. Stream ≡ batch is spec-locked via
    // CurationGate.gate (StreamingSpec): the same three signal gates
    // run on a streaming frame against the frozen artifacts.
    Q("q_t_curation_gate", Some(s"""
      WITH ${CurationQueries.qclfCtes},
      ${graft.text.QualityClf.oracleThresholdCtes(
        CurationQueries.QcIters, CurationQueries.QcTarget).trim},
      ${graft.text.KneserNey.oracleCtes(KnDiscount).trim},
      ${CurationQueries.dsirCtes.trim},
      cgtok AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(text, '[[:space:]]+'))
                 AS BIGINT) AS n_tokens
        FROM documents),
      cg1 AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS keep
          FROM documents) WHERE doc_id = keep),
      cg2 AS (
        SELECT c.doc_id FROM cg1 c JOIN qcpt m ON c.doc_id = m.doc_id
        WHERE m.p >= (SELECT thr FROM qcpick)),
      cgk AS (
        SELECT doc_id, lang, round(exp(-avg_lp), 6) AS ppl FROM knd),
      cgr AS (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY ppl)
                 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM cgk),
      cgcut AS (
        SELECT lang,
               max(CASE WHEN rn = CAST(ceil(${1.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut1,
               max(CASE WHEN rn = CAST(ceil(${2.0 / 3} * n) AS BIGINT)
                 THEN ppl END) AS cut2
        FROM cgr GROUP BY 1),
      cgb AS (
        SELECT d.doc_id,
               CASE WHEN d.ppl <= c.cut1 THEN 'head'
                    WHEN d.ppl <= c.cut2 THEN 'middle'
                    ELSE 'tail' END AS b
        FROM cgk d JOIN cgcut c USING (lang)),
      cg3 AS (
        SELECT c.doc_id FROM cg2 c
        LEFT JOIN cgb ON c.doc_id = cgb.doc_id
        WHERE cgb.b IS NULL OR cgb.b <> 'tail'),
      cg4 AS (
        SELECT c.doc_id FROM cg3 c JOIN dlw ON c.doc_id = dlw.doc_id
        WHERE round(dlw.logw, 6) > 0),
      cga0 AS (SELECT CAST(count(*) AS BIGINT) AS d0 FROM documents),
      cga1 AS (SELECT CAST(count(*) AS BIGINT) AS d1,
                      CAST(sum(t.n_tokens) AS BIGINT) AS t1
               FROM cg1 JOIN cgtok t USING (doc_id)),
      cga2 AS (SELECT CAST(count(*) AS BIGINT) AS d2,
                      CAST(sum(t.n_tokens) AS BIGINT) AS t2
               FROM cg2 JOIN cgtok t USING (doc_id)),
      cga3 AS (SELECT CAST(count(*) AS BIGINT) AS d3,
                      CAST(sum(t.n_tokens) AS BIGINT) AS t3
               FROM cg3 JOIN cgtok t USING (doc_id)),
      cga4 AS (SELECT CAST(count(*) AS BIGINT) AS d4,
                      CAST(sum(t.n_tokens) AS BIGINT) AS t4
               FROM cg4 JOIN cgtok t USING (doc_id))
      SELECT * FROM (
        SELECT '1_exact_dedup' AS stage, d0 AS docs_in,
               d0 - d1 AS docs_removed, d1 AS docs_out,
               t1 AS tokens_out
        FROM cga0, cga1
        UNION ALL
        SELECT '2_quality_clf', d1, d1 - d2, d2, t2 FROM cga1, cga2
        UNION ALL
        SELECT '3_ppl_kn', d2, d2 - d3, d3, t3 FROM cga2, cga3
        UNION ALL
        SELECT '4_dsir', d3, d3 - d4, d4, t4 FROM cga3, cga4)
      ORDER BY stage""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val nTok = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val s1 = Dedup.exactDups(docs).filter(!col("is_dup"))
        .select("doc_id")
      val thr = CurationQueries.qclfThreshold(s, dir)
      val clfP = graft.text.QualityClf.score(
          CurationQueries.qclfFeatY(s, dir),
          CurationQueries.qclfWeights(s, dir))
        .select(col("doc_id"), round(col("prob"), 9).as("p"))
      val s2 = s1.join(clfP, "doc_id").filter(col("p") >= thr)
        .select("doc_id")
      val knB = knBucketed(s, dir)
        .select(col("doc_id"), col("ppl_bucket").as("b"))
      val s3 = s2.join(knB, Seq("doc_id"), "left")
        .filter(col("b").isNull || col("b") =!= "tail")
        .select("doc_id")
      val s4 = s3.join(CurationQueries.dsirWeights(s, dir)
          .select(col("doc_id"), col("logw")), "doc_id")
        .filter(round(col("logw"), 6) > 0)
        .select("doc_id")
      def acc(df: DataFrame, dn: String, tn: String) =
        df.join(nTok, "doc_id")
          .agg(count(lit(1)).as(dn),
            sum("n_tokens").cast("long").as(tn))
      val a0 = docs.agg(count(lit(1)).as("d0"))
      val one = a0.crossJoin(acc(s1, "d1", "t1"))
        .crossJoin(acc(s2, "d2", "t2"))
        .crossJoin(acc(s3, "d3", "t3"))
        .crossJoin(acc(s4, "d4", "t4"))
        .localCheckpoint()
      def row(stage: String, din: org.apache.spark.sql.Column,
          dout: org.apache.spark.sql.Column,
          tout: org.apache.spark.sql.Column) =
        one.select(lit(stage).as("stage"), din.as("docs_in"),
          (din - dout).as("docs_removed"), dout.as("docs_out"),
          tout.as("tokens_out"))
      row("1_exact_dedup", col("d0"), col("d1"), col("t1"))
        .unionByName(row("2_quality_clf", col("d1"), col("d2"),
          col("t2")))
        .unionByName(row("3_ppl_kn", col("d2"), col("d3"), col("t3")))
        .unionByName(row("4_dsir", col("d3"), col("d4"), col("t4")))
        .orderBy("stage")
    },

    // Document chunking for context windows: 64-token chunks with
    // 8-token overlap (stride 56). Pure per-doc arithmetic + explode —
    // embarrassingly parallel at corpus scale; spans are emitted as
    // token offsets, not text copies.
    Q("q_t_chunks", Some("""
      WITH d AS (
        SELECT doc_id, len(regexp_split_to_array(text, '[[:space:]]+')) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
               greatest(1, (n_tokens - 8 + 55) // 56) AS n_chunks
        FROM d),
      ch AS (
        SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * 56 AS BIGINT) AS start_tok,
               CAST(least(i * 56 + 64, n_tokens) AS BIGINT) AS end_tok
        FROM c, unnest(range(n_chunks)) r(i))
      SELECT doc_id, chunk_idx, start_tok, end_tok,
             end_tok - start_tok AS n_chunk_tokens,
             CAST(end_tok = n_tokens AS BOOLEAN) AS is_last
      FROM ch ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      val C = 64; val O = 8; val stride = C - O
      val d = t(s, dir, "documents").select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tokens"))
      val c = d.withColumn("n_chunks",
        greatest(lit(1), floor((col("n_tokens") - O + stride - 1)
          / lit(stride.toDouble)).cast("int")))
      c.select(col("doc_id"), col("n_tokens"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("i"))
        .select(col("doc_id"), col("i").cast("long").as("chunk_idx"),
          (col("i") * stride).cast("long").as("start_tok"),
          least(col("i") * stride + C, col("n_tokens")).cast("long")
            .as("end_tok"),
          col("n_tokens"))
        .withColumn("n_chunk_tokens", col("end_tok") - col("start_tok"))
        .withColumn("is_last", col("end_tok") === col("n_tokens"))
        .select("doc_id", "chunk_idx", "start_tok", "end_tok",
          "n_chunk_tokens", "is_last")
        .orderBy("doc_id", "chunk_idx")
    },

    // Context-window packing: docs packed into fixed 2048-token bins by
    // cumulative offset (deterministic doc_id order) — the sample-
    // packing shape; per-bin occupancy + fill rate. The cumulative sum
    // runs as a distributed two-pass prefix sum (Wins.globalCumSum):
    // range-partition, per-partition totals, broadcast offsets — never
    // a single-task global window; everything else is a bin-keyed
    // aggregate.
    Q("q_t_pack", Some(s"""
      WITH ${graft.text.Bpe.oracleCtes(BpeMerges)},
      tk AS (
        SELECT doc_id, unnest(${graft.text.Bpe.ToksSql}) AS word
        FROM documents),
      d AS (
        SELECT t.doc_id, CAST(sum(len(w.s)) AS BIGINT) AS n_tokens
        FROM tk t JOIN bw_$BpeMerges w ON t.word = w.word
        GROUP BY 1),
      cum AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM d),
      binned AS (
        SELECT *, CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin_id
        FROM cum)
      SELECT bin_id, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(min(doc_id) AS BIGINT) AS first_doc,
             CAST(max(doc_id) AS BIGINT) AS last_doc,
             round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 9) AS fill_rate
      FROM binned GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val target = 2048
      // the packing budget is REAL learned-BPE token counts (r10) —
      // the ceil(len/4) estimate retired to q_t_tokens_bpe's
      // pre-tokenizer accounting
      val d = t(s, dir, "documents").select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .join(bpeVocab(s, dir)
          .select(col("word"), size(col("syms")).as("np")), Seq("word"))
        .groupBy("doc_id")
        .agg(sum("np").cast("long").as("n_tokens"))
      val binned = graft.ops.Wins
        .globalCumSum(d, Seq(col("doc_id")), col("n_tokens"), "cum_tokens")
        .withColumn("bin_id",
          floor((col("cum_tokens") - col("n_tokens"))
            / lit(target.toDouble)).cast("long"))
      binned.groupBy("bin_id").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          min("doc_id").cast("long").as("first_doc"),
          max("doc_id").cast("long").as("last_doc"),
          round(sum("n_tokens").cast("double") / target, 9)
            .as("fill_rate"))
        .orderBy("bin_id")
    },

    // Corpus curation end-to-end: the C4-style selection pipeline —
    // quality gates (token count / quality score / digit ratio), exact
    // dedup keeper, then a quality-ranked token budget (60% of surviving
    // tokens). The ranked budget needs a total ORDER but not a single
    // task: rank + cumulative tokens come from the distributed two-pass
    // prefix sum (Wins.globalCumSum) over (quality desc, doc_id), so
    // every stage — gates, keeper, budget — stays embarrassingly
    // parallel.
    Q("q_corpus_curate", Some {
      val scoreCols = TextOps.LangMarkers.map { case (l, ms) =>
        val in = ms.map(m => s"'$m'").mkString("(", ", ", ")")
        s"len(list_filter(t, x -> x IN $in)) AS score_$l"
      }.mkString(",\n             ")
      val langs = TextOps.LangMarkers.map(_._1)
      val best = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
      val pred = langs.map(l => s"WHEN score_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      s"""
      WITH b AS (
        SELECT doc_id, lang, text, regexp_split_to_array(text, '[[:space:]]+') AS t,
               length(text) AS nc FROM documents),
      feat AS (
        SELECT doc_id, lang,
             len(t) AS n_tokens,
             round(CAST(nc - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE) / nc, 9) AS digit_ratio,
             round(0.4 * (CAST(least(nc, 400) AS DOUBLE) / 400.0)
               + 0.4 * (1.0 - CAST(nc - length(regexp_replace(text, '[0-9]',
                   '', 'g')) AS DOUBLE) / nc)
               + 0.2 * least((CAST(len(list_filter(t, x -> x IN $stop))
                   AS DOUBLE) / len(t)) * 4.0, 1.0), 9) AS quality_score,
             $scoreCols
        FROM b),
      pr AS (SELECT *, $pred AS predicted FROM feat),
      fp AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents),
      surv AS (
        SELECT p.doc_id, p.lang, p.predicted, p.n_tokens, p.quality_score
        FROM pr p JOIN fp ON p.doc_id = fp.doc_id
        WHERE fp.doc_id = fp.keep_id
          AND p.n_tokens >= 10 AND p.quality_score >= 0.5
          AND p.digit_ratio <= 0.3),
      bud AS (SELECT CAST(floor(0.6 * sum(n_tokens)) AS BIGINT) AS budget
              FROM surv),
      ranked AS (
        SELECT *,
          CAST(row_number() OVER (ORDER BY quality_score DESC, doc_id)
            AS BIGINT) AS rnk,
          CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM surv)
      SELECT doc_id, lang, predicted, n_tokens, quality_score, rnk,
             cum_tokens
      FROM ranked, bud WHERE cum_tokens <= bud.budget ORDER BY rnk"""
    }) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val feat = docs.select(
        Seq(col("doc_id"), col("lang"))
          ++ TextOps.qualityFeatures(col("text"))
          ++ TextOps.langScores(col("text")): _*)
        .withColumn("predicted", TextOps.predictedLang)
      val keepW = Window.partitionBy(md5(col("text").cast("binary")))
      val fp = docs.select(col("doc_id"),
        min("doc_id").over(keepW).as("keep_id"))
      // Materialize the slim survivor frame ONCE: the interpreted HOF
      // feature battery (qualityFeatures/langScores lambdas — no
      // codegen) would otherwise run twice, for the budget aggregate AND
      // for globalCumSum's own checkpoint. One narrow row per surviving
      // doc, so the checkpoint is bounded by corpus cardinality.
      val surv = feat.join(fp, Seq("doc_id"))
        .filter(col("doc_id") === col("keep_id")
          && col("n_tokens") >= 10 && col("quality_score") >= 0.5
          && col("digit_ratio") <= 0.3)
        .select("doc_id", "lang", "predicted", "n_tokens", "quality_score")
        .localCheckpoint()
      val bud = surv.agg(
        floor(lit(0.6) * sum("n_tokens")).cast("long").as("budget"))
      val ranked = graft.ops.Wins.globalCumSum(surv,
        Seq(col("quality_score").desc, col("doc_id")), col("n_tokens"),
        "cum_tokens", outRank = Some("rnk"))
      ranked.crossJoin(broadcast(bud))
        .filter(col("cum_tokens") <= col("budget"))
        .select("doc_id", "lang", "predicted", "n_tokens",
          "quality_score", "rnk", "cum_tokens")
        .orderBy("rnk")
    },

    // TF-IDF keyword extraction: smoothed idf, length-normalized tf,
    // top-3 terms per doc (rounded-score + term tie-break so ranking is
    // reproducible across engines). One term-keyed shuffle for df, one
    // doc-keyed window for top-k — linear at corpus scale.
    // Vocabulary builder: top-100 terms by corpus frequency with
    // per-term share and cumulative coverage — what a WordPiece/BPE
    // trainer consumes and the OOV-rate curve falls out of. Scale
    // shape: one map-side-combined term count, then TakeOrdered for
    // the top slice (never a global sort); the rank/coverage window
    // runs over the ≤100-row post-limit report table (SURVEY A14's
    // own shape).
    Q("q_t_vocab", Some("""
      WITH tk AS (
        SELECT unnest(regexp_split_to_array(text, '[[:space:]]+')) AS term FROM documents),
      tot AS (SELECT count(*) AS n FROM tk),
      top AS (
        SELECT term, count(*) AS cnt FROM tk GROUP BY 1
        ORDER BY cnt DESC, term LIMIT 100),
      r AS (
        SELECT term, cnt,
               row_number() OVER (ORDER BY cnt DESC, term) AS rank,
               sum(cnt) OVER (ORDER BY cnt DESC, term
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM top)
      SELECT rank, term, CAST(cnt AS BIGINT) AS cnt,
             round(CAST(cnt AS DOUBLE) / (SELECT n FROM tot), 9)
               AS share,
             round(CAST(cum AS DOUBLE) / (SELECT n FROM tot), 9)
               AS cum_share
      FROM r ORDER BY rank""")) { (s, dir) =>
      val tk = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      val tot = tk.agg(count(lit(1)).as("n"))
      val top = tk.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(100)
      // unpartitioned window is intentional: post-limit ≤100-row
      // report table — SURVEY A14's own shape
      val w = Window.orderBy(col("cnt").desc, col("term"))
      top
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("term"), col("cnt"),
          round(col("cnt").cast("double") / col("n"), 9).as("share"),
          round(col("cum").cast("double") / col("n"), 9).as("cum_share"))
        .orderBy("rank")
    },

    Q("q_t_tfidf", Some("""
      WITH tk AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '[[:space:]]+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
      dfreq AS (SELECT term, count(*) AS df FROM
        (SELECT DISTINCT doc_id, term FROM tk) GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM documents),
      scored AS (
        SELECT t.doc_id, t.term, t.tf, f.df,
               round((CAST(t.tf AS DOUBLE) / dl.n_tok)
                 * (ln((nn.n + 1.0) / (f.df + 1.0)) + 1.0), 9) AS tfidf
        FROM tf t JOIN dl USING (doc_id) JOIN dfreq f USING (term)
        CROSS JOIN nn)
      SELECT doc_id, term, tf, df, tfidf, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY tfidf DESC, term) AS rnk FROM scored)
      WHERE rnk <= 3 ORDER BY doc_id, rnk""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tk = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val tf = tk.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tk.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      val dfreq = tk.distinct().groupBy("term")
        .agg(count(lit(1)).as("df"))
      val nn = docs.agg(count(lit(1)).as("n"))
      val scored = tf.join(dl, "doc_id").join(dfreq, "term")
        .crossJoin(broadcast(nn))
        .withColumn("tfidf",
          round((col("tf").cast("double") / col("n_tok"))
            * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 9))
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("term"))))
        .filter(col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    },

    // BM25 retrieval scoring — the ranking function data curation uses
    // to select domain-matching documents (tf saturation via k1=1.2,
    // length normalization via b=0.75), scored for a fixed 3-term
    // query against the corpus. Same two shuffles as TF-IDF (term df +
    // doc length); per-term scores stay unrounded, the 3-term per-doc
    // sum goes through DECIMAL(38,18) (order-free), round-9 out. The
    // k1+1 / 1−b constants are written literally (2.2 / 0.25) on both
    // sides — computing them lands on different doubles.
    Q("q_t_bm25", Some("""
      WITH tk AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '[[:space:]]+')) AS term
        FROM documents),
      qt (term) AS (VALUES ('join'), ('hash'), ('scan')),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tk
        WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
      dl AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
      avgdl AS (
        SELECT CAST(sum(n_tok) AS DOUBLE) / count(*) AS adl FROM dl),
      dfreq AS (SELECT term, count(*) AS df FROM
        (SELECT DISTINCT doc_id, term FROM tk
         WHERE term IN (SELECT term FROM qt)) GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM documents),
      terms AS (
        SELECT t.doc_id,
               ln(1.0 + (nn.n - f.df + 0.5) / (f.df + 0.5))
                 * (CAST(t.tf AS DOUBLE) * 2.2)
                 / (t.tf + 1.2 * (0.25 + 0.75
                   * (CAST(dl.n_tok AS DOUBLE) / av.adl))) AS ts
        FROM tf t JOIN dl USING (doc_id) JOIN dfreq f USING (term)
        CROSS JOIN nn CROSS JOIN avgdl av),
      scored AS (
        SELECT doc_id,
               round(CAST(sum(CAST(ts AS DECIMAL(38,18))) AS DOUBLE),
                 9) AS bm25
        FROM terms GROUP BY 1)
      SELECT doc_id, bm25, rnk FROM (
        SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id)
          AS rnk FROM scored)
      WHERE rnk <= 20 ORDER BY rnk""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val qTerms = Seq("join", "hash", "scan")
      val tk = docs.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val tf = tk.filter(col("term").isin(qTerms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tk.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      val avgdl = dl.agg((sum("n_tok").cast("double")
        / count(lit(1))).as("adl"))
      val dfreq = tk.filter(col("term").isin(qTerms: _*))
        .select("doc_id", "term").distinct()
        .groupBy("term").agg(count(lit(1)).as("df"))
      val nn = docs.agg(count(lit(1)).as("n"))
      val terms = tf.join(dl, "doc_id").join(dfreq, "term")
        .crossJoin(broadcast(nn)).crossJoin(broadcast(avgdl))
        .select(col("doc_id"),
          (log(lit(1.0) + (col("n") - col("df") + 0.5)
              / (col("df") + 0.5))
            * (col("tf").cast("double") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75)
              * (col("n_tok").cast("double") / col("adl"))))).as("ts"))
      val scored = terms.groupBy("doc_id")
        .agg(round(sum(col("ts").cast("decimal(38,18)")).cast("double"),
          9).as("bm25"))
      // unpartitioned window is intentional: post-aggregation per-doc
      // score table ranked for a top-20 report — SURVEY A14's own shape
      scored.withColumn("rnk", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .filter(col("rnk") <= 20)
        .select("doc_id", "bm25", "rnk")
        .orderBy("rnk")
    },

    // Brute-force cosine top-5 for query vectors (vec_id < 8)
    Q("q_e_cosine_topk", Some("""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
      q AS (SELECT * FROM ex WHERE vec_id < 8),
      dots AS (
        SELECT q.vec_id AS qid, e.vec_id AS vid, sum(q.x * e.x) AS dot
        FROM q JOIN ex e ON q.i = e.i AND q.vec_id <> e.vec_id
        GROUP BY 1, 2),
      cosd AS (
        SELECT qid, vid, round(dot / (nq.nrm * nv.nrm), 6) AS cos_sim
        FROM dots JOIN norms nq ON qid = nq.vec_id
                  JOIN norms nv ON vid = nv.vec_id)
      SELECT qid, vid, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY cos_sim DESC, vid) AS rnk FROM cosd)
      WHERE rnk <= 5 ORDER BY qid, rnk""")) { (s, dir) =>
      Similarity.cosineTopK(t(s, dir, "embeddings"), col("vec_id") < 8, 5)
        .select("qid", "vid", "cos_sim", "rnk")
        .orderBy("qid", "rnk")
    },

    // Power-iteration PCA FIT (PowerPca scaladoc): the data-DEPENDENT
    // dimension reduction next to the J-L random projection — the
    // TRAINED loadings themselves are hash-checked, every iterate
    // accumulated through exact DECIMAL(38,18) sums with the round-9
    // seam before re-entering the recursion (the QualityClf GD
    // discipline), so the whole deflated power iteration is
    // reproduced by the unrolled oracle.
    Q("q_e_pca_fit", Some(s"""
      WITH $pcaCtes
      SELECT component, i, loading FROM ppfit
      ORDER BY component, i""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val f = pcaFitted(s, dir)
      f.components.flatMap(c =>
          (0 until f.dims).map(i => (c.c, i, c.v(i))))
        .toDF("component", "i", "loading")
        .orderBy("component", "i")
    },

    // PCA variance report: per component the round-9 eigenvalue and
    // the explained-variance fraction — the dial that says how many
    // components an embedding-whitening or compression step actually
    // needs (the data-dependent answer the q_e_rp_* rows' oblivious
    // guarantee can't give). Honest fixture reading: the embeddings
    // are near-isotropic (each component ≈ 2.4% vs the 1/64 ≈ 1.6%
    // isotropic baseline), and at a FIXED iteration count on a flat
    // spectrum the components are top-variance directions up to
    // convergence, not strictly eigenvalue-ordered — power
    // iteration's known small-eigengap behavior; PowerPcaSpec proves
    // ordered recovery on planted anisotropic data, and this row is
    // exactly what tells an operator the corpus has no axis worth
    // whitening.
    Q("q_e_pca_var", Some(s"""
      WITH $pcaCtes
      SELECT component, eigenvalue, explained_frac FROM ppvar
      ORDER BY component""")) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val f = pcaFitted(s, dir)
      f.components.map(c =>
          (c.c, c.lambda, graft.text.Unigram.round9(
            c.lambda / f.totalVar)))
        .toDF("component", "eigenvalue", "explained_frac")
        .orderBy("component")
    },

    // PCA projection — the serving half: every vector's coordinate on
    // every fitted component, (x − m)·v_c through the same exact
    // decimal path as the fit (the oracle re-derives from its own
    // fitted loadings, so fit AND serve are checked together). The
    // stateless rowwise/streaming scorer is the map-only twin
    // (PowerPca.projectRowwise, parity spec-locked).
    Q("q_e_pca_project", Some(s"""
      WITH $pcaCtes
      SELECT vec_id, component, proj FROM pprj
      ORDER BY vec_id, component""")) { (s, dir) =>
      graft.ml.PowerPca.projectLong(t(s, dir, "embeddings"),
          pcaFitted(s, dir))
        .orderBy("vec_id", "component")
    },

    // Matryoshka-style dimension-truncation A/B (Kusupati et al.
    // 2022: serve embeddings from a nested PREFIX of the vector —
    // a d/64 fraction of the scan bytes and dot-product FLOPs):
    // per (prefix dim, query), the exact top-k under truncated
    // cosine vs the full-dim truth. The row prices dim budget
    // against recall before any index even enters; honest caveat —
    // the fixture embeddings are not MRL-TRAINED, so this measures
    // the intrinsic prefix robustness, which is exactly what the
    // operator reports on any real corpus too.
    Q("q_e_mrl_recall", Some {
      val mx = """
      mx AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      mxtn AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM mx
               GROUP BY 1),
      mxtt AS MATERIALIZED (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid, row_number() OVER (PARTITION BY d.qid
            ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC, d.vid)
            AS rnk
          FROM (SELECT q.vec_id AS qid, e.vec_id AS vid,
                       sum(q.x * e.x) AS dot
                FROM mx q JOIN mx e ON q.i = e.i
                  AND q.vec_id <> e.vec_id
                WHERE q.vec_id < 8 GROUP BY 1, 2) d
          JOIN mxtn na ON na.vec_id = d.qid
          JOIN mxtn nb ON nb.vec_id = d.vid)
        WHERE rnk <= """ + AnnK + ")"
      val perDim = MrlDims.map { d => s"""
      mxn$d AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM mx
                WHERE i < $d GROUP BY 1),
      mxt$d AS MATERIALIZED (
        SELECT qid, vid FROM (
          SELECT dd.qid, dd.vid, row_number() OVER (PARTITION BY dd.qid
            ORDER BY round(dd.dot / (na.nrm * nb.nrm), 6) DESC, dd.vid)
            AS rnk
          FROM (SELECT q.vec_id AS qid, e.vec_id AS vid,
                       sum(q.x * e.x) AS dot
                FROM mx q JOIN mx e ON q.i = e.i
                  AND q.vec_id <> e.vec_id
                WHERE q.vec_id < 8 AND q.i < $d AND e.i < $d
                GROUP BY 1, 2) dd
          JOIN mxn$d na ON na.vec_id = dd.qid
          JOIN mxn$d nb ON nb.vec_id = dd.vid)
        WHERE rnk <= $AnnK)"""
      }.mkString(",")
      val union = MrlDims.map { d => s"""
        SELECT $d AS dim, t.qid,
               CAST(count(s.vid) AS BIGINT) AS n_hits,
               CAST(count(*) AS BIGINT) AS n_true,
               round(CAST(count(s.vid) AS DOUBLE) / count(*), 9)
                 AS recall
        FROM mxtt t LEFT JOIN mxt$d s
          ON s.qid = t.qid AND s.vid = t.vid
        GROUP BY 2"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $mx,$perDim
      $union
      ORDER BY dim, qid"""
    }) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val truth = Similarity.cosineTopK(emb, col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      MrlDims.map { d =>
        val trunc = emb.withColumn("embedding",
          slice(col("embedding"), 1, d))
        val top = Similarity.cosineTopK(trunc, col("vec_id") < 8, AnnK)
          .select(col("qid"), col("vid")).withColumn("hit", lit(1L))
        truth.join(top, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
            count(lit(1)).as("n_true"))
          .select(lit(d).as("dim"), col("qid"), col("n_hits"),
            col("n_true"),
            round(col("n_hits").cast("double") / col("n_true"), 9)
              .as("recall"))
      }.reduce(_ unionByName _).orderBy("dim", "qid")
    },

    // Dimension-reduction CONSUMED by the ANN ladder — RP vs PCA vs
    // MRL prefix at ONE matched dimension (ann.dimred.dim), each
    // arm running the SAME IVF-flat index in its reduced space:
    // Lloyd coarse cells fitted on the reduced vectors (the
    // hash-checkable seed-slice fit), n_probe-cell probing, exact
    // reduced-space cosine inside probed cells. Per (arm, query):
    // recall@k against the FULL-dim exact truth + the probed-
    // candidate cost. The consume-what-you-measured discipline (the
    // calibration threshold's r12 pattern) applied to the dim-
    // reduction family: the RP/PCA/MRL recall rows each price the
    // reduction alone — this row prices the reduction UNDER the
    // index a production deployment would actually serve from.
    Q("q_e_dimred_ab", Some {
      val dIn = graft.Settings.ann.embeddingDim
      val scale = 1.0 / math.sqrt(DimredDim.toDouble)
      val pcaChain = graft.ml.PowerPca.oracleCtes(DimredDim,
        DimredPcaIters, dims = dIn)
      val srcs = s"""
      drex AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      drm AS MATERIALIZED (
        SELECT vec_id AS pid, i AS j, x FROM drex
        WHERE i < $DimredDim),
      drrm AS (
        SELECT j, i,
               CASE WHEN ${hsql("'rp_' || j || '_' || i")} % 2 = 0
                 THEN $scale ELSE -$scale END AS r
        FROM range($DimredDim) t1(j) CROSS JOIN range($dIn) t2(i)),
      drr AS MATERIALIZED (
        SELECT e.vec_id AS pid, m.j,
               round(CAST(sum(CAST(e.x * m.r AS DECIMAL(38,18)))
                 AS DOUBLE), 6) AS x
        FROM drex e JOIN drrm m ON e.i = m.i GROUP BY 1, 2),
      drp AS MATERIALIZED (
        SELECT vec_id AS pid, component AS j, proj AS x FROM pprj),
      drnf AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM drex
               GROUP BY 1),
      drtt AS MATERIALIZED (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid, row_number() OVER (PARTITION BY d.qid
            ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC, d.vid)
            AS rnk
          FROM (SELECT q.vec_id AS qid, e.vec_id AS vid,
                       sum(q.x * e.x) AS dot
                FROM drex q JOIN drex e ON q.i = e.i
                  AND q.vec_id <> e.vec_id
                WHERE q.vec_id < 8 GROUP BY 1, 2) d
          JOIN drnf na ON na.vec_id = d.qid
          JOIN drnf nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)"""
      val arms = Seq(("mrl", "dm", "drm"), ("pca", "dp", "drp"),
        ("rp", "dr", "drr"))
      val armCtes = arms.map { case (_, pfx, src) =>
        dimredArmCtes(pfx, src).trim }.mkString(",\n      ")
      val union = arms.map { case (m, pfx, _) => s"""
        SELECT '$m' AS method, t.qid,
               CAST(count(s.vid) AS BIGINT) AS n_hits,
               CAST(count(*) AS BIGINT) AS n_true,
               round(CAST(count(s.vid) AS DOUBLE) / count(*), 9)
                 AS recall,
               any_value(c.n_cands) AS n_cands
        FROM drtt t
        LEFT JOIN ${pfx}tk s ON s.qid = t.qid AND s.vid = t.vid
        JOIN ${pfx}nc c ON c.qid = t.qid
        GROUP BY 2"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $pcaChain,$srcs,
      $armCtes
      $union
      ORDER BY method, qid"""
    }) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      def armOut(m: String): DataFrame = {
        val served = dimredArm(s, dir, m)
        val hits = served.select(col("qid"), col("vid"))
          .withColumn("hit", lit(1L))
        val nc = served.groupBy("qid")
          .agg(first(col("n_cands")).as("n_cands"))
        truth.join(hits, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
            count(lit(1)).as("n_true"))
          .join(nc, Seq("qid"))
          .select(lit(m).as("method"), col("qid"), col("n_hits"),
            col("n_true"),
            round(col("n_hits").cast("double") / col("n_true"), 9)
              .as("recall"), col("n_cands"))
      }
      armOut("mrl").unionByName(armOut("pca")).unionByName(armOut("rp"))
        .orderBy("method", "qid")
    },

    // NN-Descent kNN GRAPH (NnDescent scaladoc — Dong et al. 2011):
    // the graph-building ANN family member next to the IVF/PQ point-
    // query ladder — md5-seeded random graph, then fixed local-join
    // rounds ("a neighbor of my neighbor is a candidate"), each
    // bounded by N·(2k)² pivot-local pairs (no all-pairs step). The
    // oracle unrolls one round per rank, so the ITERATIVE graph
    // refinement itself is hash-checked end-to-end.
    Q("q_e_nnd_graph", Some(s"""
      WITH $nndCtes
      SELECT node, nbr, cos_sim, CAST(rnk AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY node
          ORDER BY cos_sim DESC, nbr) AS rnk
        FROM ndk$NndRounds)
      ORDER BY node, rnk""")) { (s, dir) =>
      nndGraph(s, dir)
        .select(col("node"), col("nbr"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"))
        .orderBy("node", "rnk")
    },

    // NN-Descent recall vs the brute-force truth (per node): how much
    // of the exact top-k neighborhood the local-join rounds recovered
    // — the graded quality row of the graph build (the exact truth is
    // fixture-scale only; it IS the quadratic baseline NN-Descent
    // exists to avoid).
    Q("q_e_nnd_recall", Some(s"""
      WITH $nndCtes,
      ${graft.text.NnDescent.oracleTruthCte(NndK).trim},
      ndg AS (SELECT node, nbr FROM ndk$NndRounds),
      ndh AS (
        SELECT t.node, CAST(count(g.nbr) AS BIGINT) AS n_hits,
               CAST(count(*) AS BIGINT) AS n_true
        FROM ndt t LEFT JOIN ndg g
          ON g.node = t.node AND g.nbr = t.nbr
        GROUP BY 1)
      SELECT node, n_hits, n_true,
             round(CAST(n_hits AS DOUBLE) / n_true, 9) AS recall
      FROM ndh ORDER BY node""")) { (s, dir) =>
      val truth = nndTruth(s, dir)
      val g = nndGraph(s, dir).select("node", "nbr")
        .withColumn("hit", lit(1L))
      truth.join(g, Seq("node", "nbr"), "left")
        .groupBy("node")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          count(lit(1)).as("n_true"))
        .select(col("node"), col("n_hits"), col("n_true"),
          round(col("n_hits").cast("double") / col("n_true"), 9)
            .as("recall"))
        .orderBy("node")
    },

    // Graph-ANN SERVING: beam search over the built NN-Descent graph
    // (the search layer HNSW-style indexes descend from) — md5 entry
    // nodes per query, `hops` expansion rounds each scoring ≤
    // beam·(k+1) query-local candidates, never a pass over the
    // corpus. The oracle re-walks the same descent hop by hop.
    Q("q_e_nnd_serve", Some(s"""
      WITH $nndCtes,
      $nndServeCtes
      SELECT qid, vid, cos_sim, rnk FROM nsrv
      ORDER BY qid, rnk""")) { (s, dir) =>
      nndServed(s, dir)
        .select(col("qid"), col("vid"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"))
        .orderBy("qid", "rnk")
    },

    // Served recall vs cost: per query, how much of the exact top-k
    // the graph descent recovered and how many candidates it ever
    // scored (the brute-force denominator is the corpus size — the
    // row that prices graph serving against the IVF/PQ ladder's
    // frontier points).
    Q("q_e_nnd_serve_recall", Some(s"""
      WITH $nndCtes,
      $nndServeCtes,
      nstr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      nstt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM nstr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)
      SELECT t.qid,
             CAST(count(s.vid) AS BIGINT) AS n_hits,
             CAST(count(*) AS BIGINT) AS n_true,
             round(CAST(count(s.vid) AS DOUBLE) / count(*), 9)
               AS recall,
             any_value(a.n_scored) AS n_scored
      FROM nstt t
      LEFT JOIN nsrv s ON s.qid = t.qid AND s.vid = t.vid
      JOIN nsall a ON a.qid = t.qid
      GROUP BY 1 ORDER BY t.qid""")) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      val served = nndServed(s, dir)
      val hits = served.select(col("qid"), col("vid"))
        .withColumn("hit", lit(1L))
      val nsc = served.groupBy("qid")
        .agg(first(col("n_scored")).as("n_scored"))
      truth.join(hits, Seq("qid", "vid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          count(lit(1)).as("n_true"))
        .join(nsc, Seq("qid"))
        .select(col("qid"), col("n_hits"), col("n_true"),
          round(col("n_hits").cast("double") / col("n_true"), 9)
            .as("recall"), col("n_scored"))
        .orderBy("qid")
    },

    // INCREMENTAL NN-Descent graph maintenance (NnDescent.incrInsert
    // — the graph index's q_e_index_incr analog): the new-doc batch
    // (vec_id >= incr_base) seeds its edges by beam search over the
    // FROZEN base graph (entries drawn from old nodes only), then
    // confined local-join rounds repair the affected neighborhoods —
    // work proportional to the batch's blast radius, never a rebuild.
    // The oracle re-walks the base build, the seed descent, and every
    // confined round; incremental ≡ rebuild recall is spec-locked in
    // NnDescentSpec.
    Q("q_e_nnd_incr", Some(s"""
      WITH $nndIncrCtes
      SELECT node, nbr, cos_sim, rnk FROM ingf
      ORDER BY node, rnk""")) { (s, dir) =>
      nndIncrGraph(s, dir)
        .select(col("node"), col("nbr"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"))
        .orderBy("node", "rnk")
    },

    // Incremental-graph DRIFT accounting — the q_e_index_drift analog
    // for the graph index: how far did the batch insert move the OLD
    // nodes' neighborhoods (edge-set overlap vs the frozen base
    // graph) and how big is the new population. The dial an index
    // owner reads to decide incremental-vs-rebuild: high old-node
    // churn means the batch is reshaping the graph and a rebuild is
    // due.
    Q("q_e_nnd_drift", Some(s"""
      WITH $nndIncrCtes,
      dfb AS (SELECT node, nbr FROM inbk$NndRounds),
      dff AS (SELECT node, nbr FROM ingf WHERE node < $IncrBase),
      dfo AS (
        SELECT b.node,
               CAST(count(*) AS BIGINT) AS n_base,
               CAST(count(f.nbr) AS BIGINT) AS n_kept
        FROM dfb b LEFT JOIN dff f
          ON f.node = b.node AND f.nbr = b.nbr
        GROUP BY 1)
      SELECT CAST((SELECT count(DISTINCT node) FROM dfb) AS BIGINT)
               AS n_old,
             CAST((SELECT count(*) FROM embeddings
                   WHERE vec_id >= $IncrBase) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN n_kept < n_base THEN 1 ELSE 0 END)
               AS BIGINT) AS n_old_changed,
             round(CAST(sum(CASE WHEN n_kept < n_base THEN 1 ELSE 0
               END) AS DOUBLE) / count(*), 9) AS changed_frac,
             round(CAST(sum(CAST(n_kept AS DOUBLE) / n_base)
               AS DOUBLE) / count(*), 9) AS avg_edge_overlap
      FROM dfo""")) { (s, dir) =>
      val base = nndBaseGraph(s, dir).select("node", "nbr")
      val fin = nndIncrGraph(s, dir)
        .filter(col("node") < IncrBase).select("node", "nbr")
        .withColumn("kept", lit(1L))
      val nNew = t(s, dir, "embeddings")
        .filter(col("vec_id") >= IncrBase)
        .agg(count(lit(1)).as("n_new"))
      val dfo = base.join(fin, Seq("node", "nbr"), "left")
        .groupBy("node")
        .agg(count(lit(1)).as("n_base"),
          sum(coalesce(col("kept"), lit(0L))).as("n_kept"))
      dfo.agg(
          countDistinct("node").as("n_old"),
          sum(when(col("n_kept") < col("n_base"), 1L).otherwise(0L))
            .as("n_old_changed"),
          round(sum(when(col("n_kept") < col("n_base"), 1.0)
            .otherwise(0.0)) / count(lit(1)), 9).as("changed_frac"),
          round(sum(col("n_kept").cast("double") / col("n_base"))
            / count(lit(1)), 9).as("avg_edge_overlap"))
        .crossJoin(broadcast(nNew))
        .select(col("n_old"), col("n_new"), col("n_old_changed"),
          col("changed_frac"), col("avg_edge_overlap"))
    },

    // HNSW-style HIERARCHICAL serving (NnDescent.serveHier — Malkov &
    // Yashunin 2016, run over NN-Descent layer graphs): nested
    // md5-sampled layers each carry their own bucket-init NND graph;
    // a query coarse-scans the (N/ratio^levels)-node top layer, beam-
    // descends layer to layer, and finishes on the base graph — the
    // O(log N) entry the flat serve's md5-random entries lack. The
    // oracle re-walks every layer build AND every descent hop.
    Q("q_e_hnsw_serve", Some(s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      $hnswServeChainCtes
      SELECT qid, vid, cos_sim, rnk FROM hsrv
      ORDER BY qid, rnk""")) { (s, dir) =>
      hnswServed(s, dir)
        .select(col("qid"), col("vid"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"))
        .orderBy("qid", "rnk")
    },

    // Hierarchical served recall vs cost — the q_e_nnd_serve_recall
    // twin for the layered index: per query, recall against the exact
    // top-k plus the count of DISTINCT candidates ever scored across
    // ALL layers (coarse scan included — honest accounting; the A/B
    // against the flat serve is q_e_hnsw_ab).
    Q("q_e_hnsw_serve_recall", Some(s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      $hnswServeChainCtes,
      hstr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      hstt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM hstr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)
      SELECT t.qid,
             CAST(count(s.vid) AS BIGINT) AS n_hits,
             CAST(count(*) AS BIGINT) AS n_true,
             round(CAST(count(s.vid) AS DOUBLE) / count(*), 9)
               AS recall,
             any_value(a.n_scored) AS n_scored
      FROM hstt t
      LEFT JOIN hsrv s ON s.qid = t.qid AND s.vid = t.vid
      JOIN hsall a ON a.qid = t.qid
      GROUP BY 1 ORDER BY t.qid""")) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      val served = hnswServed(s, dir)
      val hits = served.select(col("qid"), col("vid"))
        .withColumn("hit", lit(1L))
      val nsc = served.groupBy("qid")
        .agg(first(col("n_scored")).as("n_scored"))
      truth.join(hits, Seq("qid", "vid"), "left")
        .groupBy("qid")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          count(lit(1)).as("n_true"))
        .join(nsc, Seq("qid"))
        .select(col("qid"), col("n_hits"), col("n_true"),
          round(col("n_hits").cast("double") / col("n_true"), 9)
            .as("recall"), col("n_scored"))
        .orderBy("qid")
    },

    // Flat vs hierarchical serving A/B — the frontier row the
    // hierarchy exists for: per arm, average recall@k against the
    // exact truth and the average/total DISTINCT candidates scored,
    // same k, same corpus, same shared artifacts. Measured at the
    // committed knee: at the sf0.01 gate scale the hierarchy
    // DOMINATES — recall 0.875 @ ~183 scored vs flat 0.775 @ 228
    // (better recall at 20% fewer candidates), because descent
    // entries land near the query; on the sf0.001 draw (closer to
    // i.i.d. — the non-navigable case) it reads 0.65 @ 181 vs 0.75
    // @ 216: concentrated entries there lose more to reduced
    // exploration diversity than they gain in proximity (12 knob
    // combos measured before pinning). The structural claim is vs N
    // — coarse entry cost is a knob (N/ratio^levels) where flat
    // hops must grow.
    Q("q_e_hnsw_ab", Some(s"""
      WITH $nndCtes,
      $nndServeCtes,
      $hnswLayerCtes,
      $hnswServeChainCtes,
      abtr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      abtt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM abtr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK),
      abarm AS (
        SELECT 'flat' AS arm, t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*) AS recall,
               any_value(a.n_scored) AS n_scored
        FROM abtt t
        LEFT JOIN nsrv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN nsall a ON a.qid = t.qid
        GROUP BY 2
        UNION ALL
        SELECT 'hier', t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*),
               any_value(a.n_scored)
        FROM abtt t
        LEFT JOIN hsrv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN hsall a ON a.qid = t.qid
        GROUP BY 2)
      SELECT arm, CAST(count(*) AS BIGINT) AS n_queries,
             round(avg(recall), 9) AS avg_recall,
             round(avg(CAST(n_scored AS DOUBLE)), 9) AS avg_scored,
             CAST(sum(n_scored) AS BIGINT) AS total_scored
      FROM abarm GROUP BY 1 ORDER BY arm""")) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      def arm(name: String, served: DataFrame): DataFrame = {
        val hits = served.select(col("qid"), col("vid"))
          .withColumn("hit", lit(1L))
        val nsc = served.groupBy("qid")
          .agg(first(col("n_scored")).as("n_scored"))
        truth.join(hits, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .join(nsc, Seq("qid"))
          .select(lit(name).as("arm"), col("qid"), col("recall"),
            col("n_scored"))
      }
      arm("flat", nndServed(s, dir))
        .unionByName(arm("hier", hnswServed(s, dir)))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 9).as("avg_recall"),
          round(avg(col("n_scored").cast("double")), 9)
            .as("avg_scored"),
          sum("n_scored").cast("long").as("total_scored"))
        .orderBy("arm")
    },

    // Hierarchical-serving FRONTIER — the measured (up_beam, up_hops)
    // table the hnsw_up_* defaults are promoted from (the
    // q_e_ann_frontier discipline applied to the graph index): per
    // rung, average recall@k against the exact truth and the
    // average/total distinct candidates scored, with the flat serve
    // as the baseline arm. All rungs share the layer graphs; the
    // default rung shares the standing hnsw_served stage.
    Q("q_e_hnsw_frontier", Some {
      val rungChains = HnswFrontierRungs.map { case (ub, uh) =>
        graft.text.NnDescent.oracleHierServeCtes(NndRounds, AnnK,
          ub, uh, HnswBeam, HnswHops, HnswRatio, HnswLevels,
          HnswUpRounds, pfx = s"hf${ub}x$uh").trim
      }.mkString(",\n      ")
      val armRows = (s"""
        SELECT 'flat' AS variant, t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*) AS recall,
               any_value(a.n_scored) AS n_scored
        FROM hftt t
        LEFT JOIN nsrv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN nsall a ON a.qid = t.qid
        GROUP BY 2""" +: HnswFrontierRungs.map { case (ub, uh) =>
        val p = s"hf${ub}x$uh"
        s"""
        SELECT 'ub${ub}_uh$uh', t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*),
               any_value(a.n_scored)
        FROM hftt t
        LEFT JOIN ${p}rv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN ${p}all a ON a.qid = t.qid
        GROUP BY 2"""
      }).mkString("\n        UNION ALL ")
      s"""
      WITH $nndCtes,
      $nndServeCtes,
      $hnswLayerCtes,
      $rungChains,
      hftr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      hftt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM hftr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)
      SELECT variant, CAST(count(*) AS BIGINT) AS n_queries,
             round(avg(recall), 9) AS avg_recall,
             round(avg(CAST(n_scored AS DOUBLE)), 9) AS avg_scored,
             CAST(sum(n_scored) AS BIGINT) AS total_scored
      FROM ($armRows)
      GROUP BY 1 ORDER BY variant"""
    }) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      def arm(name: String, served: DataFrame): DataFrame = {
        val hits = served.select(col("qid"), col("vid"))
          .withColumn("hit", lit(1L))
        val nsc = served.groupBy("qid")
          .agg(first(col("n_scored")).as("n_scored"))
        truth.join(hits, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .join(nsc, Seq("qid"))
          .select(lit(name).as("variant"), col("qid"), col("recall"),
            col("n_scored"))
      }
      (arm("flat", nndServed(s, dir)) +:
        HnswFrontierRungs.map { case (ub, uh) =>
          arm(s"ub${ub}_uh$uh", hnswServedAt(s, dir, ub, uh))
        }).reduce(_ unionByName _)
        .groupBy("variant")
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 9).as("avg_recall"),
          round(avg(col("n_scored").cast("double")), 9)
            .as("avg_scored"),
          sum("n_scored").cast("long").as("total_scored"))
        .orderBy("variant")
    },

    // DiskANN-style GRAPH + PQ serving (NnDescent.serveHierPq —
    // Subramanya et al. 2019: graph traversal over COMPRESSED
    // vectors): the hierarchical descent with every hop ADC-scored
    // against the m-byte PQ codes (Similarity.pqParts seed codebook —
    // the chain the pq-topk rows already hash-check), then ONE exact
    // cosine re-rank of the final beam. At 100 TB the traversal
    // touches only the code table + k-bounded edge lists; full-dim
    // floats are read for n_exact ≤ beam candidates per query instead
    // of every scored candidate — the memory bill the DiskANN design
    // pays for. The oracle re-walks the PQ encode, every ADC-scored
    // hop and the exact re-rank.
    Q("q_e_hnsw_pq_serve", Some(s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      ${hnswPqServeChainCtes.trim}
      SELECT qid, vid, cos_sim, rnk, n_scored, n_exact FROM gprv
      ORDER BY qid, rnk""")) { (s, dir) =>
      hnswPqServed(s, dir)
        .select(col("qid"), col("vid"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"), col("n_scored"),
          col("n_exact"))
        .orderBy("qid", "rnk")
    },

    // Float-vs-PQ serving A/B at the SAME descent knobs: recall
    // against the exact top-k, PQ-scored candidate counts, and the
    // full-dimension float touches each arm pays (the float arm reads
    // floats for EVERY scored candidate; the PQ arm only for the
    // final beam) — the row that prices the DiskANN trade: how much
    // recall the compressed traversal gives up for a ~beam-sized
    // float budget.
    Q("q_e_hnsw_pq_ab", Some(s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      $hnswServeChainCtes,
      ${hnswPqServeChainCtes.trim},
      pqtr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      pqtt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM pqtr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK),
      pqarm AS (
        SELECT 'hier_float' AS arm, t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*) AS recall,
               any_value(a.n_scored) AS n_scored,
               any_value(a.n_scored) AS n_exact
        FROM pqtt t
        LEFT JOIN hsrv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN hsall a ON a.qid = t.qid
        GROUP BY 2
        UNION ALL
        SELECT 'hier_pq', t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*),
               any_value(a.n_scored),
               any_value(x.n_exact)
        FROM pqtt t
        LEFT JOIN gprv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN gpall a ON a.qid = t.qid
        JOIN gpnx x ON x.qid = t.qid
        GROUP BY 2)
      SELECT arm, CAST(count(*) AS BIGINT) AS n_queries,
             round(avg(recall), 9) AS avg_recall,
             round(avg(CAST(n_scored AS DOUBLE)), 9) AS avg_scored,
             CAST(sum(n_scored) AS BIGINT) AS total_scored,
             round(avg(CAST(n_exact AS DOUBLE)), 9) AS avg_exact,
             CAST(sum(n_exact) AS BIGINT) AS total_exact
      FROM pqarm GROUP BY 1 ORDER BY arm""")) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid"))
      def arm(name: String, served: DataFrame, hasExact: Boolean)
          : DataFrame = {
        val hits = served.select(col("qid"), col("vid"))
          .withColumn("hit", lit(1L))
        val nsc = served.groupBy("qid")
          .agg(first(col("n_scored")).as("n_scored"),
            (if (hasExact) first(col("n_exact"))
             else first(col("n_scored"))).as("n_exact"))
        truth.join(hits, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .join(nsc, Seq("qid"))
          .select(lit(name).as("arm"), col("qid"), col("recall"),
            col("n_scored"), col("n_exact"))
      }
      arm("hier_float", hnswServed(s, dir), hasExact = false)
        .unionByName(arm("hier_pq", hnswPqServed(s, dir),
          hasExact = true))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 9).as("avg_recall"),
          round(avg(col("n_scored").cast("double")), 9)
            .as("avg_scored"),
          sum("n_scored").cast("long").as("total_scored"),
          round(avg(col("n_exact").cast("double")), 9)
            .as("avg_exact"),
          sum("n_exact").cast("long").as("total_exact"))
        .orderBy("arm")
    },

    // The rerank-budget FRONTIER of the graph+PQ serve — the
    // ann-frontier discipline applied to the DiskANN trade: ONE ADC
    // traversal (the pool does not affect it), one exact re-rank per
    // rerank_r rung, each rung priced by recall vs the exact top-k
    // and by n_exact (full-dim float touches — the budget being
    // bought). The table the shared ann.rerank_r default is promoted
    // from on the compressed-graph side.
    Q("q_e_hnsw_pq_frontier", Some {
      val core = graft.text.NnDescent.oracleHierServePqCore(
        NndRounds, HnswUpBeam, HnswUpHops, HnswBeam, HnswHops,
        HnswRatio, HnswLevels, HnswUpRounds, PqM, PqSubK, PqSubDim,
        lloydIters = PqLloydIters)
      val tails = HnswPqRerankRungs.map(r => graft.text.NnDescent
        .oracleHierServePqTail(AnnK, r, "gp", s"r$r").trim)
        .mkString(",\n      ")
      val armRows = HnswPqRerankRungs.map { r =>
        s"""
        SELECT $r AS rerank_r, t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*) AS recall,
               any_value(a.n_scored) AS n_scored,
               any_value(x.n_exact) AS n_exact
        FROM pftt t
        LEFT JOIN gpr${r}rv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN gpall a ON a.qid = t.qid
        JOIN gpr${r}nx x ON x.qid = t.qid
        GROUP BY 2"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      ${core.trim},
      $tails,
      pftr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      pftt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM pftr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)
      SELECT rerank_r, CAST(count(*) AS BIGINT) AS n_queries,
             round(avg(recall), 9) AS avg_recall,
             round(avg(CAST(n_scored AS DOUBLE)), 9) AS avg_scored,
             round(avg(CAST(n_exact AS DOUBLE)), 9) AS avg_exact,
             CAST(sum(n_exact) AS BIGINT) AS total_exact
      FROM ($armRows)
      GROUP BY 1 ORDER BY rerank_r"""
    }) { (s, dir) =>
      // checkpoint the (fixture-scale, 8-query) brute-force truth
      // ONCE — each rung arm reads the materialized frame instead of
      // re-planning the broadcast ≠-join per arm
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid")).localCheckpoint()
      val served = hnswPqFrontierServed(s, dir)
      val hits = served.select(col("rerank_r"), col("qid"),
        col("vid")).withColumn("hit", lit(1L))
      val costs = served.groupBy("rerank_r", "qid")
        .agg(first(col("n_scored")).as("n_scored"),
          first(col("n_exact")).as("n_exact"))
      HnswPqRerankRungs.map { r =>
        truth
          .join(hits.filter(col("rerank_r") === r)
            .drop("rerank_r"), Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .join(costs.filter(col("rerank_r") === r)
            .drop("rerank_r"), Seq("qid"))
          .agg(count(lit(1)).as("n_queries"),
            round(avg("recall"), 9).as("avg_recall"),
            round(avg(col("n_scored").cast("double")), 9)
              .as("avg_scored"),
            round(avg(col("n_exact").cast("double")), 9)
              .as("avg_exact"),
            sum("n_exact").cast("long").as("total_exact"))
          .select(lit(r).as("rerank_r"), col("n_queries"),
            col("avg_recall"), col("avg_scored"), col("avg_exact"),
            col("total_exact"))
      }.reduce(_ unionByName _).orderBy("rerank_r")
    },

    // OPQ levers for the graph+PQ serve, priced at matched descent
    // knobs: the 12-bit default arm vs (a) the SRHT-rotated codes
    // (Srht — the Ge et al. 2013 OPQ rotation in its deterministic
    // Hadamard form: spread coordinate energy uniformly across the
    // subspace split before quantizing; codes and ADC tables live in
    // the rotated space, the graph and the exact re-rank stay in the
    // original — orthogonality preserves the cosine ranking) and (b)
    // a wider-m rung (2·pq.m subspaces = 2× bits/vector — the
    // bits-buy-recall lever the frontier showed 12 bits starving).
    // The oracle re-walks all three chains: rotation, per-subspace
    // Lloyd fits, ADC traversal, exact re-rank.
    Q("q_e_hnsw_pq_opq_ab", Some {
      val d = graft.Settings.ann.embeddingDim
      val rotCtes = graft.text.Srht.oracleCtes(d, "ndex", "oq",
        graft.text.TextOps.hsqlMod)
      def core(pfx: String, m: Int, subDim: Int, src: String) =
        graft.text.NnDescent.oracleHierServePqCore(NndRounds,
          HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswRatio,
          HnswLevels, HnswUpRounds, m, PqSubK, subDim,
          lloydIters = PqLloydIters, pfx = pfx, srcCte = src).trim
      def tail(pfx: String) = graft.text.NnDescent
        .oracleHierServePqTail(AnnK, RerankR, pfx, "").trim
      val armRows = Seq("pq_base" -> "gp", "pq_opq_rot" -> "gr",
        "pq_m_wide" -> "gw").map { case (arm, pfx) =>
        s"""
        SELECT '$arm' AS arm, t.qid,
               CAST(count(s.vid) AS DOUBLE) / count(*) AS recall,
               any_value(a.n_scored) AS n_scored,
               any_value(x.n_exact) AS n_exact
        FROM obtt t
        LEFT JOIN ${pfx}rv s ON s.qid = t.qid AND s.vid = t.vid
        JOIN ${pfx}all a ON a.qid = t.qid
        JOIN ${pfx}nx x ON x.qid = t.qid
        GROUP BY 2"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH $nndCtes,
      $hnswLayerCtes,
      ${hnswPqServeChainCtes.trim},
      $rotCtes,
      ${core("gr", PqM, PqSubDim, "oqrotex")},
      ${tail("gr")},
      ${core("gw", 2 * PqM, PqSubDim / 2, "ndex")},
      ${tail("gw")},
      obtr AS (
        SELECT a.vec_id AS qid, b.vec_id AS vid,
               sum(a.x * b.x) AS dot
        FROM ndex a JOIN ndex b ON a.i = b.i
          AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 8
        GROUP BY 1, 2),
      obtt AS (
        SELECT qid, vid FROM (
          SELECT d.qid, d.vid,
                 row_number() OVER (PARTITION BY d.qid
                   ORDER BY round(d.dot / (na.nrm * nb.nrm), 6) DESC,
                     d.vid) AS rnk
          FROM obtr d JOIN ndnrm na ON na.vec_id = d.qid
                      JOIN ndnrm nb ON nb.vec_id = d.vid)
        WHERE rnk <= $AnnK)
      SELECT arm, CAST(count(*) AS BIGINT) AS n_queries,
             round(avg(recall), 9) AS avg_recall,
             round(avg(CAST(n_scored AS DOUBLE)), 9) AS avg_scored,
             round(avg(CAST(n_exact AS DOUBLE)), 9) AS avg_exact,
             CAST(sum(n_exact) AS BIGINT) AS total_exact
      FROM ($armRows)
      GROUP BY 1 ORDER BY arm"""
    }) { (s, dir) =>
      val truth = Similarity.cosineTopK(t(s, dir, "embeddings"),
          col("vec_id") < 8, AnnK)
        .select(col("qid"), col("vid")).localCheckpoint()
      def arm(name: String, served: DataFrame): DataFrame = {
        val hits = served.select(col("qid"), col("vid"))
          .withColumn("hit", lit(1L))
        val nsc = served.groupBy("qid")
          .agg(first(col("n_scored")).as("n_scored"),
            first(col("n_exact")).as("n_exact"))
        truth.join(hits, Seq("qid", "vid"), "left")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double")
            / count(lit(1))).as("recall"))
          .join(nsc, Seq("qid"))
          .select(lit(name).as("arm"), col("recall"),
            col("n_scored"), col("n_exact"))
      }
      arm("pq_base", hnswPqServed(s, dir))
        .unionByName(arm("pq_opq_rot", hnswPqRotServed(s, dir)))
        .unionByName(arm("pq_m_wide", hnswPqWideServed(s, dir)))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_queries"),
          round(avg("recall"), 9).as("avg_recall"),
          round(avg(col("n_scored").cast("double")), 9)
            .as("avg_scored"),
          round(avg(col("n_exact").cast("double")), 9)
            .as("avg_exact"),
          sum("n_exact").cast("long").as("total_exact"))
        .orderBy("arm")
    },

    // INCREMENTAL HNSW hierarchy maintenance (NnDescent
    // .incrInsertLayer — the layered index's add-without-retrain,
    // closing the r13 gap where only the BASE graph had it): each
    // level's new members (layerPred ∧ vec_id >= incr_base — layer
    // assignment is the same md5 rule as at build time, so new
    // top-layer members become coarse-scan entries automatically)
    // seed their edges by beam search over the FROZEN old layer
    // graph, entering through bucket REPRESENTATIVES of the old
    // members (sparse layer ids — md5-mod entries don't apply), then
    // confined repair rounds bounded by the batch's blast radius.
    // The oracle re-walks every old-layer build, every seed descent
    // and every confined round, per level. Incremental ≡ rebuild
    // hierarchical-serve recall is spec-locked in NnDescentSpec.
    Q("q_e_hnsw_incr", Some(s"""
      WITH ${graft.text.NnDescent.oracleVecCtes.trim},
      $hnswIncrLayerCtes
      SELECT layer, node, nbr, cos_sim, rnk FROM (${(1 to HnswLevels)
        .map(l => s"SELECT $l AS layer, * FROM il${l}gf")
        .mkString("\n        UNION ALL ")})
      ORDER BY layer, node, rnk""")) { (s, dir) =>
      hnswIncrLayers(s, dir).zipWithIndex
        .map { case (g, i) => g.select(lit(i + 1).as("layer"),
          col("node"), col("nbr"), col("cos_sim"),
          col("rnk").cast("long").as("rnk")) }
        .reduce(_ unionByName _)
        .orderBy("layer", "node", "rnk")
    },

    // Serving over the MAINTAINED hierarchy — the row that proves
    // the add-without-retrain index actually SERVES: the same
    // hierarchical descent as q_e_hnsw_serve, but over the
    // incrementally-repaired base graph (ingf) and layer graphs
    // (il*gf), with the coarse scan drawn from ALL top-level members
    // (old AND new — layer assignment is the md5 layerPred rule, so
    // a new node that samples into the top layer becomes an entry;
    // this oracle row checks that claim end-to-end, the spec only
    // bounds its recall). n_scored rides along as the served-cost
    // column.
    Q("q_e_hnsw_incr_serve", Some {
      val m = math.pow(HnswRatio.toDouble, HnswLevels.toDouble).toLong
      s"""
      WITH ${nndIncrCtes.trim},
      $hnswIncrLayerCtes,
      ihnd AS (
        SELECT vec_id FROM embeddings
        WHERE ${graft.text.TextOps.hsqlRaw(
          "'hnsw:' || vec_id::VARCHAR")} % $m = 0),
      ${graft.text.NnDescent.oracleHierServeCtesFrom(AnnK,
        HnswUpBeam, HnswUpHops, HnswBeam, HnswHops, HnswLevels,
        coarseCte = "ihnd", layerCte = l => s"il${l}gf",
        baseCte = "ingf", pfx = "ih").trim}
      SELECT qid, vid, cos_sim, rnk, n_scored FROM ihrv
      ORDER BY qid, rnk"""
    }) { (s, dir) =>
      hnswIncrServed(s, dir)
        .select(col("qid"), col("vid"), col("cos_sim"),
          col("rnk").cast("long").as("rnk"), col("n_scored"))
        .orderBy("qid", "rnk")
    },

    // Layered drift accounting — the q_e_nnd_drift analog PER LEVEL:
    // how far did the batch move the old layer members' neighborhoods
    // (edge overlap vs the frozen layer graph), how many new members
    // each level absorbed. The rebuild-due dial for the hierarchy: a
    // level whose old-member churn spikes is reshaping and its layer
    // graph should be rebuilt, while untouched levels keep serving.
    Q("q_e_hnsw_incr_drift", Some(s"""
      WITH ${graft.text.NnDescent.oracleVecCtes.trim},
      $hnswIncrLayerCtes,
      ${(1 to HnswLevels).map(l => s"""
      hd${l}b AS (SELECT node, nbr FROM il${l}ok$HnswUpRounds),
      hd${l}f AS (SELECT node, nbr FROM il${l}gf
                  WHERE node < $IncrBase),
      hd${l}o AS (
        SELECT b.node,
               CAST(count(*) AS BIGINT) AS n_base,
               CAST(count(f.nbr) AS BIGINT) AS n_kept
        FROM hd${l}b b LEFT JOIN hd${l}f f
          ON f.node = b.node AND f.nbr = b.nbr
        GROUP BY 1),
      hd${l}r AS (
        SELECT $l AS layer,
               CAST((SELECT count(DISTINCT node) FROM hd${l}b)
                 AS BIGINT) AS n_old,
               CAST((SELECT count(*) FROM il${l}q) AS BIGINT)
                 AS n_new,
               CAST(sum(CASE WHEN n_kept < n_base THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_old_changed,
               round(CAST(sum(CASE WHEN n_kept < n_base THEN 1
                 ELSE 0 END) AS DOUBLE) / count(*), 9)
                 AS changed_frac,
               round(CAST(sum(CAST(n_kept AS DOUBLE) / n_base)
                 AS DOUBLE) / count(*), 9) AS avg_edge_overlap
        FROM hd${l}o)""").mkString(",")}
      SELECT * FROM (${(1 to HnswLevels)
        .map(l => s"SELECT * FROM hd${l}r")
        .mkString("\n        UNION ALL ")})
      ORDER BY layer""")) { (s, dir) =>
      val olds = hnswOldLayers(s, dir)
      val fins = hnswIncrLayers(s, dir)
      (1 to HnswLevels).map { l =>
        val base = olds(l - 1).select("node", "nbr")
        val fin = fins(l - 1).filter(col("node") < IncrBase)
          .select("node", "nbr").withColumn("kept", lit(1L))
        val nNew = t(s, dir, "embeddings")
          .filter(col("vec_id") >= IncrBase
            && graft.text.NnDescent.layerPred(col("vec_id"), l,
              HnswRatio))
          .agg(count(lit(1)).as("n_new"))
        base.join(fin, Seq("node", "nbr"), "left")
          .groupBy("node")
          .agg(count(lit(1)).as("n_base"),
            sum(coalesce(col("kept"), lit(0L))).as("n_kept"))
          .agg(countDistinct("node").as("n_old"),
            sum(when(col("n_kept") < col("n_base"), 1L)
              .otherwise(0L)).as("n_old_changed"),
            round(sum(when(col("n_kept") < col("n_base"), 1.0)
              .otherwise(0.0)) / count(lit(1)), 9).as("changed_frac"),
            round(sum(col("n_kept").cast("double") / col("n_base"))
              / count(lit(1)), 9).as("avg_edge_overlap"))
          .crossJoin(broadcast(nNew))
          .select(lit(l).as("layer"), col("n_old"), col("n_new"),
            col("n_old_changed"), col("changed_frac"),
            col("avg_edge_overlap"))
      }.reduce(_ unionByName _).orderBy("layer")
    },

    // Per-label centroid geometry (posexplode → per-dim means → norms)
    Q("q_e_centroids", Some("""
      WITH ex AS (
        SELECT label, vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      cent AS (SELECT label, i, avg(x) AS m FROM ex GROUP BY 1, 2),
      norms AS (SELECT label, vec_id, sqrt(sum(x*x)) AS nrm
                FROM ex GROUP BY 1, 2)
      SELECT c.label, n.n_vecs,
             round(sqrt(sum(c.m * c.m)), 6) AS centroid_norm,
             any_value(n.mean_norm) AS mean_norm
      FROM cent c JOIN (
        SELECT label, count(*) AS n_vecs, round(avg(nrm), 6) AS mean_norm
        FROM norms GROUP BY 1) n ON c.label = n.label
      GROUP BY 1, 2 ORDER BY 1""")) { (s, dir) =>
      val e = t(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          Similarity.asDouble(col("embedding")).as("v"))
      val ex = e.select(col("label"), col("vec_id"),
        posexplode(col("v")).as(Seq("i", "x")))
      val cent = ex.groupBy("label", "i").agg(avg("x").as("m"))
      val norms = e.select(col("label"), col("vec_id"),
        Similarity.norm(col("v")).as("nrm"))
      val perLabel = norms.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), round(avg("nrm"), 6).as("mean_norm"))
      cent.groupBy("label")
        .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
        .join(perLabel, Seq("label"))
        .select("label", "n_vecs", "centroid_norm", "mean_norm")
        .orderBy("label")
    },

    // Symmetric int8 embedding quantization audit: per-vector scale
    // (127/max|x|), portable round-half-up (floor(x+0.5)) quantize →
    // dequantize, reconstruction RMSE + max abs error — the storage-
    // compression check a 100-TB embedding pipeline runs before
    // switching dtypes. Pure per-vector aggregation, no shuffle beyond
    // the vec_id group.
    Q("q_e_quantize", Some("""
      WITH ex AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      mx AS (SELECT vec_id, max(abs(x)) AS maxabs, count(*) AS n_dims
             FROM ex GROUP BY 1),
      qd AS (
        SELECT e.vec_id, mx.n_dims, 127.0 / mx.maxabs AS scale,
               e.x,
               greatest(-127.0, least(127.0,
                 floor(e.x * (127.0 / mx.maxabs) + 0.5))) AS q
        FROM ex e JOIN mx ON e.vec_id = mx.vec_id
        WHERE mx.maxabs > 0)
      SELECT vec_id, CAST(any_value(n_dims) AS BIGINT) AS n_dims,
             round(any_value(scale), 9) AS scale,
             round(sqrt(avg(pow(x - q / scale, 2))), 9) AS rmse,
             round(max(abs(x - q / scale)), 9) AS max_abs_err
      FROM qd GROUP BY vec_id ORDER BY vec_id""")) { (s, dir) =>
      val ex = t(s, dir, "embeddings").select(col("vec_id"),
        explode(Similarity.asDouble(col("embedding"))).as("x"))
      val mx = ex.groupBy("vec_id").agg(max(abs(col("x"))).as("maxabs"),
        count(lit(1)).as("n_dims"))
      val qd = ex.join(mx, "vec_id").filter(col("maxabs") > 0)
        .withColumn("scale", lit(127.0) / col("maxabs"))
        .withColumn("q", greatest(lit(-127.0),
          least(lit(127.0), floor(col("x") * col("scale") + 0.5))))
      qd.groupBy("vec_id").agg(
          first("n_dims").as("n_dims"),
          round(first("scale"), 9).as("scale"),
          round(sqrt(avg(pow(col("x") - col("q") / col("scale"), 2))), 9)
            .as("rmse"),
          round(max(abs(col("x") - col("q") / col("scale"))), 9)
            .as("max_abs_err"))
        .orderBy("vec_id")
    },

    // LSH-bucketed ANN (sign hyperplanes, bucket equi-join, top-5/bucket)
    Q("q_e_ann_lsh", Some(s"""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      proj AS (
        SELECT vec_id, j, sum(x * (CASE WHEN
          ${hsql("'hp_' || j || '_' || i")} % 2 = 0
          THEN 1.0 ELSE -1.0 END)) AS p
        FROM ex, range(8) rj(j) GROUP BY 1, 2),
      buckets AS (
        SELECT vec_id, CAST(sum(CASE WHEN p > 0
          THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY 1),
      norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
      q AS (SELECT vec_id AS qid, bucket FROM buckets WHERE vec_id < 32),
      cand AS (
        SELECT q.qid, b.vec_id AS vid FROM q JOIN buckets b
          ON q.bucket = b.bucket AND q.qid <> b.vec_id),
      dots AS (
        SELECT c.qid, c.vid, sum(qe.x * ve.x) AS dot
        FROM cand c JOIN ex qe ON qe.vec_id = c.qid
                    JOIN ex ve ON ve.vec_id = c.vid AND qe.i = ve.i
        GROUP BY 1, 2),
      cosd AS (
        SELECT qid, vid, round(dot / (nq.nrm * nv.nrm), 6) AS cos_sim
        FROM dots JOIN norms nq ON qid = nq.vec_id
                  JOIN norms nv ON vid = nv.vec_id)
      SELECT qid, vid, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY cos_sim DESC, vid) AS rnk FROM cosd)
      WHERE rnk <= 5 ORDER BY qid, rnk""")) { (s, dir) =>
      Similarity.annLsh(t(s, dir, "embeddings"), col("vec_id") < 32, 5)
        .select("qid", "vid", "cos_sim", "rnk")
        .orderBy("qid", "rnk")
    },

    // IVF-Flat ANN: seeded KMeans coarse quantizer, nProbe nearest cells
    // per query, exact cosine inside probed cells. Run at nProbe = nCells
    // the IVF contract makes it exactly brute force, so the brute-force
    // SQL IS its oracle — the full KMeans/assign/probe machinery is
    // driver-verified (probe-limited recall is locked by SimilaritySpec).
    Q("q_e_ann_ivf", Some(s"""
      WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY 1),
      q AS (SELECT * FROM ex WHERE vec_id < $AnnQ),
      dots AS (
        SELECT q.vec_id AS qid, e.vec_id AS vid, sum(q.x * e.x) AS dot
        FROM q JOIN ex e ON q.i = e.i AND q.vec_id <> e.vec_id
        GROUP BY 1, 2),
      cosd AS (
        SELECT qid, vid, round(dot / (nq.nrm * nv.nrm), 6) AS cos_sim
        FROM dots JOIN norms nq ON qid = nq.vec_id
                  JOIN norms nv ON vid = nv.vec_id)
      SELECT qid, vid, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY cos_sim DESC, vid) AS rnk FROM cosd)
      WHERE rnk <= $AnnK ORDER BY qid, rnk""")) { (s, dir) =>
      ivfTop5(s, dir)
        .select("qid", "vid", "cos_sim", "rnk")
        .orderBy("qid", "rnk")
    },

    // Product-quantization ANN (Similarity.pqTopK): 4 subspaces × 16
    // dims, 8 deterministic seed centroids per subspace, encode =
    // per-subspace argmin, query = ADC table-lookup sum. Every distance
    // sums per-term through DECIMAL → rounded values are aggregation-
    // order-free on both engines. 64 f32 dims compress to 4 codes/vec.
    Q("q_e_pq_topk", Some(s"""
      WITH $pqCtes
      SELECT qid, vid, adc, rnk FROM pqranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      pqTop5(s, dir)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // IVF-PQ (Similarity.ivfPqTopK): the composed production index —
    // 8 coarse cells route each query to its 2 nearest cells; only the
    // PQ codes of vectors in probed cells are ADC-scored. Non-residual
    // encoding + seed centroids keep the whole path SQL-expressible;
    // the nProbe=nCells ≡ pqTopK contract is locked in SimilaritySpec.
    Q("q_e_ann_ivfpq", Some(ivfPqOracle)) { (s, dir) =>
      // reads the shared ADC shortlist (k = RerankR ⊇ AnnK; identical
      // scoring + rank order, k only truncates) — the stored-artifact
      // shape every other ivfpq consumer already uses, instead of
      // re-running the whole encode+ADC pipeline per query
      ivfPqCands(s, dir).filter(col("rnk") <= AnnK)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // The streaming ANN SERVING column program (StreamingAnnServe:
    // per-row probe ordering + ADC table lookups against the standing
    // (vid, cell, codes) index), run in batch mode against the SAME
    // DuckDB oracle as q_e_ann_ivfpq — proving the serving path's
    // per-row formulation is bit-identical to the batch index's
    // explode/groupBy formulation, not just fixture-close. The
    // streaming execution of the identical program is locked in
    // StreamingSpec.
    Q("q_e_ann_serve", Some(ivfPqOracle)) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = serveArtifacts(s, dir)
      val cand = StreamingAnnServe.scoreCandidates(
        emb.filter(col("vec_id") < AnnQ), annServeIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      val w = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
      cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= AnnK)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // Exact re-rank refinement (Similarity.rerankExact) — the stage a
    // production IVF-PQ server runs after ADC: the top-16 ADC
    // candidates per query join their STORED full vectors and exact
    // squared-L2 (the same per-term-decimal d2 as the ground truth)
    // picks the final top-5. The full-vector cost is paid only on
    // queries×16 rows, never the corpus. Oracle composes the IVF-PQ
    // chain with the exact-distance re-score.
    Q("q_e_ann_rerank", Some(s"""
      WITH $ivfPqCtes, $rerankCtes
      SELECT qid, vid, adc, d2, rnk FROM rranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      rerankTop5(s, dir)
        .select("qid", "vid", "adc", "d2", "rnk")
        .orderBy("qid", "rnk")
    },

    // The A/B row the re-rank stage exists for: recall@5 vs the exact
    // ground truth of (a) the raw ADC top-5 and (b) the re-ranked
    // top-5 from the same candidate list — "re-rank buys back
    // quantization recall" as an oracle-checked fact. Both rankings
    // read the ONE shared ADC short-list stage.
    Q("q_e_rerank_gain", Some(s"""
      WITH $ivfPqCtes, $rerankCtes,
      gqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      gd2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN gqfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      gexact5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM gd2full) WHERE rn <= $AnnK),
      adc5 AS (SELECT qid, vid FROM ranked2 WHERE rnk <= $AnnK),
      rer5 AS (SELECT qid, vid FROM rranked WHERE rnk <= $AnnK)
      SELECT * FROM (
        SELECT 'ivfpq_adc' AS variant,
               count(DISTINCT e.qid) AS n_queries,
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
                 AS recall_at_5
        FROM gexact5 e LEFT JOIN adc5 p
          ON e.qid = p.qid AND e.vid = p.vid
        UNION ALL
        SELECT 'ivfpq_rerank', count(DISTINCT e.qid),
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
        FROM gexact5 e LEFT JOIN rer5 p
          ON e.qid = p.qid AND e.vid = p.vid)
      ORDER BY variant""")) { (s, dir) =>
      val exact5 = exactTop5(s, dir)
      val adc5 = ivfPqCands(s, dir).filter(col("rnk") <= AnnK)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      val rer5 = rerankTop5(s, dir)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      def row(v: String, hits: DataFrame) =
        exact5.join(hits, Seq("qid", "vid"), "left")
          .agg(lit(v).as("variant"),
            countDistinct(col("qid")).as("n_queries"),
            round(count(col("hit")).cast("double") / count(lit(1)), 6)
              .as("recall_at_5"))
      row("ivfpq_adc", adc5).unionByName(row("ivfpq_rerank", rer5))
        .orderBy("variant")
    },

    // The SERVING-path re-rank (StreamingAnnServe.scoreCandidates →
    // Similarity.rerankServe): the per-row serving formulation of the
    // candidate scoring feeds the same ADC-short-list + stored-vector
    // exact re-score, run in batch mode against the IDENTICAL oracle
    // as q_e_ann_rerank — proving the served refinement is
    // bit-identical to the batch operator, exactly as q_e_ann_serve
    // does for the unrefined ADC answer. The streamed execution (query
    // stream → stream-static candidate join → per-micro-batch rerank
    // via foreachBatch) is locked in StreamingSpec.
    Q("q_e_ann_serve_rerank", Some(s"""
      WITH $ivfPqCtes, $rerankCtes
      SELECT qid, vid, adc, d2, rnk FROM rranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = serveArtifacts(s, dir)
      val cands = StreamingAnnServe.scoreCandidates(
        emb.filter(col("vec_id") < AnnQ), annServeIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      Similarity.rerankServe(cands, emb.filter(col("vec_id") < AnnQ),
          emb, rerankR = RerankR, k = AnnK)
        .select("qid", "vid", "adc", "d2", "rnk")
        .orderBy("qid", "rnk")
    },

    // Residual IVF-PQ (Similarity.ivfPqResidualTopK — faiss's
    // by_residual=true, the production default): Lloyd-FITTED coarse
    // cells (LloydKmeans on the full vectors), PQ codes over
    // r = x − centroid(cell(x)) against per-subspace Lloyd residual
    // codebooks, ADC tables keyed per probed cell. The oracle
    // reproduces the ENTIRE path — coarse fit, residual codebook fits,
    // encode, cell-keyed ADC — via composed LloydKmeans CTE chains.
    Q("q_e_ann_ivfpq_res", Some(s"""
      WITH $exCte, $residIvfPqCtes
      SELECT qid, vid, adc, rnk FROM resranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      residCands(s, dir).filter(col("rnk") <= AnnK)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // Residual IVF-PQ + exact re-rank — the full production serving
    // stack: residual ADC short-lists top-R, stored full vectors
    // re-score exactly, top-k emits. Same R and k as the non-residual
    // re-rank query, so the two are directly comparable.
    Q("q_e_ann_ivfpq_res_rerank", Some(s"""
      WITH $exCte, $residIvfPqCtes, $residRerankCtes
      SELECT qid, vid, adc, d2, rnk FROM resrranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      residRerankTop5(s, dir)
        .select("qid", "vid", "adc", "d2", "rnk")
        .orderBy("qid", "rnk")
    },

    // The residual SERVING path (StreamingAnnServe.indexOfResidual →
    // scoreCandidatesResidual): per-row residual encode against the
    // standing (vid, cell, codes) index and per-probed-cell query ADC
    // tables, run in batch mode against the IDENTICAL oracle as
    // q_e_ann_ivfpq_res — proving the served residual formulation is
    // bit-identical to the batch operator. Streamed execution locked
    // in StreamingSpec.
    Q("q_e_ann_serve_res", Some(s"""
      WITH $exCte, $residIvfPqCtes
      SELECT qid, vid, adc, rnk FROM resranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = residArtifacts(s, dir)
      val cand = StreamingAnnServe.scoreCandidatesResidual(
        emb.filter(col("vec_id") < AnnQ), annServeResIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      val w = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
      cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= AnnK)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // ... and with the exact re-rank refinement composed in (the full
    // residual serving stack, the engine's best-recall configuration:
    // 0.363 at sf0.01 vs 0.231 for the r8 non-residual serve+rerank),
    // against the identical oracle as q_e_ann_ivfpq_res_rerank.
    Q("q_e_ann_serve_res_rerank", Some(s"""
      WITH $exCte, $residIvfPqCtes, $residRerankCtes
      SELECT qid, vid, adc, d2, rnk FROM resrranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = residArtifacts(s, dir)
      val cands = StreamingAnnServe.scoreCandidatesResidual(
        emb.filter(col("vec_id") < AnnQ), annServeResIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      Similarity.rerankServe(cands, emb.filter(col("vec_id") < AnnQ),
          emb, rerankR = RerankR, k = AnnK)
        .select("qid", "vid", "adc", "d2", "rnk")
        .orderBy("qid", "rnk")
    },

    // The A/B ladder residual encoding exists for — recall@5 vs exact
    // ground truth of (1) the seed-codebook non-residual index (r8's
    // production path), (2) fitted coarse + fitted ABSOLUTE codebook
    // (the control that isolates the residual effect from the fitting
    // effect), (3) fitted residual ADC, (4) residual ADC + exact
    // re-rank — all at equal (nProbe, R, k). Rows 2→3 is the residual
    // gain as an oracle-checked fact; measured at sf0.01:
    // 0.113 → 0.156 → 0.188 → 0.363.
    Q("q_e_ivfpq_res_gain", Some(s"""
      WITH $ivfPqCtes, $lloydPqCtes, $residIvfPqCtes, $residRerankCtes,
      fadc AS (
        SELECT ca.qid, ca.vid,
               round(CAST(sum(CAST(q.qd2 AS DECIMAL(38,18))) AS DOUBLE),
                 6) AS adc
        FROM rescand ca JOIN lcodes k ON k.vid = ca.vid
             JOIN lqd2 q ON q.qid = ca.qid AND q.m = k.m AND q.c = k.c
        GROUP BY 1, 2),
      franked AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY adc, vid) AS rnk FROM fadc),
      ggqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      ggd2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN ggqfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      ggexact AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM ggd2full) WHERE rn <= $AnnK),
      v1 AS (SELECT qid, vid FROM ranked2 WHERE rnk <= $AnnK),
      v2 AS (SELECT qid, vid FROM franked WHERE rnk <= $AnnK),
      v3 AS (SELECT qid, vid FROM resranked WHERE rnk <= $AnnK),
      v4 AS (SELECT qid, vid FROM resrranked WHERE rnk <= $AnnK)
      SELECT * FROM (
        SELECT '1_seed_nonres_adc' AS variant,
               count(DISTINCT e.qid) AS n_queries,
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
                 AS recall_at_5
        FROM ggexact e LEFT JOIN v1 p
          ON e.qid = p.qid AND e.vid = p.vid
        UNION ALL
        SELECT '2_fitted_nonres_adc', count(DISTINCT e.qid),
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
        FROM ggexact e LEFT JOIN v2 p
          ON e.qid = p.qid AND e.vid = p.vid
        UNION ALL
        SELECT '3_fitted_res_adc', count(DISTINCT e.qid),
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
        FROM ggexact e LEFT JOIN v3 p
          ON e.qid = p.qid AND e.vid = p.vid
        UNION ALL
        SELECT '4_fitted_res_rerank', count(DISTINCT e.qid),
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
        FROM ggexact e LEFT JOIN v4 p
          ON e.qid = p.qid AND e.vid = p.vid)
      ORDER BY variant""")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val exact5 = exactTop5(s, dir)
      val (cells, _) = residArtifacts(s, dir)
      def row(v: String, hits: DataFrame) =
        exact5.join(hits.select(col("qid"), col("vid"),
            lit(1).as("hit")), Seq("qid", "vid"), "left")
          .agg(lit(v).as("variant"),
            countDistinct(col("qid")).as("n_queries"),
            round(count(col("hit")).cast("double") / count(lit(1)), 6)
              .as("recall_at_5"))
      row("1_seed_nonres_adc",
          ivfPqCands(s, dir).filter(col("rnk") <= AnnK))
        .unionByName(row("2_fitted_nonres_adc",
          Similarity.ivfPqFittedTopK(emb, col("vec_id") < AnnQ,
            AnnK, IvfNProbe, cells, lloydCb(s, dir))))
        .unionByName(row("3_fitted_res_adc",
          residCands(s, dir).filter(col("rnk") <= AnnK)))
        .unionByName(row("4_fitted_res_rerank", residRerankTop5(s, dir)))
        .orderBy("variant")
    },

    // The recall-vs-cost FRONTIER the serving defaults are chosen
    // from: for each (nProbe, rerank R) rung, the served residual
    // stack's recall@5 against the exact ground truth and the number
    // of candidates it had to scan (the cost axis: ADC rows paid ≈
    // corpus·nProbe/nCells per query, plus R full-vector re-scores).
    // Engine rows run the SERVING program (scoreCandidatesResidual →
    // rerankServe) per rung; the oracle appends one probe tail per
    // nProbe to the shared residual fit chain and composes the rerank
    // per rung — every rung is the same bit-exact path the standing
    // q_e_ann_serve_res_rerank query serves at the promoted defaults.
    Q("q_e_ann_frontier", Some {
      val rerankBlocks = FrontierRungs.map { case (np, rr) =>
        val lbl = s"np${np}_r$rr"
        s"""
      fr_$lbl AS (
        SELECT a.qid, a.vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM (SELECT qid, vid FROM resranked_p$np WHERE rnk <= $rr) a
             JOIN ex e ON e.vec_id = a.vid
             JOIN fqfull q ON q.qid = a.qid AND q.i = e.i
        GROUP BY 1, 2),
      ft_$lbl AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rnk FROM fr_$lbl) WHERE rnk <= $AnnK)"""
      }.mkString(",")
      val rows = FrontierRungs.map { case (np, rr) =>
        val lbl = s"np${np}_r$rr"
        s"""
        SELECT '$lbl' AS variant,
               count(DISTINCT e.qid) AS n_queries,
               (SELECT count(*) FROM rescand_p$np) AS total_scanned,
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
                 AS recall_at_5
        FROM fexact e LEFT JOIN ft_$lbl p
          ON e.qid = p.qid AND e.vid = p.vid"""
      }.mkString("\n        UNION ALL")
      val tails = FrontierRungs.map(_._1).distinct
        .map(np => residProbeTail(np, s"_p$np")).mkString(",")
      s"""
      WITH $exCte, ${residFitCtes(None)},$tails,
      fqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      fd2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN fqfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      fexact AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM fd2full) WHERE rn <= $AnnK),
      $rerankBlocks
      SELECT * FROM ($rows)
      ORDER BY variant"""
    }) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < AnnQ)
      val (cells, cb) = residArtifacts(s, dir)
      val exact5 = exactTop5(s, dir)
      val byNp = FrontierRungs.map(_._1).distinct.map { np =>
        np -> StreamingAnnServe.scoreCandidatesResidual(
          queries, annServeResIndex(s, dir), cells, cb, nProbe = np)
      }.toMap
      FrontierRungs.map { case (np, rr) =>
        val cand = byNp(np)
        val scanned = cand.agg(count(lit(1)).as("total_scanned"))
        val hits = Similarity.rerankServe(cand, queries, emb,
            rerankR = rr, k = AnnK)
          .select(col("qid"), col("vid"), lit(1).as("hit"))
        exact5.join(hits, Seq("qid", "vid"), "left")
          .agg(lit(s"np${np}_r$rr").as("variant"),
            countDistinct(col("qid")).as("n_queries"),
            round(count(col("hit")).cast("double") / count(lit(1)), 6)
              .as("recall_at_5"))
          .crossJoin(broadcast(scanned))
          .select("variant", "n_queries", "total_scanned", "recall_at_5")
      }.reduce(_ unionByName _).orderBy("variant")
    },

    // Incremental index growth (faiss add-without-train): the coarse
    // cells + residual codebooks were fit on the BASE snapshot
    // (vec_id < IncrBase); the delta batch arrived later and was
    // append-encoded against those frozen artifacts into the standing
    // index (annServeIncrIndex = index(base) ∪ index(delta)); queries
    // serve from the union. The oracle fits only on the base
    // (residChainCtes(Some(IncrBase))) and encodes/serves the whole
    // corpus — proving the engine's append path introduces no refit
    // and no re-encode. At 100 TB this is the only viable index
    // lifecycle: per-batch encode is map-only against broadcast
    // artifacts, and the union is a partitioned append to the stored
    // index table.
    Q("q_e_index_incr", Some(s"""
      WITH $exCte, ${residChainCtes(Some(IncrBase))}
      SELECT qid, vid, adc, rnk FROM resranked WHERE rnk <= $AnnK
      ORDER BY qid, rnk""")) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = incrArtifacts(s, dir)
      val cand = StreamingAnnServe.scoreCandidatesResidual(
        emb.filter(col("vec_id") < AnnQ), annServeIncrIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      val w = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
      cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= AnnK)
        .select("qid", "vid", "adc", "rnk")
        .orderBy("qid", "rnk")
    },

    // The quality number the incremental lifecycle is accountable to:
    // recall@5 of the base-fit union index's ADC serve against the
    // exact squared-L2 ground truth — what serving from artifacts fit
    // on 80% of the corpus costs vs the full-fit residual path's
    // hash-checked 0.188 (q_e_ivfpq_res_gain row 3). One oracle row,
    // same ground-truth conventions as the gain ladder.
    Q("q_e_index_recall", Some(s"""
      WITH $exCte, ${residChainCtes(Some(IncrBase))},
      gqfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      gd2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN gqfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      gexact AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM gd2full) WHERE rn <= $AnnK),
      i5 AS (SELECT qid, vid FROM resranked WHERE rnk <= $AnnK)
      SELECT count(DISTINCT e.qid) AS n_queries,
             round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
               AS recall_at_5
      FROM gexact e LEFT JOIN i5 p
        ON e.qid = p.qid AND e.vid = p.vid""")) { (s, dir) =>
      import graft.streaming.StreamingAnnServe
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = incrArtifacts(s, dir)
      val cand = StreamingAnnServe.scoreCandidatesResidual(
        emb.filter(col("vec_id") < AnnQ), annServeIncrIndex(s, dir),
        cells, cb, nProbe = IvfNProbe)
      val w = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
      val i5 = cand.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= AnnK)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      exactTop5(s, dir).join(i5, Seq("qid", "vid"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          round(count(col("hit")).cast("double") / count(lit(1)), 6)
            .as("recall_at_5"))
    },

    // The refit dial for that add-without-train lifecycle: per batch
    // (base = fit snapshot, delta = appended-unfit), the average
    // squared distance to the assigned coarse cell and the average PQ
    // reconstruction error (Similarity.residualEncodeStats). A delta
    // batch drifting from the fit distribution shows both rising —
    // the operational "time to retrain" signal. On the iid fixture the
    // two batches score close, which is the honest null reading.
    Q("q_e_index_drift", Some(s"""
      WITH $exCte, ${residChainCtes(Some(IncrBase))},
      cdrift AS (
        SELECT pid, round(d2, 6) AS cell_d2 FROM (
          SELECT *, row_number() OVER (PARTITION BY pid
            ORDER BY round(d2, 6), c) AS rn FROM cq_kd_fin)
        WHERE rn = 1),
      edrift AS (
        SELECT vec_id, round(CAST(sum(CAST(d2 AS DECIMAL(38,18)))
          AS DOUBLE), 6) AS enc_err FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, m
            ORDER BY round(d2, 6), c) AS rn FROM rd2) WHERE rn = 1
        GROUP BY 1)
      SELECT CASE WHEN e.vec_id < $IncrBase THEN '1_base'
               ELSE '2_delta' END AS batch,
             count(*) AS n_vecs,
             round(CAST(sum(CAST(c.cell_d2 AS DECIMAL(38,18)))
               AS DOUBLE) / count(*), 6) AS avg_cell_d2,
             round(CAST(sum(CAST(e.enc_err AS DECIMAL(38,18)))
               AS DOUBLE) / count(*), 6) AS avg_enc_err
      FROM edrift e JOIN cdrift c ON c.pid = e.vec_id
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val (cells, cb) = incrArtifacts(s, dir)
      Similarity.residualEncodeStats(emb, cells, cb)
        .withColumn("batch", when(col("vec_id") < IncrBase, "1_base")
          .otherwise("2_delta"))
        .groupBy("batch")
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("cell_d2").cast("decimal(38,18)")).cast("double")
            / count(lit(1)), 6).as("avg_cell_d2"),
          round(sum(col("enc_err").cast("decimal(38,18)")).cast("double")
            / count(lit(1)), 6).as("avg_enc_err"))
        .orderBy("batch")
    },

    // PQ recall observability (the quality dial a production PQ
    // deployment watches before trusting the compressed index):
    // recall@5 of the ADC ranking against the EXACT squared-L2 top-5 —
    // same metric family as ADC, so the number isolates quantization
    // loss, not metric mismatch. Exact distances use the same per-term
    // decimal sums as the PQ path.
    Q("q_e_pq_recall", Some(s"""
      WITH $pqCtes,
      qfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      d2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN qfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      exact5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM d2full) WHERE rn <= $AnnK),
      pq5 AS (SELECT qid, vid FROM pqranked WHERE rnk <= $AnnK)
      SELECT e.qid,
             CAST(count(p.vid) AS BIGINT) AS n_hits,
             round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
               AS recall_at_5
      FROM exact5 e LEFT JOIN pq5 p ON e.qid = p.qid AND e.vid = p.vid
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val exact5 = exactTop5(s, dir)
      val pq5 = pqTop5(s, dir)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      exact5.join(pq5, Seq("qid", "vid"), "left")
        .groupBy("qid")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")).cast("double") / count(lit(1)), 6)
            .as("recall_at_5"))
        .orderBy("qid")
    },

    // Codebook-quality A/B (VERDICT r6 #4), promoted from rows-only to
    // a FULL hash check: mean recall@5 of the seed-slice codebook vs a
    // DETERMINISTIC per-subspace-Lloyd-fitted codebook, both against
    // the same exact squared-L2 top-5 ground truth. The oracle
    // reproduces the entire fitted path — four unrolled Lloyd chains
    // (one per subspace), fitted-codebook encode, ADC ranking, recall
    // aggregation — bit-for-bit, so "an iteratively fitted codebook
    // beats the unfitted one" is now an oracle-checked fact, not just
    // a spec invariant. The MLlib-KMeans codebook (engine-private
    // k-means|| init) keeps its own driver row below
    // (q_e_pq_recall_mllib) + the SimilaritySpec invariant.
    Q("q_e_pq_recall_cmp", Some(s"""
      WITH $pqCtes, $lloydPqCtes,
      qfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM ex WHERE vec_id < $AnnQ),
      d2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM ex e JOIN qfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      exact5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM d2full) WHERE rn <= $AnnK),
      seed5 AS (SELECT qid, vid FROM pqranked WHERE rnk <= $AnnK),
      lloyd5 AS (SELECT qid, vid FROM lranked WHERE rnk <= $AnnK)
      SELECT * FROM (
        SELECT 'seed_slice' AS codebook,
               count(DISTINCT e.qid) AS n_queries,
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
                 AS recall_at_5
        FROM exact5 e LEFT JOIN seed5 p
          ON e.qid = p.qid AND e.vid = p.vid
        UNION ALL
        SELECT 'lloyd_fit', count(DISTINCT e.qid),
               round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
        FROM exact5 e LEFT JOIN lloyd5 p
          ON e.qid = p.qid AND e.vid = p.vid)
      ORDER BY codebook""")) { (s, dir) =>
      val exact5 = exactTop5(s, dir)
      recallRow(exact5, pqTop5(s, dir), "seed_slice")
        .unionByName(recallRow(exact5, lloydTop5(s, dir), "lloyd_fit"))
        .orderBy("codebook")
    },

    // The MLlib-KMeans codebook's recall row (the production-library
    // fit whose k-means|| init + float summation order are
    // engine-private — same caveat as q_kmeans_clusters, so rows-only
    // by nature). Its "must not trail the seed codebook" invariant is
    // spec-locked; its DETERMINISTIC twin above is fully hash-checked.
    Q("q_e_pq_recall_mllib", None) { (s, dir) =>
      recallRow(exactTop5(s, dir), kmTop5(s, dir), "mllib_kmeans")
    },

    // Corpus-vs-corpus ANN pairs (the near-dup shape: no broadcastable
    // query side — banded bucket equi-join with a hot-bucket cap;
    // 2 OR-amplification bands driver-verify the banded path)
    Q("q_e_ann_pairs", Some(s"""
      WITH $annPairCtes,
      cosd AS (
        SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id)
      SELECT id_a, id_b, cos_sim FROM cosd
      WHERE cos_sim >= 0.0 ORDER BY id_a, id_b""")) { (s, dir) =>
      annPairs(s, dir).filter(col("cos_sim") >= 0.0)
        .orderBy("id_a", "id_b")
    },

    // Dedup-threshold calibration histogram: candidate-pair cosine
    // similarities in 0.05 bins with a top-down cumulative count — the
    // curve you read to pick the semantic-dedup τ for a removal budget
    // ("τ = 0.40 drops N pairs"). The window runs over ~40 bin rows
    // (already aggregated), not the pair set.
    Q("q_e_sim_hist", Some(s"""
      WITH $annPairCtes,
      cosd AS (
        SELECT round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id),
      hist AS (
        SELECT CAST(floor(cos_sim / 0.05) AS BIGINT) AS bin,
               count(*) AS n
        FROM cosd GROUP BY 1)
      SELECT bin, round(CAST(bin AS DOUBLE) * 0.05, 2) AS bin_lo, n,
             CAST(sum(n) OVER (ORDER BY bin DESC) AS BIGINT)
               AS n_at_or_above
      FROM hist ORDER BY bin""")) { (s, dir) =>
      annPairs(s, dir)
        .select(floor(col("cos_sim") / 0.05).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .select(col("bin"), round(col("bin") * 0.05, 2).as("bin_lo"),
          col("n"),
          // unpartitioned window is intentional: post-aggregation
          // histogram (≤ 40 bins) — SURVEY A14's own shape
          sum("n").over(Window.orderBy(col("bin").desc)).cast("long")
            .as("n_at_or_above"))
        .orderBy("bin")
    },

    // SemDeDup-style semantic dedup: ANN near-dup pairs above a cosine
    // threshold → connected components → one canonical keeper per
    // embedding cluster. Same banded bucket equi-join as q_e_ann_pairs
    // (nothing all-pairs) + the same min-label/pointer-jump components
    // as q_d_components — composition, not new machinery. τ resolves
    // through `dedup.semantic.min_cos` (0.35 — scaled to the synthetic
    // random embeddings; production spaces override to ≈ 0.95).
    Q("q_e_semantic_dedup", Some(s"""
      WITH RECURSIVE $annPairCtes,
      sem AS (
        SELECT id_a AS d1, id_b AS d2
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id
        WHERE round(dot / (na.nrm * nb.nrm), 6) >= $SemMinCos),
      edges AS (
        SELECT d1 AS a, d2 AS b FROM sem UNION SELECT d2, d1 FROM sem),
      reach (a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      comp AS (
        SELECT v.vec_id,
               least(v.vec_id, coalesce(min(r.b), v.vec_id)) AS comp_id
        FROM embeddings v LEFT JOIN reach r ON r.a = v.vec_id
        GROUP BY v.vec_id)
      SELECT vec_id, comp_id,
             count(*) OVER (PARTITION BY comp_id) AS cluster_size,
             vec_id = comp_id AS is_canonical
      FROM comp ORDER BY vec_id""")) { (s, dir) =>
      semComps(s, dir).orderBy("vec_id")
    },

    // The end-to-end dedup PIPELINE a real curation run executes —
    // exact → substring-strip → MinHash-component → semantic keeper,
    // each stage applied to the previous stage's survivors, reported
    // as per-stage removal counts with monotone corpus shrinkage.
    // Stage policy (stated, and mirrored verbatim by the oracle):
    // artifacts (fingerprints, covered positions, component maps) are
    // computed ONCE on the full corpus — the shared stages every
    // individual query reads — and each stage keeps, per duplicate
    // group, the minimum SURVIVING doc. Full-corpus substring
    // artifacts stay sound after stage 1 because an exact-dup
    // non-keeper's grams occur identically (same positions) in its
    // kept twin, so no first occurrence is lost. Docs without an
    // embedding pass the semantic stage untouched. tokens_out counts
    // post-strip whitespace tokens of the stage's survivors.
    Q("q_t_dedup_pipeline", Some(s"""
      WITH RECURSIVE $componentCtes,
      $annPairCtes,
      ${substrCovCtes.trim},
      ${pplCtes.trim},
      sem AS (
        SELECT id_a AS d1, id_b AS d2
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id
        WHERE round(dot / (na.nrm * nb.nrm), 6) >= $SemMinCos),
      edges2 AS (
        SELECT d1 AS a, d2 AS b FROM sem UNION SELECT d2, d1 FROM sem),
      reach2 (a, b) AS (
        SELECT a, b FROM edges2
        UNION
        SELECT r.a, e.b FROM reach2 r JOIN edges2 e ON r.b = e.a),
      comp2 AS (
        SELECT v.vec_id,
               least(v.vec_id, coalesce(min(r.b), v.vec_id)) AS comp_id
        FROM embeddings v LEFT JOIN reach2 r ON r.a = v.vec_id
        GROUP BY v.vec_id),
      ntok AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(text, '[[:space:]]+'))
                 AS BIGINT) AS n_tokens
        FROM documents),
      covn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cov
               FROM cov GROUP BY 1),
      s1 AS (SELECT doc_id FROM fp_star WHERE doc_id = keep),
      s1t AS (
        SELECT s1.doc_id, n.n_tokens,
               n.n_tokens - coalesce(c.n_cov, 0) AS kept
        FROM s1 JOIN ntok n USING (doc_id)
             LEFT JOIN covn c USING (doc_id)),
      s2 AS (SELECT * FROM s1t WHERE kept > 0),
      s2c AS (SELECT s2.*, comp.comp_id FROM s2
              JOIN comp USING (doc_id)),
      k3 AS (SELECT comp_id, min(doc_id) AS keep_id FROM s2c
             GROUP BY 1),
      s3 AS (SELECT s2c.doc_id, s2c.kept FROM s2c
             JOIN k3 USING (comp_id) WHERE doc_id = keep_id),
      s3s AS (SELECT s3.doc_id, s3.kept, c2.comp_id AS sem_comp
              FROM s3 LEFT JOIN comp2 c2 ON s3.doc_id = c2.vec_id),
      k4 AS (SELECT sem_comp, min(doc_id) AS skeep FROM s3s
             WHERE sem_comp IS NOT NULL GROUP BY 1),
      s4 AS (SELECT s3s.doc_id, s3s.kept FROM s3s
             LEFT JOIN k4 USING (sem_comp)
             WHERE sem_comp IS NULL OR doc_id = skeep),
      a0 AS (SELECT CAST(count(*) AS BIGINT) AS d0 FROM documents),
      a1 AS (SELECT CAST(count(*) AS BIGINT) AS d1,
                    CAST(sum(n_tokens) AS BIGINT) AS t1 FROM s1t),
      a2 AS (SELECT CAST(count(*) AS BIGINT) AS d2,
                    CAST(sum(kept) AS BIGINT) AS t2 FROM s2),
      a3 AS (SELECT CAST(count(*) AS BIGINT) AS d3,
                    CAST(sum(kept) AS BIGINT) AS t3 FROM s3),
      a4 AS (SELECT CAST(count(*) AS BIGINT) AS d4,
                    CAST(sum(kept) AS BIGINT) AS t4 FROM s4),
      pbk AS (
        SELECT d.doc_id, $pplBucketCase AS b
        FROM pb_d d JOIN pb_cut c USING (lang)),
      s5 AS (
        SELECT s4.doc_id, s4.kept FROM s4
        LEFT JOIN pbk ON s4.doc_id = pbk.doc_id
        WHERE pbk.b IS NULL OR pbk.b <> 'tail'),
      a5 AS (SELECT CAST(count(*) AS BIGINT) AS d5,
                    CAST(sum(kept) AS BIGINT) AS t5 FROM s5),
      ${CurationQueries.qclfCtes.trim},
      ${graft.text.QualityClf.oracleThresholdCtes(
        CurationQueries.QcIters, CurationQueries.QcTarget).trim},
      s6 AS (
        SELECT s5.doc_id, s5.kept FROM s5
        JOIN qcpt m ON s5.doc_id = m.doc_id
        WHERE m.p >= (SELECT thr FROM qcpick)),
      a6 AS (SELECT CAST(count(*) AS BIGINT) AS d6,
                    CAST(sum(kept) AS BIGINT) AS t6 FROM s6)
      SELECT * FROM (
        SELECT '1_exact' AS stage, d0 AS docs_in, d0 - d1 AS docs_removed,
               d1 AS docs_out, t1 AS tokens_out
        FROM a0, a1
        UNION ALL
        SELECT '2_substr_strip', d1, d1 - d2, d2, t2 FROM a1, a2
        UNION ALL
        SELECT '3_near_dup_component', d2, d2 - d3, d3, t3 FROM a2, a3
        UNION ALL
        SELECT '4_semantic_keeper', d3, d3 - d4, d4, t4 FROM a3, a4
        UNION ALL
        SELECT '5_quality_ppl', d4, d4 - d5, d5, t5 FROM a4, a5
        UNION ALL
        SELECT '6_quality_clf', d5, d5 - d6, d6, t6 FROM a5, a6)
      ORDER BY stage""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val nTok = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      // pipeline-variant note: stage 2 strips EXACT-substring spans;
      // corpora dominated by boilerplate/license text swap in (or add)
      // the winnow-driven stripper (q_d_winnow_strip / Winnow
      // .stripSpans) at the same position — identical kept-token
      // accounting contract (n_tokens − covered), fingerprint-localized
      // spans instead of exact k-token grams, same shared-artifact
      // shape (the wfp stage replaces the cov stage)
      val s1 = Dedup.exactDups(docs).filter(!col("is_dup"))
        .select("doc_id")
      val covn = substrCovered(s, dir).groupBy("doc_id")
        .agg(count(lit(1)).as("n_cov"))
      val s1t = s1.join(nTok, "doc_id")
        .join(covn, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_cov"), lit(0L))).as("kept"))
      val s2 = s1t.filter(col("kept") > 0)
      val s2c = s2.join(
        docComponents(s, dir).select("doc_id", "comp_id"), "doc_id")
      val k3 = s2c.groupBy("comp_id").agg(min("doc_id").as("keep_id"))
      val s3 = s2c.join(k3, "comp_id")
        .filter(col("doc_id") === col("keep_id"))
        .select("doc_id", "kept")
      val s3s = s3.join(
        semComps(s, dir).select(col("vec_id").as("doc_id"),
          col("comp_id").as("sem_comp")), Seq("doc_id"), "left")
      val k4 = s3s.filter(col("sem_comp").isNotNull)
        .groupBy("sem_comp").agg(min("doc_id").as("skeep"))
      val s4 = s3s.join(k4, Seq("sem_comp"), "left")
        .filter(col("sem_comp").isNull || col("doc_id") === col("skeep"))
        .select("doc_id", "kept")
      // stage 5 — CCNet quality gate: drop survivors whose bigram-LM
      // perplexity sits in the per-language TAIL tercile (buckets
      // computed on the FULL corpus — the family's stage-artifact
      // convention; an exact dup has identical text hence identical
      // ppl, so full-corpus buckets are sound after dedup). Docs with
      // no bigrams have no score and pass (can't-score ≠ low-quality).
      val s5 = s4.join(
          pplBucketed(s, dir).select(col("doc_id"),
            col("ppl_bucket").as("pb")), Seq("doc_id"), "left")
        .filter(col("pb").isNull || col("pb") =!= "tail")
        .select("doc_id", "kept")
      // stage 6 — TRAINED quality gate: the fastText-style classifier
      // (QualityClf, fitted once per run on the full corpus like the
      // ppl buckets) keeps survivors whose round-9 probability clears
      // the CALIBRATION-DRIVEN threshold (qclfThreshold — the decile
      // operating point chosen for quality_clf.target_precision), the
      // classifier-scored filter production stacks run AFTER the
      // heuristic/perplexity gates (GPT-3/CCNet lineage); inner join:
      // every doc has gram features, so no can't-score class here
      val thr6 = CurationQueries.qclfThreshold(s, dir)
      val s6 = s5.join(
          graft.text.QualityClf.score(
            CurationQueries.qclfFeatY(s, dir),
            CurationQueries.qclfWeights(s, dir))
            .select(col("doc_id"), round(col("prob"), 9).as("clf_p")),
          "doc_id")
        .filter(col("clf_p") >= thr6)
        .select("doc_id", "kept")
      val a0 = docs.agg(count(lit(1)).as("d0"))
      val a1 = s1t.agg(count(lit(1)).as("d1"),
        sum("n_tokens").cast("long").as("t1"))
      val a2 = s2.agg(count(lit(1)).as("d2"),
        sum("kept").cast("long").as("t2"))
      val a3 = s3.agg(count(lit(1)).as("d3"),
        sum("kept").cast("long").as("t3"))
      val a4 = s4.agg(count(lit(1)).as("d4"),
        sum("kept").cast("long").as("t4"))
      val a5 = s5.agg(count(lit(1)).as("d5"),
        sum("kept").cast("long").as("t5"))
      val a6 = s6.agg(count(lit(1)).as("d6"),
        sum("kept").cast("long").as("t6"))
      // ONE row after the crossJoins — checkpoint it so the six stage
      // rows below don't re-run the whole seven-aggregate chain each
      // (union branches share no exchange)
      val all = a0.crossJoin(broadcast(a1)).crossJoin(broadcast(a2))
        .crossJoin(broadcast(a3)).crossJoin(broadcast(a4))
        .crossJoin(broadcast(a5)).crossJoin(broadcast(a6))
        .localCheckpoint()
      def row(stage: String, din: String, dout: String, tok: String) =
        all.select(lit(stage).as("stage"), col(din).as("docs_in"),
          (col(din) - col(dout)).as("docs_removed"),
          col(dout).as("docs_out"), col(tok).as("tokens_out"))
      row("1_exact", "d0", "d1", "t1")
        .unionByName(row("2_substr_strip", "d1", "d2", "t2"))
        .unionByName(row("3_near_dup_component", "d2", "d3", "t3"))
        .unionByName(row("4_semantic_keeper", "d3", "d4", "t4"))
        .unionByName(row("5_quality_ppl", "d4", "d5", "t5"))
        .unionByName(row("6_quality_clf", "d5", "d6", "t6"))
        .orderBy("stage")
    },

    // Filter-AGREEMENT matrix: pairwise agreement between the four
    // per-doc quality/selection signals the curation stack runs —
    // heuristic battery pass, perplexity non-tail, trained-classifier
    // positive, DSIR target-likeness (logw > 0). The row a pipeline
    // owner reads to see which filters are redundant and which carry
    // independent signal (the quality trio should correlate; DSIR is
    // DOMAIN match and should not — this row MEASURES the separation
    //-of-concerns claim instead of asserting it). One shuffle to the
    // 4-per-doc long form, one pair join keyed by doc (fanout exactly
    // 6 rows per doc), exact-count ratios.
    Q("q_t_filter_agreement", Some(s"""
      WITH ${CurationQueries.qclfCtes},
      ${CurationQueries.dsirCtes.trim},
      ${pplCtes.trim},
      fam AS (
        SELECT f.doc_id,
               CAST(sum(CAST(f.x * w.w AS DECIMAL(38,18))) AS DOUBLE)
                 AS margin
        FROM qcf f JOIN qcw${CurationQueries.QcIters} w USING (bk)
        GROUP BY 1),
      fah AS (
        SELECT doc_id,
               (len(t) >= 10
                AND round(0.4 * (CAST(least(nc, 400) AS DOUBLE) / 400.0)
                  + 0.4 * (1.0 - CAST(nc - length(regexp_replace(text,
                      '[0-9]', '', 'g')) AS DOUBLE) / nc)
                  + 0.2 * least((CAST(len(list_filter(t,
                      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      AS DOUBLE) / len(t)) * 4.0, 1.0), 9) >= 0.5
                AND round(CAST(nc - length(regexp_replace(text, '[0-9]',
                      '', 'g')) AS DOUBLE) / nc, 9) <= 0.3) AS pass
        FROM qcd),
      fapk AS (
        SELECT d.doc_id, $pplBucketCase AS b
        FROM pb_d d JOIN pb_cut c USING (lang)),
      fal AS (
        SELECT doc_id, 'clf' AS f, margin > 0 AS pass FROM fam
        UNION ALL
        SELECT doc_id, 'dsir', round(logw, 6) > 0 FROM dlw
        UNION ALL
        SELECT doc_id, 'heuristic', pass FROM fah
        UNION ALL
        SELECT d.doc_id, 'ppl', (pk.b IS NULL OR pk.b <> 'tail')
        FROM documents d LEFT JOIN fapk pk ON d.doc_id = pk.doc_id),
      faj AS (
        SELECT a.f AS filter_a, b.f AS filter_b,
               a.pass AS pa, b.pass AS pb
        FROM fal a JOIN fal b
          ON a.doc_id = b.doc_id AND a.f < b.f)
      SELECT filter_a, filter_b,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN pa THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_a,
             CAST(sum(CASE WHEN pb THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_b,
             CAST(sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS BIGINT)
               AS both_pass,
             CAST(sum(CASE WHEN pa = pb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
             round(CAST(sum(CASE WHEN pa = pb THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 9) AS agree_rate,
             round(CASE WHEN sum(CASE WHEN pa OR pb THEN 1 ELSE 0 END)
               > 0 THEN CAST(sum(CASE WHEN pa AND pb THEN 1 ELSE 0 END)
                 AS DOUBLE)
                 / sum(CASE WHEN pa OR pb THEN 1 ELSE 0 END) END, 9)
               AS pass_jaccard
      FROM faj GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val q = docs.select(col("doc_id") +:
        TextOps.qualityFeatures(col("text")): _*)
      val heur = q.select(col("doc_id"),
        (col("n_tokens") >= 10 && col("quality_score") >= 0.5 &&
          col("digit_ratio") <= 0.3).as("pass"))
      val ppl = docs.select("doc_id")
        .join(pplBucketed(s, dir).select(col("doc_id"),
          col("ppl_bucket")), Seq("doc_id"), "left")
        .select(col("doc_id"), (col("ppl_bucket").isNull ||
          col("ppl_bucket") =!= "tail").as("pass"))
      val clf = graft.text.QualityClf.score(
          CurationQueries.qclfFeatY(s, dir),
          CurationQueries.qclfWeights(s, dir))
        .select(col("doc_id"), col("pred").as("pass"))
      val dsir = CurationQueries.dsirWeights(s, dir)
        .select(col("doc_id"), (round(col("logw"), 6) > 0).as("pass"))
      val long = clf.select(col("doc_id"), lit("clf").as("f"),
          col("pass"))
        .unionByName(dsir.select(col("doc_id"), lit("dsir").as("f"),
          col("pass")))
        .unionByName(heur.select(col("doc_id"),
          lit("heuristic").as("f"), col("pass")))
        .unionByName(ppl.select(col("doc_id"), lit("ppl").as("f"),
          col("pass")))
      val a = long.select(col("doc_id"), col("f").as("filter_a"),
        col("pass").as("pa"))
      val b = long.select(col("doc_id"), col("f").as("filter_b"),
        col("pass").as("pb"))
      a.join(b, Seq("doc_id"))
        .filter(col("filter_a") < col("filter_b"))
        .groupBy("filter_a", "filter_b")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pa"), 1L).otherwise(0L)).as("pass_a"),
          sum(when(col("pb"), 1L).otherwise(0L)).as("pass_b"),
          sum(when(col("pa") && col("pb"), 1L).otherwise(0L))
            .as("both_pass"),
          sum(when(col("pa") === col("pb"), 1L).otherwise(0L))
            .as("n_agree"),
          round(sum(when(col("pa") === col("pb"), 1.0).otherwise(0.0))
            / count(lit(1)), 9).as("agree_rate"),
          round(when(sum(when(col("pa") || col("pb"), 1L)
              .otherwise(0L)) > 0,
            sum(when(col("pa") && col("pb"), 1.0).otherwise(0.0))
              / sum(when(col("pa") || col("pb"), 1L).otherwise(0L)))
            , 9).as("pass_jaccard"))
        .orderBy("filter_a", "filter_b")
    },

    // Hot-bucket-guard observability: per-band occupancy + the fraction
    // of docs the maxBucket cap would drop (the silent-recall-loss alarm)
    Q("q_e_ann_stats", Some(s"""
      WITH $annBucketCtes
      SELECT CAST(band_idx AS BIGINT) AS band_idx,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(bn) AS BIGINT) AS n_docs,
             CAST(max(bn) AS BIGINT) AS max_bucket,
             CAST(sum(CASE WHEN bn > 24 THEN bn ELSE 0 END) AS BIGINT)
               AS dropped_docs,
             round(CAST(sum(CASE WHEN bn > 24 THEN bn ELSE 0 END) AS DOUBLE)
               / sum(bn), 9) AS dropped_frac
      FROM bsz GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Similarity.annBucketStats(t(s, dir, "embeddings"),
          maxBucket = 24, bits = 8, nBands = 2)
        .withColumn("band_idx", col("band_idx").cast("long"))
        .select("band_idx", "n_buckets", "n_docs", "max_bucket",
          "dropped_docs", "dropped_frac")
        .orderBy("band_idx")
    },

    // Contrastive training-pair mining (the SimCSE/E5-style
    // hard-negative step): for every vector with BOTH a near-dup mate
    // (candidate cosine ≥ the semantic-dedup τ — the positive) and a
    // below-τ candidate (the HARD negative: the closest non-duplicate,
    // exactly the pair a contrastive loss learns the most from), emit
    // (anchor, positive, hard negative, margin). Mined entirely from
    // the shared bucketed ANN candidate stage — candidate generation
    // cost is already paid, selection is two per-anchor argmax windows
    // over candidate lists (bounded by the bucket cap, never corpus
    // fanout).
    Q("q_e_contrastive", Some(s"""
      WITH $annPairCtes,
      ctc AS (
        SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cs
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id),
      ctsym AS (
        SELECT id_a AS a, id_b AS b, cs FROM ctc
        UNION ALL
        SELECT id_b, id_a, cs FROM ctc),
      ctpos AS (
        SELECT a, b AS pos_id, cs AS pos_cos FROM (
          SELECT *, row_number() OVER (PARTITION BY a
            ORDER BY cs DESC, b) AS rn
          FROM ctsym WHERE cs >= $SemMinCos) WHERE rn = 1),
      ctneg AS (
        SELECT a, b AS neg_id, cs AS neg_cos FROM (
          SELECT *, row_number() OVER (PARTITION BY a
            ORDER BY cs DESC, b) AS rn
          FROM ctsym WHERE cs < $SemMinCos) WHERE rn = 1)
      SELECT a AS anchor_id, pos_id, pos_cos, neg_id, neg_cos,
             round(pos_cos - neg_cos, 6) AS margin
      FROM ctpos JOIN ctneg USING (a) ORDER BY anchor_id""")) {
      (s, dir) =>
      val sym = annPairs(s, dir).select(col("id_a").as("a"),
          col("id_b").as("b"), col("cos_sim").as("cs"))
        .unionByName(annPairs(s, dir).select(col("id_b").as("a"),
          col("id_a").as("b"), col("cos_sim").as("cs")))
      val w = Window.partitionBy("a").orderBy(col("cs").desc, col("b"))
      val pos = sym.filter(col("cs") >= SemMinCos)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("a"), col("b").as("pos_id"), col("cs").as("pos_cos"))
      val neg = sym.filter(col("cs") < SemMinCos)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("a"), col("b").as("neg_id"), col("cs").as("neg_cos"))
      pos.join(neg, "a")
        .select(col("a").as("anchor_id"), col("pos_id"), col("pos_cos"),
          col("neg_id"), col("neg_cos"),
          round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
        .orderBy("anchor_id")
    },

    // Johnson–Lindenstrauss random projection (Achlioptas ±1 variant,
    // text.RandomProjection): per-vector norm preservation report —
    // the pre-ANN dimensionality reduction, with the sign matrix
    // DERIVED from md5 parity so the whole operator (matrix included)
    // is hash-checked. The matrix rides the plan as dOut literal
    // coefficient arrays feeding the codegen'd dot product: map-only,
    // no shuffle, no model state. Projections round-6 at the seam so
    // downstream sums see identical doubles on both engines.
    Q("q_e_rp_norms", Some(s"""
      WITH $rpCtes,
      rno AS (SELECT vec_id, sum(x * x) AS o2 FROM rex GROUP BY 1),
      rnp AS (SELECT vec_id, sum(y * y) AS p2 FROM rpj GROUP BY 1)
      SELECT r.vec_id, $RpOutDim AS d_out,
             round(o2, 6) AS orig_sq, round(p2, 6) AS proj_sq,
             round(p2 / o2, 6) AS norm_ratio
      FROM rno r JOIN rnp USING (vec_id) ORDER BY vec_id""")) {
      (s, dir) =>
      val v = col("embedding").cast("array<double>")
      val proj = rpProjected(s, dir)
      proj.select(col("vec_id"), lit(RpOutDim).as("d_out"),
          round(graft.functions.VecOps.dot(v, v), 6).as("orig_sq"),
          round(graft.functions.VecOps.dot(col("yr"), col("yr")), 6)
            .as("proj_sq"),
          round(graft.functions.VecOps.dot(col("yr"), col("yr"))
            / graft.functions.VecOps.dot(v, v), 6).as("norm_ratio"))
        .orderBy("vec_id")
    },

    // J-L distortion, measured: pairwise squared-distance ratio
    // projected/original over the capped pair sample — the
    // concentration the lemma promises (mean ≈ 1, spread O(√(1/d)))
    // as an observability row, the ANN-recall-ladder pattern applied
    // to the projection. Pair generation is the capped broadcast
    // cross the HDBSCAN family uses; everything downstream is one
    // aggregate.
    Q("q_e_rp_distortion", Some(s"""
      WITH $rpCtes,
      rod AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               sum((a.x - b.x) * (a.x - b.x)) AS d2
        FROM rex a JOIN rex b ON a.i = b.i AND a.vec_id < b.vec_id
        WHERE a.vec_id < $RpPairCap AND b.vec_id < $RpPairCap
        GROUP BY 1, 2),
      rpd AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               sum((a.y - b.y) * (a.y - b.y)) AS d2
        FROM rpj a JOIN rpj b ON a.j = b.j AND a.vec_id < b.vec_id
        WHERE a.vec_id < $RpPairCap AND b.vec_id < $RpPairCap
        GROUP BY 1, 2),
      rr AS (
        SELECT round(p.d2 / o.d2, 6) AS ratio
        FROM rod o JOIN rpd p ON o.ia = p.ia AND o.ib = p.ib
        WHERE o.d2 > 0)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             round(CAST(sum(CAST(ratio AS DECIMAL(38,9))) AS DOUBLE)
               / count(*), 6) AS mean_ratio,
             round(min(ratio), 6) AS min_ratio,
             round(max(ratio), 6) AS max_ratio,
             round(CAST(sum(CASE WHEN ratio BETWEEN 0.5 AND 2.0
               THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9)
               AS frac_within_2x
      FROM rr""")) { (s, dir) =>
      val base = rpProjected(s, dir).filter(col("vec_id") < RpPairCap)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("v"), col("yr"))
      val pairs = base.select(col("vec_id").as("ia"), col("v").as("va"),
          col("yr").as("pa"))
        .join(broadcast(base.select(col("vec_id").as("ib"),
          col("v").as("vb"), col("yr").as("pb"))),
          col("ia") < col("ib"))
        // zero guard (both engines: the oracle's rr has o.d2 > 0):
        // two identical embeddings inside the pair cap give original
        // d2 = 0 → NaN/Inf ratio in Spark and an Infinity→DECIMAL
        // cast failure in DuckDB; a zero-distance pair carries no
        // distortion information, so drop it on both sides
        .filter(graft.functions.VecOps.sqDist(col("va"), col("vb")) > 0)
      val ratio = round(
        graft.functions.VecOps.sqDist(col("pa"), col("pb"))
          / graft.functions.VecOps.sqDist(col("va"), col("vb")), 6)
      pairs.select(ratio.as("ratio"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("ratio").cast("decimal(38,9)")).cast("double")
            / count(lit(1)), 6).as("mean_ratio"),
          round(min("ratio"), 6).as("min_ratio"),
          round(max("ratio"), 6).as("max_ratio"),
          round(sum(when(col("ratio").between(0.5, 2.0), 1.0)
            .otherwise(0.0)) / count(lit(1)), 9).as("frac_within_2x"))
    },

    // RP as pre-ANN, measured: top-5 by squared L2 in the PROJECTED
    // 16-dim space vs the exact full-dim truth — the recall ladder
    // pattern applied to the projection (what a 4× cheaper distance
    // costs in recall). The projected search is the same broadcast-
    // query shape as the exact stage at a quarter of the per-pair
    // arithmetic; at production scale RP composes in FRONT of
    // IVF/PQ — this row prices the first stage alone.
    Q("q_e_rp_recall", Some(s"""
      WITH $rpCtes,
      rq AS (SELECT vec_id AS qid, j, y AS qy FROM rpj
             WHERE vec_id < $AnnQ),
      rpd2 AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.y - q.qy) * (e.y - q.qy)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM rpj e JOIN rq q ON e.j = q.j AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      rp5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM rpd2) WHERE rn <= $AnnK),
      qfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM rex WHERE vec_id < $AnnQ),
      d2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM rex e JOIN qfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      exact5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM d2full) WHERE rn <= $AnnK)
      SELECT e.qid,
             CAST(count(p.vid) AS BIGINT) AS n_hits,
             round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
               AS recall_at_5
      FROM exact5 e LEFT JOIN rp5 p ON e.qid = p.qid AND e.vid = p.vid
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val base = rpProjected(s, dir).select(col("vec_id"), col("yr"))
      val q = base.filter(col("vec_id") < AnnQ)
        .select(col("vec_id").as("qid"), col("yr").as("qy"))
      val d2 = base.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          round(graft.functions.VecOps.sqDist18(col("yr"), col("qy")), 6)
            .as("d2"))
      val rp5 = d2.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("d2"), col("vid"))))
        .filter(col("rn") <= AnnK)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      exactTop5(s, dir).join(rp5, Seq("qid", "vid"), "left")
        .groupBy("qid")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")).cast("double") / count(lit(1)), 6)
            .as("recall_at_5"))
        .orderBy("qid")
    },

    // RP + exact re-rank, measured: shortlist the rerank_r nearest in
    // the PROJECTED space (cheap: dOut-dim distances), exact-re-rank
    // the shortlist in full dimension, report recall@5 — the
    // composition q_e_rp_recall's raw number argues for (0.131 raw →
    // the re-rank owns the recall budget, the same division of labor
    // the residual-ADC ladder established). Shortlist cost is the
    // projected scan; the exact pass touches only queries × R full
    // vectors.
    Q("q_e_rp_rerank", Some(s"""
      WITH $rpCtes,
      rq AS (SELECT vec_id AS qid, j, y AS qy FROM rpj
             WHERE vec_id < $AnnQ),
      rpd2 AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.y - q.qy) * (e.y - q.qy)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM rpj e JOIN rq q ON e.j = q.j AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      rsh AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM rpd2) WHERE rn <= $RerankR),
      qfull AS (
        SELECT vec_id AS qid, i, x AS qx FROM rex WHERE vec_id < $AnnQ),
      d2full AS (
        SELECT q.qid, e.vec_id AS vid,
               round(CAST(sum(CAST((e.x - q.qx) * (e.x - q.qx)
                 AS DECIMAL(38,18))) AS DOUBLE), 6) AS d2
        FROM rex e JOIN qfull q ON e.i = q.i AND e.vec_id <> q.qid
        GROUP BY 1, 2),
      rrx AS (
        SELECT s.qid, s.vid, d.d2 FROM rsh s
        JOIN d2full d ON d.qid = s.qid AND d.vid = s.vid),
      rr5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM rrx) WHERE rn <= $AnnK),
      exact5 AS (
        SELECT qid, vid FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY d2, vid) AS rn FROM d2full) WHERE rn <= $AnnK)
      SELECT e.qid,
             CAST(count(p.vid) AS BIGINT) AS n_hits,
             round(CAST(count(p.vid) AS DOUBLE) / count(*), 6)
               AS recall_at_5
      FROM exact5 e LEFT JOIN rr5 p ON e.qid = p.qid AND e.vid = p.vid
      GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val base = rpProjected(s, dir).select(col("vec_id"), col("yr"))
      val q = base.filter(col("vec_id") < AnnQ)
        .select(col("vec_id").as("qid"), col("yr").as("qy"))
      val d2rp = base.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          round(graft.functions.VecOps.sqDist18(col("yr"), col("qy")), 6)
            .as("d2"))
      val short = d2rp.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("d2"), col("vid"))))
        .filter(col("rn") <= RerankR).select("qid", "vid")
      val exact = short
        .join(emb.select(col("vec_id").as("vid"), col("v").as("cv")),
          "vid")
        .join(broadcast(emb.filter(col("vec_id") < AnnQ)
          .select(col("vec_id").as("qid"), col("v").as("qv"))), "qid")
        .select(col("qid"), col("vid"),
          round(graft.functions.VecOps.sqDist18(col("cv"), col("qv")), 6)
            .as("d2"))
      val rr5 = exact.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("d2"), col("vid"))))
        .filter(col("rn") <= AnnK)
        .select(col("qid"), col("vid"), lit(1).as("hit"))
      exactTop5(s, dir).join(rr5, Seq("qid", "vid"), "left")
        .groupBy("qid")
        .agg(count(col("hit")).as("n_hits"),
          round(count(col("hit")).cast("double") / count(lit(1)), 6)
            .as("recall_at_5"))
        .orderBy("qid")
    },

    // INCREMENTAL CDC dedup — the block-level member of the
    // incremental family (exact q_t_incr_dedup, substring
    // q_d_substr_incr, index q_e_index_incr): a delta batch's chunks
    // classified against the STANDING corpus's chunk-fingerprint
    // index with one distinct-fp equi-join; the index is never
    // re-chunked. Per batch doc: duplicate-vs-index bytes and the
    // dup/partial/novel triage an ingest gate acts on.
    Q("q_d_cdc_incr", Some(s"""
      WITH $cdcCtes,
      cidx AS (
        SELECT DISTINCT chunk_fp FROM cdck WHERE doc_id % 5 <> 0),
      cbat AS (
        SELECT c.doc_id, c.chunk_len,
               (i.chunk_fp IS NOT NULL) AS is_dup
        FROM cdck c LEFT JOIN cidx i USING (chunk_fp)
        WHERE c.doc_id % 5 = 0)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(chunk_len) AS BIGINT) AS n_bytes,
             CAST(sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
               AS BIGINT) AS dup_bytes,
             round(CAST(sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
               AS DOUBLE) / sum(chunk_len), 9) AS dup_ratio,
             CASE WHEN sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
                    = sum(chunk_len) THEN 'dup'
                  WHEN sum(CASE WHEN is_dup THEN chunk_len ELSE 0 END)
                    > 0 THEN 'partial'
                  ELSE 'novel' END AS status
      FROM cbat GROUP BY 1 ORDER BY doc_id""")) { (s, dir) =>
      val ch = cdcChunks(s, dir)
      val idx = ch.filter(col("doc_id") % 5 =!= 0)
        .select("chunk_fp").distinct()
        .withColumn("seen", lit(true))
      val dupBytes = sum(when(col("seen"), col("chunk_len").cast("long"))
        .otherwise(0L))
      ch.filter(col("doc_id") % 5 === 0)
        .join(idx, Seq("chunk_fp"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum("chunk_len").as("n_bytes"),
          dupBytes.as("dup_bytes"),
          round(dupBytes.cast("double") / sum("chunk_len"), 9)
            .as("dup_ratio"),
          when(dupBytes === sum("chunk_len"), "dup")
            .when(dupBytes > 0, "partial")
            .otherwise("novel").as("status"))
        .orderBy("doc_id")
    }
  )

  // ---- J-L random projection (text.RandomProjection) live views +
  // shared stage + oracle

  private def RpOutDim = graft.Settings.ann.rpOutDim
  private def RpPairCap = graft.Settings.ann.rpPairCap

  /** Shared projected-embedding stage: `(vec_id, embedding, yr)` with
    * yr the ROUND-6 projected vector — the rounding seam makes every
    * downstream float identical across engines (both sides then sum
    * the same doubles). */
  private[queries] def rpProjected(s: SparkSession, dir: String): DataFrame =
    Stage.cached(s, dir, "rp_projected") {
      val emb = t(s, dir, "embeddings")
      val dIn = graft.Settings.ann.embeddingDim
      emb.select(col("vec_id"), col("embedding"),
        transform(graft.text.RandomProjection.project(
          col("embedding").cast("array<double>"), dIn, RpOutDim),
          y => round(y, 6)).as("yr"))
    }

  /** DuckDB CTE chain mirroring RandomProjection.project at the live
    * knobs: md5-parity sign matrix, decimal-exact dot products,
    * round-6 projection seam. Ends at `rpj(vec_id, j, y)`. */
  private def rpCtes: String = {
    val dIn = graft.Settings.ann.embeddingDim
    val scale = 1.0 / math.sqrt(RpOutDim.toDouble)
    s"""
      rex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      rmat AS (
        SELECT j, i,
               CASE WHEN ${hsql("'rp_' || j || '_' || i")} % 2 = 0
                 THEN $scale ELSE -$scale END AS r
        FROM range($RpOutDim) t1(j) CROSS JOIN range($dIn) t2(i)),
      rpj AS (
        SELECT e.vec_id, m.j,
               round(CAST(sum(CAST(e.x * m.r AS DECIMAL(38,18)))
                 AS DOUBLE), 6) AS y
        FROM rex e JOIN rmat m ON e.i = m.i GROUP BY 1, 2)"""
  }
}
