package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.text.{Dedup, Similarity, TextOps}
import TextQueries._

/** Shared dedup-family stages and oracle CTE generators (r15 split out
  * of TextQueries — pure move, stage names and oracle strings
  * byte-identical): winnowing fingerprints, CDC chunks, MinHash
  * signatures + LSH pairs, exact-substring covered positions,
  * exact-Jaccard truth, duplicate connected components, the standing
  * dedup index. Consumed by [[DedupQueries]] and the dedup-pipeline
  * rows. */
object DedupStages {

  /** Read one driver testdata table (the QueryModule helper, local
    * copy — this object hosts stages, not queries). */
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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

  /** DuckDB CTE chain mirroring Cdc.chunks at the live knobs: per-char
    * code points (byte ≡ code point on the ASCII fixture — the
    * winnow/phash contract), per-position polynomial k-gram hashes via
    * the same coefficient table the O(len) rolling engine expression
    * realizes (the oracle pays the O(len·k) direct form), content cuts
    * where h % divisor = 0, spans via lead(), salted chunk-text
    * fingerprints. Ends at `cdck(doc_id, chunk_idx, start_pos,
    * chunk_len, chunk_fp)`. */
  private[queries] def cdcCtes: String = {
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

  /** DuckDB CTE chain mirroring Winnow.fingerprints: per-char code
    * points (byte ≡ code point on the ASCII fixture — the engine
    * hashes UTF-8 bytes, the phash/simhash contract), per-position
    * polynomial k-gram hashes via the same coefficient table the
    * O(len) rolling engine expression uses (the oracle pays the
    * O(len·k) direct form — fine at gate scale), robust-winnowing
    * window minima (ties → rightmost), distinct selections. */
  private[queries] def winnowCtes: String = {
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
  private[queries] def substrCovCtes: String = {
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

  /** Exact-duplicate star edges (dup doc → md5-group keeper) for any doc
    * frame — one window on the text fingerprint, shared by the full and
    * index-side component builders. */
  private[queries] def fpPairs(d: DataFrame): DataFrame = {
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

  /** CTE chain shingles → minhash signatures (`sig`) → LSH band keys →
    * candidate pairs (`mh_pairs`); shared by q_d_minhash and
    * q_d_components. */
  private[queries] def minhashCtes: String = {
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
  private[queries] def componentCtes: String = {
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
}
