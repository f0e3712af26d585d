package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload + typed metadata, stubbed
  * decode (see Multimodal scaladoc), frame-index sampling, and the batched
  * mapPartitions feature-extraction path (rows-only check — its checksum
  * kernel is JVM-side by design).
  */
object MultimodalQueries extends QueryModule {

  private def hsql(e: String) = graft.text.TextOps.hsqlRaw(e)

  def all: Seq[Q] = Seq(

    // media_format: magic-byte container dispatch (png / jpeg / other).
    // The engine tests payload BYTES; the oracle tests codepoint
    // prefixes of the text — equivalent on the ASCII fixture (byte ≡
    // codepoint), where every row routes 'other'. The REAL png/jpeg
    // byte routes are spec-locked with handcrafted container fixtures
    // through the DispatchDecoder seam (MultimodalSpec).
    Q("q_m_media_meta", Some(s"""
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             CASE WHEN left(text, 8) = chr(137) || 'PNG' || chr(13)
                    || chr(10) || chr(26) || chr(10) THEN 'png'
                  WHEN left(text, 2) = chr(255) || chr(216) THEN 'jpeg'
                  WHEN left(text, 4) = 'RIFF'
                    AND substring(text, 9, 4) = 'WAVE' THEN 'wav'
                  ELSE 'other' END AS media_format,
             CAST(${hsql("text")} % 576 + 64 AS INT) AS width,
             CAST(${hsql("reverse(text)")} % 416 + 64 AS INT) AS height,
             CAST(floor(octet_length(encode(text)) / 256.0) AS INT) + 1
               AS n_frames,
             doc_id % 32 AS batch_id
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.decodeMeta(Multimodal.withPayload(t(s, dir, "documents")))
        .orderBy("doc_id")
    },

    Q("q_m_frame_sample", Some(s"""
      WITH meta AS (
        SELECT doc_id,
               CAST(floor(octet_length(encode(text)) / 256.0) AS INT) + 1
                 AS n_frames
        FROM documents)
      SELECT doc_id, n_frames,
             CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
      FROM meta
      ORDER BY doc_id, frame_idx""")) { (s, dir) =>
      val meta = Multimodal.decodeMeta(
        Multimodal.withPayload(t(s, dir, "documents")))
      Multimodal.frameSample(meta, step = 2)
        .select(col("doc_id"), col("n_frames"),
          col("frame_idx").cast("int").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    },

    // Perceptual-hash near-dup detection (Multimodal.phashCandidates):
    // the image-dedup analogue of q_d_simhash — aHash over the
    // stub-decoded intensity stream (64-block downsample → mean
    // threshold → 64 bits), 4×16-bit band blocking, exact hamming
    // verify on candidates, emitted in the observability form (banded
    // pairs + hamming + is_dup verdict; the radius-filtered operator
    // is phashPairs, planted-dup-tested in MultimodalSpec). Pure
    // expression math end-to-end, so the whole pipeline oracles
    // (documents are ASCII → unicode(char) ≡ payload byte).
    Q("q_m_phash_dup", Some {
      val bandSums = (0 until 4).map(c =>
        s"""coalesce(sum(CASE WHEN bit AND cell // 16 = $c
               THEN (CAST(1 AS BIGINT) << (cell % 16)) ELSE 0 END), 0)
               AS b$c""").mkString(",\n             ")
      val bandCase = (0 until 4).map(c => s"WHEN $c THEN b$c")
        .mkString("CASE c ", " ", " END")
      val hamming = (0 until 4).map(c =>
        s"bit_count(xor(a.b$c, b.b$c))").mkString(" + ")
      s"""
      WITH chars AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents),
      cells AS (
        SELECT doc_id,
               CAST(floor(CAST(i AS DOUBLE) * 64 / n) AS INT) AS cell,
               CAST(sum(cv) AS DOUBLE) / count(*) AS gv
        FROM chars GROUP BY 1, 2),
      thr AS (
        SELECT doc_id,
               CAST(sum(CAST(gv AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS thr
        FROM cells GROUP BY 1),
      bits AS (
        SELECT c.doc_id, c.cell, c.gv > t.thr AS bit
        FROM cells c JOIN thr t USING (doc_id)),
      sig AS (
        SELECT doc_id,
             $bandSums
        FROM bits GROUP BY 1),
      keyed0 AS (
        SELECT doc_id, b0, b1, b2, b3, c AS band_idx,
               $bandCase AS band
        FROM sig, range(4) r(c)),
      keyed AS (
        SELECT * FROM (
          SELECT *, count(*) OVER (PARTITION BY band_idx, band) AS bn
          FROM keyed0)
        WHERE bn <= ${graft.Settings.multimodal.maxBandBucket}),
      ppairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               CAST($hamming AS INT) AS hamming
        FROM keyed a JOIN keyed b
          ON a.band_idx = b.band_idx AND a.band = b.band
          AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming,
             hamming <= ${TextQueries.SimhashRadius} AS is_dup
      FROM ppairs
      ORDER BY d1, d2"""
    }) { (s, dir) =>
      Multimodal.phashCandidates(t(s, dir, "documents"),
          maxHamming = TextQueries.SimhashRadius)
        .orderBy("d1", "d2")
    },

    // VIDEO keyframe near-dup (Multimodal.videoDupCandidates —
    // completing the perceptual-dup modality set): the payload splits
    // into 256-byte frames (the decode stub's n_frames rule), every
    // step-th frame is sampled (the keyframe convention), each
    // sampled keyframe gets its own 64-cell aHash (per-frame grid →
    // per-frame mean threshold → 64 bits → 4 LSH bands), keyframes
    // block through the SAME capped banding as the image/audio
    // hashes, and frame matches (hamming ≤ radius) aggregate to
    // video pairs: how many of each side's keyframes found a match,
    // match_share = matched/min(sampled), is_dup at the
    // video.min_frame_share knob. Scale shape: one shuffle on
    // (doc, frame); banding is an equi-join; the hot-bucket cap
    // bounds a viral clip's k² frame-pair blow-up.
    Q("q_m_video_dup", Some {
      val step = graft.Settings.multimodal.videoFrameStep
      val minShare = graft.Settings.multimodal.videoMinShare
      val bandSums = (0 until 4).map(c =>
        s"""coalesce(sum(CASE WHEN bit AND cell // 16 = $c
               THEN (CAST(1 AS BIGINT) << (cell % 16)) ELSE 0 END), 0)
               AS b$c""").mkString(",\n             ")
      val bandCase = (0 until 4).map(c => s"WHEN $c THEN b$c")
        .mkString("CASE c ", " ", " END")
      val hamming = (0 until 4).map(c =>
        s"bit_count(xor(a.b$c, b.b$c))").mkString(" + ")
      s"""
      WITH vchars AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents),
      vsampled AS (
        SELECT doc_id,
               CAST(unnest(range(0, len(text) // 256 + 1, $step))
                 AS INT) AS frame_idx
        FROM documents),
      vcells AS (
        SELECT c.doc_id, s.frame_idx,
               CAST(floor(CAST(c.i % 256 AS DOUBLE) * 64
                 / least(256, c.n - s.frame_idx * 256)) AS INT)
                 AS cell,
               CAST(sum(c.cv) AS DOUBLE) / count(*) AS gv
        FROM vchars c JOIN vsampled s ON s.doc_id = c.doc_id
          AND c.i // 256 = s.frame_idx
        GROUP BY 1, 2, 3),
      vthr AS (
        SELECT doc_id, frame_idx,
               CAST(sum(CAST(gv AS DECIMAL(38,18))) AS DOUBLE)
                 / count(*) AS thr
        FROM vcells GROUP BY 1, 2),
      vbits AS (
        SELECT c.doc_id, c.frame_idx, c.cell, c.gv > t.thr AS bit
        FROM vcells c JOIN vthr t USING (doc_id, frame_idx)),
      vsig AS (
        SELECT doc_id, frame_idx,
             $bandSums
        FROM vbits GROUP BY 1, 2),
      vkeyed0 AS (
        SELECT doc_id, frame_idx, b0, b1, b2, b3, c AS band_idx,
               $bandCase AS band
        FROM vsig, range(4) r(c)),
      vkeyed AS (
        SELECT * FROM (
          SELECT *, count(*) OVER (PARTITION BY band_idx, band) AS bn
          FROM vkeyed0)
        WHERE bn <= ${graft.Settings.multimodal.maxBandBucket}),
      vfpairs AS (
        SELECT DISTINCT a.doc_id AS d1, a.frame_idx AS f1,
               b.doc_id AS d2, b.frame_idx AS f2,
               CAST($hamming AS INT) AS hamming
        FROM vkeyed a JOIN vkeyed b
          ON a.band_idx = b.band_idx AND a.band = b.band
          AND a.doc_id < b.doc_id),
      vmatch AS (
        SELECT * FROM vfpairs
        WHERE hamming <= ${TextQueries.SimhashRadius}),
      vns AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames
        FROM vsig GROUP BY 1),
      vagg AS (
        SELECT d1, d2,
               CAST(count(*) AS BIGINT) AS n_pair_matches,
               CAST(count(DISTINCT f1) AS BIGINT) AS n_f1_matched,
               CAST(count(DISTINCT f2) AS BIGINT) AS n_f2_matched
        FROM vmatch GROUP BY 1, 2)
      SELECT g.d1, g.d2, g.n_pair_matches, g.n_f1_matched,
             g.n_f2_matched, n1.n_frames AS n_frames_1,
             n2.n_frames AS n_frames_2,
             round(CAST(least(g.n_f1_matched, g.n_f2_matched)
                 AS DOUBLE)
               / least(n1.n_frames, n2.n_frames), 6) AS match_share,
             round(CAST(least(g.n_f1_matched, g.n_f2_matched)
                 AS DOUBLE)
               / least(n1.n_frames, n2.n_frames), 6) >= $minShare
               AS is_dup
      FROM vagg g
      JOIN vns n1 ON n1.doc_id = g.d1
      JOIN vns n2 ON n2.doc_id = g.d2
      ORDER BY d1, d2"""
    }) { (s, dir) =>
      Multimodal.videoDupCandidates(t(s, dir, "documents"),
          step = graft.Settings.multimodal.videoFrameStep,
          maxHamming = TextQueries.SimhashRadius,
          minShare = graft.Settings.multimodal.videoMinShare)
        .orderBy("d1", "d2")
    },

    // AUDIO near-dup fingerprint (Multimodal.audioDupCandidates —
    // the chromaprint shape over the WAV decode seam's sample
    // stream, completing the perceptual-dup family's audio
    // modality): 17 time frames, 4 lag-filterbank band energies per
    // frame (mean |x[i] − x[i+2^b]| — Haar-style time-frequency in
    // place of the FFT: libm-free, exact integer sums, one IEEE
    // division), chromaprint's spectral-FLUX bit rule between
    // consecutive frames (empty frames read 0), 64 bits packed so
    // each 16-bit LSH band is one spectral band's flux sequence,
    // then the phash banding + exact-hamming verify. Observability
    // form (pairs + hamming + is_dup); planted-dup recall is
    // spec-locked in MultimodalSpec.
    Q("q_m_audio_dup", Some {
      val bandSums = (0 until 4).map(c =>
        s"""coalesce(sum(CASE WHEN bit AND cell // 16 = $c
               THEN (CAST(1 AS BIGINT) << (cell % 16)) ELSE 0 END), 0)
               AS b$c""").mkString(",\n             ")
      val bandCase = (0 until 4).map(c => s"WHEN $c THEN b$c")
        .mkString("CASE c ", " ", " END")
      val hamming = (0 until 4).map(c =>
        s"bit_count(xor(a.b$c, b.b$c))").mkString(" + ")
      s"""
      WITH achars AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents),
      alagd AS (
        SELECT x.doc_id,
               CAST(floor(CAST(x.i AS DOUBLE) * 17 / x.n) AS INT) AS f,
               bb.b AS b, abs(x.cv - y.cv) AS d
        FROM achars x
        CROSS JOIN range(4) bb(b)
        JOIN achars y ON y.doc_id = x.doc_id
          AND y.i = x.i + (1 << CAST(bb.b AS INT))),
      aen AS (
        SELECT doc_id, f, b,
               CAST(sum(d) AS DOUBLE) / count(*) AS e
        FROM alagd GROUP BY 1, 2, 3),
      agrid AS (
        SELECT d.doc_id, ff.f, bb.b
        FROM (SELECT DISTINCT doc_id FROM documents) d,
             range(17) ff(f), range(4) bb(b)),
      ag AS (
        SELECT g.doc_id, g.f, g.b, coalesce(e.e, 0.0) AS e
        FROM agrid g LEFT JOIN aen e
          ON e.doc_id = g.doc_id AND e.f = g.f AND e.b = g.b),
      aflux AS (
        SELECT p.doc_id, CAST(p.b * 16 + p.f AS INT) AS cell,
               p.e > q.e AS bit
        FROM ag p JOIN ag q ON q.doc_id = p.doc_id AND q.b = p.b
          AND q.f = p.f + 1),
      asig AS (
        SELECT doc_id,
             $bandSums
        FROM aflux GROUP BY 1),
      akeyed0 AS (
        SELECT doc_id, b0, b1, b2, b3, c AS band_idx,
               $bandCase AS band
        FROM asig, range(4) r(c)),
      akeyed AS (
        SELECT * FROM (
          SELECT *, count(*) OVER (PARTITION BY band_idx, band) AS bn
          FROM akeyed0)
        WHERE bn <= ${graft.Settings.multimodal.maxBandBucket}),
      apairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               CAST($hamming AS INT) AS hamming
        FROM akeyed a JOIN akeyed b
          ON a.band_idx = b.band_idx AND a.band = b.band
          AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming,
             hamming <= ${TextQueries.SimhashRadius} AS is_dup
      FROM apairs
      ORDER BY d1, d2"""
    }) { (s, dir) =>
      Multimodal.audioDupCandidates(t(s, dir, "documents"),
          maxHamming = TextQueries.SimhashRadius)
        .orderBy("d1", "d2")
    },

    // Media RESIZE kernel (Multimodal.resizeGrid): block-mean
    // downsample of the decoded intensity stream to a fixed 64-cell
    // grid — the standalone form of the aHash's "8×8 resize" step
    // (q_m_phash_dup consumes this exact frame) and the per-media
    // feature-extraction shape a vision pipeline's preprocessing
    // runs. Exact integer sums / one IEEE division per cell, so the
    // grid values hash bit-for-bit.
    Q("q_m_resize_grid", Some("""
      WITH chars AS (
        SELECT doc_id, len(text) AS n,
               generate_subscripts(string_split(text, ''), 1) - 1 AS i,
               unicode(unnest(string_split(text, ''))) AS cv
        FROM documents)
      SELECT doc_id,
             CAST(floor(CAST(i AS DOUBLE) * 64 / n) AS INT) AS cell,
             round(CAST(sum(cv) AS DOUBLE) / count(*), 9) AS gv
      FROM chars GROUP BY 1, 2 ORDER BY doc_id, cell""")) { (s, dir) =>
      Multimodal.resizeGrid(t(s, dir, "documents"), nCells = 64)
        .select(col("doc_id"), col("cell"), round(col("gv"), 9).as("gv"))
        .orderBy("doc_id", "cell")
    },

    // Batched partition-wise extraction (mapInPandas-shaped). The stub
    // checksum is a deterministic byte fold, so it oracles as a character
    // code-point fold (documents are ASCII → bytes ≡ code points).
    Q("q_m_batch_features", Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeaturesBatched(
          Multimodal.withPayload(t(s, dir, "documents")), batchSize = 64)
        .orderBy("doc_id")
    }
  )
}
