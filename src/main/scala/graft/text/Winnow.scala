package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document fingerprinting by WINNOWING (Schleimer, Wilkerson & Aiken
  * 2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
  * the MOSS algorithm): every k-byte-gram gets a polynomial rolling
  * hash ([[graft.functions.RollingHash]], one O(len) pass per doc),
  * then each sliding window of `w` consecutive gram hashes selects its
  * MINIMUM (ties → RIGHTMOST position, the paper's "robust winnowing"
  * rule), and the distinct selections are the document's fingerprints.
  *
  * The winnowing guarantee: any verbatim byte match of length
  * ≥ w + k − 1 between two documents shares at least one fingerprint,
  * while expected fingerprint density is only 2/(w+1) of positions —
  * fingerprint sets are ~an order of magnitude smaller than gram sets,
  * which is what the MinHash/Jaccard families cannot give you when you
  * need POSITIONAL matches back (plagiarism spans, license-text
  * detection, boilerplate localization).
  *
  * Scale shape: hashing is map-only; the window-min runs PER DOC
  * (partition bounded by doc length); pair generation joins on the
  * fingerprint value with the family's standard hot-key prune + ≤cap
  * holder-list map-side expansion — never a self-join, never
  * quadratic. */
object Winnow {

  /** Per-doc winnowed fingerprints: (doc_id, fp_pos, h) — the gram
    * position whose hash each full window selected, distinct. Docs
    * shorter than k + w − 1 bytes have no full window and contribute
    * nothing (the guarantee needs a full window anyway). */
  def fingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val hashes = docs.select(col("doc_id"),
      posexplode(graft.functions.RollingHashOps
        .rollingHash(col("text"), k)).as(Seq("pos", "h")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    // min(struct(h, -pos)) IS robust winnowing: lexicographic min takes
    // the smallest hash, then the smallest -pos = the RIGHTMOST of the
    // tied positions
    hashes
      .withColumn("sel",
        min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .filter(col("pos") >= w - 1)
      .select(col("doc_id"), (-col("sel.np")).as("fp_pos"),
        col("sel.h").as("h"))
      .distinct()
  }

  /** Fingerprint-overlap candidate pairs: docs sharing ≥ `minShared`
    * winnowed fingerprint VALUES, with set sizes and containment.
    * Fingerprints held by more than `maxFreq` docs are boilerplate and
    * are pruned (the jaccard maxFreq guard); surviving holder lists
    * (≤ maxFreq) expand to pairs map-side — the same no-self-join
    * shape as Dedup.jaccardPairs. */
  def fingerprintPairs(docs: DataFrame, k: Int, w: Int, maxFreq: Int,
      minShared: Int): DataFrame =
    fingerprintPairsFrom(fingerprints(docs, k, w), maxFreq, minShared)

  /** Positional ALIGNMENT of a candidate pair set — the payoff
    * fingerprints-with-positions buy over set-semantics dedup: every
    * shared fingerprint VALUE joins back both docs' positions, and
    * the alignment OFFSET (pos1 − pos2) groups them — matches from
    * one contiguous verbatim span share an offset (both sides' gram
    * positions advance together), so the per-(pair, offset) match
    * count is the span evidence a plagiarism/license reviewer reads.
    * Cost: the fingerprint frames join on h only for docs already in
    * `pairs` (candidate-bounded, like every verify stage in the
    * family). Returns (d1, d2, align_offset, n_matches,
    * min_pos1, max_pos1). */
  def alignments(pairs: DataFrame, fps: DataFrame): DataFrame = {
    val a = fps.select(col("doc_id").as("d1"),
      col("fp_pos").as("pos1"), col("h"))
    val b = fps.select(col("doc_id").as("d2"),
      col("fp_pos").as("pos2"), col("h"))
    pairs.select("d1", "d2")
      .join(a, Seq("d1")).join(b, Seq("d2", "h"))
      .groupBy(col("d1"), col("d2"),
        (col("pos1") - col("pos2")).as("align_offset"))
      .agg(count(lit(1)).as("n_matches"),
        min("pos1").as("min_pos1"), max("pos1").as("max_pos1"))
  }

  /** SEGMENTED alignment spans: like [[alignments]], but matches
    * within one (d1, d2, offset) group are split into contiguity
    * SEGMENTS before taking extents. Rationale: two disjoint shared
    * blocks can sit at the same relative offset (the templated-doc
    * case — identical header and footer around equal-length unique
    * middles); min/max over the whole offset group would bridge them
    * into one span and swallow the unique text between. Within a
    * contiguous verbatim run, winnowing selects a fingerprint at
    * least once per w-gram window, so consecutive shared fingerprint
    * positions are ≤ w grams (< w + k bytes) apart — a gap of more
    * than w + k byte positions between consecutive same-offset
    * matches cannot be fingerprint-silent verbatim text and marks a
    * segment boundary. Returns one row per (d1, d2, align_offset,
    * seg) with that segment's n_matches / min_pos1 / max_pos1. */
  def alignmentSegments(pairs: DataFrame, fps: DataFrame,
      w: Int, k: Int): DataFrame = {
    val a = fps.select(col("doc_id").as("d1"),
      col("fp_pos").as("pos1"), col("h"))
    val b = fps.select(col("doc_id").as("d2"),
      col("fp_pos").as("pos2"), col("h"))
    val matches = pairs.select("d1", "d2")
      .join(a, Seq("d1")).join(b, Seq("d2", "h"))
      .select(col("d1"), col("d2"),
        (col("pos1") - col("pos2")).as("align_offset"), col("pos1"))
    val wOff = Window.partitionBy("d1", "d2", "align_offset")
      .orderBy("pos1")
    matches
      .withColumn("brk",
        when(col("pos1") - lag(col("pos1"), 1).over(wOff) > w + k, 1)
          .otherwise(0))
      .withColumn("seg", sum(col("brk"))
        .over(wOff.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("d1", "d2", "align_offset", "seg")
      .agg(count(lit(1)).as("n_matches"),
        min("pos1").as("min_pos1"), max("pos1").as("max_pos1"))
  }

  /** Winnow-driven span STRIPPING — the curation consumer of
    * [[alignmentSegments]] (the counterpart of Dedup.substringStrip
    * for boilerplate/license spans localized by fingerprint
    * alignment): strip from the LATER doc of each candidate pair
    * (keeper convention: d1 < d2 keeps d1) every aligned SEGMENT
    * carrying at least `minMatches` same-offset fingerprint matches
    * (a single shared fingerprint at an offset is collision-grade
    * evidence; a real contiguous span emits one ~every (w+1)/2
    * positions). Segmentation (gap > w + k splits — see
    * [[alignmentSegments]]) keeps two disjoint shared blocks at the
    * same offset from bridging into one span that would delete the
    * unique text between them. The span in the stripped doc's char
    * coordinates is [min_pos1 − offset, max_pos1 − offset + k − 1] —
    * a fingerprint at pos covers its k-gram [pos, pos+k); both
    * bounds are real fingerprint positions of that doc, so the range
    * is in-bounds by construction. Covered positions merge to
    * islands per doc (explode is O(covered chars), bounded by doc
    * length); the strip is a fold over the ≤ islands+1 KEPT
    * segments — O(segments) substr calls, never per-char work.
    * Returns one row per corpus doc: `(doc_id, n_chars,
    * covered_chars, n_spans, covered_frac, clean_text)`;
    * covered_frac is null for an empty doc (0/0 guarded, the
    * family's ratio convention). */
  def stripSpans(docs: DataFrame, pairs: DataFrame, fps: DataFrame,
      k: Int, w: Int, minMatches: Int): DataFrame = {
    val spans = alignmentSegments(pairs, fps, w, k)
      .filter(col("n_matches") >= minMatches)
      .select(col("d2").as("doc_id"),
        (col("min_pos1") - col("align_offset")).as("s"),
        (col("max_pos1") - col("align_offset") + (k - 1)).as("e"))
    val covPos = spans.select(col("doc_id"),
      explode(sequence(col("s"), col("e"))).as("cp")).distinct()
    val wIsl = Window.partitionBy("doc_id").orderBy("cp")
    val islands = covPos
      .withColumn("grp", col("cp") - row_number().over(wIsl))
      .groupBy("doc_id", "grp")
      .agg(min("cp").as("cs"), max("cp").as("ce"))
    val perDoc = islands.groupBy("doc_id").agg(
      sort_array(collect_list(struct(col("cs"), col("ce")))).as("isl"),
      sum(col("ce") - col("cs") + 1).cast("long").as("covered_chars"),
      count(lit(1)).as("n_spans"))
    val isl = coalesce(col("isl"),
      array().cast("array<struct<cs:int,ce:int>>"))
    val n = length(col("text"))
    // fold over islands: acc = text up to the current island's start,
    // p = first position not yet emitted; finish emits the tail
    val stripped = aggregate(isl,
      struct(lit(0).as("p"), lit("").as("acc")),
      (st, iv) => struct(
        (iv.getField("ce") + 1).as("p"),
        concat(st.getField("acc"), col("text").substr(
          st.getField("p") + 1,
          iv.getField("cs") - st.getField("p"))).as("acc")),
      st => concat(st.getField("acc"),
        col("text").substr(st.getField("p") + 1, n - st.getField("p"))))
    docs.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        n.cast("long").as("n_chars"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        round(when(n > 0,
          coalesce(col("covered_chars"), lit(0L)).cast("double") / n),
          9).as("covered_frac"),
        stripped.as("clean_text"))
  }

  /** [[fingerprintPairs]] over a precomputed fingerprint frame (the
    * stored per-doc artifact at corpus scale). */
  def fingerprintPairsFrom(fps: DataFrame, maxFreq: Int,
      minShared: Int): DataFrame = {
    val sets = fps.select("doc_id", "h").distinct()
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val rare = sets.groupBy("h").agg(count(lit(1)).as("freq"))
      .filter(col("freq").between(2, maxFreq))
    val holders = sets.join(rare.select("h"), Seq("h"))
      .groupBy("h").agg(collect_list(col("doc_id")).as("ds"))
    val arr = sort_array(col("ds"))
    val shared = holders
      .select(explode(flatten(transform(arr, (a, i) =>
        transform(slice(arr, i + lit(2), size(arr)), b =>
          struct(a.as("d1"), b.as("d2")))))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    shared
      .join(sizes.select(col("doc_id").as("d1"), col("n_fp").as("n1")),
        Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n_fp").as("n2")),
        Seq("d2"))
      .withColumn("containment",
        round(col("n_shared").cast("double")
          / least(col("n1"), col("n2")), 9))
      .select("d1", "d2", "n_shared", "n1", "n2", "containment")
  }
}
