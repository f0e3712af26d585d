package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication operators: exact (content-hash), n-gram Jaccard
  * with frequency pruning, MinHash+LSH banding, SimHash+chunk blocking.
  *
  * Everything here is candidate-pair generation via equi-joins on derived
  * keys — never a cross product — so each operator is one shuffle on the
  * blocking key and scales linearly in corpus size (hot keys are dropped by
  * the frequency filter, the classic guard against quadratic blowup on
  * boilerplate shingles).
  */
object Dedup {
  import TextOps._

  /** Exact duplicate detection: md5 content fingerprint; the lowest doc_id
    * in each group is the canonical keeper. */
  def exactDups(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .withColumn("dup_n", count(lit(1)).over(w))
      .withColumn("keep_id", min("doc_id").over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
  }

  /** (doc_id, shingle) exploded distinct word-n-gram table. */
  def shingleTable(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("sh"))

  /** Frequency-pruned n-gram Jaccard candidate pairs: shingles occurring in
    * more than `maxFreq` docs are dropped (boilerplate guard), remaining
    * shared shingles produce candidate pairs, similarity =
    * |shared| / (|A| + |B| - |shared|) over the doc's full shingle sets. */
  def jaccardPairs(docs: DataFrame, n: Int, maxFreq: Int,
      minJaccard: Double): DataFrame = {
    val sh = graft.ops.CacheReg.cached(shingleTable(docs, n))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // The count-only frequency pass stays first (its combine-tree
    // partials are skew-immune — a boilerplate gram in 10^8 docs never
    // builds a 10^8-element buffer), and the prune join drops hot
    // grams BEFORE any holder list exists. The pair SELF-join is what
    // disappears: the pruned frame (already hash-partitioned by sh
    // from the join) groups in place into ≤maxFreq-element holder
    // lists, and pairs expand map-side. Fanout stays
    // ≤ maxFreq·(maxFreq-1)/2 per shingle.
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("freq"))
      .filter(col("freq").between(2, maxFreq))
    val holders = sh.join(rare.select("sh"), Seq("sh"))
      .groupBy("sh").agg(collect_list(col("doc_id")).as("ds"))
    val arr = sort_array(col("ds"))
    val shared = holders
      .select(explode(flatten(transform(arr, (a, i) =>
        transform(slice(arr, i + lit(2), size(arr)), b =>
          struct(a.as("d1"), b.as("d2")))))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.select(col("doc_id").as("d1"), col("n_sh").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n_sh").as("n2")), Seq("d2"))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (col("n1") + col("n2") - col("inter")), 9))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "inter", "n1", "n2", "jaccard")
  }

  /** MinHash signature per doc: min over shingle hashes of the k fixed
    * affine permutations (TextOps.MinHashParams). */
  def minhashSignatures(docs: DataFrame, n: Int): DataFrame = {
    val h = shingleTable(docs, n).withColumn("h2", hashMod(col("sh")))
    val aggs = MinHashParams.zipWithIndex.map { case ((a, b), k) =>
      minhashCol(col("h2"), a, b).as(s"m$k")
    }
    h.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Derive the (bands, rowsPerBand) LSH layout for a k-component
    * MinHash family from the similarity threshold via the S-curve
    * P(candidate | s) = 1 − (1 − s^r)^b, whose transition sits near
    * s* ≈ (1/b)^(1/r) (MMDS ch. 3). Chooses the LARGEST r — the
    * precision-greediest banding, fewest incidental candidates —
    * whose curve threshold still sits at or below the target
    * similarity, falling back to single-row bands (max recall) when
    * even r = 1 transitions above it. E.g. k = 8: thresholds are
    * 0.125 / 0.5 / 0.84 / 1.0 for r = 1/2/4/8, so a near-dup
    * threshold of 0.04 derives (8, 1) where the old fixed (4, 2)
    * layout was tuned for s ≈ 0.5 (measured at sf0.01: candidate
    * recall 0.735 → 0.794 over the ≥-threshold truth, 1.0 on the
    * planted ≥ 0.5 near-dups either way). */
  def deriveBanding(nHashes: Int, minJaccard: Double): (Int, Int) = {
    val layouts = (1 to nHashes).filter(nHashes % _ == 0)
      .map(r => (nHashes / r, r))
    layouts
      .filter { case (b, r) => math.pow(1.0 / b, 1.0 / r) <= minJaccard }
      .sortBy(-_._2).headOption.getOrElse((nHashes, 1))
  }

  /** LSH banding over the minhash signature (bands of `rowsPerBand`),
    * candidate pairs sharing any band key, with estimated similarity =
    * fraction of agreeing minhash components. Size `rowsPerBand` from
    * the operating threshold with [[deriveBanding]]. */
  def minhashLshPairs(docs: DataFrame, n: Int,
      rowsPerBand: Int = 2): DataFrame =
    minhashLshPairsFromSigs(
      graft.ops.CacheReg.cached(minhashSignatures(docs, n)),
      rowsPerBand)

  /** [[minhashLshPairs]] over a precomputed signature frame — at corpus
    * scale the signatures are a stored per-doc table (one row per doc,
    * computed once per ingestion), so every dedup pass starts here
    * instead of re-sharding the corpus into shingles. */
  def minhashLshPairsFromSigs(sigs: DataFrame,
      rowsPerBand: Int = 2): DataFrame = {
    val k = MinHashParams.size
    val bands = bandTable(sigs, rowsPerBand)
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val agree = (0 until k).map(j =>
      when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0)).reduce(_ + _)
    pairs.join(sigs.as("a"), col("d1") === col("a.doc_id"))
      .join(sigs.as("b"), col("d2") === col("b.doc_id"))
      .select(col("d1"), col("d2"),
        (agree.cast("double") / k).as("est_sim"))
  }

  /** Exact edit-distance verification of near-dup CANDIDATE pairs —
    * the refinement stage after banding: LSH recalls a candidate set,
    * and the expensive true metric is paid only on |pairs| rows, never
    * the n² corpus. Levenshtein is O(len²) per pair, so it runs on a
    * bounded `prefixLen`-char prefix (the production pattern for
    * titles / headers / short fields); `verified` = distance ≤
    * `maxDist`. Join shape: two broadcast-able equi-joins from the
    * pair list into the per-doc prefix projection. */
  def editDistanceVerify(pairs: DataFrame, docs: DataFrame,
      prefixLen: Int, maxDist: Int): DataFrame = {
    val pfx = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("p"))
    pairs.select(col("d1"), col("d2"))
      .join(pfx.select(col("doc_id").as("d1"), col("p").as("p1")),
        Seq("d1"))
      .join(pfx.select(col("doc_id").as("d2"), col("p").as("p2")),
        Seq("d2"))
      .select(col("d1"), col("d2"),
        levenshtein(col("p1"), col("p2")).as("lev"),
        length(col("p1")).as("len1"), length(col("p2")).as("len2"))
      .withColumn("verified",
        when(col("lev") <= maxDist, 1).otherwise(0))
  }

  /** LSH band-key table (doc_id, band_idx, key) over a minhash
    * signature frame — the join axis of both self-dedup and
    * incremental (batch-vs-index) dedup. */
  private def bandTable(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val nBands = MinHashParams.size / rowsPerBand
    val bandKey = (band: Int) => concat_ws("_",
      (band * rowsPerBand until (band + 1) * rowsPerBand)
        .map(j => col(s"m$j")): _*)
    sigs.select(col("doc_id"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band_idx"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_idx"), col("bk.key"))
  }

  /** Incremental corpus dedup: classify each doc of a new `batch`
    * against an existing `index` corpus (both (doc_id, text)) as
    * `exact_dup` (identical md5 fingerprint; match = lowest-id index
    * holder), `near_dup` (shares a MinHash LSH band with an index doc at
    * estimated similarity ≥ `minSim`; match = highest-similarity index
    * doc, ties to the lowest id), or `novel`.
    *
    * This is the continuous-ingestion shape: at 100 TB you never
    * re-dedup the whole corpus per delivery — the index side's
    * fingerprints and signatures are a stored table (computed once,
    * appended per batch), and each new batch costs one fingerprint
    * equi-join plus one band-key equi-join of batch-side bands against
    * the index, both shuffling only on derived keys. Batch×batch pairs
    * are deliberately out of scope here (run [[minhashLshPairs]] within
    * the batch for that); the hot-band guard is the same pigeonhole
    * argument as self-dedup since band keys with many index holders
    * only multiply candidates linearly in the batch's matches. */
  def incrementalClassify(index: DataFrame, batch: DataFrame, n: Int,
      minSim: Double, rowsPerBand: Int = 2): DataFrame =
    incrementalClassifyFromSigs(index, batch,
      minhashSignatures(index, n), minhashSignatures(batch, n),
      minSim, rowsPerBand)

  /** [[incrementalClassify]] over precomputed signature frames — the
    * index side's signatures are the stored artifact at scale, and the
    * batch side's can be appended to it after classification. */
  def incrementalClassifyFromSigs(index: DataFrame, batch: DataFrame,
      sigI: DataFrame, sigB: DataFrame, minSim: Double,
      rowsPerBand: Int = 2): DataFrame = {
    val k = MinHashParams.size
    val fp = (d: DataFrame) => d.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
    val exact = fp(batch).join(
        fp(index).groupBy("fp").agg(min("doc_id").as("ex_id")),
        Seq("fp"), "left")
      .select(col("doc_id"), col("ex_id"))
    val cand = bandTable(sigB, rowsPerBand).as("a")
      .join(bandTable(sigI, rowsPerBand).as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.key") === col("b.key"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val agree = (0 until k).map(j =>
      when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0)).reduce(_ + _)
    val sims = cand.join(sigB.as("a"), col("d1") === col("a.doc_id"))
      .join(sigI.as("b"), col("d2") === col("b.doc_id"))
      .select(col("d1"), col("d2"), (agree.cast("double") / k).as("est"))
      .filter(col("est") >= minSim)
    val best = sims.withColumn("rn", row_number().over(
        Window.partitionBy("d1").orderBy(col("est").desc, col("d2"))))
      .filter(col("rn") === 1)
      .select(col("d1").as("doc_id"), col("d2").as("nr_id"),
        col("est"))
    batch.select("doc_id").join(exact, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ex_id").isNotNull, lit("exact_dup"))
          .when(col("nr_id").isNotNull, lit("near_dup"))
          .otherwise(lit("novel")).as("verdict"),
        when(col("ex_id").isNotNull, col("ex_id"))
          .otherwise(col("nr_id")).as("match_id"),
        when(col("ex_id").isNull, col("est")).as("est_sim"))
  }

  /** Distributed connected components over a near-dup pair graph via
    * iterative min-label ("HashMin") propagation: every doc starts as
    * its own component; each round every doc adopts the minimum label
    * among itself and its neighbors. One shuffle per round, converges in
    * O(component diameter) rounds — duplicate clusters are shallow, so
    * this is 2-4 rounds in practice — with an early stop on a
    * changed-count action. This is how you turn pairwise dedup
    * candidates into keeper/duplicate assignments at corpus scale
    * without ever collecting the graph.
    *
    * Returns one row per doc in `docs`: (doc_id, comp_id, cluster_size,
    * is_canonical) where comp_id is the component's minimum doc_id. */
  def connectedComponents(docs: DataFrame, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .distinct()
    graft.ops.CacheReg.cached(edges)
    // localCheckpoint after every round: the new label frame references
    // the previous one TWICE (neighbor-min join + pointer-jump join), so
    // without lineage truncation the logical plan doubles per round and
    // Catalyst analysis goes exponential — the classic iterative-Spark
    // trap. Checkpointing keeps each round's plan O(1).
    var labels = docs.select(col("doc_id"))
      .withColumn("comp", col("doc_id")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbr = edges
        .join(labels.select(col("doc_id").as("b"), col("comp")), Seq("b"))
        .groupBy("a").agg(min("comp").as("nbr_min"))
      val stepped = labels
        .join(nbr.select(col("a").as("doc_id"), col("nbr_min")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("comp").as("comp0"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp")))
            .as("comp1"))
      // pointer jump: adopt the label's own label (comp(comp(d))) —
      // labels are monotone non-increasing, so this halves the distance
      // a min has to travel and turns O(diameter) rounds into O(log d)
      val next = stepped
        .join(labels.select(col("doc_id").as("comp1"),
          col("comp").as("parent")), Seq("comp1"), "left")
        .select(col("doc_id"),
          least(col("comp1"), coalesce(col("parent"), col("comp1")))
            .as("comp"),
          col("comp0"))
        .withColumn("chg", col("comp") < col("comp0"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select("doc_id", "comp")
      it += 1
    }
    graft.ops.CacheReg.release(edges)
    val w = Window.partitionBy("comp")
    labels
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("comp").as("comp_id"),
        col("cluster_size"),
        (col("doc_id") === col("comp")).as("is_canonical"))
  }

  /** Positional k-gram table (doc_id, pos, gram): the k-token word gram
    * starting at 0-based token position `pos`. Unlike [[shingleTable]]
    * (distinct set semantics for Jaccard), positions are kept — this is
    * the index exact-substring dedup marks spans in. Docs shorter than
    * k tokens contribute nothing. Map-only (one projection + explode),
    * ~n_tokens rows per doc. */
  def gramTable(docs: DataFrame, k: Int): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"),
      posexplode(when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
        .otherwise(array().cast("array<string>")))
        .as(Seq("pos", "gram")))
  }

  /** Exact substring dedup, position level (the ExactSubstr method of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): every token position covered by a k-gram that
    * already occurred EARLIER in corpus order — (doc_id, pos)
    * lexicographic, so exactly one occurrence of each duplicated
    * k-gram survives, within-doc repetition included. Returns the
    * distinct covered (doc_id, tp) token positions.
    *
    * Scale shape — this is the one dedup family member with NO pair
    * join at all: cost is linear in corpus tokens. The first-occurrence
    * keeper is a groupBy `min(struct(doc_id, pos))` (map-side combined,
    * immune to hot-gram skew — a boilerplate gram repeated 10^8 times
    * is still one combine tree, never one giant window partition), the
    * non-keepers come back via one equi-join on the gram, and the k×
    * position expansion is bounded by duplicate occurrences. No
    * frequency cap is needed because nothing here is quadratic. */
  def duplicateCovered(docs: DataFrame, k: Int): DataFrame = {
    // keeper + occurrence count via ONE gram-partitioned window pass:
    // the former groupBy(gram) + join-back shuffled the heavy gram-
    // string stream twice (once into the aggregate, once into the
    // join); the window computes min(struct) and count on the same
    // single exchange (guide §2.4) — identical keeper rule, identical
    // rows
    val g = gramTable(docs, k)
    val w = Window.partitionBy("gram")
    g.withColumn("keep", min(struct(col("doc_id"), col("pos"))).over(w))
      .withColumn("occ", count(lit(1)).over(w))
      .filter(col("occ") > 1
        && !(col("doc_id") === col("keep.doc_id")
          && col("pos") === col("keep.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .distinct()
  }

  /** Token positions in `docs` covered by any k-gram that occurs
    * ANYWHERE in `ref` — exact-substring decontamination (Lee et al.
    * 2022 §4 run against an eval suite instead of the corpus itself):
    * unlike [[duplicateCovered]] there is no first-occurrence keeper —
    * every benchmark-overlapping position is contamination. Join
    * shape: corpus grams ⋈ distinct reference grams; a REAL eval
    * suite is a fixed few-MB gram set that AQE broadcasts, so the
    * corpus streams through map-side. */
  def coveredByReference(docs: DataFrame, ref: DataFrame,
      k: Int): DataFrame = {
    val refGrams = gramTable(ref, k).select("gram").distinct()
    gramTable(docs, k).join(refGrams, Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .distinct()
  }

  /** Incremental exact-substring dedup: covered token positions of a
    * NEW batch against a standing corpus whose grams were all ingested
    * earlier — the index side is never re-scanned for its own
    * duplicates and no index positions are re-emitted. Corpus order is
    * ingestion order (index strictly before batch), so a batch
    * position is covered iff its k-gram occurred in the index
    * ([[coveredByReference]] — every batch occurrence is a repeat) OR
    * earlier within the batch itself ([[duplicateCovered]] on the
    * batch alone). DedupSpec locks ≡ the full-union recompute with
    * batch ids relabeled above the index. Cost: linear in BATCH
    * tokens + one gram join against the index. */
  def duplicateCoveredIncremental(index: DataFrame, batch: DataFrame,
      k: Int): DataFrame =
    coveredByReference(batch, index, k)
      .union(duplicateCovered(batch, k))
      .distinct()

  /** Maximal duplicated token spans per doc over [[duplicateCovered]]
    * positions: consecutive covered positions merge into one
    * (span_start, span_end, span_len) row — the classic
    * gaps-and-islands pass, windowed PER DOC (partition size bounded
    * by doc token count, never corpus size). `covered` is exposed as a
    * parameter so the span and strip queries share one stage. */
  def duplicateSpans(covered: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("tp")
    covered
      .withColumn("brk",
        when(col("tp") - lag("tp", 1).over(w) === 1, 0).otherwise(1))
      .withColumn("grp", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("tp").as("span_start"), max("tp").as("span_end"),
        count(lit(1)).as("span_len"))
      .select("doc_id", "span_start", "span_end", "span_len")
  }

  /** Strip the duplicated positions out of each doc: per-doc counts +
    * the cleaned text with covered tokens removed (first corpus
    * occurrence kept — see [[duplicateCovered]]). The covered set rolls
    * up to ONE array per doc (bounded by doc length), then the strip is
    * a map-only positional filter — no range join. A fully-duplicated
    * doc strips to the empty string. */
  def substringStrip(docs: DataFrame, covered: DataFrame): DataFrame = {
    val cov = covered.groupBy("doc_id")
      .agg(sort_array(collect_list(col("tp"))).as("cov"))
    val toks = tokens(col("text"))
    // kept positions = array_except(all positions, covered) — a hash
    // set probe per position, O(n_tokens + n_covered) per doc; the
    // earlier filter(toks, !array_contains(cov, i)) scanned the covered
    // array per TOKEN, going quadratic on exactly the long heavily-
    // duplicated docs this operator targets (the substr O(len²) shape).
    // size(toks) ≥ 1 always (split of "" is [""]), so the position
    // sequence never counts down.
    val keptPos = array_except(
      sequence(lit(0), size(toks) - 1), col("cov"))
    docs.join(cov, Seq("doc_id"), "left")
      .withColumn("cov",
        coalesce(col("cov"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(col("cov")).cast("long").as("n_dup_tokens"),
        round(size(col("cov")).cast("double") / size(toks), 9)
          .as("dup_frac"),
        array_join(transform(keptPos,
          p => element_at(toks, p + 1)), " ").as("clean_text"))
  }

  /** Derive the SimHash blocking layout from the hamming radius — the
    * SimHash counterpart of [[deriveBanding]] (one derivation site
    * read by both the engine and the DuckDB oracle, instead of a
    * pinned 4×16 with the pigeonhole bound asserted by hand).
    *
    * Returns (nBands, quartersPerBand): nBands equal-width blocking
    * bands, each the concatenation of quartersPerBand physical 16-bit
    * signature quarters (b0..b3). Pigeonhole: a pair at hamming ≤ r
    * differs in at most r bands, so with nBands ≥ r + 1 at least one
    * band agrees — banded candidate generation has PERFECT recall at
    * the radius. Precision direction: among the layouts whose
    * guarantee holds, the FEWEST (widest) bands win — a 32-bit band
    * collision is far rarer than a 16-bit one, so incidental
    * candidates are minimized (the same greedy direction
    * [[deriveBanding]]'s largest-r rule takes). Feasible band counts
    * are the equal groupings of the 4 physical quarters: 1×64, 2×32,
    * 4×16 — so r = 0 derives one exact 64-bit key, r = 1 two 32-bit
    * bands, r ∈ {2, 3} the 4×16 layout (r = 2 skips the infeasible
    * 3-band split; 4 > 2 still satisfies the pigeonhole). Radii ≥ 4
    * would need sub-16-bit bands (the near-quadratic key-space the
    * 4×16 design replaced) and are rejected. */
  def deriveSimhashBanding(maxHamming: Int): (Int, Int) = {
    require(maxHamming >= 0 && maxHamming < SimHashBands,
      s"banded blocking only guarantees recall for hamming < $SimHashBands")
    val nBands = Seq(1, 2, 4).find(_ > maxHamming).get
    (nBands, SimHashBands / nBands)
  }

  /** SimHash near-dup pairs: 64-bit signatures as four physical
    * 16-bit quarters, blocked on (band_idx, band_key) at the layout
    * [[deriveSimhashBanding]] derives from the radius — per-key
    * bucket sizes stay tiny at corpus scale (≥ 2^16 key space), the
    * pigeonhole recall guarantee holds by construction, and the exact
    * hamming filter then trims band-collision false positives. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val (nBands, qPer) = deriveSimhashBanding(maxHamming)
    val sigs = graft.ops.CacheReg.cached(
      simhash64(docs, col("doc_id"), col("text")))
    val bandCols = (0 until SimHashBands).map(c => col(s"b$c"))
    def bandKey(g: Int) = concat_ws("_",
      (g * qPer until (g + 1) * qPer).map(c => col(s"b$c")): _*)
    val keyed = sigs.select(col("doc_id") +: bandCols :+
      explode(array((0 until nBands).map(g =>
        struct(lit(g).as("band_idx"), bandKey(g).as("band"))): _*))
        .as("bk"): _*)
      .select(col("doc_id") +: bandCols :+ col("bk.band_idx")
        :+ col("bk.band"): _*)
    val hamming = (0 until SimHashBands).map(c =>
      bit_count(col(s"a.b$c").bitwiseXOR(col(s"b.b$c")))).reduce(_ + _)
    keyed.as("a").join(keyed.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band") === col("b.band")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        hamming.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
