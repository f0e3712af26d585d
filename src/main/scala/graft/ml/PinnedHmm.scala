package graft.ml

/** Pinned 3-state, 1-feature Gaussian HMM — the stored-model-artifact
  * decode contract (ref: src/mf_etl/research_hmm/decode.py:146-156
  * decodes against a model loaded from disk; the reference pins
  * `random_state` everywhere — configs/settings.yaml — so a decode
  * against a given model is a deterministic dynamic program).
  *
  * Pinning the model as literals makes the DECODE half of the HMM
  * oracle-checkable end-to-end: given fixed params, Viterbi is pure
  * arithmetic — the emission log-density constant log(2πv) is
  * precomputed HERE (once, on the driver) and interpolated into the
  * DuckDB oracle SQL as the exact shortest-round-trip decimal of the
  * Java double, so neither engine calls a data-dependent `log` inside
  * the recursion and the delta/argmax arithmetic is bit-identical by
  * construction (IEEE +,-,*,/ only, same association order).
  *
  * The params are plausible for the events.value series (low / typical
  * / tail spender regimes) but their quality is irrelevant to the
  * contract — any fixed model decodes deterministically. The FIT path
  * stays exercised by q_hmm_sweep and HmmSpec.
  */
object PinnedHmm {

  val K = 3

  /** State means over the single `value` feature. */
  val Mu: Array[Double] = Array(10.0, 50.0, 200.0)

  /** State variances (diagonal, d=1). */
  val V: Array[Double] = Array(400.0, 2500.0, 40000.0)

  /** Uniform initial distribution, log space. */
  val LogPi: Array[Double] = Array.fill(K)(math.log(1.0 / K))

  /** Sticky transition matrix: stay 0.8, move 0.1 each. */
  val LogA: Array[Array[Double]] = Array.tabulate(K, K)((p, s) =>
    if (p == s) math.log(0.8) else math.log(0.1))

  /** Precomputed emission constants log(2π·v_s) — the only libm call in
    * logB, hoisted out so the decode recursion is libm-free. */
  val Lc: Array[Double] = V.map(v => math.log(2 * math.Pi * v))

  /** The pinned model in the decoder's shape. Hmm.viterbi recomputes
    * log(2πv) internally via math.log — same JVM call as [[Lc]], so the
    * values are identical to what the oracle SQL interpolates. */
  val model: Hmm.Model =
    Hmm.Model(K, 1, LogPi, LogA, Mu.map(Array(_)), V.map(Array(_)))
}
