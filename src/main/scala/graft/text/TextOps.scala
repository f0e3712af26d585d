package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting,
  * shingling, MinHash/LSH and SimHash near-dup signatures.
  *
  * All hashes are *portable*: token/shingle → first 15 hex digits of md5 →
  * int64 (`conv(hex,16,10)`), reduced mod a 31-bit prime. The same
  * arithmetic is expressible in ANSI SQL, so every signature is
  * oracle-checkable and cluster-deterministic (no JVM hashCode, no
  * partition-order dependence).
  */
object TextOps {

  val HashPrime = 1000000007L

  // PII patterns (ref: C4/CCNet-style scrubbing; RE2/Java-portable so
  // the DuckDB oracle runs the identical regexes)
  val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePat = """\d{3}-\d{3}-\d{4}"""
  val Ipv4Pat = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"""

  /** Email/phone/IPv4 occurrence counts, in that order. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    regexp_count(text, lit(EmailPat)),
    regexp_count(text, lit(PhonePat)),
    regexp_count(text, lit(Ipv4Pat)))

  /** Redact all three PII classes with typed placeholders. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      text, EmailPat, "<EMAIL>"),
      PhonePat, "<PHONE>"), Ipv4Pat, "<IP>")

  /** Deterministic 60-bit hash of a string via md5 (portable across
    * engines). */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Hash reduced into [0, HashPrime). */
  def hashMod(c: Column): Column = md5Hash64(c) % HashPrime

  /** The DuckDB twin of [[md5Hash64]] — ONE definition so the
    * portable-hash recipe can never drift between engine and oracle
    * call sites (`e` is a SQL string expression). */
  def hsqlRaw(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  /** The DuckDB twin of [[hashMod]]. */
  def hsqlMod(e: String): String = s"${hsqlRaw(e)} % $HashPrime"

  /** Whitespace tokens: any run of whitespace separates (Java `\s+` ≡
    * RE2 `[[:space:]]+` — the oracle's regexp_split_to_array pattern,
    * identical char class). A single-SPACE split silently fused
    * tab/newline-separated tokens into one, letting grams escape the
    * substring/Jaccard/decontamination families on real corpora (r9
    * verdict watch-item). Leading/trailing whitespace still yields an
    * empty boundary token on both engines (Java split limit -1 ≡
    * DuckDB regexp_split_to_array). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Word n-gram shingles (distinct), space-joined. Requires >= n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    // sub-n-token docs have NO shingles: the oracle's range(len - n + 1)
    // is empty there, but Spark's sequence(0, size - n) would count DOWN
    // through negative indices and error inside slice — guard explicitly
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash permutation parameters (fixed seed — part of the engine's
    * public contract, mirrored into the SQL oracle). */
  val MinHashParams: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (214013L, 2531011L), (134775813L, 1L),
    (22695477L, 1L), (69069L, 362437L), (1664525L, 1013904223L),
    (48271L, 11L), (16807L, 7L))

  /** One minhash value: min over shingle hashes of (a*h + b) mod p. */
  def minhashCol(hashed: Column, a: Long, b: Long): Column =
    min((hashed * a + b) % HashPrime)

  /** 64-bit SimHash, materialized as four 16-bit band values `b0..b3`.
    *
    * Band c's bit j is 1 iff the ±1 vote sum over distinct tokens (by bit
    * j of the band's 16-bit token hash) is positive. All four band hashes
    * are sliced from ONE md5 digest per token (hex chars [4c, 4c+4) —
    * 128 uniform bits cover the 64 needed), so signature computation
    * costs a single md5 pass; the earlier scheme paid four salted md5
    * calls per token because its mod-prime hash had only ~30 uniform
    * bits. Keeping bands as separate small ints avoids signed 64-bit
    * shift arithmetic entirely — every step mirrors into ANSI SQL.
    *
    * Blocking on (band_idx, band_value) gives a `4 · 2^16` key space; by
    * pigeonhole any pair at hamming ≤ 3 agrees on at least one full band,
    * so banded candidate generation has perfect recall at that radius —
    * unlike the previous 16-bit/4-bit-chunk scheme whose 64 total keys
    * went near-quadratic at corpus scale. */
  val SimHashBandBits = 16
  val SimHashBands = 4

  def simhash64(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"),
        explode(array_distinct(tokens(text))).as("tok"))
      .withColumn("md5h", md5(col("tok").cast("binary")))
      .select(col("doc_id") +: (0 until SimHashBands).map(c =>
        conv(substring(col("md5h"), 4 * c + 1, 4), 16, 10)
          .cast("long").as(s"h$c")): _*)
    val bitSums = for (c <- 0 until SimHashBands; j <- 0 until SimHashBandBits)
      yield sum(when(shiftright(col(s"h$c"), j) % 2 === 1, 1).otherwise(-1))
        .as(s"s${c}_$j")
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val bands = (0 until SimHashBands).map { c =>
      (0 until SimHashBandBits).map { j =>
        when(col(s"s${c}_$j") > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _).as(s"b$c")
    }
    sums.select(col("doc_id") +: bands: _*)
  }

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Quality-score battery: token counts, mean token length, stopword and
    * digit ratios, and a weighted quality score in [0,1]. All ratios are
    * integer-count divisions → bit-exact vs the oracle. */
  def qualityFeatures(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks)
    // codegen'd marker count (graft.functions.MarkerCount) — the HOF
    // form size(filter(toks, isin)) is interpreted per token
    val nStop = graft.functions.TokenOps.markerCount(toks, Stopwords)
    val nChars = length(text)
    // Σ token lengths = chars after stripping ALL whitespace (the old
    // nChars − (nTok − 1) arithmetic assumed exactly one space between
    // tokens and broke on tab/newline runs); regexp_replace keeps the
    // whole battery codegen'd
    val meanTokLen =
      length(regexp_replace(text, "\\s", "")).cast("double") / nTok
    val stopRatio = nStop.cast("double") / nTok
    val nDigits = nChars - length(regexp_replace(text, "[0-9]", ""))
    val digitRatio = nDigits.cast("double") / nChars
    val lenScore = least(nChars, lit(400)).cast("double") / 400.0
    val score = round(
      lit(0.4) * lenScore + lit(0.4) * (lit(1.0) - digitRatio)
        + lit(0.2) * least(stopRatio * 4.0, lit(1.0)), 9)
    Seq(nTok.as("n_tokens"), round(meanTokLen, 9).as("mean_tok_len"),
      round(stopRatio, 9).as("stop_ratio"),
      round(digitRatio, 9).as("digit_ratio"), score.as("quality_score"))
  }

  /** Marker-token language-ID heuristic: score = count of language-marker
    * tokens; argmax with fixed tie order en>de>es>fr>zh. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "les", "des"),
    "zh" -> Seq("de", "shi", "bu"))

  def langScores(text: Column): Seq[Column] = {
    val toks = tokens(text)
    LangMarkers.map { case (lang, markers) =>
      graft.functions.TokenOps.markerCount(toks, markers)
        .as(s"score_$lang")
    }
  }

  /** Predicted language from the marker scores (strict argmax, first wins
    * ties in LangMarkers order). */
  def predictedLang: Column = {
    val scores = LangMarkers.map { case (l, _) => (l, col(s"score_$l")) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit(null).cast("string")) { case (acc, (l, s)) =>
      coalesce(acc, when(s === best, lit(l)))
    }
  }
}
