package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming ≡ batch parity: the windowed aggregation over a parquet file
  * stream (AvailableNow) must equal the same program run in batch. */
class StreamingSpec extends SparkSpec {

  test("stateful streaming signals match batch across micro-batches") {
    import graft.streaming.StreamingSignals
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val gram = graft.queries.Stage.slimGrammar(spark, dir)
      .select("ticker", "bar_ts", "bar_id", "flow_state_code")
    // split the state-labeled bars into two time-ordered files so the
    // confirm streak must survive a micro-batch boundary
    val cut = gram.agg(
      percentile_approx(col("bar_ts"), lit(0.5), lit(1000)))
      .head.getLong(0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sig")
    gram.filter(col("bar_ts") <= cut).coalesce(1)
      .write.parquet(streamDir.resolve("part1").toString)
    gram.filter(col("bar_ts") > cut).coalesce(1)
      .write.parquet(streamDir.resolve("part2").toString)
    val schema = gram.schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // force >= 2 micro-batches
      .parquet(s"$streamDir/part*")
    val out = StreamingSignals.signals(
      StreamingSignals.fromFrame(src), "state_entry", 2)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sig_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sig_stream_test")
      .select("ticker", "bar_ts", "bar_id", "state_streak",
        "entry_signal", "signal_side")
    val batch = graft.backtest.Signals.generate(
        graft.etl.EventGrammar.build(graft.etl.Indicators.twiggs(
          graft.etl.MarketData.barsFromEvents(
            spark.read.parquet(s"$dir/events.parquet")))),
        "state_entry", 2)
      .select(col("ticker"), col("bar_ts"), col("bar_id"),
        col("state_streak"), col("entry_signal"),
        coalesce(col("signal_side"), lit(0)).as("signal_side"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "streaming signals diverge from batch")
    graft.queries.Stage.clear()
  }

  test("streaming exact dedup drops repeated fingerprints across " +
      "micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    // duplicate content arrives in a LATER micro-batch; state-backed
    // dropDuplicates must still suppress it (cross-batch dedup state)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup")
    val b1 = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "unique one"))
    val b2 = Seq((4L, "alpha beta"), (5L, "epsilon zeta"),
      (6L, "gamma delta"))
    import spark.implicits._
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part1").toString)
    b2.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part2").toString)
    val src = spark.readStream
      .schema(b1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/part*")
    val deduped = src
      .withColumn("fp", md5(col("text").cast("binary")))
      .dropDuplicates("fp")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val kept = spark.table("dedup_stream_test")
      .select("doc_id").as[Long].collect().toSet
    // exactly one doc per distinct text survives; ids 4 and 6 (late
    // duplicates) must be dropped
    assert(kept.intersect(Set(4L, 6L)).isEmpty,
      s"late duplicates not dropped: $kept")
    assert(kept.size == 4, s"expected 4 distinct docs, got $kept")
  }

  test("streaming curation: annotations match batch exactly; gate and " +
      "cross-batch dedup apply") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingCuration
    import spark.implicits._
    // b2 carries an exact duplicate of a b1 doc (id 14), a blocklisted
    // doc (id 15, contains "slow"), and a PII doc (id 16)
    val b1 = Seq(
      (11L, "the quick brown fox jumps over the lazy dog near the bank"),
      (12L, "a of the and some more filler content words to pass length"),
      (13L, "der und die berlin words in german text for the marker test"))
    val b2 = Seq(
      (14L, "the quick brown fox jumps over the lazy dog near the bank"),
      (15L, "slow query on the big table of the warehouse the usual story"),
      (16L, "contact admin@example.org or call 555-123-4567 for the help desk of the team"))
    val all = b1 ++ b2
    val streamDir = java.nio.file.Files.createTempDirectory("graft-cur")
    b1.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part1").toString)
    b2.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part2").toString)

    val src = spark.readStream
      .schema(b1.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/part*")
    val q = StreamingCuration.curate(src, minQuality = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("curation_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("curation_stream_test")

    // batch ≡ stream on the stateless program: same rows → identical
    // annotation values (the map-only stage has no batch/stream skew)
    val batchAnno = StreamingCuration
      .annotate(all.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val streamAnno = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
    for ((id, sr) <- streamAnno; br = batchAnno(id);
         f <- Seq("quality_score", "lang_pred", "n_pii",
           "text_redacted", "n_blocked", "fingerprint"))
      assert(sr.getAs[Any](f) == br.getAs[Any](f),
        s"doc $id field $f: stream ${sr.getAs[Any](f)} != batch " +
          s"${br.getAs[Any](f)}")

    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(14L), "late exact duplicate not suppressed")
    assert(!kept.contains(15L), "blocklisted doc not dropped")
    assert(kept.contains(16L), "PII doc must be kept (redacted), not dropped")
    val red = out.filter(col("doc_id") === 16L)
      .select("text_redacted").as[String].head()
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>")
      && !red.contains("admin@example.org"), s"not redacted: $red")
    // german marker doc routes to 'de'
    val lang13 = out.filter(col("doc_id") === 13L)
      .select("lang_pred").as[String].head()
    assert(lang13 == "de", s"lang_pred: $lang13")
  }

  test("watermark-bounded dedup: suppresses in-horizon duplicates, " +
      "re-admits after state expiry") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    // batch 1: original at t0. batch 2 (within the 10s horizon): a
    // duplicate at t0+5 — must be dropped — plus an unrelated doc at
    // t0+1000 that advances the watermark far past t0+10, expiring the
    // original's state. batch 3: the same content again at t0+1010 —
    // must be RE-ADMITTED (state expired), the contract that bounds
    // state to the lateness horizon instead of the corpus.
    // MemoryStream + processAllAvailable gives DETERMINISTIC micro-batch
    // boundaries (the file source may coalesce same-aged files into one
    // batch, which would collapse the horizon semantics under test)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)](
        org.apache.spark.sql.Encoders.product[(Long, String, Long)],
        spark.sqlContext)
    val src = mem.toDF.toDF("doc_id", "text", "sec")
      .withColumn("ts_t", timestamp_seconds(col("sec")))
    val q = StreamingDedup
      .exactDedupWithinWatermark(src, "ts_t", "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("wmd_stream_test")
      .start()
    // base offset keeps event times above the initial (epoch) watermark
    mem.addData((1L, "alpha beta", 10000L))
    q.processAllAvailable()
    mem.addData((2L, "alpha beta", 10005L), (3L, "advance doc", 11000L))
    q.processAllAvailable()
    mem.addData((4L, "alpha beta", 11010L))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wmd_stream_test")
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(2L), s"in-horizon duplicate not dropped: $kept")
    assert(kept.contains(4L),
      s"post-expiry duplicate not re-admitted (state unbounded?): $kept")
    assert(kept == Set(1L, 3L, 4L), s"unexpected keep set: $kept")
  }

  test("streaming MinHash near-dup flags late near-duplicates against " +
      "earlier claimants (RocksDB state store)") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 39).map(i => s"w$i") :+ "changed").mkString(" ")
    val unrelated = (1 to 40).map(i => s"z$i").mkString(" ")
    // batch 1: original + unrelated + a sub-shingle-width doc; batch 2:
    // near-dup of the original + another short doc. Short docs have no
    // signature (empty shingle array) and must never be flagged — under
    // a band_key-only state they'd all collapse to key "" and match
    // each other.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-nd")
    Seq((10L, base), (20L, unrelated), (40L, "hi there"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part1").toString)
    Seq((30L, nearDup), (50L, "bye now")).toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part2").toString)
    val src = spark.readStream
      .schema(Seq((1L, "x")).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/part*")
    // the claimant index never expires — at corpus scale it must live on
    // the disk-backed RocksDB store, so the spec locks that provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val q = StreamingDedup.nearDupMatches(src, n = 3)
        .writeStream.outputMode("append").format("memory")
        .queryName("nd_stream_test").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
    val matches = spark.table("nd_stream_test")
      .select("doc_id", "first_doc").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the batch-2 near-dup must match the batch-1 original on at least
    // one band; the unrelated and short docs must never be flagged
    assert(matches.contains((30L, 10L)),
      s"late near-dup not flagged: $matches")
    assert(!matches.exists(m => m._1 == 20L || m._2 == 20L),
      s"unrelated doc flagged: $matches")
    assert(!matches.exists(m => Set(40L, 50L)(m._1) || Set(40L, 50L)(m._2)),
      s"short (signature-less) doc flagged: $matches")
  }

  test("session_window sessionization merges across micro-batches and " +
      "emits only watermark-finalized sessions") {
    import graft.streaming.EventSessions
    import spark.implicits._
    // gap 30s, watermark delay 10s. Batch 1 opens u1 (t=1000,1010) and
    // u2 (t=1000); batch 2 EXTENDS u1 across the batch boundary
    // (t=1020 < 1010+30) and advances the watermark via u3 (t=2000);
    // batch 3 (u4, t=3000) pushes the watermark to 2990, finalizing
    // u1/u2/u3 (no-data micro-batches flush watermark-passed state).
    // u1 must come out as ONE 3-event session — the cross-batch merge —
    // and u4 (end 3030 > watermark 2990, still open) must be withheld.
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Double)],
        spark.sqlContext)
    val src = mem.toDF.toDF("user_id", "sec", "value")
      .withColumn("ts_t", timestamp_seconds(col("sec")))
      .withWatermark("ts_t", "10 seconds")
    val q = EventSessions.sessionize(src, "ts_t", "30 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_stream_test")
      .start()
    mem.addData((1L, 1000L, 1.0), (1L, 1010L, 2.0), (2L, 1000L, 5.0))
    q.processAllAvailable()
    mem.addData((1L, 1020L, 3.0), (3L, 2000L, 7.0))
    q.processAllAvailable()
    mem.addData((4L, 3000L, 9.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_stream_test")
      .select(col("user_id"), unix_seconds(col("win_start")).as("s"),
        unix_seconds(col("win_end")).as("e"), col("n_events"),
        col("sum_value"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out.contains((1L, 1000L, 1050L, 3L, 6.0)),
      s"u1 session not merged across batches: $out")
    assert(out.contains((2L, 1000L, 1030L, 1L, 5.0)),
      s"u2 session missing: $out")
    assert(out.contains((3L, 2000L, 2030L, 1L, 7.0)),
      s"watermark-passed session not finalized: $out")
    assert(!out.exists(_._1 == 4L),
      s"unfinalized session emitted: $out")
  }

  test("stream-static enrichment joins each micro-batch against the " +
      "dimension without shuffling the stream") {
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        spark.sqlContext)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = StreamingIngest.enrich(
      mem.toDF.toDF("user_id", "value"), dim, Seq("user_id"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("enrich_stream_test").start()
    mem.addData((1L, 10.0), (3L, 30.0))
    q.processAllAvailable()
    mem.addData((2L, 20.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich_stream_test")
      .select("user_id", "value", "tier")
      .as[(Long, Double, Option[String])].collect().toSet
    // left semantics: unmatched keys survive with a null tier
    assert(rows == Set((1L, 10.0, Some("gold")), (3L, 30.0, None),
      (2L, 20.0, Some("silver"))))
  }

  test("streaming BPE encode: arriving docs tokenize against the " +
      "standing vocabulary exactly like batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // learn on a tiny standing corpus; the word -> n_pieces table is
    // the static side of a stream-static join (the tokenizer-serving
    // shape: the vocab is megabytes, the doc stream never shuffles)
    val corpus = Seq((1L, "abab abab low lower"), (2L, "abab low"))
      .toDF("doc_id", "text")
    val (_, vocab) = graft.text.Bpe.learn(corpus, 2)
    val pieces = vocab.select(col("word"),
      size(col("syms")).as("np"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)],
        spark.sqlContext)
    def encode(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(pieces, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("np").as("n_bpe"))
    val streamed = encode(mem.toDF.toDF("doc_id", "text"))
    val q = streamed.writeStream.outputMode("complete").format("memory")
      .queryName("bpe_stream_test").start()
    mem.addData((10L, "abab low"), (11L, "lower abab abab"))
    q.processAllAvailable()
    mem.addData((12L, "low low abab"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bpe_stream_test")
      .as[(Long, Long, Long)].collect().toSet
    val want = encode(Seq((10L, "abab low"), (11L, "lower abab abab"),
        (12L, "low low abab")).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "streamed BPE token accounting must equal batch")
  }

  test("streaming Stupid-Backoff scoring: arriving docs score against " +
      "the standing count tables exactly like batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // counts from a standing index corpus are the static side (the
    // LM-serving shape: vocabulary-bounded count tables, the doc
    // stream explodes to trigrams, stream-static LEFT-joins, and
    // re-aggregates per arriving doc) — StupidBackoff.scoreTrigrams
    // runs UNCHANGED on a streaming batch frame
    val index = Seq((1L, "en", "a b c a b d"))
      .toDF("doc_id", "lang", "text")
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](
        org.apache.spark.sql.Encoders.product[(Long, String, String)],
        spark.sqlContext)
    val streamed = graft.text.StupidBackoff.scoreTrigrams(index,
      mem.toDF.toDF("doc_id", "lang", "text"), 0.4, 1e-9)
      .select(col("doc_id"), col("n_trigrams"), col("n_tri_hits"),
        col("n_unk"), round(col("avg_lp"), 9).as("avg_lp"))
    val q = streamed.writeStream.outputMode("complete").format("memory")
      .queryName("sb_stream_test").start()
    mem.addData((10L, "en", "a b c x"), (11L, "en", "d a b"))
    q.processAllAvailable()
    mem.addData((12L, "en", "x y d"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sb_stream_test")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val want = graft.text.StupidBackoff.scoreTrigrams(index,
      Seq((10L, "en", "a b c x"), (11L, "en", "d a b"),
        (12L, "en", "x y d")).toDF("doc_id", "lang", "text"),
      0.4, 1e-9)
      .select(col("doc_id"), col("n_trigrams"), col("n_tri_hits"),
        col("n_unk"), round(col("avg_lp"), 9).as("avg_lp"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == want,
      "streamed Stupid-Backoff scoring must equal batch")
  }

  test("streaming DSIR scoring: arriving docs score against the frozen " +
      "importance model exactly like batch, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 100)
    val B = 64
    // freeze the model on the standing corpus (the serving shape: an
    // O(B) literal riding the plan — no shuffle, no state store)
    val (model, dflt) = graft.text.Dsir.fitModel(docs, B, "en")
    assert(model.nonEmpty && model.size <= B)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)],
        spark.sqlContext)
    val scored = graft.text.Dsir.scoreRowwise(
      mem.toDF.toDF("doc_id", "text"), B, model, dflt)
      .select(col("doc_id"), col("n_grams"), round(col("logw"), 6))
    // stateless map-only program => append mode, no watermark needed
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("dsir_stream_test").start()
    val batchRows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dsir_stream_test")
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => a -> (b, c) }.toMap
    // batch truth: the aggregate formulation (per-bucket counts) —
    // same value to fp round-off, absorbed by the round-6 boundary
    val want = graft.text.Dsir.logWeights(docs, B, "en")
      .select(col("doc_id"), col("n_grams"), round(col("logw"), 6))
      .as[(Long, Long, Double)].collect().map { case (a, b, c) => a -> (b, c) }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (ng, lw)) =>
      assert(ng == want(id)._1, s"doc $id gram count")
      assert(math.abs(lw - want(id)._2) < 2e-6,
        s"doc $id: streamed $lw vs batch ${want(id)._2}")
    }
  }

  test("streaming curation with the trained classifier gate composed: " +
      "stream keeps exactly the batch survivors with identical scores") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingCuration
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 120)
    val B = 64
    val featY = graft.text.QualityClf.features(corpus, B)
      .join(graft.text.QualityClf.labels(corpus, 0.75), "doc_id")
      .select("doc_id", "y", "bk", "x").localCheckpoint()
    val w = graft.text.QualityClf.fit(featY, B, 10.0, 6,
      corpus.count().toDouble)
    val rows = corpus.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-cclf")
    b1.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part1").toString)
    b2.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.parquet(streamDir.resolve("part2").toString)
    val src = spark.readStream
      .schema(b1.toSeq.toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/part*")
    // operating point: the calibration-driven threshold (the
    // pipeline-stage-6 contract) — chosen once from the trained
    // model's decile metrics, then passed to BOTH the stream and the
    // batch twin so they cut at the same point
    val thrRows = graft.text.QualityClf.thresholdMetrics(
        graft.text.QualityClf.score(featY, w))
      .select("thr", "prec").collect()
      .map(r => r.getDouble(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq
    val thr = graft.text.QualityClf.chooseThreshold(thrRows,
      Settings.qualityClf.targetPrecision)
    val q = StreamingCuration
      .curateWithClassifier(src, minQuality = 0.3, B, w,
        probThreshold = thr)
      .select(col("doc_id"), round(col("clf_margin"), 6).as("m"))
      .writeStream.outputMode("append").format("memory")
      .queryName("cclf_stream_test").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cclf_stream_test")
      .as[(Long, Double)].collect().toMap
    val want = StreamingCuration
      .curateWithClassifier(rows.toSeq.toDF("doc_id", "text"),
        minQuality = 0.3, B, w, probThreshold = thr)
      .select(col("doc_id"), round(col("clf_margin"), 6).as("m"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet,
      s"survivor sets differ: ${got.keySet.diff(want.keySet)} / " +
        s"${want.keySet.diff(got.keySet)}")
    got.foreach { case (id, m) =>
      assert(math.abs(m - want(id)) < 2e-6, s"doc $id margin")
    }
    // the classifier gate actually fires on this corpus (some
    // heuristic-passers score negative) — otherwise the composition
    // is vacuous
    val heurOnly = StreamingCuration
      .curate(rows.toSeq.toDF("doc_id", "text"), minQuality = 0.3)
      .count()
    assert(want.size < heurOnly,
      "classifier gate dropped nothing — composition untested")
  }

  test("streaming quality classifier: arriving docs score against the " +
      "frozen trained weights exactly like batch, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 100)
    val B = 64
    // train on the standing corpus, freeze: the model is B+2 doubles
    // riding the plan as a map literal — no shuffle, no state store
    val featY = graft.text.QualityClf.features(docs, B)
      .join(graft.text.QualityClf.labels(docs, 0.75), "doc_id")
      .select("doc_id", "y", "bk", "x").localCheckpoint()
    val w = graft.text.QualityClf.fit(featY, B, 10.0, 6, docs.count().toDouble)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)],
        spark.sqlContext)
    val scored = graft.text.QualityClf.scoreRowwise(
      mem.toDF.toDF("doc_id", "text"), B, w)
      .select(col("doc_id"), round(col("margin"), 6), col("pred"))
    // stateless map-only program => append mode, no watermark needed
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("qclf_stream_test").start()
    val batchRows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("qclf_stream_test")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // batch truth: the exact-decimal aggregate path — same value to fp
    // round-off, absorbed by the round-6 emit boundary
    val want = graft.text.QualityClf.score(featY, w)
      .select(col("doc_id"), round(col("margin"), 6), col("pred"))
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (m, p)) =>
      assert(math.abs(m - want(id)._1) < 2e-6,
        s"doc $id: streamed margin $m vs batch ${want(id)._1}")
      assert(p == want(id)._2, s"doc $id pred")
    }
  }

  test("streaming CDC: chunking is stateless and identical to batch; " +
      "chunk-level dedup state suppresses shared blocks across " +
      "micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (k, d) = (8, 32)
    // doc 2 (later micro-batch) shares a verbatim block with doc 1 but
    // has novel prefix content — CDC must suppress exactly the shared
    // chunks' fingerprints, not the whole doc
    val shared = ("the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep dark woods tonight where " +
      "owls hoot softly and the river bends around mossy stones " +
      "while distant thunder rolls across the quiet valley floor " +
      "and fireflies drift between the cedars near the old mill") // ~280B
    val b1 = Seq((1L, "unrelated preamble text " + shared))
    val b2 = Seq((2L, "a wholly novel start right here " + shared),
      (3L, "fully novel document content with nothing shared at all"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)],
        spark.sqlContext)
    // chunk (stateless map) then state-backed dedup on chunk_fp:
    // first occurrence across the WHOLE stream wins
    val q = graft.text.Cdc.chunks(mem.toDF.toDF("doc_id", "text"), k, d)
      .dropDuplicates("chunk_fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_stream_test").start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("cdc_stream_test")
      .select(col("doc_id"), col("chunk_fp"))
      .as[(Long, Long)].collect()
    // batch truth: chunk everything at once, keep first occurrence
    val batch = graft.text.Cdc.chunks(
      (b1 ++ b2).toDF("doc_id", "text"), k, d)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_fp"))
      .as[(Long, Int, Long)].collect()
    val firstOwner = batch.groupBy(_._3).map { case (fp, occ) =>
      fp -> occ.map(x => (x._1, x._2)).min._1 }
    // streamed survivors = exactly the batch first-occurrence set
    assert(kept.map(_._2).toSet == firstOwner.keySet)
    kept.foreach { case (doc, fp) =>
      assert(firstOwner(fp) == doc,
        s"chunk $fp kept by $doc, batch keeper ${firstOwner(fp)}") }
    // doc 2 must have BOTH suppressed (shared-block) and surviving
    // (novel-prefix) chunks — block-level, not doc-level, dedup
    val doc2Kept = kept.count(_._1 == 2L)
    val doc2All = batch.count(_._1 == 2L)
    assert(doc2Kept > 0 && doc2Kept < doc2All,
      s"doc 2: $doc2Kept of $doc2All chunks kept — expected a strict " +
        "subset (shared blocks suppressed, novel blocks kept)")
  }

  test("windowed counts over file stream match batch computation") {
    val dir = "/root/testdata/sf0.001"
    // batch-read the schema, convert ts (encoding-adaptive) to a typed
    // ts column
    val batchRaw = spark.read.parquet(s"$dir/events.parquet")
    val schema = batchRaw.schema
    val toTyped = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("ts_t", timestamp_micros(
        graft.etl.EventTime.typedMicros(schema("ts").dataType)))
    // the file-stream source requires a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamed = StreamingIngest.runAvailableNow(
      StreamingIngest.windowedCounts(
        toTyped(StreamingIngest.eventsStream(spark, streamDir.toString,
          schema)), "ts_t"),
      "win_counts_test")
    val batch = toTyped(batchRaw)
      .groupBy(window(col("ts_t"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"),
        col("total_value"))
    assert(streamed.count() > 0)
    // append mode emits only watermark-finalized windows: streamed must be
    // a subset of batch, and complete for windows safely past the
    // watermark (max ts - 30m tolerance, minus one window of slack)
    assert(streamed.exceptAll(batch).isEmpty)
    val cutoff = toTyped(batchRaw)
      .agg(max(col("ts_t"))).head.getTimestamp(0).toInstant
      .minusSeconds(30 * 60 + 3600)
    val mustHave = batch.filter(col("win_end") <=
      lit(java.sql.Timestamp.from(cutoff)))
    assert(mustHave.exceptAll(streamed).isEmpty)
  }

  test("streaming PQ encode matches the batch encoder's codes") {
    import graft.streaming.{StreamingEncode, StreamingIngest}
    val dir = "/root/testdata/sf0.001"
    val batchEmb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codebook = StreamingEncode.seedCodebook(batchEmb, m = 4,
      subK = 8)
    // stream the corpus through the stateless per-row encoder
    val streamDir = java.nio.file.Files.createTempDirectory("graft-pq")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"),
      streamDir.resolve("embeddings.parquet"))
    val src = spark.readStream.schema(batchEmb.schema)
      .parquet(streamDir.toString)
    val streamed = StreamingIngest.runAvailableNow(
      StreamingEncode.encode(src, codebook)
        .select("vec_id", "code_0", "code_1", "code_2", "code_3"),
      "pq_encode_test")
    // pivot to (vid, m, c) and compare with the batch explode-based
    // encoder — two independent formulations of the same argmin (the
    // per-row codegen fold vs the exploded decimal sum) must agree
    val streamedCodes = (0 until 4).map(m =>
        streamed.select(col("vec_id").as("vid"), lit(m).as("m"),
          col(s"code_$m").cast("int").as("c")))
      .reduce(_ unionByName _)
    val batchCodes = graft.text.Similarity.pqCodes(batchEmb)
      .select(col("vid"), col("m"), col("c").cast("int").as("c"))
    assert(streamedCodes.exceptAll(batchCodes).isEmpty &&
      batchCodes.exceptAll(streamedCodes).isEmpty,
      "streaming per-row PQ codes diverge from the batch encoder")
    // the encoded stream is stateless map-only: no state rows at all
    assert(streamed.count() == batchEmb.count())
  }

  test("streaming index append: arriving vectors get the same cell and " +
      "codes as a batch index rebuild") {
    import graft.streaming.{StreamingAnnServe, StreamingEncode}
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = StreamingAnnServe.seedCells(emb, nCells = 8)
    val cb = StreamingEncode.seedCodebook(emb, m = 4, subK = 8)
    // the encode + cell-assignment program is stateless column algebra,
    // so indexOf runs UNCHANGED on a streaming frame — this is the
    // continuous index-append half of the lifecycle (new vectors land
    // in the standing (vid, cell, codes) table as they arrive)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-idx")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"),
      streamDir.resolve("embeddings.parquet"))
    val src = spark.readStream.schema(emb.schema)
      .parquet(streamDir.toString)
    val streamed = graft.streaming.StreamingIngest.runAvailableNow(
      StreamingAnnServe.indexOf(src, cells, cb), "idx_append_test")
    val batch = StreamingAnnServe.indexOf(emb, cells, cb)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty
      && batch.exceptAll(streamed).isEmpty,
      "streamed index rows diverge from the batch rebuild")
  }

  test("streamed delta append grows the incremental residual index " +
      "identically to the batch union (add-without-train)") {
    import graft.streaming.StreamingAnnServe
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    // artifacts frozen at base-fit time — the q_e_index_incr contract
    val cells = graft.text.Similarity.lloydCoarseCells(base,
      nCells = 4, iters = 2)
    val cb = graft.text.Similarity.lloydResidualCodebook(base, cells,
      m = 4, subK = 4, iters = 2)
    // the delta batch arrives as a STREAM; indexOfResidual is
    // stateless column algebra, so the same program appends rows to
    // the standing index as they arrive
    val streamDir = java.nio.file.Files.createTempDirectory("graft-incr")
    delta.write.mode("overwrite").parquet(streamDir.toString)
    val src = spark.readStream.schema(emb.schema)
      .parquet(streamDir.toString)
    val streamedDelta = graft.streaming.StreamingIngest.runAvailableNow(
      StreamingAnnServe.indexOfResidual(src, cells, cb),
      "incr_append_test")
    val appended = StreamingAnnServe.indexOfResidual(base, cells, cb)
      .unionByName(streamedDelta)
    val rebuilt = StreamingAnnServe.indexOfResidual(emb, cells, cb)
    assert(appended.count() == rebuilt.count())
    assert(appended.exceptAll(rebuilt).isEmpty
      && rebuilt.exceptAll(appended).isEmpty,
      "streamed incremental append diverges from the full rebuild")
  }

  test("streaming IVF-PQ serving answers match the batch index " +
      "bit-for-bit") {
    import graft.streaming.{StreamingAnnServe, StreamingEncode}
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = StreamingAnnServe.seedCells(emb, nCells = 8)
    val cb = StreamingEncode.seedCodebook(emb, m = 4, subK = 8)
    val idx = StreamingAnnServe.indexOf(emb, cells, cb)

    // queries arrive on a stream, split across two micro-batches
    val qRows = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
        spark.sqlContext)
    val served = StreamingAnnServe.serveTopK(
      mem.toDF.toDF("vec_id", "embedding"), idx, cells, cb,
      nProbe = 2, k = 5)
    val q = served.writeStream.outputMode("append").format("memory")
      .queryName("ann_serve_test").start()
    val (b1, b2) = qRows.splitAt(qRows.length / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("ann_serve_test")
      .select("qid", "vid", "adc", "rnk")
    val want = graft.text.Similarity.ivfPqTopK(emb,
        col("vec_id") < 32, k = 5, nCells = 8, nProbe = 2,
        m = 4, subK = 8)
      .select("qid", "vid", "adc", "rnk")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming serving diverges from the batch IVF-PQ answer")
  }

  test("streamed serve + exact re-rank matches the batch refinement " +
      "bit-for-bit") {
    import graft.streaming.{StreamingAnnServe, StreamingEncode}
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = StreamingAnnServe.seedCells(emb, nCells = 8)
    val cb = StreamingEncode.seedCodebook(emb, m = 4, subK = 8)
    val idx = StreamingAnnServe.indexOf(emb, cells, cb)
    val queriesStatic = emb.filter(col("vec_id") < 32)

    val qRows = queriesStatic
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
        spark.sqlContext)
    // stream-static candidate scoring, then the rerank program applied
    // per micro-batch via foreachBatch — the standard multi-stage
    // streaming-serving shape (a query's candidates are complete
    // within its own micro-batch because the join is stream-static)
    val cands = StreamingAnnServe.scoreCandidates(
      mem.toDF.toDF("vec_id", "embedding"), idx, cells, cb, nProbe = 2)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double, Int)]
    val q = cands.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= graft.text.Similarity
            .rerankServe(batch, queriesStatic, emb, rerankR = 16, k = 5)
            .select("qid", "vid", "adc", "d2", "rnk")
            .as[(Long, Long, Double, Double, Int)].collect()
        }
        ()
      }.start()
    val (b1, b2) = qRows.splitAt(qRows.length / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val want = graft.text.Similarity.ivfPqRerankTopK(emb,
        col("vec_id") < 32, k = 5, nCells = 8, nProbe = 2,
        rerankR = 16)
      .select("qid", "vid", "adc", "d2", "rnk")
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(got.size == want.length)
    assert(got.toSet == want.toSet,
      "streamed serve+rerank diverges from the batch refinement")
  }

  test("streamed RESIDUAL IVF-PQ serving matches the batch residual " +
      "index bit-for-bit") {
    import graft.streaming.{StreamingAnnServe, StreamingEncode}
    import graft.text.Similarity
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // fitted artifacts: Lloyd coarse cells + Lloyd residual codebook
    // (the convention the residual oracle family pins)
    val cells = Similarity.lloydCoarseCells(emb, nCells = 8, iters = 2)
    val cb = Similarity.lloydResidualCodebook(emb, cells, m = 4,
      subK = 8, iters = 2)
    val idx = StreamingAnnServe.indexOfResidual(emb, cells, cb)

    val qRows = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
        spark.sqlContext)
    val served = StreamingAnnServe.serveTopKResidual(
      mem.toDF.toDF("vec_id", "embedding"), idx, cells, cb,
      nProbe = 2, k = 5)
    val q = served.writeStream.outputMode("append").format("memory")
      .queryName("ann_serve_res_test").start()
    val (b1, b2) = qRows.splitAt(qRows.length / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("ann_serve_res_test")
      .select("qid", "vid", "adc", "rnk")
    val want = Similarity.ivfPqResidualTopK(emb,
        col("vec_id") < 32, k = 5, nProbe = 2, cells, cb)
      .select("qid", "vid", "adc", "rnk")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed residual serving diverges from the batch residual " +
        "IVF-PQ answer")
  }

  test("streaming HLL registers and CMS counters converge to the batch " +
      "builds (complete mode)") {
    // the sketch builders are plain select + groupBy max/sum column
    // programs, so they run UNCHANGED on a streaming frame — this is
    // the continuously-maintained-sketch half of the artifact story
    // (registers/counters updated as data arrives, identical to a
    // batch rebuild at every point where the stream drains)
    import graft.ops.Sketches
    import spark.implicits._
    val keys = (1L to 3000L).map(i => i % 700) // dups across batches
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long](
        org.apache.spark.sql.Encoders.scalaLong, spark.sqlContext)
    val src = mem.toDF.toDF("k")
    val hq = Sketches.hllRegisters(src, col("k"), p = 9)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream_test").start()
    val cq = Sketches.cmsCounters(src, col("k"), d = 4, w = 1024)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream_test").start()
    val (b1, b2) = keys.splitAt(keys.length / 3)
    mem.addData(b1: _*); hq.processAllAvailable(); cq.processAllAvailable()
    mem.addData(b2: _*); hq.processAllAvailable(); cq.processAllAvailable()
    hq.stop(); cq.stop()
    val batchDf = keys.toDF("k")
    val hllBatch = Sketches.hllRegisters(batchDf, col("k"), p = 9)
    val hllGot = spark.table("hll_stream_test")
    assert(hllGot.exceptAll(hllBatch).isEmpty &&
      hllBatch.exceptAll(hllGot).isEmpty,
      "streamed HLL registers diverge from the batch build")
    val cmsBatch = Sketches.cmsCounters(batchDf, col("k"), d = 4,
      w = 1024)
    val cmsGot = spark.table("cms_stream_test")
    assert(cmsGot.exceptAll(cmsBatch).isEmpty &&
      cmsBatch.exceptAll(cmsGot).isEmpty,
      "streamed CMS counters diverge from the batch build")
  }

  test("unified curation gate: streamed micro-batches pass the three " +
      "signal gates exactly like batch (CurationGate.gate)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 120)
      .select("doc_id", "lang", "text")
    // freeze every artifact on the standing corpus — classifier
    // weights, KN count tables + per-language tercile cuts, DSIR
    // bucket model (the batch query's stage artifacts)
    val B = 64
    val featY = graft.text.QualityClf.features(docs, B)
      .join(graft.text.QualityClf.labels(docs, 0.75), "doc_id")
      .select("doc_id", "y", "bk", "x").cache()
    val n = featY.filter(col("bk") === -1L).count().toDouble
    // the production iteration count: a 6-iter fit underfits this
    // 120-doc slice to all-below-0.5 probs and the gate degenerates
    val w = graft.text.QualityClf.fit(featY, B, lr = 10.0, iters = 24,
      nDocs = n)
    featY.unpersist()
    val (c2, ctx, back, nTypes) = graft.text.KneserNey.model(docs, 0.75)
    val knD = graft.text.KneserNey.scoreBigrams(docs, 0.75)
      .select(col("doc_id"), col("lang"),
        round(exp(-col("avg_lp")), 6).as("ppl"))
    val cuts = knD.groupBy("lang")
      .agg(percentile_approx(col("ppl"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(1000000)).as("qs"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1)(0), r.getSeq[Double](1)(1))).toMap
    val (dsirM, dsirD) = graft.text.Dsir.fitModel(docs, B, "en")
    def gated(in: org.apache.spark.sql.DataFrame) =
      graft.text.CurationGate.gate(in, B, w, probThreshold = 0.5,
        c2, ctx, back, nTypes.toDouble, 0.75, cuts, B, dsirM, dsirD)
        .select(col("doc_id"), round(col("clf_prob"), 9).as("p"),
          col("kn_bucket"), round(col("dsir_logw"), 6).as("lw"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](
        org.apache.spark.sql.Encoders.product[(Long, String, String)],
        spark.sqlContext)
    val q = gated(mem.toDF.toDF("doc_id", "lang", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("curation_gate_test").start()
    val rows = docs.as[(Long, String, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    mem.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("curation_gate_test")
      .as[(Long, Double, Option[String], Double)].collect().toSet
    val want = gated(docs)
      .as[(Long, Double, Option[String], Double)].collect().toSet
    assert(got == want, "streamed curation gate must equal batch")
    // the gate is selective but not degenerate on the fixture
    assert(want.nonEmpty && want.size < 120,
      s"gate must filter something: ${want.size} of 120 survive")
  }

  test("streaming graph-ANN serving: micro-batched queries equal the " +
      "batch beam search, flat and hierarchical (foreachBatch over " +
      "frozen graphs — no state store)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.NnDescent
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 120)
    val graph = NnDescent.build(emb, k = 5, rounds = 2)
    val layers = NnDescent.buildLayers(emb, k = 5, upRounds = 2,
      ratio = 3, levels = 2)
    val qRows = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    type Hit = (Long, Long, Double, Int, Long)
    def run(hier: Boolean): Set[Hit] = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])](
          org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
          spark.sqlContext)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Hit]
      val in = mem.toDF.toDF("vec_id", "embedding")
      val sink = (df: org.apache.spark.sql.DataFrame) =>
        buf.synchronized { buf ++= df.as[(Long, Long, Double, Int, Long)].collect() }: Unit
      val q =
        if (hier) graft.streaming.StreamingAnnServe
          .serveHierGraphStream(in, emb, graph, layers, k = 3,
            upBeam = 4, upHops = 1, beam = 6, hops = 2,
            ratio = 3)(sink)
        else graft.streaming.StreamingAnnServe
          .serveGraphStream(in, emb, graph, k = 3, beam = 6,
            hops = 2)(sink)
      // two micro-batches: per-query chains are query-local, so the
      // batching must not change any answer
      mem.addData(qRows.take(3).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(qRows.drop(3).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      buf.toSet
    }
    val wantFlat = NnDescent.serve(emb, graph, col("vec_id") < 6,
      k = 3, beam = 6, hops = 2)
      .as[(Long, Long, Double, Int, Long)].collect().toSet
    assert(run(hier = false) == wantFlat,
      "streamed flat graph serving must equal batch")
    val wantHier = NnDescent.serveHier(emb, graph, layers,
        col("vec_id") < 6, k = 3, upBeam = 4, upHops = 1, beam = 6,
        hops = 2, ratio = 3)
      .as[(Long, Long, Double, Int, Long)].collect().toSet
    assert(run(hier = true) == wantHier,
      "streamed hierarchical graph serving must equal batch")
  }

  test("streaming graph+PQ serving: micro-batched queries equal the " +
      "batch DiskANN-style serve (frozen codes + exact re-rank, " +
      "foreachBatch)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.{NnDescent, Similarity}
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 120)
    val graph = NnDescent.build(emb, k = 5, rounds = 2)
    val layers = NnDescent.buildLayers(emb, k = 5, upRounds = 2,
      ratio = 3, levels = 2)
    val cb = Similarity.lloydCodebook(emb, m = 4, subK = 8, iters = 2)
    type Hit = (Long, Long, Double, Int, Long, Long)
    val qRows = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Double])],
        spark.sqlContext)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Int, Long, Long)]
    val q = graft.streaming.StreamingAnnServe.servePqGraphStream(
      mem.toDF.toDF("vec_id", "embedding"), emb, graph, layers,
      k = 3, upBeam = 4, upHops = 1, beam = 6, hops = 2, ratio = 3,
      rerankR = 12, codebook = cb) { df =>
      buf.synchronized {
        buf ++= df.as[(Long, Long, Double, Int, Long, Long)].collect()
      }: Unit
    }
    mem.addData(qRows.take(3).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(qRows.drop(3).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val want = NnDescent.serveHierPq(emb, graph, layers,
        col("vec_id") < 6, k = 3, upBeam = 4, upHops = 1, beam = 6,
        hops = 2, ratio = 3, m = 4, subK = 8, rerankR = 12,
        codebook = Some(cb))
      .as[(Long, Long, Double, Int, Long, Long)].collect().toSet
    assert(buf.toSet == want,
      "streamed graph+PQ serving must equal the batch serve")
  }
}
