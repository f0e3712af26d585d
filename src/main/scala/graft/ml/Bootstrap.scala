package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bootstrap confidence intervals
  * (ref: src/mf_etl/validation/bootstrap.py:38-373): per-group percentile
  * CIs for the mean via iid resampling with a seeded generator.
  *
  * The resampler is a *portable* LCG (glibc constants) over the group's
  * values sorted deterministically, so the whole procedure — draws,
  * means, percentile CI — is reproducible across engines and cluster
  * runs, and oracle-checkable in SQL. Everything is array expressions:
  * no UDFs, no driver collect; each group's resampling is one codegen'd
  * projection (the reference caps group size at 50k points, which bounds
  * the collected array).
  */
object Bootstrap {

  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L // 2^31

  /** Per-group bootstrap CI of the mean: nBoot draws of size n (the group
    * size), percentile CI [lo, hi] + point mean.
    * Draw b, position i uses LCG(b * n + i) % n as the sampled index. */
  def meanCi(df: DataFrame, key: String, valueCol: String, nBoot: Int,
      ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2): DataFrame = {
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .groupBy(key)
      .agg(sort_array(collect_list(col(valueCol))).as("vals"),
        count(col(valueCol)).as("n"),
        avg(col(valueCol)).as("point_mean"))
    // means of nBoot resamples, each of size n, via index arithmetic
    val draws = transform(sequence(lit(0), lit(nBoot - 1)), b =>
      aggregate(
        sequence(lit(0L), col("n") - 1),
        lit(0.0),
        (acc, i) => acc + element_at(col("vals"),
          (((b.cast("long") * col("n") + i) * A + C) % M % col("n") + 1)
            .cast("int")),
        acc => acc / col("n")))
    sorted
      .withColumn("boot_means", sort_array(draws))
      .select(col(key), col("n"),
        round(col("point_mean"), 9).as("point_mean"),
        round(element_at(col("boot_means"),
          (floor(lit(ciLo) * nBoot) + 1).cast("int")), 9).as("ci_lo"),
        round(element_at(col("boot_means"),
          (floor(lit(ciHi) * nBoot) + 1).cast("int")), 9).as("ci_hi"))
  }

  // ---- full bootstrap battery (ref bootstrap.py:38-373) ----------------
  //
  // Moving-block + iid modes, mean/median/hit-rate CIs, pairwise state
  // mean-diff CIs. Same portable-LCG index scheme as meanCi, so every
  // draw is reproducible across engines: draw b, slot i samples index
  // LCG(b·n+i) mod n (iid), or block j of draw b starts at
  // LCG(b·blockCount+j) mod (n-L+1) (block mode, ref
  // _sample_block_bootstrap). CI bounds use np.quantile's linear
  // interpolation at positions precomputed on the driver, so Spark and
  // the DuckDB oracle embed bit-identical constants.
  //
  // Divergence from the reference (documented like the r1 sampling note):
  // the reference threads one numpy Generator through all states
  // sequentially; we give each (state, draw) an independent deterministic
  // LCG stream — same estimator, portable + cluster-order-independent.

  /** np.quantile linear-interpolation position over a sorted length-m
    * array: (0-based floor index, fraction). */
  private def qpos(q: Double, m: Int): (Int, Double) = {
    val pos = q * (m - 1)
    val lo = math.floor(pos).toInt
    (lo, pos - lo)
  }

  private def ciAt(sorted: Column, q: Double, m: Int): Column = {
    val (lo, frac) = qpos(q, m)
    if (frac == 0.0) element_at(sorted, lo + 1)
    else element_at(sorted, lo + 1) +
      lit(frac) * (element_at(sorted, lo + 2) - element_at(sorted, lo + 1))
  }

  private def ciAtSql(arr: String, q: Double, m: Int): String = {
    val (lo, frac) = qpos(q, m)
    if (frac == 0.0) s"$arr[${lo + 1}]"
    else s"($arr[${lo + 1}] + $frac * ($arr[${lo + 2}] - $arr[${lo + 1}]))"
  }

  /** DuckDB round-at-9 with Spark's exact-decimal semantics: DuckDB's
    * native round(x,9) multiplies by 1e9 first, and the FP drift flips
    * values sitting within an ulp of a .5 decimal boundary (median CIs —
    * averages of two doubles — land there often). Routing through
    * DECIMAL(38,18) keeps the double's full shortest decimal repr (no
    * double-rounding at an intermediate digit), so the round at 9
    * matches Spark's BigDecimal HALF_UP; CAST back to DOUBLE for the
    * driver's Arrow hash. */
  private def r9Sql(e: String): String =
    s"CAST(round(CAST(($e) AS DECIMAL(38,18)), 9) AS DOUBLE)"

  /** Exact median of a pre-sorted array of n elements (np.median). */
  private def medianOfSorted(ms: Column, n: Column): Column =
    when(n % 2 === 1, element_at(ms, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(ms, (n / 2).cast("int"))
        + element_at(ms, (n / 2 + 1).cast("int"))) / 2.0)

  private def medianOfSortedSql(ms: String, n: String): String =
    s"""CASE WHEN $n % 2 = 1 THEN $ms[CAST(($n + 1) // 2 AS BIGINT)]
        ELSE ($ms[CAST($n // 2 AS BIGINT)]
              + $ms[CAST($n // 2 + 1 AS BIGINT)]) / 2.0 END"""

  private def iidDraws(vals: Column, n: Column, nBoot: Int): Column =
    transform(sequence(lit(0), lit(nBoot - 1)), b =>
      transform(sequence(lit(0L), n - 1), i =>
        element_at(vals,
          (((b.cast("long") * n + i) * A + C) % M % n + 1).cast("int"))))

  private def iidDrawsSql(vals: String, n: String, nBoot: Int): String =
    s"""list_transform(range($nBoot), b ->
          list_transform(range($n), i ->
            $vals[CAST(((b * $n + i) * $A + $C) % $M % $n AS BIGINT) + 1]))"""

  private def blockDraws(vals: Column, n: Column, bl: Int,
      nBoot: Int): Column = {
    val bc = floor((n + (bl - 1)) / bl).cast("long")
    val startsMax = n - bl + 1
    transform(sequence(lit(0), lit(nBoot - 1)), b =>
      slice(
        flatten(transform(sequence(lit(0L), bc - 1), j =>
          slice(vals,
            (((b.cast("long") * bc + j) * A + C) % M % startsMax + 1)
              .cast("int"),
            lit(bl)))),
        lit(1), n.cast("int")))
  }

  private def blockDrawsSql(vals: String, n: String, bl: Int,
      nBoot: Int): String = {
    val bc = s"(($n + ${bl - 1}) // $bl)"
    val start = s"CAST(((b * $bc + j) * $A + $C) % $M % ($n - $bl + 1)" +
      s" AS BIGINT)"
    s"""list_transform(range($nBoot), b ->
          list_slice(
            flatten(list_transform(range($bc), j ->
              list_slice($vals, $start + 1, $start + $bl))),
            1, $n))"""
  }

  /** Per-group bootstrap battery: mean/median/hit-rate observed values +
    * percentile CIs from nBoot resamples. `mode` = "iid" | "block"
    * (moving-block of length `blockLength`, falling back to iid when the
    * group is shorter than one block — ref _sample_block_bootstrap).
    * `ordCols` fixes the in-group order (time order, so block resampling
    * preserves serial correlation). Groups larger than `maxPoints` are
    * first reduced to a deterministic stride sample of that size — the
    * reference's max_points_per_state=50k bound (rng.choice there; an
    * order-preserving stride here so it stays portable and keeps the
    * serial structure block mode needs). Stats are over the sample; the
    * output `n` stays the true non-null count, like the reference. */
  def statsCi(df: DataFrame, key: String, valueCol: String,
      ordCols: Seq[String], nBoot: Int, mode: String = "iid",
      blockLength: Int = graft.Settings.validation.bootstrapBlockLength,
      ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2,
      maxPoints: Int = 50000): DataFrame = {
    val ordered = transform(
      sort_array(collect_list(struct(
        (ordCols.map(col) :+ col(valueCol).as("v")): _*))),
      x => x.getField("v"))
    val grouped0 = df.filter(col(valueCol).isNotNull)
      .groupBy(key)
      .agg(ordered.as("vals0"), count(col(valueCol)).as("n"))
    val grouped = grouped0
      .withColumn("vals",
        when(col("n") > maxPoints,
          transform(sequence(lit(0L), lit(maxPoints - 1L)),
            j => element_at(col("vals0"),
              floor(j * col("n") / maxPoints).cast("int") + 1)))
          .otherwise(col("vals0")))
      .withColumn("m", least(col("n"), lit(maxPoints.toLong)))
      .drop("vals0")
    val n = col("m")
    def meanOf(x: Column) =
      aggregate(x, lit(0.0), (acc, e) => acc + e, acc => acc / n)
    def hitOf(x: Column) =
      aggregate(x, lit(0.0),
        (acc, e) => acc + when(e > 0, 1.0).otherwise(0.0), acc => acc / n)
    // Parallelism shape: one row per (group, draw) — with a handful of
    // groups, per-group rows would keep only #groups cores busy; the
    // explode + repartition spreads the nBoot resamples across the whole
    // cluster, then the tiny per-group dist arrays reassemble. The
    // per-draw stats run as a typed kernel (plain JVM loops — the
    // interpreted expression path is ~10× slower for 200×50k lookups);
    // the LCG index stream and the ascending-order fold are bit-identical
    // to the SQL oracle, which remains the semantic contract.
    val perDraw = grouped
      .select(col(key), col("m"), col("vals"),
        explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
      .repartition(col(key), col("b"))
    val inSchema = perDraw.schema
    val keyField = inSchema.head
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      keyField,
      org.apache.spark.sql.types.StructField("dm",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("dmed",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("dh",
        org.apache.spark.sql.types.DoubleType)))
    val bl = blockLength
    val useBlock = mode == "block" && blockLength > 1
    val statRows = perDraw.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.getSeq[Double](2).toArray
        val m = vals.length
        val b = r.getInt(3).toLong
        val draw = new Array[Double](m)
        if (useBlock && m > bl) {
          val bc = (m + bl - 1) / bl
          val startsMax = m - bl + 1
          var pos = 0
          var j = 0L
          while (pos < m) {
            val start = (((b * bc + j) * A + C) % M % startsMax).toInt
            var t = 0
            while (t < bl && pos < m) {
              draw(pos) = vals(start + t); pos += 1; t += 1
            }
            j += 1
          }
        } else {
          var i = 0
          while (i < m) {
            draw(i) = vals((((b * m + i) * A + C) % M % m).toInt)
            i += 1
          }
        }
        java.util.Arrays.sort(draw)
        var s = 0.0
        var hits = 0.0
        var i = 0
        while (i < m) {
          s += draw(i)
          if (draw(i) > 0) hits += 1.0
          i += 1
        }
        val med =
          if (m % 2 == 1) draw((m + 1) / 2 - 1)
          else (draw(m / 2 - 1) + draw(m / 2)) / 2.0
        org.apache.spark.sql.Row(r.get(0), s / m, med, hits / m)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val stats = statRows
      .groupBy(key)
      .agg(sort_array(collect_list(col("dm"))).as("mean_d"),
        sort_array(collect_list(col("dmed"))).as("med_d"),
        sort_array(collect_list(col("dh"))).as("hit_d"))
    grouped.join(stats, Seq(key))
      .select(col(key), col("n"),
        round(meanOf(col("vals")), 9).as("mean_obs"),
        round(ciAt(col("mean_d"), ciLo, nBoot), 9).as("mean_ci_lo"),
        round(ciAt(col("mean_d"), ciHi, nBoot), 9).as("mean_ci_hi"),
        round(medianOfSorted(array_sort(col("vals")), n), 9)
          .as("median_obs"),
        round(ciAt(col("med_d"), ciLo, nBoot), 9).as("median_ci_lo"),
        round(ciAt(col("med_d"), ciHi, nBoot), 9).as("median_ci_hi"),
        round(hitOf(col("vals")), 9).as("hit_rate_obs"),
        round(ciAt(col("hit_d"), ciLo, nBoot), 9).as("hit_rate_ci_lo"),
        round(ciAt(col("hit_d"), ciHi, nBoot), 9).as("hit_rate_ci_hi"))
  }

  /** SQL mirror of statsCi over a relation `bv(key, ord…, v)` → CTE
    * `bstats`. `ord` is the ORDER BY column list fixing in-group order. */
  def sqlStats(key: String, ord: String, nBoot: Int,
      mode: String = "iid",
      blockLength: Int = graft.Settings.validation.bootstrapBlockLength,
      ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2,
      maxPoints: Int = 50000): String = {
    val draws =
      if (mode == "block" && blockLength > 1)
        s"""CASE WHEN m > $blockLength
            THEN ${blockDrawsSql("vals", "m", blockLength, nBoot)}
            ELSE ${iidDrawsSql("vals", "m", nBoot)} END"""
      else iidDrawsSql("vals", "m", nBoot)
    val meanL = "ms -> list_aggregate(ms, 'sum') / m"
    val hitL = """ms -> list_aggregate(list_transform(ms, e ->
        CASE WHEN e > 0 THEN 1.0 ELSE 0.0 END), 'sum') / m"""
    s"""
      bsorted0 AS (
        SELECT $key, list(v ORDER BY $ord) AS vals0, count(v) AS n
        FROM bv GROUP BY 1),
      bsorted AS (
        SELECT $key, n, least(n, $maxPoints) AS m,
               CASE WHEN n > $maxPoints
                 THEN list_transform(range($maxPoints), j ->
                   vals0[CAST((j * n) // $maxPoints AS BIGINT) + 1])
                 ELSE vals0 END AS vals
        FROM bsorted0),
      bres AS (
        SELECT $key, n, m, vals,
               list_transform($draws, r -> list_sort(r)) AS rss
        FROM bsorted),
      bdist AS (
        -- all three dists read the per-draw SORTED resample; sums fold
        -- the ascending order (identical fp order to the engine)
        SELECT $key, n, m, vals,
               list_sort(list_transform(rss, $meanL)) AS mean_d,
               list_sort(list_transform(rss,
                 ms -> ${medianOfSortedSql("ms", "m")})) AS med_d,
               list_sort(list_transform(rss, $hitL)) AS hit_d
        FROM bres),
      bstats AS (
        SELECT $key, n,
               ${r9Sql("list_aggregate(vals, 'sum') / m")} AS mean_obs,
               ${r9Sql(ciAtSql("mean_d", ciLo, nBoot))} AS mean_ci_lo,
               ${r9Sql(ciAtSql("mean_d", ciHi, nBoot))} AS mean_ci_hi,
               ${r9Sql(medianOfSortedSql("list_sort(vals)", "m"))}
                 AS median_obs,
               ${r9Sql(ciAtSql("med_d", ciLo, nBoot))} AS median_ci_lo,
               ${r9Sql(ciAtSql("med_d", ciHi, nBoot))} AS median_ci_hi,
               ${r9Sql("""list_aggregate(list_transform(vals, e ->
                 CASE WHEN e > 0 THEN 1.0 ELSE 0.0 END), 'sum') / m""")}
                 AS hit_rate_obs,
               ${r9Sql(ciAtSql("hit_d", ciLo, nBoot))} AS hit_rate_ci_lo,
               ${r9Sql(ciAtSql("hit_d", ciHi, nBoot))} AS hit_rate_ci_hi
        FROM bdist)"""
  }

  /** Pairwise state mean-difference CIs (ref bootstrap.py:316-345):
    * per-state iid bootstrap mean distributions, draws paired by index
    * across states, percentile CI of the difference + sign consistency.
    * Same (group, draw)-grained parallel shape and 50k stride cap as
    * statsCi. */
  def pairwiseDiffCi(df: DataFrame, key: String, valueCol: String,
      nBoot: Int, ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2,
      maxPoints: Int = 50000): DataFrame = {
    val grouped = df.filter(col(valueCol).isNotNull)
      .groupBy(key)
      .agg(sort_array(collect_list(col(valueCol))).as("vals0"),
        count(col(valueCol)).as("n0"))
      .withColumn("vals",
        when(col("n0") > maxPoints,
          transform(sequence(lit(0L), lit(maxPoints - 1L)),
            j => element_at(col("vals0"),
              floor(j * col("n0") / maxPoints).cast("int") + 1)))
          .otherwise(col("vals0")))
      .withColumn("n", least(col("n0"), lit(maxPoints.toLong)))
      .drop("vals0")
    // typed kernel per (group, draw): resample mean summed in DRAW order
    // (matches sqlPairwise's fold order)
    val perDraw = grouped
      .select(col(key), col("n0"), col("vals"),
        explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
      .repartition(col(key), col("b"))
    val inSchema = perDraw.schema
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      inSchema.head, inSchema(1),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("dm",
        org.apache.spark.sql.types.DoubleType)))
    val dmRows = perDraw.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.getSeq[Double](2).toArray
        val m = vals.length
        val b = r.getInt(3).toLong
        var s = 0.0
        var i = 0
        while (i < m) {
          s += vals((((b * m + i) * A + C) % M % m).toInt)
          i += 1
        }
        org.apache.spark.sql.Row(r.get(0), r.get(1), b.toInt, s / m)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val withDist = dmRows
      .groupBy(key)
      .agg(first(col("n0")).as("n"),
        transform(sort_array(collect_list(struct(col("b"), col("dm")))),
          x => x.getField("dm")).as("dist"))
    val a = withDist.select(col(key).as("state_a"), col("n").as("n_a"),
      col("dist").as("dist_a"))
    val b = withDist.select(col(key).as("state_b"), col("n").as("n_b"),
      col("dist").as("dist_b"))
    val diff = zip_with(col("dist_a"), col("dist_b"), (x, y) => x - y)
    val diffLo = round(ciAt(col("sd"), ciLo, nBoot), 9)
    val diffHi = round(ciAt(col("sd"), ciHi, nBoot), 9)
    a.join(b, col("state_a") < col("state_b"))
      .withColumn("diff", diff)
      .withColumn("sd", sort_array(col("diff")))
      .select(col("state_a"), col("state_b"), col("n_a"), col("n_b"),
        round(aggregate(col("diff"), lit(0.0), (acc, e) => acc + e,
          acc => acc / nBoot), 9).as("diff_mean_obs"),
        diffLo.as("diff_ci_lo"),
        diffHi.as("diff_ci_hi"),
        (diffLo > 0 || diffHi < 0).as("diff_sign_consistent"))
  }

  /** SQL mirror of pairwiseDiffCi over `bv(key, v)` → CTE `bpair`. */
  def sqlPairwise(key: String, nBoot: Int,
      ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2,
      maxPoints: Int = 50000): String = {
    val lo = ciAtSql("sd", ciLo, nBoot)
    val hi = ciAtSql("sd", ciHi, nBoot)
    s"""
      psorted0 AS (
        SELECT $key, list(v ORDER BY v) AS vals0, count(v) AS n
        FROM bv GROUP BY 1),
      psorted AS (
        SELECT $key, n, least(n, $maxPoints) AS m,
               CASE WHEN n > $maxPoints
                 THEN list_transform(range($maxPoints), j ->
                   vals0[CAST((j * n) // $maxPoints AS BIGINT) + 1])
                 ELSE vals0 END AS vals
        FROM psorted0),
      pdist AS (
        SELECT $key, n,
               list_transform(${iidDrawsSql("vals", "m", nBoot)},
                 r -> list_aggregate(r, 'sum') / m) AS dist
        FROM psorted),
      pdiff AS (
        SELECT a.$key AS state_a, b.$key AS state_b,
               a.n AS n_a, b.n AS n_b,
               list_transform(range($nBoot),
                 i -> a.dist[i + 1] - b.dist[i + 1]) AS diff,
               list_sort(list_transform(range($nBoot),
                 i -> a.dist[i + 1] - b.dist[i + 1])) AS sd
        FROM pdist a JOIN pdist b ON a.$key < b.$key),
      bpair AS (
        SELECT state_a, state_b, n_a, n_b,
               ${r9Sql(s"list_aggregate(diff, 'sum') / $nBoot")}
                 AS diff_mean_obs,
               ${r9Sql(lo)} AS diff_ci_lo,
               ${r9Sql(hi)} AS diff_ci_hi,
               (${r9Sql(lo)} > 0 OR ${r9Sql(hi)} < 0)
                 AS diff_sign_consistent
        FROM pdiff)"""
  }

  /** SQL mirror over a (key, value) relation named `bv` → CTE `boot`. */
  def sql(key: String, nBoot: Int,
      ciLo: Double = (1.0 - graft.Settings.validation.bootstrapCi) / 2,
      ciHi: Double = (1.0 + graft.Settings.validation.bootstrapCi) / 2)
      : String = s"""
      bsorted AS (
        SELECT $key, list(v ORDER BY v) AS vals, count(v) AS n,
               avg(v) AS point_mean
        FROM bv GROUP BY 1),
      bdraws AS (
        SELECT $key, n, point_mean,
               list_sort(list_transform(range($nBoot), b ->
                 list_aggregate(
                   list_transform(range(n), i ->
                     vals[CAST((((b * n + i) * $A + $C) % $M) % n AS INT)
                          + 1]),
                   'sum') / n)) AS boot_means
        FROM bsorted),
      boot AS (
        SELECT $key, n, round(point_mean, 9) AS point_mean,
               round(boot_means[CAST(floor($ciLo * $nBoot) AS INT) + 1], 9)
                 AS ci_lo,
               round(boot_means[CAST(floor($ciHi * $nBoot) AS INT) + 1], 9)
                 AS ci_hi
        FROM bdraws)"""
}
