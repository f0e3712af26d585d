package graft

import org.apache.spark.sql.functions._
import graft.text.Export

/** Shard-export semantics on hand-built fixtures. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val corpus = docs(
    (1L to 40L).map(i => i -> s"tok${i % 7} tok${i % 5} tok${i % 3} t$i"): _*)

  test("shardAssign: every doc lands in exactly one shard, positions " +
      "are contiguous from 1, and assignment is content-independent") {
    val a = Export.shardAssign(corpus, nShards = 4)
    assert(a.count() == 40)
    assert(a.select("doc_id").distinct().count() == 40)
    val shards = a.select("shard_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(shards.subsetOf((0L until 4L).toSet))
    // per-shard positions are exactly 1..n_shard
    val bad = a.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() == 0)
    // same ids with different text → same shard (id-hashed, not content)
    val edited = corpus.withColumn("text", concat(col("text"), lit(" x")))
    val b = Export.shardAssign(edited, nShards = 4)
      .select("doc_id", "shard_id")
    assert(a.select("doc_id", "shard_id").exceptAll(b).count() == 0)
  }

  test("shardManifest: checksum and counts are partition-order " +
      "invariant; balance rolls up the totals") {
    val a = Export.shardAssign(corpus, nShards = 4)
    val m1 = Export.shardManifest(a).orderBy("shard_id").collect()
    val m2 = Export.shardManifest(
        Export.shardAssign(corpus.repartition(7), nShards = 4))
      .orderBy("shard_id").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val bal = Export.shardBalance(Export.shardManifest(a)).head()
    assert(bal.getAs[Long]("total_docs") == 40L)
    assert(bal.getAs[Long]("n_shards") == m1.length.toLong)
    assert(bal.getAs[Long]("min_shard_docs") <=
      bal.getAs[Long]("max_shard_docs"))
    assert(bal.getAs[Double]("max_token_skew") >= 1.0 - 1e-9)
  }

  test("end-to-end: hive-partitioned shard write round-trips and the " +
      "re-read corpus reproduces the manifest checksums") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val a = Export.shardAssign(corpus, nShards = 4)
    a.write.mode("overwrite").partitionBy("shard_id").parquet(tmp)
    val back = spark.read.parquet(tmp)
    // partition pruning: reading one shard touches one directory
    val one = back.filter(col("shard_id") === 0L)
    assert(one.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(shard_id"))
    // the re-read corpus carries every doc exactly once, and its
    // manifest (recomputed from what was READ) matches the original
    val m1 = Export.shardManifest(a).orderBy("shard_id").collect()
    val m2 = Export.shardManifest(back).orderBy("shard_id").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
  }

  test("shardAssign: salt reshuffles shard membership, nShards=1 " +
      "degenerates to one ordered corpus") {
    val a = Export.shardAssign(corpus, nShards = 4)
    val s2 = Export.shardAssign(corpus, nShards = 4, salt = "other")
    // not a proof, but 40 ids all keeping their shard under a new salt
    // would mean the salt is dead
    assert(a.select("doc_id", "shard_id")
      .exceptAll(s2.select("doc_id", "shard_id")).count() > 0)
    val one = Export.shardAssign(corpus, nShards = 1)
    assert(one.select("shard_id").distinct().count() == 1)
    assert(one.agg(max("pos")).head().getLong(0) == 40L)
  }

  test("HRW resharding: only docs whose winner IS the new shard move, " +
      "movement far below mod-N's") {
    val big = docs((1L to 300L).map(i => i -> s"t$i"): _*)
    val a = Export.shardAssignHrw(big, 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Export.shardAssignHrw(big, 9).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = a.keys.filter(k => a(k) != b(k)).toSeq
    // the defining rendezvous property: a doc moves ONLY because the
    // ADDED shard out-weighed its old winner — no doc reshuffles
    // between surviving shards
    assert(moved.forall(k => b(k) == 8L),
      s"HRW moved docs to a surviving shard: ${
        moved.filter(k => b(k) != 8L).map(k => (k, a(k), b(k)))}")
    // movement ~ 1/9 of the corpus, far below mod's ~8/9
    assert(moved.size < 300 / 4, s"HRW moved ${moved.size}/300")
    val mv = Export.reshardMovement(big, 8).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mv("hrw") == moved.size)
    assert(mv("mod") > 5 * mv("hrw"),
      s"mod ${mv("mod")} vs hrw ${mv("hrw")}")
  }
}
