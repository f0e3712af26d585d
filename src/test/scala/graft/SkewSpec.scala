package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted-join contract: identical results to the plain join, with the
  * salt participating in the shuffle key. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a pathologically skewed key") {
    val big = (1 to 20000).map { i =>
      (if (i % 100 == 0) s"T${i % 5}" else "HOT", i.toLong)
    }.toDF("ticker", "v")
    val dim = (Seq("HOT") ++ (0 until 5).map(i => s"T$i"))
      .zipWithIndex.map { case (t, i) => (t, i * 10L) }
      .toDF("ticker", "w")
    val plain = big.join(dim, Seq("ticker"))
    val salted = Skew.saltedJoin(big, dim, "ticker",
      tiebreak = col("v"), nSalts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty
      && plain.exceptAll(salted).isEmpty,
      "salted join diverged from plain join")
    // the salt must be part of the join keys (that is the whole point)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt not in join keys:\n$plan")
  }
}
