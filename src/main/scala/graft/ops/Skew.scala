package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew mitigation (SURVEY §7.5.6): AQE's skew-join split rebalances
  * sort-merge joins after a shuffle materializes, but a key so hot that
  * one task cannot even hold its build side needs a-priori salting.
  */
object Skew {

  /** Salted equi-join: the big side's key is split into `nSalts`
    * deterministic sub-keys (portable hash of a row-unique tiebreak
    * column — never rand(), which breaks retries and replays), and the
    * small side is replicated across every salt. The shuffle then
    * spreads each hot key over `nSalts` tasks; results are identical to
    * the plain join. Cost: small side × nSalts, so keep the small side
    * genuinely small or nSalts modest. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      tiebreak: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = big.withColumn("__salt",
      pmod(hash(tiebreak), lit(nSalts)))
    val expanded = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }
}
