package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder: the warehouse operator
  * that turns a change LOG (one row per key per observation time) into
  * interval rows — each attribute run becomes one row with
  * `[effective_from, effective_to)` validity and an `is_current` flag,
  * so facts can as-of join the dimension state they were recorded
  * under (Kimball's SCD type 2).
  */
object Scd {

  /** Collapse a change log into SCD2 interval rows.
    *
    * Input contract: ONE row per (key, ts) — pre-aggregate the log if
    * an entity can emit several observations at the same timestamp,
    * otherwise the change detection's lag() is order-nondeterministic.
    *
    * Per key (ordered by ts): a row opens a new run iff it is the
    * first observation or any tracked attribute IS DISTINCT FROM its
    * predecessor (null-safe — a null→value flip is a change).
    * `effective_to` is the next run's `effective_from` (null on the
    * current run), so runs tile the key's timeline with no gaps or
    * overlaps.
    *
    * Scale shape: one exchange on the key — the run filter preserves
    * the window's partitioning and sort, so the change-detection
    * window, the filter, and the lead() window all ride the same
    * shuffle. No driver state; keys are independent. */
  def scd2(log: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs at least one key and one tracked attribute")
    // the builder GENERATES these columns via withColumn — a pre-existing
    // column of the same name would be silently clobbered (and a tsCol
    // named "effective_from" would self-assign, then be dropped)
    val generated = Seq("__open", "effective_from", "effective_to",
      "is_current")
    require(!generated.contains(tsCol),
      s"scd2 tsCol '$tsCol' collides with a generated column name")
    val clash = log.columns.toSeq.intersect(generated)
    require(clash.isEmpty,
      s"scd2 input already has generated column name(s) " +
        s"${clash.mkString(", ")} — rename them first")
    val wk = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(wk)))
      .reduce(_ || _)
    log
      .withColumn("__open", row_number().over(wk) === 1 || changed)
      .filter(col("__open")).drop("__open")
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(wk))
      .withColumn("is_current",
        when(col("effective_to").isNull, 1).otherwise(0))
      .drop(tsCol)
  }
}
