package graft.backtest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Cols

/** Trade metrics (ref: src/mf_etl/backtest/metrics.py:26-204): headline
  * summary, per-state/per-symbol breakdowns, exit-reason distribution —
  * all single-pass conditional aggregates (A4/A5) — and the portfolio
  * equity curve (ref: backtest/portfolio.py:33-112): per-exit-bar mean
  * return, compounded equity via exp(sum(log1p)), running-peak drawdown.
  */
object Metrics {

  /** Per-group trade summary; groupCols empty → global (grouped by a
    * constant). */
  def summary(trades: DataFrame, groupCols: Seq[String]): DataFrame = {
    val win = col("net_ret") > 0
    val aggs = Seq(
      count(lit(1)).as("n_trades"),
      Cols.hitRate(win).as("win_rate"),
      round(avg(when(win, col("net_ret"))), 9).as("avg_win"),
      round(avg(when(!win, col("net_ret"))), 9).as("avg_loss"),
      round(sum(when(win, col("net_ret"))), 9).as("gross_win"),
      round(sum(when(!win, col("net_ret"))), 9).as("gross_loss"),
      round(Cols.safeDiv(sum(when(win, col("net_ret"))),
        abs(sum(when(!win, col("net_ret"))))), 6).as("profit_factor"),
      round(avg(col("net_ret")), 9).as("expectancy"),
      round(avg(col("hold_bars")), 9).as("avg_hold_bars"),
      Cols.countIf(col("exit_reason") === "HORIZON").as("n_horizon"),
      Cols.countIf(col("exit_reason") === "STATE_EXIT").as("n_state_exit"),
      Cols.countIf(col("exit_reason") === "END_OF_DATA").as("n_eod"),
      round(avg(col("mfe")), 9).as("avg_mfe"),
      round(avg(col("mae")), 9).as("avg_mae"))
    if (groupCols.isEmpty)
      trades.agg(aggs.head, aggs.tail: _*)
    else
      trades.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** SQL mirror over CTE `trades` with the same group-by columns. */
  def summarySql(groupCols: Seq[String]): String = {
    val sel = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val grp = if (groupCols.isEmpty) ""
      else s"GROUP BY ${groupCols.mkString(", ")}"
    s"""
      summary AS (
        SELECT $sel
               count(*) AS n_trades,
               CAST(count(CASE WHEN net_ret > 0 THEN 1 END) AS DOUBLE)
                 / count(*) AS win_rate,
               round(avg(CASE WHEN net_ret > 0 THEN net_ret END), 9)
                 AS avg_win,
               round(avg(CASE WHEN NOT (net_ret > 0) THEN net_ret END), 9)
                 AS avg_loss,
               round(sum(CASE WHEN net_ret > 0 THEN net_ret END), 9)
                 AS gross_win,
               round(sum(CASE WHEN NOT (net_ret > 0) THEN net_ret END), 9)
                 AS gross_loss,
               round(CASE WHEN abs(sum(CASE WHEN NOT (net_ret > 0)
                   THEN net_ret END)) > 0.000000000001
                 THEN sum(CASE WHEN net_ret > 0 THEN net_ret END)
                   / abs(sum(CASE WHEN NOT (net_ret > 0) THEN net_ret END))
                 END, 6) AS profit_factor,
               round(avg(net_ret), 9) AS expectancy,
               round(avg(hold_bars), 9) AS avg_hold_bars,
               count(CASE WHEN exit_reason = 'HORIZON' THEN 1 END)
                 AS n_horizon,
               count(CASE WHEN exit_reason = 'STATE_EXIT' THEN 1 END)
                 AS n_state_exit,
               count(CASE WHEN exit_reason = 'END_OF_DATA' THEN 1 END)
                 AS n_eod,
               round(avg(mfe), 9) AS avg_mfe,
               round(avg(mae), 9) AS avg_mae
        FROM trades $grp)"""
  }

  /** Portfolio equity curve keyed by exit bar index: mean net return per
    * exit_rn across tickers, compounded equity, running peak, drawdown.
    * (ref: backtest/portfolio.py:33-112; cum-product via exp·sum·log1p) */
  def portfolio(trades: DataFrame): DataFrame = {
    val byBar = trades.groupBy("exit_rn")
      .agg(count(lit(1)).as("n_exits"), avg(col("net_ret")).as("mean_ret"))
    // clamp at -99%: synthetic bars can move >100% in one step; a real
    // equity curve is undefined past total loss (same guard in the SQL).
    // The log-space prefix sum + running peak run as the distributed
    // two-pass scan (Wins.globalCumSumMax), never an unpartitioned
    // window — exact DECIMAL accumulation keeps the result independent
    // of the partition layout; exp is monotone, so the running max of
    // cum_log IS the running equity peak.
    val logRet = log(lit(1) + greatest(col("mean_ret"), lit(-0.99)))
    graft.ops.Wins
      .globalCumSumMax(byBar, Seq(col("exit_rn")), logRet,
        "cum_log", "peak_log")
      .withColumn("equity", exp(col("cum_log").cast("double")))
      .withColumn("peak", exp(col("peak_log").cast("double")))
      .withColumn("drawdown", col("equity") / col("peak") - 1)
      .select(col("exit_rn"), col("n_exits"),
        round(col("mean_ret"), 9).as("mean_ret"),
        round(col("equity"), 9).as("equity"),
        round(col("peak"), 9).as("peak"),
        round(col("drawdown"), 9).as("drawdown"))
  }

  /** Per-cell max drawdown over a keyed trade frame (Engine.simulateKeyed
    * output) — the batched counterpart of `portfolio(...).agg(min(
    * drawdown))` per cell: ONE grouped two-pass prefix scan
    * (Wins.groupedCumSumMax) computes every cell's equity curve in a
    * single job instead of one eager scan per cell. Identical arithmetic
    * to [[portfolio]] (same decimal cum-log, same cast/round points), so
    * per-cell values match the one-cell path exactly. Cells with no
    * trades are simply absent (left-join and null-fill at the caller). */
  def maxDrawdownByCell(trades: DataFrame): DataFrame = {
    val byBar = trades.groupBy("cell", "exit_rn")
      .agg(avg(col("net_ret")).as("mean_ret"))
    val logRet = log(lit(1) + greatest(col("mean_ret"), lit(-0.99)))
    graft.ops.Wins
      .groupedCumSumMax(byBar, "cell", Seq(col("exit_rn")), logRet,
        "cum_log", "peak_log")
      .withColumn("drawdown", round(exp(col("cum_log").cast("double"))
        / exp(col("peak_log").cast("double")) - 1, 9))
      .groupBy("cell").agg(min("drawdown").as("max_drawdown"))
  }

  /** SQL mirror over CTE `trades` → CTE `portfolio`. The cum sum runs in
    * DECIMAL(38,18) exactly like the Spark side, so both engines compute
    * the identical prefix regardless of evaluation order. */
  val portfolioSql: String = """
      by_bar AS (
        SELECT exit_rn, count(*) AS n_exits, avg(net_ret) AS mean_ret
        FROM trades GROUP BY 1),
      eq AS (
        SELECT *, sum(CAST(ln(1 + greatest(mean_ret, -0.99))
            AS DECIMAL(38,18)))
          OVER (ORDER BY exit_rn
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_log
        FROM by_bar),
      portfolio AS (
        SELECT exit_rn, n_exits,
               round(mean_ret, 9) AS mean_ret,
               round(exp(CAST(cum_log AS DOUBLE)), 9) AS equity,
               round(exp(CAST(max(cum_log) OVER (ORDER BY exit_rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE)), 9) AS peak,
               round(exp(CAST(cum_log AS DOUBLE))
                 / exp(CAST(max(cum_log) OVER (ORDER BY exit_rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE)) - 1, 9) AS drawdown
        FROM eq)"""
}
