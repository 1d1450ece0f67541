"""Long-frame (keyed) metrics: the million-asset scale path.

The wide returns frame (one column per asset) mirrors the reference's data
model and is right for a handful of strategies — but its plan grows one
expression set per column, which caps out in the hundreds (codegen size,
driver planning time). The long frame ``(key, date, r)`` is the shape a
100 TB store actually uses, and its plan is O(1) in the number of assets:
ONE aggregation with ~30 expressions grouped by key, ONE keyed drawdown
enrichment (:mod:`operators.keyed`), ONE episodes pass — whether there are
two assets or two million.

``metrics_by_key`` computes the full scalar metric surface per key in 3
jobs (enrichment+main agg, CVaR threshold join pass, episodes join):

* single-pass metrics: the exact same Column builders the wide API uses
  (:mod:`expressions`) — results match ``stats.*`` per asset bit-for-bit;
* drawdown metrics ride the keyed prefix machinery;
* CVaR's conditional mean uses a per-key threshold JOINED back (the
  literal-injection trick is per-frame, not per-key) — co-partitioned on
  the key, AQE-broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alphastats_spark import expressions as X
from alphastats_spark._utils import get_temporal_column_name
from alphastats_spark.exceptions import NoTemporalColumnError
from alphastats_spark.operators import keyed


def metrics_by_key(
    df: DataFrame,
    key_col: str = "asset",
    value_col: str = "r",
    temporal: str | None = None,
    rf: float = 0.0,
    periods: int = 252,
) -> DataFrame:
    """Per-key scalar metrics over a long ``(key, date, value)`` frame.

    Output: one row per key with the scalar metric surface (comp, cagr,
    sharpe, sortino, volatility, win/loss stats, tail ratios, VaR/CVaR,
    drawdown metrics, episode stats). Semantics per key are identical to
    running the wide-frame ``stats.*`` functions on that key's series.
    """
    temporal = temporal or get_temporal_column_name(df)
    if temporal is None:
        raise NoTemporalColumnError
    c = F.col(value_col)
    keys = [key_col]

    base = df.select(key_col, temporal, value_col)
    base = keyed.with_order_keyed(base, temporal, keys)
    base = keyed.add_drawdown_columns_keyed(base, keys, {"__dd": value_col})
    base.persist()
    dd = F.col("__dd")

    main = base.groupBy(key_col).agg(
        F.count(c).alias("n_obs"),
        X.comp(c).alias("comp"),
        X.cagr(c, rf=rf, periods=periods).alias("cagr"),
        X.sharpe(c, rf, periods, True).alias("sharpe"),
        X.sortino(c, rf, periods, True).alias("sortino"),
        X.volatility(c, periods, True).alias("volatility"),
        X.exposure(c).alias("exposure"),
        X.omega(c).alias("omega"),
        X.expected_return(c).alias("expected_return"),
        F.max(c).alias("best"),
        F.min(c).alias("worst"),
        X.skew(c).alias("skew"),
        X.kurtosis(c).alias("kurtosis"),
        X.avg_return(c).alias("avg_return"),
        X.avg_win(c).alias("avg_win"),
        X.avg_loss(c).alias("avg_loss"),
        X.win_rate(c).alias("win_rate"),
        X.payoff_ratio(c).alias("payoff_ratio"),
        X.profit_factor(c).alias("profit_factor"),
        X.gain_to_pain_ratio(c, rf).alias("gain_to_pain_ratio"),
        X.common_sense_ratio(c).alias("common_sense_ratio"),
        X.tail_ratio(c).alias("tail_ratio"),
        X.outlier_win_ratio(c).alias("outlier_win_ratio"),
        X.outlier_loss_ratio(c).alias("outlier_loss_ratio"),
        X.kelly_criterion(c).alias("kelly_criterion"),
        X.risk_of_ruin(c).alias("risk_of_ruin"),
        X.value_at_risk(c).alias("value_at_risk"),
        F.min(dd).alias("max_drawdown"),
        F.sqrt(X.fdiv(F.sum(F.pow(dd, 2)), F.count(c) - 1)).alias("ulcer_index"),
        X.fdiv(F.abs(F.sum(c) - F.lit(float(rf))), F.abs(F.min(dd))).alias(
            "recovery_factor"
        ),
    )

    # CVaR: per-key parametric VaR threshold joined back (no per-key literal
    # injection possible), then the conditional mean below it per key.
    thresholds = base.groupBy(key_col).agg(
        X.value_at_risk(c).alias("__var_t")
    )
    cvar = (
        base.join(thresholds, key_col)
        .groupBy(key_col)
        .agg(
            F.coalesce(
                F.mean(X.when_pl(c < F.col("__var_t"), c, None)),
                F.first("__var_t"),
            ).alias("cvar")
        )
    )

    episodes = keyed.episode_stats_keyed(
        base, keys, "__dd", length_mode="days", temporal_name=temporal
    ).select(
        key_col,
        F.col("longest_days").alias("longest_drawdown_days"),
        F.col("avg_days").alias("avg_drawdown_days"),
        F.col("avg_dd").alias("avg_drawdown"),
    )

    out = main.join(cvar, key_col, "left").join(episodes, key_col, "left")
    base.unpersist()
    return out
