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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alphastats_spark import expressions as X
from alphastats_spark._utils import (
    BENCHMARK_RETURNS_COLNAME,
    get_temporal_column_name,
    prepare_benchmark,
)
from alphastats_spark.exceptions import NoTemporalColumnError
from alphastats_spark.operators import joins, keyed


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
    base = keyed.with_order_keyed(base, temporal)
    # peak positions ride along in the same prefix pass: the episode stats
    # below then need no island pass of their own
    base = keyed.add_drawdown_columns_keyed(
        base, keys, {"__dd": value_col}, with_peak_pos=True
    )
    # Persisted so the three consumers below (main aggs, CVaR join, episode
    # stats) compute the keyed drawdown enrichment once. The result is
    # returned lazily, so the cache must OUTLIVE this function — it fills on
    # the caller's first action and is evicted LRU (MEMORY_AND_DISK) or via
    # spark.catalog.clearCache(). An unpersist here would drop it before any
    # action ever ran (round-2 advisor finding). The cached projection is
    # narrow: (key, date, value, __dd) only.
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
        base, keys, "__dd", length_mode="days", temporal_name=temporal,
        pos_col="__dd__pos",
    ).select(
        key_col,
        F.col("longest_days").alias("longest_drawdown_days"),
        F.col("avg_days").alias("avg_drawdown_days"),
        F.col("avg_dd").alias("avg_drawdown"),
    )

    return main.join(cvar, key_col, "left").join(episodes, key_col, "left")


def smart_ratios_by_key(
    df: DataFrame,
    key_col: str = "asset",
    value_col: str = "r",
    temporal: str | None = None,
    rf: float | None = None,
    periods: int = 252,
) -> DataFrame:
    """Per-key sharpe/sortino plus their autocorrelation-penalized "smart"
    variants — penalty computed IN-PLAN (:func:`expressions.
    geometric_sum_penalty_col`), so a million keys never round-trip the
    driver (the wide-frame path evaluates the closed form per column on
    the driver — fine for dozens of columns, not for millions of keys).

    Pairing matches the reference: at each non-null row the "previous"
    value is the previous non-null value within the key (ffill-shift), via
    a per-key window — parallel across keys, no global funnel.
    """
    temporal = temporal or get_temporal_column_name(df)
    if temporal is None:
        raise NoTemporalColumnError
    c = F.col(value_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(temporal)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.when(c.isNotNull(), F.last(c, ignorenulls=True).over(w))
    enriched = df.select(key_col, temporal, value_col).withColumn("__prev", prev)

    penalty = X.geometric_sum_penalty_col(
        F.abs(F.corr(c, F.col("__prev"))), F.count(c)
    )
    sharpe_ = X.sharpe(c, rf, periods, True)
    sortino_ = X.sortino(c, rf, periods, True)
    return enriched.groupBy(key_col).agg(
        F.count(c).alias("n_obs"),
        F.abs(F.corr(c, F.col("__prev"))).alias("autocorr"),
        penalty.alias("autocorr_penalty"),
        sharpe_.alias("sharpe"),
        sortino_.alias("sortino"),
        (sharpe_ / penalty).alias("smart_sharpe"),
        (sortino_ / penalty).alias("smart_sortino"),
        (sortino_ / penalty / F.lit(2.0**0.5)).alias("smart_adjusted_sortino"),
    )


def with_benchmark(
    df: DataFrame,
    benchmark: DataFrame,
    key_col: str = "asset",
    temporal: str | None = None,
) -> DataFrame:
    """Attach the (single-series) benchmark to every key's rows by backward
    as-of match on the temporal column.

    Scalable shape: the as-of resolution runs on the DISTINCT DATES of the
    long frame (cardinality = calendar grain, independent of key count)
    against the benchmark series via the keyless distributed as-of join,
    and the resolved (date → benchmark) table — tiny by construction —
    broadcast-equi-joins back onto the long frame. No range join, no
    per-key scan of the benchmark.
    """
    temporal = temporal or get_temporal_column_name(df)
    if temporal is None:
        raise NoTemporalColumnError
    bench = prepare_benchmark(benchmark)
    b_temporal = get_temporal_column_name(bench)
    if b_temporal is None:
        raise NoTemporalColumnError
    dates = df.select(F.col(temporal)).distinct()
    resolved = joins.asof_join(dates, bench, temporal, b_temporal)
    return df.join(F.broadcast(resolved), on=temporal, how="left")


def benchmark_metrics_by_key(
    df: DataFrame,
    benchmark: DataFrame,
    key_col: str = "asset",
    value_col: str = "r",
    temporal: str | None = None,
    rf: float = 0.0,
    periods: int = 252,
) -> DataFrame:
    """Per-key benchmark-relative metrics (CAPM alpha/beta, information
    ratio, correlation, R², Treynor) in ONE grouped aggregation over the
    benchmark-attached long frame."""
    joined = with_benchmark(df, benchmark, key_col, temporal)
    c = F.col(value_col)
    b = F.col(BENCHMARK_RETURNS_COLNAME)
    beta = X.fdiv(F.covar_samp(c, b), F.var_samp(b))
    active = c - b
    return joined.groupBy(key_col).agg(
        ((F.mean(c) - beta * F.mean(b)) * periods).alias("alpha"),
        beta.alias("beta"),
        X.fdiv(F.mean(active), F.stddev_samp(active)).alias("information_ratio"),
        F.corr(c, b).alias("correlation"),
        F.pow(F.corr(c, b), 2).alias("r_squared"),
        X.fdiv(X.comp(c) - F.lit(rf), beta).alias("treynor_ratio"),
    )


def correlation_matrix(
    df: DataFrame,
    key_col: str = "asset",
    temporal: str | None = None,
    value_col: str = "r",
) -> DataFrame:
    """Pairwise Pearson correlation across every asset in the long frame —
    the cross-sectional extension of the reference's single-benchmark
    ``correlation`` (/root/reference/alphastats/stats.py: benchmark-relative
    metrics take exactly one benchmark; a portfolio engine needs the full
    matrix).

    Upper triangle only (``key_a < key_b``; the diagonal is 1 by
    definition). Plan: self-equi-join on the date key — co-partitioned by
    date, so each date's K rows meet locally — then one map-side-combinable
    groupBy on the unordered pair. Correlation pairs only align where BOTH
    assets observe the date (inner join = pairwise-complete observations,
    the standard estimator). At K assets the join emits ~K²/2 rows per
    date; for K in the tens of thousands move to a block-matrix scheme
    (bucket keys into B blocks, join block pairs) — for portfolio-scale K
    (hundreds) this single join IS the right plan.

    Output: ``(asset_a, asset_b, corr double, n_obs bigint)``; ``corr`` is
    null when fewer than 2 paired observations exist.
    """
    if temporal is None:
        temporal = get_temporal_column_name(df)
        if temporal is None:
            raise NoTemporalColumnError()
    left = df.select(
        F.col(key_col).alias("__ka"), F.col(temporal).alias("__d"),
        F.col(value_col).alias("__ra"),
    ).where(F.col("__ra").isNotNull())
    right = df.select(
        F.col(key_col).alias("__kb"), F.col(temporal).alias("__d"),
        F.col(value_col).alias("__rb"),
    ).where(F.col("__rb").isNotNull())
    pairs = left.join(right, on="__d").where(F.col("__ka") < F.col("__kb"))
    return pairs.groupBy(
        F.col("__ka").alias("asset_a"), F.col("__kb").alias("asset_b")
    ).agg(
        F.corr("__ra", "__rb").alias("corr"),
        F.count(F.lit(1)).alias("n_obs"),
    )
