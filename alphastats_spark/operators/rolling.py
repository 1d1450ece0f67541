"""Per-row trailing (rolling) window metrics, distributed.

A rolling N-day metric is ``RANGE BETWEEN N-1 PRECEDING AND CURRENT ROW``
over event time. The naive Spark plan (``Window.orderBy(ts)`` with no
partition) funnels every row through one task; this module uses **overlap
replication**: bucket rows into fixed N-day spans (so any trailing window
crosses at most one bucket boundary), ship a ghost copy of each row to the
next bucket, run the range window *within* buckets — fully parallel — and
drop the ghosts on output. Cost: 2× rows through one shuffle, no global
funnel, exact results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from alphastats_spark import _utils
from alphastats_spark.exceptions import NoTemporalColumnError

# builders: name -> fn(value_col, window). Every AGGREGATE inside must get
# its own .over(w) — a composite like avg/stddev cannot take one shared
# .over() call.
ROLLING_METRICS: dict[str, Callable[[Column, Window], Column]] = {
    "mean": lambda c, w: F.avg(c).over(w),
    "sum": lambda c, w: F.sum(c).over(w),
    "n_obs": lambda c, w: F.count(c).over(w).cast("long"),
    # windowed stddev_samp yields NaN (not null) on a 1-row frame — define
    # n<2 → null so rolling and aggregate volatility semantics agree
    "volatility": lambda c, w: F.when(
        F.count(c).over(w) >= 2, F.stddev_samp(c).over(w) * F.lit(252.0**0.5)
    ),
    "sharpe": lambda c, w: F.when(
        F.count(c).over(w) >= 2,
        F.avg(c).over(w) / F.stddev_samp(c).over(w) * F.lit(252.0**0.5),
    ),
    "min": lambda c, w: F.min(c).over(w),
    "max": lambda c, w: F.max(c).over(w),
}


def trailing_metrics(
    df: DataFrame,
    days: int,
    temporal: str | None = None,
    cols: list[str] | None = None,
    metrics: dict[str, Callable[[Column, Window], Column]] | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row trailing ``days``-day metrics for every numeric column.

    Output keeps the input rows (keys + temporal + value columns) plus
    ``{col}_{metric}`` columns computed over the inclusive trailing window
    ``[t - days + 1, t]`` in calendar days. With ``key_cols`` (the
    multi-asset long-frame shape) the window is per key and the
    overlap-replication buckets become (keys × N-day span) — parallel
    across keys AND across time within each key.
    """
    if days < 1:
        raise ValueError("days must be >= 1")
    temporal = temporal or _utils.get_temporal_column_name(df)
    if temporal is None:
        raise NoTemporalColumnError
    key_cols = key_cols or []
    cols = cols or [c for c in _utils.numeric_column_names(df) if c not in key_cols]
    metrics = metrics or ROLLING_METRICS

    ts = F.col(temporal)
    dtype = dict(df.dtypes)[temporal]
    day = (
        F.datediff(ts, F.lit("1970-01-01"))
        if dtype == "date"
        else F.floor(F.unix_timestamp(ts) / 86400)
    ).cast("long")

    # a null-temporal row has no trailing window (and its native + ghost
    # copies would become range-frame peers of each other in the null
    # bucket, double-counting) — excluded, like any date-based reference op
    base = df.where(ts.isNotNull()).select(
        *[F.col(k) for k in key_cols],
        ts.alias(temporal),
        *[F.col(c) for c in cols],
    ).withColumn("__day", day)
    # fixed N-day buckets: a trailing N-day window reaches into at most the
    # previous bucket, so one ghost copy per row suffices
    native = base.withColumn("__bkt", F.floor(F.col("__day") / days)).withColumn(
        "__ghost", F.lit(False)
    )
    ghost = base.withColumn("__bkt", F.floor(F.col("__day") / days) + 1).withColumn(
        "__ghost", F.lit(True)
    )
    unioned = native.unionByName(ghost)

    w = (
        Window.partitionBy(*key_cols, "__bkt")
        .orderBy(F.col("__day"))
        .rangeBetween(-(days - 1), 0)
    )
    out_cols = [
        fn(F.col(c), w).alias(f"{c}_{name}")
        for c in cols
        for name, fn in metrics.items()
    ]
    out = unioned.select("*", *out_cols).where(~F.col("__ghost"))
    return out.drop("__day", "__bkt", "__ghost")


def rolling_greeks(
    df: DataFrame,
    days: int,
    benchmark_col: str,
    temporal: str | None = None,
    cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    periods_per_year: int = 252,
) -> DataFrame:
    """Per-row trailing CAPM greeks vs a benchmark column that rides the
    same rows: ``{col}_beta`` = windowed covar/var, ``{col}_alpha`` =
    annualized windowed intercept, ``{col}_corr`` = windowed correlation —
    the rolling complement of the aggregate ``stats.greeks``/
    ``stats.correlation``. Windows where the benchmark variance is 0
    (fewer than 2 observations, or a flat benchmark) yield null, matching
    the aggregate path's undefined-beta behaviour; ``corr`` additionally
    nulls on a flat strategy window.

    Same overlap-replication machinery (and scale posture) as
    :func:`trailing_metrics`; the benchmark column is appended to the
    windowed selection so the two-column covariance runs inside the same
    per-bucket range window, then its self-referential metric columns are
    dropped (beta of the benchmark against itself is identically 1).
    """
    b = F.col(benchmark_col)
    p = F.lit(float(periods_per_year))

    def beta_fn(c: Column, w) -> Column:
        return F.when(
            F.var_samp(b).over(w) > 0, F.covar_samp(c, b).over(w) / F.var_samp(b).over(w)
        )

    def alpha_fn(c: Column, w) -> Column:
        beta = F.covar_samp(c, b).over(w) / F.var_samp(b).over(w)
        return F.when(
            F.var_samp(b).over(w) > 0,
            (F.avg(c).over(w) - beta * F.avg(b).over(w)) * p,
        )

    def corr_fn(c: Column, w) -> Column:
        # covar_samp/(std_samp*std_samp) rather than F.corr: the (n-1)
        # factors cancel identically, and the explicit form is what the
        # DuckDB oracle replicates expression-for-expression
        return F.when(
            (F.var_samp(b).over(w) > 0) & (F.var_samp(c).over(w) > 0),
            F.covar_samp(c, b).over(w)
            / (F.stddev_samp(c).over(w) * F.stddev_samp(b).over(w)),
        )

    metrics = {
        "beta": beta_fn,
        "alpha": alpha_fn,
        "corr": corr_fn,
        "n_obs": lambda c, w: F.count(c).over(w).cast("long"),
    }
    key_cols = key_cols or []
    if cols is None:
        cols = [
            c
            for c in _utils.numeric_column_names(df)
            if c not in key_cols and c != benchmark_col
        ]
    out = trailing_metrics(
        df, days, temporal, cols=cols + [benchmark_col], metrics=metrics, key_cols=key_cols
    )
    return out.drop(*[f"{benchmark_col}_{m}" for m in metrics])
