"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each SURVEY §2 operator gets a named query over the driver's synthetic
tables and an equivalent ANSI-SQL oracle that DuckDB runs on the same
parquet. The shared input is a deterministic daily returns series derived
from ``orders`` (daily revenue pct-change) — and a benchmark series from
``lineitem`` — so every metric exercises the real ingest path
(parquet scan → groupBy → ordered lag → metric).

Both sides round results to 7 decimals: Spark and DuckDB aggregate floats in
different orders, so unrounded values differ at ~1e-12 relative; the
driver's value-hash comparison needs bit-identical output.
"""

from __future__ import annotations

import math
from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alphastats_spark import expressions as X
from alphastats_spark import stats
from alphastats_spark.operators import islands, joins, ordered

ROUND = 7

# ---------------------------------------------------------------------------
# shared input derivation

RETURNS_CTE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
rets0 AS (
    SELECT d, rev / LAG(rev) OVER (ORDER BY d) - 1 AS r FROM daily
),
rets AS (SELECT d, r FROM rets0 WHERE r IS NOT NULL)
"""

BENCH_CTE = """,
bdaily AS (
    SELECT CAST(l_shipdate AS DATE) AS d, SUM(l_extendedprice * (1 - l_discount)) AS rev
    FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
),
bres0 AS (
    SELECT d, rev / LAG(rev) OVER (ORDER BY d) - 1 AS b FROM bdaily
),
bres AS (SELECT d, b FROM bres0 WHERE b IS NOT NULL)
"""

# drawdown series in log space — mirrors operators.ordered.add_drawdown_columns
DD_CTE = """,
wealth AS (
    SELECT d, r, EXP(SUM(LN(1 + r)) OVER (ORDER BY d)) AS w FROM rets
),
dds AS (
    SELECT d, r, LEAST(w / MAX(w) OVER (ORDER BY d) - 1, 0) AS dd FROM wealth
)
"""


def load_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → daily revenue → pct-change returns (temporal col ``d``)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    daily = ordered.with_order(daily, "d")
    daily = ordered.add_lag_columns(daily, {"__prev": "rev"})
    rets = (
        daily.withColumn("r", F.col("rev") / F.col("__prev") - 1)
        .where(F.col("r").isNotNull())
        .select("d", "r")
    )
    return rets


def load_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    daily = ordered.with_order(daily, "d")
    daily = ordered.add_lag_columns(daily, {"__prev": "rev"})
    return (
        daily.withColumn("b", F.col("rev") / F.col("__prev") - 1)
        .where(F.col("b").isNotNull())
        .select("d", "b")
    )


def _round_df(df: DataFrame) -> DataFrame:
    """Round every double column to ROUND decimals (hash stability)."""
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            cols.append(F.round(F.col(f.name), ROUND).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _metric_query(fn):
    """Wrap a stats metric: (spark, sf_dir) → 1-row DF aliased ``value``."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        res = fn(load_returns(spark, sf_dir))
        return _round_df(res.select(F.col("r").alias("value")))

    return q


def _bench_query(fn):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        res = fn(load_returns(spark, sf_dir), load_benchmark(spark, sf_dir))
        return _round_df(res.select(F.col("r").alias("value")))

    return q


def _scalar_sql(expr: str, extra_cte: str = "") -> str:
    return f"{RETURNS_CTE}{extra_cte}\nSELECT ROUND(({expr}), {ROUND}) AS value FROM rets"


_Z95 = NormalDist().inv_cdf(0.05)  # -1.6448536269514722


def build_registry():
    """Return (queries, oracles) dicts for the driver contract."""
    q: dict = {}
    o: dict = {}

    def add(name, query_fn, oracle: str | None):
        q[name] = query_fn
        if oracle is not None:
            o[name] = oracle

    # ---- stateless aggregates ------------------------------------------
    add("comp", _metric_query(stats.comp),
        _scalar_sql("EXP(SUM(LN(1 + r))) - 1"))
    add("cagr", _metric_query(stats.cagr),
        _scalar_sql("POW(EXP(SUM(LN(1 + r))), 252.0 / COUNT(r)) - 1"))
    add("cagr_simple", _metric_query(lambda r: stats.cagr(r, compound=False)),
        _scalar_sql("POW(SUM(r) + 1, 252.0 / COUNT(r)) - 1"))
    add("sharpe", _metric_query(stats.sharpe),
        _scalar_sql("AVG(r) / STDDEV_SAMP(r) * SQRT(252)"))
    add("sharpe_rf", _metric_query(lambda r: stats.sharpe(r, rf=0.0001)),
        _scalar_sql("AVG(r - 0.0001) / STDDEV_SAMP(r - 0.0001) * SQRT(252)"))
    add("sortino", _metric_query(stats.sortino),
        _scalar_sql("AVG(r) / SQRT(AVG(POW(LEAST(r, 0), 2))) * SQRT(252)"))
    add("volatility", _metric_query(stats.volatility),
        _scalar_sql("STDDEV_SAMP(r) * SQRT(252)"))
    add("exposure", _metric_query(stats.exposure),
        _scalar_sql("SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(r)"))
    add("omega", _metric_query(stats.omega),
        _scalar_sql("SUM(GREATEST(r, 0)) / SUM(GREATEST(-r, 0))"))
    add("cpc_index", _metric_query(stats.cpc_index), _scalar_sql(
        "(SUM(CASE WHEN r >= 0 THEN r ELSE 0 END) / ABS(SUM(CASE WHEN r < 0 THEN r ELSE 0 END)))"
        " * ((SUM(CASE WHEN r >= 0 THEN r ELSE 0 END) / SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END))"
        "    / (ABS(SUM(CASE WHEN r < 0 THEN r ELSE 0 END)) / SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END)))"
        " * (SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END))"
    ))
    add("expected_return", _metric_query(stats.expected_return),
        _scalar_sql("POW(EXP(SUM(LN(1 + r))), 1.0 / COUNT(r)) - 1"))
    add("best", _metric_query(stats.best), _scalar_sql("MAX(r)"))
    add("worst", _metric_query(stats.worst), _scalar_sql("MIN(r)"))
    add("skew", _metric_query(stats.skew), _scalar_sql("SKEWNESS(r)"))
    add("kurtosis", _metric_query(stats.kurtosis), _scalar_sql("KURTOSIS(r)"))
    add("avg_return", _metric_query(stats.avg_return),
        _scalar_sql("AVG(CASE WHEN r <> 0 THEN r END)"))
    add("avg_win", _metric_query(stats.avg_win),
        _scalar_sql("AVG(CASE WHEN r > 0 THEN r END)"))
    add("avg_loss", _metric_query(stats.avg_loss),
        _scalar_sql("AVG(CASE WHEN r < 0 THEN r END)"))
    add("win_rate", _metric_query(stats.win_rate), _scalar_sql(
        "SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END)"
    ))
    add("payoff_ratio", _metric_query(stats.payoff_ratio), _scalar_sql(
        "AVG(CASE WHEN r > 0 THEN r END) / ABS(AVG(CASE WHEN r < 0 THEN r END))"
    ))
    add("profit_factor", _metric_query(stats.profit_factor), _scalar_sql(
        "SUM(CASE WHEN r >= 0 THEN r ELSE 0 END) / ABS(SUM(CASE WHEN r < 0 THEN r ELSE 0 END))"
    ))
    add("gain_to_pain_ratio", _metric_query(stats.gain_to_pain_ratio), _scalar_sql(
        "SUM(r) / ABS(SUM(CASE WHEN r < 0 THEN r ELSE 0 END))"
    ))
    add("gain_to_pain_ratio_1m", _metric_query(stats.gain_to_pain_ratio_1m), RETURNS_CTE + """
, monthly AS (
    SELECT SUM(r) AS mr FROM rets GROUP BY YEAR(d), MONTH(d)
)
SELECT ROUND(SUM(mr) / ABS(SUM(CASE WHEN mr < 0 THEN mr ELSE 0 END)), 7) AS value FROM monthly
""")
    add("tail_ratio", _metric_query(stats.tail_ratio), _scalar_sql(
        "ABS(QUANTILE_CONT(r, 0.95)) / ABS(QUANTILE_CONT(r, 0.05))"
    ))
    add("common_sense_ratio", _metric_query(stats.common_sense_ratio), _scalar_sql(
        "(SUM(CASE WHEN r >= 0 THEN r ELSE 0 END) / ABS(SUM(CASE WHEN r < 0 THEN r ELSE 0 END)))"
        " * (ABS(QUANTILE_CONT(r, 0.95)) / ABS(QUANTILE_CONT(r, 0.05)))"
    ))
    add("outlier_win_ratio", _metric_query(stats.outlier_win_ratio), _scalar_sql(
        "QUANTILE_CONT(r, 0.99) / AVG(CASE WHEN r >= 0 THEN r END)"
    ))
    add("outlier_loss_ratio", _metric_query(stats.outlier_loss_ratio), _scalar_sql(
        "QUANTILE_CONT(r, 0.01) / AVG(CASE WHEN r < 0 THEN r END)"
    ))
    add("kelly_criterion", _metric_query(stats.kelly_criterion), _scalar_sql(
        "((AVG(CASE WHEN r > 0 THEN r END) / ABS(AVG(CASE WHEN r < 0 THEN r END)))"
        " * (SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END))"
        " - (1 - SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END)))"
        " / (AVG(CASE WHEN r > 0 THEN r END) / ABS(AVG(CASE WHEN r < 0 THEN r END)))"
    ))
    add("risk_of_ruin", _metric_query(stats.risk_of_ruin), _scalar_sql(
        "POW((1 - SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END))"
        " / (1 + SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN r <> 0 THEN 1 ELSE 0 END)), COUNT(r))"
    ))
    add("value_at_risk", _metric_query(stats.value_at_risk),
        _scalar_sql(f"AVG(r) + ({_Z95!r}) * STDDEV_SAMP(r)"))
    add("cvar", _metric_query(stats.conditional_value_at_risk), RETURNS_CTE + f"""
, v AS (SELECT AVG(r) + ({_Z95!r}) * STDDEV_SAMP(r) AS var_v FROM rets)
SELECT ROUND(COALESCE(
    (SELECT AVG(r) FROM rets, v WHERE r < var_v),
    (SELECT var_v FROM v)), {ROUND}) AS value
""")

    # ---- order-dependent -------------------------------------------------
    add("max_drawdown", _metric_query(stats.max_drawdown),
        RETURNS_CTE + DD_CTE + f"\nSELECT ROUND(MIN(dd), {ROUND}) AS value FROM dds")
    # date emitted as ISO string on both sides — pandas converts DuckDB DATE
    # to Timestamp but Spark DATE to datetime.date, which would hash-mismatch
    add("to_drawdowns", lambda spark, sf_dir: _round_df(
        stats.to_drawdowns(load_returns(spark, sf_dir)).select(
            F.col("d").cast("string").alias("d"), F.col("r").alias("drawdown"))
        ),
        RETURNS_CTE + DD_CTE
        + f"\nSELECT CAST(d AS VARCHAR) AS d, ROUND(dd, {ROUND}) AS drawdown FROM dds")
    add("calmar", _metric_query(stats.calmar), RETURNS_CTE + DD_CTE + f"""
SELECT ROUND(
  (SELECT POW(EXP(SUM(LN(1 + r))), 252.0 / COUNT(r)) - 1 FROM rets)
  / ABS((SELECT MIN(dd) FROM dds)), {ROUND}) AS value
""")
    add("ulcer_index", _metric_query(stats.ulcer_index), RETURNS_CTE + DD_CTE + f"""
SELECT ROUND(SQRT(SUM(dd * dd) / (COUNT(dd) - 1)), {ROUND}) AS value FROM dds
""")
    add("recovery_factor", _metric_query(stats.recovery_factor), RETURNS_CTE + DD_CTE + f"""
SELECT ROUND(ABS((SELECT SUM(r) FROM rets)) / ABS((SELECT MIN(dd) FROM dds)), {ROUND}) AS value
""")
    add("serenity_index", _metric_query(stats.serenity_index), RETURNS_CTE + DD_CTE + f"""
, p AS (
  SELECT AVG(dd) + ({_Z95!r}) * STDDEV_SAMP(dd) AS dd_var,
         SQRT(SUM(dd * dd) / (COUNT(dd) - 1)) AS ulcer
  FROM dds
),
cv AS (
  SELECT COALESCE((SELECT AVG(dd) FROM dds, p WHERE dd < p.dd_var),
                  (SELECT dd_var FROM p)) AS dd_cvar
)
SELECT ROUND(
  (SELECT SUM(r) FROM rets)
  / ((SELECT ulcer FROM p) * (-(SELECT dd_cvar FROM cv) / (SELECT STDDEV_SAMP(r) FROM rets))),
  {ROUND}) AS value
""")
    add("consecutive_wins",
        lambda spark, sf_dir: stats.consecutive_wins(load_returns(spark, sf_dir))
        .select(F.col("r").cast("bigint").alias("value")),
        RETURNS_CTE + """
, f AS (SELECT d, CASE WHEN r > 0 THEN 0 ELSE 1 END AS brk FROM rets),
i AS (SELECT d, brk, SUM(brk) OVER (ORDER BY d) AS isl FROM f),
runs AS (SELECT isl, COUNT(*) AS cnt FROM i WHERE brk = 0 GROUP BY isl)
SELECT COALESCE(MAX(cnt), 0) AS value FROM runs
""")
    add("consecutive_losses",
        lambda spark, sf_dir: stats.consecutive_losses(load_returns(spark, sf_dir))
        .select(F.col("r").cast("bigint").alias("value")),
        RETURNS_CTE + """
, f AS (SELECT d, CASE WHEN r < 0 THEN 0 ELSE 1 END AS brk FROM rets),
i AS (SELECT d, brk, SUM(brk) OVER (ORDER BY d) AS isl FROM f),
runs AS (SELECT isl, COUNT(*) AS cnt FROM i WHERE brk = 0 GROUP BY isl)
SELECT COALESCE(MAX(cnt), 0) AS value FROM runs
""")
    episodes_cte = RETURNS_CTE + DD_CTE + """
, f AS (SELECT d, dd, CASE WHEN dd < 0 THEN 0 ELSE 1 END AS brk FROM dds),
i AS (SELECT d, dd, brk, SUM(brk) OVER (ORDER BY d) AS isl FROM f),
eps AS (
  SELECT isl, MIN(dd) AS min_dd, DATEDIFF('day', MIN(d), MAX(d)) + 1 AS len
  FROM i WHERE brk = 0 GROUP BY isl
)
"""
    add("longest_drawdown_days",
        lambda spark, sf_dir: stats.longest_drawdown_days(load_returns(spark, sf_dir))
        .select(F.col("r").cast("bigint").alias("value")),
        episodes_cte + "SELECT COALESCE(MAX(len), 0) AS value FROM eps")
    add("avg_drawdown_days",
        lambda spark, sf_dir: _round_df(
            stats.avg_drawdown_days(load_returns(spark, sf_dir)).select(F.col("r").alias("value"))
        ),
        episodes_cte + f"SELECT ROUND(COALESCE(AVG(len), 0), {ROUND}) AS value FROM eps")
    add("avg_drawdown",
        lambda spark, sf_dir: _round_df(
            stats.avg_drawdown(load_returns(spark, sf_dir)).select(F.col("r").alias("value"))
        ),
        episodes_cte + f"SELECT ROUND(COALESCE(AVG(min_dd), 0), {ROUND}) AS value FROM eps")

    # ---- calendar & trailing windows -------------------------------------
    add("monthly_returns",
        lambda spark, sf_dir: _round_df(
            stats._simple_returns(load_returns(spark, sf_dir), "month", True)[0]
            .select(F.col("__g_year").cast("bigint").alias("y"),
                    F.col("__g_sub").cast("bigint").alias("m"),
                    F.col("r").alias("monthly_return"))
        ),
        RETURNS_CTE + f"""
SELECT YEAR(d) AS y, MONTH(d) AS m,
       ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS monthly_return
FROM rets GROUP BY YEAR(d), MONTH(d)
""")
    add("best_month", _metric_query(stats.best_month), RETURNS_CTE + f"""
, monthly AS (SELECT EXP(SUM(LN(1 + r))) - 1 AS mr FROM rets GROUP BY YEAR(d), MONTH(d))
SELECT ROUND(MAX(mr), {ROUND}) AS value FROM monthly
""")
    add("worst_year", _metric_query(stats.worst_year), RETURNS_CTE + f"""
, yearly AS (SELECT EXP(SUM(LN(1 + r))) - 1 AS yr FROM rets GROUP BY YEAR(d))
SELECT ROUND(MIN(yr), {ROUND}) AS value FROM yearly
""")
    add("expected_monthly", _metric_query(stats.expected_monthly), RETURNS_CTE + f"""
, monthly AS (SELECT EXP(SUM(LN(1 + r))) - 1 AS mr FROM rets GROUP BY YEAR(d), MONTH(d))
SELECT ROUND(POW(EXP(SUM(LN(1 + mr))), 1.0 / COUNT(mr)) - 1, {ROUND}) AS value FROM monthly
""")
    add("win_month", _metric_query(stats.win_month), RETURNS_CTE + f"""
, monthly AS (SELECT EXP(SUM(LN(1 + r))) - 1 AS mr FROM rets GROUP BY YEAR(d), MONTH(d))
SELECT ROUND(SUM(CASE WHEN mr > 0 THEN 1 ELSE 0 END) * 1.0
           / SUM(CASE WHEN mr <> 0 THEN 1 ELSE 0 END), {ROUND}) AS value FROM monthly
""")
    add("win_quarter", _metric_query(stats.win_quarter), RETURNS_CTE + f"""
, qtr AS (SELECT EXP(SUM(LN(1 + r))) - 1 AS qr FROM rets GROUP BY YEAR(d), QUARTER(d))
SELECT ROUND(SUM(CASE WHEN qr > 0 THEN 1 ELSE 0 END) * 1.0
           / SUM(CASE WHEN qr <> 0 THEN 1 ELSE 0 END), {ROUND}) AS value FROM qtr
""")
    add("mtd", _metric_query(stats.mtd), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS value
FROM rets, mx WHERE YEAR(d) = YEAR(md) AND MONTH(d) = MONTH(md)
""")
    add("ytd", _metric_query(stats.ytd), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS value
FROM rets, mx WHERE YEAR(d) = YEAR(md)
""")
    add("three_month", _metric_query(stats.three_month), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS value
FROM rets, mx WHERE d >= md - INTERVAL 3 MONTH
""")
    add("six_month", _metric_query(stats.six_month), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS value
FROM rets, mx WHERE d >= md - INTERVAL 6 MONTH
""")
    add("one_year", _metric_query(stats.one_year), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(EXP(SUM(LN(1 + r))) - 1, {ROUND}) AS value
FROM rets, mx WHERE d >= md - INTERVAL 12 MONTH
""")
    add("three_year", _metric_query(stats.three_year), RETURNS_CTE + f"""
, mx AS (SELECT MAX(d) AS md FROM rets)
SELECT ROUND(POW(EXP(SUM(LN(1 + r))), 252.0 / COUNT(r)) - 1, {ROUND}) AS value
FROM rets, mx WHERE d >= md - INTERVAL 36 MONTH
""")

    # ---- benchmark-relative ----------------------------------------------
    asof_cte = RETURNS_CTE + BENCH_CTE + """
, joined AS (
    SELECT rets.d AS d, rets.r AS r, bres.b AS b
    FROM rets ASOF LEFT JOIN bres ON rets.d >= bres.d
)
"""
    add("greeks",
        lambda spark, sf_dir: _round_df(
            stats.greeks(load_returns(spark, sf_dir), load_benchmark(spark, sf_dir))
            .select(F.col("r.alpha").alias("alpha"), F.col("r.beta").alias("beta"))
        ),
        asof_cte + f"""
SELECT ROUND((AVG(r) - (COVAR_SAMP(r, b) / VAR_SAMP(b)) * AVG(b)) * 252, {ROUND}) AS alpha,
       ROUND(COVAR_SAMP(r, b) / VAR_SAMP(b), {ROUND}) AS beta
FROM joined
""")
    add("information_ratio", _bench_query(stats.information_ratio),
        asof_cte + f"SELECT ROUND(AVG(r - b) / STDDEV_SAMP(r - b), {ROUND}) AS value FROM joined")
    add("correlation", _bench_query(stats.correlation),
        asof_cte + f"SELECT ROUND(CORR(r, b), {ROUND}) AS value FROM joined")
    add("r_squared", _bench_query(stats.r_squared),
        asof_cte + f"SELECT ROUND(POW(CORR(r, b), 2), {ROUND}) AS value FROM joined")
    add("treynor_ratio", _bench_query(stats.treynor_ratio), asof_cte + f"""
SELECT ROUND((EXP(SUM(LN(1 + r))) - 1) / (COVAR_SAMP(r, b) / VAR_SAMP(b)), {ROUND}) AS value
FROM joined
""")

    # ---- non-SQL-expressible (rows-only check) ----------------------------
    add("autocorr_penalty",
        lambda spark, sf_dir: _round_df(
            stats.autocorr_penalty(load_returns(spark, sf_dir)).select(F.col("r").alias("value"))
        ),
        None)
    add("psr",
        lambda spark, sf_dir: _round_df(
            stats.probabilistic_sharpe_ratio(load_returns(spark, sf_dir))
            .select(F.col("r").alias("value"))
        ),
        None)
    add("smart_sharpe",
        lambda spark, sf_dir: _round_df(
            stats.smart_sharpe(load_returns(spark, sf_dir)).select(F.col("r").alias("value"))
        ),
        None)
    add("report_basic",
        lambda spark, sf_dir: __import__("alphastats_spark.reports", fromlist=["metrics"]).metrics(
            load_returns(spark, sf_dir), display=False, mode="basic"
        ),
        None)

    return q, o
