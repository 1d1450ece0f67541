"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-metric snapshot on sf0.001;
``queries()`` exposes one entry per implemented SURVEY §2 operator;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted for
non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from alphastats_spark import harness  # noqa: E402

_QUERIES, _ORACLES = harness.build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: one-pass multi-metric snapshot over sf0.001 returns."""
    from pyspark.sql import functions as F

    from alphastats_spark import expressions as X
    from alphastats_spark.operators import ordered

    rets = harness.load_returns(spark, "/root/testdata/sf0.001")
    rets = ordered.with_order(rets, "d")
    rets = ordered.add_drawdown_columns(rets, {"dd": "r"})
    c = F.col("r")
    return rets.agg(
        F.count(c).alias("n_days"),
        X.comp(c).alias("total_return"),
        X.cagr(c).alias("cagr"),
        X.sharpe(c, None, 252, True).alias("sharpe"),
        X.sortino(c, None, 252, True).alias("sortino"),
        X.volatility(c, 252, True).alias("volatility"),
        F.min("dd").alias("max_drawdown"),
        X.win_rate(c).alias("win_rate"),
        X.profit_factor(c).alias("profit_factor"),
        X.tail_ratio(c).alias("tail_ratio"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for the queries above."""
    return dict(_ORACLES)
