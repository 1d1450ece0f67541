"""Schema discovery and input normalization.

Parity target: ``alphastats/_utils.py`` in the reference. The reference data
model is a *returns frame*: zero-or-one temporal column plus N numeric
"strategy" columns; every metric broadcasts column-wise over all numeric
columns. Columns are discovered from the schema per call — no declared
schemas anywhere (reference ``_utils.py:10-22``).

Spark-first notes
-----------------
* ``to_returns_df`` replaces the reference's ``to_lazy`` (``_utils.py:25-34``).
  A ``pyspark.sql.DataFrame`` is already lazy, so no Series/DataFrame/Lazy
  split is needed. For the reference's ``pl.Series`` ergonomics (scalar in →
  scalar out) we accept ``pandas.Series``, 1-D numpy arrays and plain Python
  sequences; those flow through ``spark.createDataFrame`` and the metric
  returns a Python scalar instead of a 1-row DataFrame.
* NaN→null normalization (reference ``_utils.py:34``) is applied to
  float/double columns only — integer columns cannot hold NaN.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alphastats_spark.exceptions import (
    AmbiguousBenchmarkReturnsError,
    MultipleTemporalColumnsError,
    NoReturnColumnError,
)

BENCHMARK_RETURNS_COLNAME = "_benchmark_returns"

_TEMPORAL_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)
_NUMERIC_TYPES = (T.NumericType,)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def temporal_column_names(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _TEMPORAL_TYPES)]


def get_temporal_column_name(df: DataFrame) -> str | None:
    """Find the single temporal column, mirroring reference ``_utils.py:16-22``."""
    names = temporal_column_names(df)
    if len(names) > 1:
        raise MultipleTemporalColumnsError(names)
    return names[0] if names else None


def numeric_column_names(df: DataFrame) -> list[str]:
    """All numeric (returns) columns, mirroring ``cs.numeric()`` selection."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)]


def nan_to_null(df: DataFrame) -> DataFrame:
    """NaN → null on every float column (reference ``_utils.py:34``)."""
    exprs = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, _FLOAT_TYPES):
            c = F.col(f.name)
            exprs.append(F.when(F.isnan(c), F.lit(None)).otherwise(c).alias(f.name))
            changed = True
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs) if changed else df


def _active_session() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:  # pragma: no cover - convenience path
        spark = SparkSession.builder.getOrCreate()
    return spark


def to_returns_df(returns: Any) -> tuple[DataFrame, bool]:
    """Normalize input to a (DataFrame, scalar_mode) pair.

    scalar_mode=True means the caller passed series-like data (pandas Series,
    numpy 1-D array or a plain sequence of numbers) and metric functions
    should return a Python scalar, mirroring the reference's ``pl.Series``
    overloads (e.g. ``stats.py:43-44``).
    """
    if isinstance(returns, DataFrame):
        return nan_to_null(returns), False

    spark = _active_session()
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover
        pd = None

    if pd is not None and isinstance(returns, pd.Series):
        name = returns.name if returns.name is not None else "returns"
        pdf = returns.to_frame(name=str(name))
        return nan_to_null(spark.createDataFrame(pdf)), True
    if pd is not None and isinstance(returns, pd.DataFrame):
        return nan_to_null(spark.createDataFrame(returns)), False
    if isinstance(returns, Sequence) and not isinstance(returns, (str, bytes)):
        rows = [(float(v) if v is not None else None,) for v in returns]
        schema = T.StructType([T.StructField("returns", T.DoubleType(), True)])
        return nan_to_null(spark.createDataFrame(rows, schema)), True
    try:  # numpy arrays
        import numpy as np

        if isinstance(returns, np.ndarray) and returns.ndim == 1:
            rows = [(float(v),) for v in returns]
            schema = T.StructType([T.StructField("returns", T.DoubleType(), True)])
            return nan_to_null(spark.createDataFrame(rows, schema)), True
    except ImportError:  # pragma: no cover
        pass
    raise TypeError(f"Unsupported returns container: {type(returns)!r}")


def to_excess_returns(col: Column, rf: float | None) -> Column:
    """``r - rf`` unless rf is falsy (reference ``_utils.py:37-41``)."""
    if not rf:
        return col
    return col - F.lit(float(rf))


def prepare_benchmark(benchmark: DataFrame) -> DataFrame:
    """Validate and normalize a benchmark frame (reference ``_utils.py:44-57``).

    Exactly one numeric column, renamed to ``_benchmark_returns``; the
    temporal column (if any) is kept.
    """
    names = numeric_column_names(benchmark)
    if len(names) == 0:
        raise NoReturnColumnError
    if len(names) > 1:
        raise AmbiguousBenchmarkReturnsError(names)

    temporal = get_temporal_column_name(benchmark)
    cols = []
    if temporal is not None:
        cols.append(F.col(temporal))
    cols.append(F.col(names[0]).cast("double").alias(BENCHMARK_RETURNS_COLNAME))
    return benchmark.select(*cols)
