"""Readers, sinks and shape converters for returns data.

Scale notes
-----------
* ``read_returns`` applies the reference's NaN→null ingest normalization
  (``alphastats/_utils.py:34``) directly on the scan projection, so it stays
  inside whole-stage codegen and does not block filter pushdown (the
  rewritten columns are the float returns; temporal filters still reach the
  parquet reader).
* CSV/JSON reads REQUIRE an explicit schema: schema inference is a full
  extra pass over the data — unacceptable at 100 TB — and silently turns
  every column nullable-string on dirty data.
* ``prices_to_returns`` uses the bucketed lag machinery from
  ``operators.ordered`` — no single-partition window — so a decades-long
  minute-bar price table converts in parallel.
* ``write_returns`` partitions output by year so later trailing-window
  queries (``mtd``/``ytd``/``three_year``…) prune whole directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alphastats_spark import _utils
from alphastats_spark.operators import ordered

_FORMATS = ("parquet", "csv", "json", "orc")


def read_returns(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read a returns frame and apply ingest normalization (NaN→null).

    Parquet/ORC carry their own schema; CSV/JSON must be given one
    explicitly (no inference pass at scale).
    """
    if format not in _FORMATS:
        raise ValueError(f"unsupported format {format!r}; expected one of {_FORMATS}")
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    elif format in ("csv", "json"):
        raise ValueError(f"{format} reads require an explicit schema (no inference at scale)")
    if format == "csv":
        options.setdefault("header", "true")
    df = reader.options(**options).load(path)
    return _utils.nan_to_null(df)


def read_corpus(
    spark: SparkSession,
    path: str,
    format: str = "jsonl",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read a document corpus; ``jsonl`` (one JSON object per line — the
    canonical LLM-corpus interchange format, splittable when uncompressed)
    maps onto Spark's native ``json`` source.

    Same no-inference-at-scale contract as :func:`read_returns`: jsonl/csv
    REQUIRE an explicit schema (inference is a full extra pass over 100 TB,
    and on dirty corpora silently widens every field to nullable string).
    Malformed lines surface under ``_corrupt_record`` semantics per Spark's
    ``mode`` option (default PERMISSIVE → null row; pass
    ``mode="DROPMALFORMED"`` to skip, ``"FAILFAST"`` to abort).
    """
    fmt = "json" if format == "jsonl" else format
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {format!r}; expected one of {_FORMATS} or 'jsonl'")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{format} reads require an explicit schema (no inference at scale)")
    return reader.options(**options).load(path)


def write_corpus(
    df: DataFrame,
    path: str,
    format: str = "jsonl",
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """Write a document corpus; ``partition_by`` (e.g. ``["source"]``)
    lays out one directory per value so source-filtered reads prune whole
    subtrees at the scan — the cheap first-level selector for a 100 TB
    corpus (keep it to low-cardinality columns; a high-cardinality
    partition key explodes the file count)."""
    fmt = "json" if format == "jsonl" else format
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_returns(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "error",
    partition_by_year: bool = True,
) -> None:
    """Write a returns frame, partitioned by ``__year`` of the temporal
    column (partition pruning for trailing-window reads)."""
    temporal = _utils.get_temporal_column_name(df)
    writer = df.write.format(format).mode(mode)
    if partition_by_year and temporal is not None:
        df = df.withColumn("__year", F.year(F.col(temporal)))
        writer = df.write.format(format).mode(mode).partitionBy("__year")
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (hash-partitioned-on-disk) table.

    THE shuffle-elimination tool for repeated joins/aggregations on the same
    key at 100 TB: two tables bucketed on the join key with the same bucket
    count join with NO exchange on either side (Spark recognizes the
    co-partitioning: ``scan → sort → merge-join``), and a ``groupBy`` on the
    bucket key skips its shuffle entirely. Use for the hot keys of a
    training-data pipeline — ``doc_id`` for dedup-verify joins, ``vec_id``
    for ANN re-ranking, the date column for returns frames.

    ``num_buckets`` is a layout-time commitment: pick ~(table size /
    target partition size) at the LARGEST anticipated scale — too few
    buckets caps downstream parallelism.
    """
    writer = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def prices_to_returns(prices: DataFrame, method: str = "simple") -> DataFrame:
    """Convert a wide price frame to a returns frame.

    ``simple``: p/p_prev − 1;  ``log``: ln(p/p_prev). The first row (no
    predecessor) is dropped. Distributed: one bucketed lag pass for ALL
    price columns at once.
    """
    if method not in ("simple", "log"):
        raise ValueError(f"unknown method {method!r}; expected 'simple' or 'log'")
    temporal = _utils.get_temporal_column_name(prices)
    cols = _utils.numeric_column_names(prices)
    df = ordered.with_order(prices, temporal)
    df = ordered.add_lag_columns(df, {f"__prev_{c}": c for c in cols})

    out = []
    if temporal is not None:
        out.append(F.col(temporal))
    for c in cols:
        ratio = F.col(c).cast("double") / F.col(f"__prev_{c}").cast("double")
        expr = F.log(ratio) if method == "log" else ratio - 1
        out.append(expr.alias(c))
    res = ordered.drop_order(df).select(*out)
    # drop the leading row(s) with no predecessor
    pred = None
    for c in cols:
        cond = F.col(c).isNotNull()
        pred = cond if pred is None else (pred | cond)
    return res.where(pred) if pred is not None else res


def long_to_wide(
    df: DataFrame,
    asset_col: str,
    value_col: str,
    temporal_col: str | None = None,
    assets: list[str] | None = None,
) -> DataFrame:
    """Pivot a long (date, asset, return) table into the reference's wide
    returns-frame shape — the usual shape tick/returns data arrives in.

    Pass ``assets`` explicitly at scale: without it Spark runs an extra
    distinct() job to discover pivot values.
    """
    temporal_col = temporal_col or _utils.get_temporal_column_name(df)
    if temporal_col is None:
        raise ValueError("long_to_wide requires a temporal column")
    grouped = df.groupBy(temporal_col)
    pivoted = grouped.pivot(asset_col, values=assets) if assets else grouped.pivot(asset_col)
    return pivoted.agg(F.first(value_col, ignorenulls=True))


def wide_to_long(df: DataFrame, asset_col: str = "asset", value_col: str = "r") -> DataFrame:
    """Unpivot a wide returns frame to long shape via a single-scan stack()."""
    temporal = _utils.get_temporal_column_name(df)
    cols = _utils.numeric_column_names(df)
    if not cols:
        raise ValueError("no numeric columns to unpivot")
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    head = [temporal] if temporal else []
    return df.selectExpr(
        *head, f"stack({len(cols)}, {stack_args}) as (`{asset_col}`, `{value_col}`)"
    )
