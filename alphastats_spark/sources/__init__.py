"""File-format sources and sinks for returns frames.

The reference has no I/O layer at all — every input is an in-memory Polars
frame (SURVEY §2.7). On Spark the scan IS the scale story: schema-declared
reads keep predicate pushdown and column pruning intact, and a
year-partitioned parquet layout gives partition pruning on the trailing
date filters (``stats._date_filtered_returns``).
"""

from alphastats_spark.sources.maintenance import compact_partitioned_parquet
from alphastats_spark.sources.readers import (
    long_to_wide,
    prices_to_returns,
    read_returns,
    wide_to_long,
    write_bucketed_table,
    write_returns,
)

__all__ = [
    "read_returns",
    "write_returns",
    "write_bucketed_table",
    "prices_to_returns",
    "long_to_wide",
    "wide_to_long",
    "compact_partitioned_parquet",
]
