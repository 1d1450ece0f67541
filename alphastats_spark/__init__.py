"""alphastats-spark: PySpark-native portfolio analytics.

A from-scratch rebuild of the capabilities of the reference library
(``alphaprime-dev/alphastats`` — Polars-backed QuantStats-style metrics)
on the Spark DataFrame/Catalyst stack, designed for 100 TB-scale inputs.

Public surface mirrors the reference's export list
(``alphastats/__init__.py:1-4``): the ``stats`` module and
``reports.metrics`` — plus the beyond-reference scale surface:
``sources`` (I/O), ``streaming``, ``plans`` (plan audit), ``functions``
(dedup / similarity / text / multimodal) and the ``operators`` primitives.
"""

from alphastats_spark import (
    exceptions,
    functions,
    long_frame,
    plans,
    reports,
    session,
    sources,
    stats,
    streaming,
)
from alphastats_spark.session import build_session
from alphastats_spark.operators.ordered import release_pass_caches
from alphastats_spark.exceptions import (
    AlphaStatsError,
    AmbiguousBenchmarkReturnsError,
    MultipleTemporalColumnsError,
    NoReturnColumnError,
    NoTemporalColumnError,
)

__all__ = [
    "stats",
    "reports",
    "long_frame",
    "exceptions",
    "session",
    "build_session",
    "sources",
    "streaming",
    "plans",
    "functions",
    "release_pass_caches",
    "AlphaStatsError",
    "AmbiguousBenchmarkReturnsError",
    "MultipleTemporalColumnsError",
    "NoReturnColumnError",
    "NoTemporalColumnError",
]

__version__ = "0.1.0"
