"""Exception hierarchy for alphastats-spark.

Parity target: ``alphastats/exceptions.py:4-41`` in the reference — same four
error conditions (multiple temporal columns, ambiguous benchmark, missing
temporal column, missing return column) under one library base class.
"""

from __future__ import annotations

from collections.abc import Sequence


class AlphaStatsError(Exception):
    """Base exception for alphastats-spark."""


class MultipleTemporalColumnsError(AlphaStatsError):
    """Raised when a returns frame has more than one Date/Timestamp column."""

    def __init__(self, column_names: Sequence[str]) -> None:
        self.column_names = list(column_names)
        super().__init__(f"Must have exactly one temporal column. Found {self.column_names}")


class AmbiguousBenchmarkReturnsError(AlphaStatsError):
    """Raised when a benchmark frame has more than one numeric column."""

    def __init__(self, column_names: Sequence[str]) -> None:
        self.column_names = list(column_names)
        super().__init__(
            f"Ambiguous benchmark returns columns ({self.column_names}). Please provide a "
            "dataframe with a single benchmark returns column."
        )


class NoTemporalColumnError(AlphaStatsError):
    """Raised when a metric requires a temporal column and none exists."""

    def __init__(self) -> None:
        super().__init__(
            "This function requires a temporal column. Please provide a dataframe with a "
            "temporal column."
        )


class NoReturnColumnError(AlphaStatsError):
    """Raised when a benchmark frame has no numeric column."""

    def __init__(self) -> None:
        super().__init__(
            "No return column found. Please provide a dataframe with a return column."
        )
