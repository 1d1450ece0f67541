"""Join helpers: backward as-of join and positional (horizontal) concat.

The reference joins strategy returns with a benchmark either by
``join_asof`` on the temporal columns (``alphastats/stats.py:446-449``) or by
positional horizontal concat when no temporal column exists
(``stats.py:451``). Spark has neither natively.

* ``asof_join`` — union-and-forward-fill: tag both sides, sort by
  (timestamp, side) so right-side rows at an equal timestamp precede left
  rows (backward-inclusive match, Polars' default), forward-fill the right
  value columns with the distributed two-phase ffill from
  ``operators.ordered``, keep left rows. One bucket shuffle, no
  single-partition window, no driver collect — works at any scale.
* ``positional_join`` — row-position equi-join. Row position is only
  meaningful for order-stable frames; the reference uses this solely for
  small keyless benchmark series, so we document the constraint rather than
  pretend positional semantics scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alphastats_spark.operators import ordered


#: Monotone bucket expressions for the as-of union frame: a long that is
#: non-decreasing in time (the two-phase ffill requirement). DATE inputs
#: use calendar arithmetic (dates carry no timezone; the 366/24
#: multipliers over-allocate within-period slots, preserving monotonicity
#: across period boundaries at no cost). TIMESTAMP inputs use plain epoch
#: division instead — year/dayofyear/hour on a timestamp read the SESSION
#: timezone, and a zone whose DST fall-back crosses a bucket boundary
#: would send later rows to an EARLIER bucket, silently breaking the fill
#: order; floor(epoch/width) is strictly monotone in the instant by
#: construction (the "month" width is a fixed 31 days — bucket boundaries
#: never matter semantically, only the per-bucket row count does).
_ASOF_BUCKETS = {
    "month": lambda ts: (F.year(ts) * 12 + F.month(ts)).cast("long"),
    "day": lambda ts: (F.year(ts) * 366 + F.dayofyear(ts)).cast("long"),
    "hour": lambda ts: (
        (F.year(ts) * 366 + F.dayofyear(ts)) * 24 + F.hour(ts)
    ).cast("long"),
}

_ASOF_EPOCH_WIDTH = {"month": 31 * 86400, "day": 86400, "hour": 3600}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    bucket: str = "month",
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right_on <= left_on`` (inclusive), like Polars ``join_asof``.

    ``bucket`` sets the ffill parallelism granularity — the coarse,
    order-aligned key the two-phase fill partitions on. ``"month"`` (the
    default) is right for daily financial series (a year of data = 12
    parallel buckets, each ~21 rows); for tick/intra-day data a month is
    one giant bucket, so pass ``"day"`` or ``"hour"`` to keep per-bucket
    row counts bounded. Any granularity returns IDENTICAL rows (pinned by
    ``tests/test_operators.py::test_asof_join_bucket_granularities_agree``)
    — the bucket only shapes the physical partitioning, never the match
    semantics."""
    value_cols = [c for c in right.columns if c != right_on]
    left_cols = [c for c in left.columns]

    # The right VALUES travel inside one struct: a right row's struct is
    # non-null even when every value in it is null, so the forward fill
    # stops at the MATCHED row and a matched-but-null benchmark value
    # surfaces as null (Polars join_asof / DuckDB ASOF JOIN semantics)
    # instead of filling through to an earlier non-null value.
    rv_type = "struct<" + ", ".join(
        f"`{f.name}`: {f.dataType.simpleString()}"
        for f in right.schema.fields if f.name != right_on
    ) + ">"
    l_tagged = left.select(
        F.col(left_on).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    left_schema = {f.name: f.dataType for f in left.schema.fields}
    r_tagged = right.select(
        F.col(right_on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_schema[c]).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Order: timestamp, then right-before-left at ties (backward-inclusive).
    if bucket not in _ASOF_BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_ASOF_BUCKETS)}, got {bucket!r}")
    unioned = unioned.withColumn(ordered.ORDER_COL, F.struct(F.col("__ts"), F.col("__side")))
    is_ts = unioned.schema["__ts"].dataType.typeName() == "timestamp"
    bucket_expr = (
        F.floor(F.unix_timestamp(F.col("__ts")) / F.lit(_ASOF_EPOCH_WIDTH[bucket])).cast("long")
        if is_ts
        else _ASOF_BUCKETS[bucket](F.col("__ts"))
    )
    unioned = unioned.withColumn(ordered.BUCKET_COL, bucket_expr)
    filled = ordered.add_ffill_columns(unioned, {"__rv__f": F.col("__rv")})
    out = filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col("__rv__f").getField(c).alias(c) for c in value_cols],
    )
    return out


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Align two frames by row position (reference horizontal concat,
    ``stats.py:451``; reports ``reports.py:373``).

    Row position is derived from input order — ``monotonically_increasing_id``
    ordered within each input partition plus a per-partition offset computed
    by the two-phase prefix machinery (``ordered.add_row_index``). No global
    single-partition window anywhere: the prefix runs parallel across
    partitions and the offset table is one row per input partition.
    Positional semantics are only meaningful for order-stable frames (the
    reference's keyless benchmark series); frames with a temporal column
    take the ``asof_join`` path instead.
    """

    def _indexed(df: DataFrame) -> DataFrame:
        out = ordered.with_order(df, None)
        out = ordered.add_row_index(out, "__idx")
        return out.drop(ordered.ORDER_COL, ordered.BUCKET_COL)

    l_idx = _indexed(left)
    r_idx = _indexed(right)
    return l_idx.join(r_idx, on="__idx", how="full").drop("__idx")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 1_800_000_000,
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join without a nested loop: match each
    point row to every interval of the same ``on`` key with
    ``start ≤ point ≤ end`` (inclusive both ends).

    Spark plans a keyless ``ts BETWEEN start AND end`` join as
    BroadcastNestedLoopJoin, and even with an equi-key the SortMergeJoin
    it picks generates every (point, interval) pair WITHIN a key before
    filtering — quadratic in the hot key, all of it in one task. Here
    both sides bucketize: a
    point belongs to exactly ONE ``point // bucket_width`` bucket, an
    interval EXPLODES to the buckets it covers, and the join is a plain
    hash equi-join on (key, bucket) with the range predicate applied as a
    post-filter. Cost: |points| + Σ interval_spans/bucket_width join rows
    — pick ``bucket_width`` near the typical interval length so most
    intervals explode to ~2 rows. Because the point side has exactly one
    bucket row, no dedup pass is needed.

    ``on``/``point_col``/``start_col``/``end_col`` name key and numeric
    (e.g. epoch-microsecond) columns; output = point columns + the
    matched interval's columns (minus its key).
    """
    if how not in ("inner",):
        raise ValueError("interval_join supports how='inner' only")
    w = int(bucket_width)
    pt = points.withColumn("__ib", (F.col(point_col) / w).cast("long"))
    spans = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                (F.col(start_col) / w).cast("long"),
                (F.col(end_col) / w).cast("long"),
            )
        ),
    )
    joined = pt.join(spans, [on, "__ib"], "inner").where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__ib")
