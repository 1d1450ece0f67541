"""Declarative data-quality constraint checking over corpus tables.

A Deequ-style rule engine sized for 100 TB inputs: the caller declares
row-level and column-level expectations (not-null, uniqueness, numeric
bounds, membership, regex shape) and gets back ONE small report frame —
``(rule, column, violations, n_rows, passed)`` — suitable for gating a
pipeline stage or publishing to a quality dashboard.

Scale design
------------
Every row-level rule compiles to a conditional-count aggregate expression
and ALL of them run in a SINGLE aggregation pass over the table (one scan,
map-side partial aggregation, a one-row result). Uniqueness rules ride the
same pass as exact ``count distinct`` aggregates — Spark plans these via
expand + two-stage aggregation, still one scan of the input. The one-row
wide result is then unpivoted to the per-rule report DataFrame-side (an
``explode`` over an inline array of structs — no driver collect, the
report stays a lazy plan the caller can union across tables).

There is deliberately no sampling and no approximation by default:
violation COUNTS are what a gate needs, and conditional counts are free
once the scan is paid. An ``approx`` uniqueness mode (HLL
``approx_count_distinct``) is the 100-TB escape hatch when a column's
exact distinct count would blow the aggregation hash map.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints", "not_null", "unique", "in_range", "in_set",
           "matches", "non_empty", "row_violation"]


def not_null(column: str, name: str | None = None) -> dict[str, Any]:
    """Rule: ``column`` must contain no NULLs."""
    return {"name": name or f"not_null({column})", "kind": "not_null",
            "column": column}


def unique(column: str, name: str | None = None,
           approx: bool = False) -> dict[str, Any]:
    """Rule: non-null values of ``column`` must be distinct. Violations =
    (non-null rows) − (distinct non-null values): 0 iff no value repeats.
    ``approx=True`` swaps the exact distinct count for the HLL sketch
    (±~2% — report-only use; an approx rule can misjudge ``passed`` near
    the boundary and is meant for trend dashboards, not gates)."""
    return {"name": name or f"unique({column})", "kind": "unique",
            "column": column, "approx": approx}


def in_range(column: str, lo: float | None = None, hi: float | None = None,
             name: str | None = None) -> dict[str, Any]:
    """Rule: non-null ``column`` values must satisfy ``lo <= v <= hi``
    (either bound may be omitted). NULLs are not range violations —
    pair with :func:`not_null` to forbid them."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one of lo/hi")
    return {"name": name or f"in_range({column})", "kind": "in_range",
            "column": column, "lo": lo, "hi": hi}


def in_set(column: str, allowed: list, name: str | None = None) -> dict[str, Any]:
    """Rule: non-null ``column`` values must be members of ``allowed``."""
    if not allowed:
        raise ValueError("in_set needs a non-empty allowed list")
    return {"name": name or f"in_set({column})", "kind": "in_set",
            "column": column, "allowed": list(allowed)}


def matches(column: str, pattern: str, name: str | None = None) -> dict[str, Any]:
    """Rule: non-null ``column`` values must fully match regex ``pattern``
    (anchored with ``^...$`` by the checker)."""
    return {"name": name or f"matches({column})", "kind": "matches",
            "column": column, "pattern": pattern}


def non_empty(column: str, name: str | None = None) -> dict[str, Any]:
    """Rule: string ``column`` must be non-null AND non-empty after trim."""
    return {"name": name or f"non_empty({column})", "kind": "non_empty",
            "column": column}


def row_violation(rule: dict[str, Any]) -> Column:
    """Row-level violation predicate (TRUE = this row violates the rule).

    Only row-expressible kinds — ``unique`` is an aggregate property and
    raises here (``check_constraints`` handles it with COUNT DISTINCT;
    a per-row dup verdict is the dedup family's job). Exposed for
    composition: ``pipeline.curate_corpus`` uses it as its stage-1 gate.
    """
    c = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "in_range":
        lo, hi = rule.get("lo"), rule.get("hi")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (c < F.lit(lo))
        if hi is not None:
            bad = bad | (c > F.lit(hi))
        bad = c.isNotNull() & bad
    elif kind == "in_set":
        bad = c.isNotNull() & ~c.isin(rule["allowed"])
    elif kind == "matches":
        bad = c.isNotNull() & ~c.rlike(f"^(?:{rule['pattern']})$")
    elif kind == "non_empty":
        bad = c.isNull() | (F.trim(c) == F.lit(""))
    else:
        raise ValueError(f"rule kind {kind!r} is not row-expressible")
    return bad


def _violation_expr(rule: dict[str, Any]) -> Column:
    """Violation COUNT aggregate for one row-expressible rule."""
    # coalesce: SUM over zero rows is NULL; an empty table has 0 violations
    # (and passed=true), matching the unique rule and COUNT(*) FILTER SQL.
    return F.coalesce(
        F.sum(F.when(row_violation(rule), F.lit(1)).otherwise(F.lit(0))),
        F.lit(0),
    ).cast("bigint")


def check_constraints(df: DataFrame, rules: list[dict[str, Any]]) -> DataFrame:
    """Evaluate ``rules`` over ``df`` in one aggregation pass and return the
    per-rule report ``(rule, column, violations, n_rows, passed)``.

    Rules are the dicts produced by the builder helpers in this module
    (:func:`not_null`, :func:`unique`, :func:`in_range`, :func:`in_set`,
    :func:`matches`, :func:`non_empty`). Report rows come back in rule
    declaration order under a deterministic ``rule`` name; ``passed`` is
    ``violations == 0``.

    The result is a LAZY one-partition frame derived from a single
    aggregate over ``df`` — no driver-side collect, so callers can union
    reports across tables or write them to a sink like any other frame.
    """
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    known = {"not_null", "unique", "in_range", "in_set", "matches", "non_empty"}
    for r in rules:
        if r.get("kind") not in known:
            raise ValueError(f"unknown rule kind: {r.get('kind')!r}")
        if not r.get("column"):
            raise ValueError(f"rule {r.get('name')!r} names no column")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            c = F.col(r["column"])
            distinct = (
                F.approx_count_distinct(c) if r.get("approx")
                else F.countDistinct(c)
            )
            # HLL can overestimate distinct past the row count on a truly
            # unique column; a negative violation count is meaningless (and
            # would flip `passed` on a clean column), so clamp at 0
            v = F.greatest(F.lit(0), F.count(c) - distinct).cast("bigint")
        else:
            v = _violation_expr(r)
        aggs.append(v.alias(f"__v{i}"))
    wide = df.agg(*aggs)

    report_rows = F.array(*[
        F.struct(
            F.lit(r["name"]).alias("rule"),
            F.lit(r["column"]).alias("column"),
            F.col(f"__v{i}").alias("violations"),
            F.col("__n_rows").alias("n_rows"),
        )
        for i, r in enumerate(rules)
    ])
    return (
        wide.select(F.explode(report_rows).alias("r"))
        .select("r.*")
        .withColumn("passed", F.col("violations") == F.lit(0))
    )
