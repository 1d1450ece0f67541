"""Plan audit: flag physical-plan shapes that break at cluster scale.

Findings are heuristics over the formatted physical plan:

* ``single-partition-exchange`` — an ``Exchange SinglePartition`` funnels
  every row through one task. Legitimate over tiny aggregate tables (our
  bucket-offset windows in ``operators.ordered`` run over one row per
  calendar month); fatal over the raw input.
* ``python-row-udf`` — ``BatchEvalPython`` = row-at-a-time Python UDF in
  the hot path (Arrow-batched Pandas UDFs show up as ``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` instead and are not flagged).
* ``nested-loop-join`` — ``BroadcastNestedLoopJoin`` / ``CartesianProduct``:
  O(n·m) compare, usually a missing equi-join key.
* ``unfiltered-scan`` — a file scan whose ``PushedFilters`` is empty while
  the query has a ``Filter`` above it (pushdown was expected but lost).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The string ``df.explain(mode)`` would print."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


@dataclass
class Finding:
    kind: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"[{self.kind}] {self.detail}"


def scan_info(df: DataFrame) -> list[dict[str, str]]:
    """Per-scan ReadSchema / PushedFilters / Location from the formatted plan
    — the direct check that pruning and pushdown reached the reader."""
    text = explain_string(df, "formatted")
    scans = []
    for block in re.split(r"\n\n", text):
        if "Scan " not in block:
            continue
        for m in re.finditer(
            r"Location:\s*(?P<loc>.+?)\n(?:.*?PushedFilters:\s*(?P<pf>.+?)\n)?.*?ReadSchema:\s*(?P<rs>.+?)(?:\n|$)",
            block,
            re.S,
        ):
            scans.append(
                {
                    "location": m.group("loc").strip(),
                    "pushed_filters": (m.group("pf") or "").strip(),
                    "read_schema": m.group("rs").strip(),
                }
            )
    return scans


def _op_depth(line: str) -> int:
    """Tree depth of a plan line = length of its branch-drawing prefix
    (spaces, ``:``, ``+-``, ``*(n)`` codegen tags) before the operator."""
    m = re.match(r"^[\s:+\-*()0-9]*", line)
    return len(m.group(0)) if m else 0


def _subtree(plan: str, pos: int) -> str:
    """The plan text of the operator at ``pos`` plus all its descendants
    (every following line printed deeper than it)."""
    start = plan.rfind("\n", 0, pos) + 1
    lines = plan[start:].split("\n")
    depth = _op_depth(lines[0])
    out = [lines[0]]
    for line in lines[1:]:
        if line.strip() and _op_depth(line) <= depth:
            break
        out.append(line)
    return "\n".join(out)


def audit(df: DataFrame) -> list[Finding]:
    """Heuristic scale-hazard findings for the physical plan of ``df``."""
    simple = explain_string(df, "simple")
    # WholeStageCodegen tags (``*(7) ``) appear on codegen'd operators only,
    # so in an AQE-finalized rendering a tagged parent can compute DEEPER
    # than its untagged child and ``_subtree`` truncates early (seen when a
    # BroadcastNestedLoopJoin's probe side is a materialized cached
    # relation: the exempting 1-row build aggregate was never reached).
    # Depth analysis runs on the untagged text.
    simple = re.sub(r"\*\(\d+\) ", "", simple)
    findings: list[Finding] = []

    for m in re.finditer(r"Exchange SinglePartition[^\n]*", simple):
        # A SinglePartition exchange fed by a partial aggregate is the normal
        # partial→final global-agg pattern: one pre-aggregated row per input
        # partition crosses the wire. Likewise an aggregate keyed on the
        # ordered-machinery bucket column (__as_bucket): the rows crossing are
        # the per-bucket offset table — one row per calendar month / input
        # partition, the documented two-phase prefix decomposition. Only
        # raw-row funnels (e.g. a global Window sort) are scale hazards.
        below = simple[m.end() : m.end() + 600]
        if re.search(r"HashAggregate\(.*partial_", below):
            continue
        if re.search(r"HashAggregate\(keys=\[__as_bucket", below):
            continue
        findings.append(Finding("single-partition-exchange", m.group(0)[:160]))
    for m in re.finditer(r"BatchEvalPython[^\n]*", simple):
        findings.append(Finding("python-row-udf", m.group(0)[:160]))
    for m in re.finditer(r"(BroadcastNestedLoopJoin|CartesianProduct)[^\n]*", simple):
        # A broadcast cross against a GLOBAL aggregate (keys=[] → exactly
        # one row) is the standard way to attach a corpus-level scalar
        # (vocabulary size, grand total) to every row — O(n·1), not O(n·m).
        # Only flag nested loops whose build side is a real relation. The
        # join's subtree is every following line printed deeper than the
        # join line (the probe lineage prints first, so a fixed lookahead
        # window would miss the build side).
        if "HashAggregate(keys=[], functions=" in _subtree(simple, m.start()):
            continue
        findings.append(Finding("nested-loop-join", m.group(0)[:160]))

    if re.search(r"\bFilter\b", simple):
        for scan in scan_info(df):
            pf = scan["pushed_filters"]
            if pf in ("[]", "") and "parquet" in scan["location"].lower():
                findings.append(
                    Finding("unfiltered-scan", f"{scan['location'][:120]} PushedFilters: []")
                )
    return findings


def assert_scales(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``AssertionError`` if the plan has hazards not in ``allow``.

    ``allow`` lists acceptable finding kinds — e.g. the intentional
    single-partition window over per-month bucket totals.
    """
    findings = [f for f in audit(df) if f.kind not in allow]
    if findings:
        lines = "\n".join(str(f) for f in findings)
        raise AssertionError(f"plan has scale hazards:\n{lines}")
