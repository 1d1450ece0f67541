"""QuantStats-style metrics report (reference ``alphastats/reports.py``).

Placeholder — implemented after the stats layer; see reports build step.
"""

from __future__ import annotations


def metrics(*args, **kwargs):  # pragma: no cover - replaced in reports milestone
    raise NotImplementedError("reports.metrics lands in the reports milestone")
