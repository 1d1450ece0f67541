"""Physical-plan introspection: the scale guardrails.

The build rule for this engine is "the plan you'd want at 100 TB, not the
first one that passes" — these helpers make that checkable in tests and at
review time instead of by eyeballing ``explain()`` output.
"""

from alphastats_spark.plans.audit import audit, explain_string, scan_info

__all__ = ["audit", "explain_string", "scan_info"]
