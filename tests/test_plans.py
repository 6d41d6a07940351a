"""Physical-plan gate, wired into pytest: every contract query is
explained (not executed) and checked for forbidden shapes — any
CartesianProduct or row-at-a-time BatchEvalPython anywhere fails the
suite — plus the targeted structural expectations (broadcasts,
pushdown, pruning, join types, ANN strategies) in
tools/explain_audit.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from explain_audit import run_audit  # noqa: E402


def test_physical_plans(spark):
    problems = run_audit(spark)
    assert problems == []
