"""Physical-plan hygiene as a CI gate: the checks in tools/plan_audit.py
(pushdown, pruning, broadcast placement, Arrow-only Python, codegen spans)
run under pytest so a plan regression fails the suite, not just a manual
audit run."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import run_audit  # noqa: E402


@pytest.fixture(scope="module")
def audit(spark):
    return run_audit(spark)


def test_plan_audit_all_pass(audit):
    failures = [(n, ev) for n, ok, ev in audit if not ok]
    assert not failures, failures


def test_plan_audit_covers_all_dimensions(audit):
    names = {n.split("/")[0] for n, _, _ in audit}
    assert {"pushdown", "pruning", "broadcast", "no-row-python", "codegen", "arrow-only"} <= names
