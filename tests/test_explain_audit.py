"""Physical-plan quality gate: the headline queries' plans must keep
their scale properties (pushed filters, broadcast dims, codegen spans,
no cartesian products) — a plan regression fails CI, not just a bench.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "explain_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "explain_audit.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

from tests.conftest import SF_DIR  # noqa: E402


def test_headline_plan_properties(spark):
    failures = _mod.audit(spark, SF_DIR, verbose=False)
    assert failures == []
