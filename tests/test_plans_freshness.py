"""PLANS.md freshness gate (r7 VERDICT task 3).

The r7 judge found PLANS.md two rounds stale: the note dict in
``plans/report.py`` had gained rows that were never regenerated into the
committed audit document.  This test makes that drift impossible to land
silently: every plan-noted name (SCALE_NOTES + EXTENDED_NOTES) and every
bench-flagged registry query must have a table row in the committed
PLANS.md.  Pure file assertions — no SparkSession.
"""

from __future__ import annotations

import pathlib
import re

from responsive_pub_spark import registry
from responsive_pub_spark.plans import report

REPO = pathlib.Path(__file__).resolve().parent.parent
PLANS = REPO / "PLANS.md"


def _plan_rows() -> set[str]:
    names = set()
    for line in PLANS.read_text().splitlines():
        m = re.match(r"\|\s*([a-z0-9_]+)\s*\|", line)
        if m and m.group(1) != "query":
            names.add(m.group(1))
    return names


def test_every_noted_name_has_a_committed_plans_row():
    rows = _plan_rows()
    noted = set(report.SCALE_NOTES) | set(report.EXTENDED_NOTES)
    missing = sorted(noted - rows)
    assert not missing, (
        f"PLANS.md is stale: note dict has {missing} but the committed "
        "document lacks their rows. Regenerate with "
        "`python -m responsive_pub_spark.plans.report > PLANS.md`."
    )


def test_every_bench_query_has_a_committed_plans_row():
    rows = _plan_rows()
    bench = {n for n, s in registry.REGISTRY.items() if s.bench}
    missing = sorted(bench - rows)
    assert not missing, (
        f"PLANS.md lacks rows for bench queries {missing}. Regenerate "
        "with `python -m responsive_pub_spark.plans.report > PLANS.md`."
    )


def test_every_plans_row_still_exists_in_the_registry():
    # the reverse direction: a renamed/deleted query must not leave a
    # zombie audit row claiming coverage.
    stale = sorted(_plan_rows() - set(registry.REGISTRY))
    assert not stale, f"PLANS.md has rows for unknown queries: {stale}"
