"""Gate-completeness checks for bench.py: the per-query regression gates
only fire for names with a baseline row, so a TIER2 entry without a
TIER2_BASELINE row is silently ungated — exactly the hole VERDICT r9
flagged (two measured-but-ungated rows). These tests pin the contract
shut and exercise the candidate-volume tripwire's decision logic."""

import bench
import __spark_entry__ as entrymod


def test_every_tier2_query_has_a_baseline_row():
    ungated = [n for n in bench.TIER2 if n not in bench.TIER2_BASELINE]
    assert ungated == [], (
        f"tier2 queries without a regression baseline: {ungated} — "
        "add a row to bench.TIER2_BASELINE (and BASELINE.md) from the "
        "first solo/driver run that measures them")


def test_bench_names_resolve_in_registry():
    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE + bench.TIER2 if n not in qs]
    assert missing == []
