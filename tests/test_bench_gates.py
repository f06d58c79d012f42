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


def test_candidate_volume_tripwire(spark):
    """The census's over_budget flag must be exactly (pairs_per_unit >
    budget), every deployable banded family must be present, and the
    32-bit simhash scheme must never undercut the widened one (its
    blocking space is a strict subset of the information the 62-bit
    pair keys carry)."""
    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        CANDIDATE_PAIRS_PER_UNIT_BUDGET,
        FAMILY_BANDS_PER_UNIT,
        FAMILY_SATURATION_REMEDY,
        candidate_volume_census,
    )
    from tests.conftest import SF_DIR

    rows = {r["family"]: r.asDict()
            for r in candidate_volume_census(spark, SF_DIR).collect()}
    assert set(rows) == set(FAMILY_BANDS_PER_UNIT)
    for fam, r in rows.items():
        assert r["over_budget"] == (
            r["pairs_per_unit"] > CANDIDATE_PAIRS_PER_UNIT_BUDGET), fam
        assert r["n_band_rows"] == \
            r["n_units"] * FAMILY_BANDS_PER_UNIT[fam], fam
        assert r["candidate_pairs"] >= 0
        assert r["action"] == (
            FAMILY_SATURATION_REMEDY[fam] if r["over_budget"]
            else "none"), fam
    # empirical on the fixed driver corpus (2^8-value bands vs ~2^25
    # pair keys), not a cross-sketch theorem — see test_simhash64's
    # census-shape note (ADVICE r10)
    assert (rows["simhash32_band4x8"]["pairs_per_unit"]
            >= rows["simhash64_bandpairs_2of5"]["pairs_per_unit"])
