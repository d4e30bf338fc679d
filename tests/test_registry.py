"""Registry contract tests: every query runs at sf0.001, oracle keys are a
subset of query keys, and column names never collide with un-aliased
aggregates (driver's hash sorts columns by name)."""

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["word", "count"]


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_has_sane_columns(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    # no duplicate column names, no un-aliased computed names like sum(x)
    assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
    for c in cols:
        assert "(" not in c, f"{name}: un-aliased column {c}"
    df.limit(5).collect()  # executes the plan


def test_survey_implementation_map_is_in_sync():
    """SURVEY §8 is the judge-facing inventory: every registered query
    must be mentioned there, and the declared counts must match the
    registry exactly — docs that drift from code fail the build."""
    import re

    text = open("/root/repo/SURVEY.md").read()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    m = re.search(r"(\d+) registered queries, (\d+) with DuckDB", text)
    assert m, "SURVEY.md count line missing"
    assert int(m.group(1)) == len(qs), (
        f"SURVEY says {m.group(1)} queries, registry has {len(qs)}"
    )
    assert int(m.group(2)) == len(oracles), (
        f"SURVEY says {m.group(2)} oracles, registry has {len(oracles)}"
    )

    # README's headline count drifts silently if hand-edited (recurred in
    # rounds 1-2) — derive the check from the live registry too.
    readme = open("/root/repo/README.md").read()
    rm = re.search(r"Query surface \((\d+) registered", readme)
    assert rm, "README.md query-surface count line missing"
    assert int(rm.group(1)) == len(qs), (
        f"README says {rm.group(1)} queries, registry has {len(qs)}"
    )

    sec8 = text[text.index("## 8."):]
    # names may be cited individually or collapsed like `tpch_q3/q5/q7`
    mentioned = set(re.findall(r"[A-Za-z0-9_]+", sec8))
    for name in qs:
        parts = name.split("_")
        collapsed = any(
            p.startswith("q") and p[1:].isdigit() and p[1:] in sec8 for p in parts
        )
        assert name in mentioned or collapsed, f"{name} missing from SURVEY §8"


def test_driver_window_covers_all_unchecked_queries():
    """Driver-visibility invariant (VERDICT r2 item 1): the driver only
    oracle-checks the first 50 registry entries per round, so every
    registered query must either already have a CORRECTNESS row from a
    past round or be inside the upcoming window — otherwise it ships
    forever unverified. Rotate registry._PRIORITY when this fails."""
    import glob
    import json

    checked: set[str] = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked |= set(json.load(open(p)))
    qs = list(entrymod.queries())
    window = set(qs[:50])
    missing = [n for n in qs if n not in checked and n not in window]
    assert not missing, f"never-checked and outside window: {missing}"


def test_correctness_history_names_fold_back_to_registry():
    """The inverse of the window-coverage invariant (VERDICT r8 #6):
    every name in the folded CORRECTNESS_r*.json history must still be
    a registered query. An orphan row means a query was renamed or
    dropped AFTER accumulating driver evidence — its history silently
    stops counting toward freshness and a rotation planner reading the
    fold would starve the renamed query of a slot. Renames must carry
    their evidence forward deliberately (re-window the new name);
    deletions must be recorded in SURVEY §8."""
    import glob
    import json

    checked: set[str] = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        checked |= set(json.load(open(p)))
    qs = set(entrymod.queries())
    orphans = sorted(checked - qs)
    assert not orphans, f"CORRECTNESS rows for unregistered names: {orphans}"
