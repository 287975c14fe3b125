"""Rotation-ordering unit tests for plans/registry.py — pure Python (no
Spark session): the sweep-cohort guarantees are load-bearing for the
driver's per-round CORRECTNESS signal, so they get direct coverage:

- fresh failures sort first (re-verified next sweep);
- failure priority DECAYS after ``_FAIL_PRIORITY_CAP`` consecutive failing
  sweeps (a persistent flake can't monopolize the 50-row budget);
- never-checked legacy queries (in rotation_baseline.json) sort ahead of
  post-freeze additions, which sort ahead of all checked queries;
- checked queries rotate least-recently-checked first.
"""

from __future__ import annotations

import json

import pytest

from direct_spark_sql_spark.plans import registry


def _write_round(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
ERR = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}


@pytest.fixture
def rotation_root(tmp_path, monkeypatch):
    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    return tmp_path


def test_fresh_failure_sorts_before_never_checked(rotation_root):
    _write_round(rotation_root, 3, {"a": GREEN, "b": RED})
    last = registry._last_checked_round()
    assert last["b"] == -3  # front of rotation
    assert last["a"] == 3
    assert "never" not in last


def test_err_row_counts_as_failure(rotation_root):
    _write_round(rotation_root, 2, {"x": ERR})
    assert registry._last_checked_round()["x"] == -2


def test_failure_priority_decays_after_cap(rotation_root):
    # Fails in rounds 3 and 4 (= _FAIL_PRIORITY_CAP consecutive) -> still
    # front-priority; a third consecutive failure in round 5 decays it.
    _write_round(rotation_root, 3, {"flake": RED})
    _write_round(rotation_root, 4, {"flake": RED})
    assert registry._last_checked_round()["flake"] == -4
    _write_round(rotation_root, 5, {"flake": RED})
    assert registry._last_checked_round()["flake"] == 5  # decayed to recency


def test_success_resets_failure_streak(rotation_root):
    _write_round(rotation_root, 2, {"q": RED})
    _write_round(rotation_root, 3, {"q": RED})
    _write_round(rotation_root, 4, {"q": GREEN})
    _write_round(rotation_root, 5, {"q": RED})
    # Streak restarted at round 5 -> front-priority again.
    assert registry._last_checked_round()["q"] == -5


def test_checked_queries_rotate_lru(rotation_root):
    _write_round(rotation_root, 1, {"old": GREEN})
    _write_round(rotation_root, 4, {"new": GREEN})
    last = registry._last_checked_round()
    assert last["old"] < last["new"]


def test_full_sort_bucket_order(rotation_root, monkeypatch):
    """failed < legacy-never-checked < post-freeze-never-checked < checked."""
    _write_round(rotation_root, 2, {"checked_old": GREEN})
    _write_round(rotation_root, 3, {"failed": RED, "checked_new": GREEN})
    monkeypatch.setattr(
        registry, "_baseline_names",
        lambda: frozenset({"failed", "checked_old", "checked_new", "legacy_nc"}),
    )

    class Q:  # minimal stand-in for plans.base.Query
        def __init__(self, name):
            self.name = name

    names = ["checked_new", "post_freeze_nc", "legacy_nc", "checked_old", "failed"]
    qs = [Q(n) for n in names]
    last = registry._last_checked_round()
    legacy = registry._baseline_names()
    qs.sort(key=lambda q: last.get(q.name, 0.0 if q.name in legacy else 0.5))
    assert [q.name for q in qs] == [
        "failed", "legacy_nc", "post_freeze_nc", "checked_old", "checked_new",
    ]


def test_real_registry_places_never_checked_in_sweep_window(monkeypatch):
    """Against the REAL repo CORRECTNESS files: every never-checked legacy
    query must sit inside the first 53 rotation slots (the round-6 sweep's
    50-row budget covers all but ~3), and no checked-green query may sort
    ahead of any legacy never-checked one."""
    qs = registry.all_queries()
    last = registry._last_checked_round()
    legacy = registry._baseline_names()
    assert legacy, "rotation_baseline.json must exist and be non-empty"
    never_legacy = [
        i for i, q in enumerate(qs) if q.name not in last and q.name in legacy
    ]
    if never_legacy:  # after future sweeps this backlog may be empty
        first_checked_green = min(
            (i for i, q in enumerate(qs) if last.get(q.name, 0) > 0),
            default=len(qs),
        )
        assert max(never_legacy) < first_checked_green


def test_sf01_sweep_cursor_rotation_cycles():
    """VERDICT r11 #1 plumbing: the sf0.1 sweep cursor picks
    least-recently-checked first (never-checked ahead of everything),
    ties broken by name, and advancing passed names provably cycles
    the full population."""
    from direct_spark_sql_spark.tools.oracle_sweep import pick_cohort

    names = [f"q{i:02d}" for i in range(10)]
    checked: dict = {}
    drawn: list = []
    # 4 invocations of 3 cover all 10 within ceil(10/3)=4 rounds
    for seq in range(1, 5):
        cohort = pick_cohort(names, checked, 3)
        for n in cohort:
            checked[n] = seq
        drawn += cohort
    assert set(drawn) == set(names)
    # a failure (stamp not advanced) re-enters the very next cohort
    checked2 = dict(checked)
    del checked2["q05"]
    assert "q05" in pick_cohort(names, checked2, 3)
    # deterministic: same state -> same cohort
    assert pick_cohort(names, checked2, 3) == pick_cohort(names, checked2, 3)
