"""Per-gate runtime budgets (VERDICT r6 ask #5): the oracle sweep
fails any gate slower than BUDGET_FACTOR × its committed reference
time — a silently-regressed plan (q31's hidden 15 s recursion) trips
within one ``make verify`` instead of surviving rounds."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

from check_oracles import (  # noqa: E402
    BUDGET_FACTOR,
    BUDGET_FILE,
    check_budgets,
)


def test_intentionally_slowed_gate_trips_the_guard():
    budgets = {"q1_pricing_summary": 2.0, "d5_ngram_jaccard": 1.2}
    # 10x the reference: the q31 failure mode — must trip
    over = check_budgets(
        {"q1_pricing_summary": 20.0, "d5_ngram_jaccard": 1.3}, budgets
    )
    assert over == ["q1_pricing_summary: 20.0s > 3x ref 2.0s"]


def test_committed_sf01_budgets_catch_a_10x_regression():
    """End-to-end on the real committed reference times: every sf0.1
    gate slowed 10x would trip (no gate's budget is so large that a
    10x regression hides under the floor)."""
    if not os.path.exists(BUDGET_FILE):
        import pytest

        pytest.skip("budget file not recorded yet")
    with open(BUDGET_FILE) as f:
        refs = json.load(f)["sf0.1"]
    slowed = {k: v * 10 + 15 for k, v in refs.items()}
    assert len(check_budgets(slowed, refs)) == len(refs)


def test_noise_inside_factor_and_floor_passes():
    budgets = {"a": 2.0, "b": 0.3}
    # 2.9x ref: inside the factor
    assert check_budgets({"a": 5.8}, budgets) == []
    # first-gate session warmup on a sub-second ref: under the
    # absolute floor, passes
    assert check_budgets({"b": 7.0}, budgets) == []
    # over the floor AND the factor: trips
    assert check_budgets({"b": 12.0}, budgets) == [
        "b: 12.0s > 3x ref 0.3s"
    ]


def test_gate_without_reference_is_not_checked():
    assert check_budgets({"new_gate": 100.0}, {}) == []


def test_committed_budget_file_covers_every_gate():
    """GATE_BUDGETS.json must track the live registry: a new gate
    without a reference time would never be budget-checked."""
    if not os.path.exists(BUDGET_FILE):
        import pytest

        pytest.skip("budget file not recorded yet")
    import __spark_entry__ as entrymod

    with open(BUDGET_FILE) as f:
        budgets = json.load(f)
    assert BUDGET_FACTOR == 3.0
    gates = set(entrymod.queries())
    for sf in ("sf0.01", "sf0.1"):
        missing = gates - set(budgets.get(sf, {}))
        assert not missing, (
            f"gates missing a {sf} budget reference: {sorted(missing)} "
            "— re-run scripts/check_oracles.py at that SF and fold "
            "gate_times into GATE_BUDGETS.json"
        )


def test_rotation_staleness_guard(tmp_path):
    """VERDICT r8 ask #1: the sweep must refuse to run when a new
    CORRECTNESS artifact landed but ROTATION.json was never
    regenerated (that omission made the r8 driver re-run r7's exact
    50-gate set, starving 37 gates of official rows)."""
    from check_oracles import rotation_stale_error

    repo = tmp_path
    (repo / "CORRECTNESS_r07.json").write_text("{}")
    (repo / "CORRECTNESS_r08.json").write_text("{}")

    # stale stamp → error naming the regeneration command
    (repo / "ROTATION.json").write_text(json.dumps({"_round": 7, "q1": 7}))
    err = rotation_stale_error(str(repo))
    assert err and "update_rotation" in err and "stamp 7" in err

    # pre-stamp rotation file (no _round key) is equally stale
    (repo / "ROTATION.json").write_text(json.dumps({"q1": 7}))
    assert rotation_stale_error(str(repo))

    # missing rotation file while artifacts exist is stale
    (repo / "ROTATION.json").unlink()
    assert rotation_stale_error(str(repo))

    # current stamp → clean
    (repo / "ROTATION.json").write_text(json.dumps({"_round": 8, "q1": 8}))
    assert rotation_stale_error(str(repo)) is None

    # no artifacts at all (fresh clone) → nothing to be stale against
    empty = tmp_path / "empty"
    empty.mkdir()
    assert rotation_stale_error(str(empty)) is None


def test_committed_rotation_is_current():
    """The repo's own ROTATION.json must never be stale at commit
    time — this is the in-tree tripwire for the r8 process defect."""
    from check_oracles import REPO_ROOT, rotation_stale_error

    assert rotation_stale_error(REPO_ROOT) is None


def test_rotation_age_invariant():
    """VERDICT r10 ask #1, tightened r14 (VERDICT r13 #2): with N
    gates and a 50-row artifact cap, every registered gate must hold
    a green official row within the last ceil(N/50) artifacts;
    window-edge gates (age == ceil(N/50), the one-round transient the
    r13 resets produced) must hold a RESERVED slot in the first 50 of
    the next run order. update_rotation.py enforces the same bounds
    at round start."""
    import glob
    import math
    import re

    from check_oracles import REPO_ROOT
    from sparkt.queries import order_key

    with open(os.path.join(REPO_ROOT, "ROTATION.json")) as f:
        rot = json.load(f)
    stamp = rot.pop("_round")
    newest = max(
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(
            os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")
        )
    )
    assert stamp == newest, "ROTATION.json is stale — run update_rotation.py"
    max_age = math.ceil(len(rot) / 50)
    overdue = {g: newest - r for g, r in rot.items()
               if r > 0 and newest - r > max_age}
    assert overdue == {}, (
        f"gates aged out of the ceil(N/50)={max_age}-artifact audit "
        f"window: {overdue}"
    )
    # window-edge gates self-heal ONLY via a reserved front slot
    full = dict(rot)
    full["_round"] = newest
    order = sorted(rot, key=order_key(full, len(rot)))
    edge = [g for g, r in rot.items() if r > 0 and newest - r == max_age]
    unreserved = [g for g in edge if order.index(g) >= 50]
    assert unreserved == [], (
        f"window-edge gates without a reserved next-artifact slot: "
        f"{unreserved}"
    )

    # the policy text must state the enforced arithmetic
    with open(os.path.join(REPO_ROOT, "COVERAGE.md")) as f:
        policy = f.read()
    flat = " ".join(policy.split())
    assert "ceil(N_gates / 50) most recent artifacts" in flat
    assert "RESERVED first slots" in flat and "window edge" in flat.lower()


def test_order_key_reserves_window_edge_ahead_of_resets():
    """The r13 incident mechanics: six same-round resets (tier 1, round
    0) must NOT sort ahead of a gate at the window edge (tier 0)."""
    from sparkt.queries import order_key

    # 145-gate shape: newest artifact r13, edge age = ceil(145/50) = 3
    rot = {"_round": 13, "edge_a": 10, "edge_b": 10, "reset_x": 0,
           "reset_y": 0, "fresh": 13, "mid": 12}
    order = sorted(
        ["edge_a", "edge_b", "reset_x", "reset_y", "fresh", "mid"],
        key=order_key(rot, 145),
    )
    assert order[:2] == ["edge_a", "edge_b"]          # tier 0 reserved
    assert order[2:4] == ["reset_x", "reset_y"]        # tier 1 resets
    assert order[4:] == ["mid", "fresh"]               # tier 2 stalest-first
    # age < max_age is NOT at risk: round 11 with max_age 3 stays tier 2
    rot2 = {"_round": 13, "ok": 11, "reset": 0}
    order2 = sorted(["ok", "reset"], key=order_key(rot2, 145))
    assert order2 == ["reset", "ok"]
