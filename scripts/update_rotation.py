#!/usr/bin/env python3
"""Maintain ROTATION.json: gate name → last round whose official
driver artifact (CORRECTNESS_r{N}.json) recorded a green row for it.

The driver artifact holds at most 50 entries per round (observed
45/50/50/50 across r1–r4 — an entry cap, not a time budget), so with
>50 registered gates some rotate out every round. The registry
(sparkt/queries/__init__.py) orders gates by ascending last-rowed
round, so the gates that missed the previous artifact run FIRST next
round and every gate is green within the union of the last two
artifacts. Run this at the start of each round, after the driver wrote
CORRECTNESS_r{N}.json:

    python scripts/update_rotation.py [--reset gate [gate ...]]

--reset forces the named gates to round 0 (= "needs a fresh row"), for
gates whose implementation changed since their last green row.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reset", nargs="*", default=[],
                    help="gates to force to round 0 (impl changed)")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from sparkt.queries import QUERIES

    last_rowed: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            rows = json.load(f)
        for gate, row in rows.items():
            ok = (row.get("err") is None and row.get("rows_match")
                  and row.get("schema_match") is not False)
            if ok and gate in QUERIES:
                last_rowed[gate] = max(last_rowed.get(gate, 0), rnd)

    out = {g: last_rowed.get(g, 0) for g in QUERIES}
    for g in args.reset:
        if g not in out:
            print(f"WARN: --reset {g}: not a registered gate", file=sys.stderr)
            continue
        out[g] = 0

    # staleness stamp (VERDICT r8 ask #1): record the newest artifact
    # round this rotation was generated against, so check_oracles.py
    # can refuse to sweep when a new CORRECTNESS_r*.json landed but
    # this script was never re-run (r8's driver silently re-ran r7's
    # exact 50-gate set because of exactly that omission). A stamp
    # survives git-checkout mtime resets; an mtime check would not.
    out["_round"] = max_round

    dest = os.path.join(REPO, "ROTATION.json")
    with open(dest, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1)
        f.write("\n")
    out.pop("_round")
    stale = [g for g, r in out.items() if r == 0]
    print(f"{len(out)} gates; {len(stale)} need a fresh row: {sorted(stale)}")

    # Audit-trail invariant (VERDICT r10 #1, tightened r14 per VERDICT
    # r13 #2): every registered gate must hold a green row within the
    # union of the last ceil(N_gates / 50) official artifacts. A gate
    # at exactly that age sits on the WINDOW EDGE: it fell out of the
    # documented union this round (the r13 t3/t19 incident — six
    # same-round impl resets crowded them past the 50-row cap), and
    # the only acceptable state is that it holds a RESERVED slot in
    # the first 50 of the next run order (sparkt.queries.order_key
    # tier 0, ahead of resets) so the next artifact is guaranteed to
    # re-row it. Three outcomes:
    #   age >  max_age                      -> hard fail (irrecoverable
    #                                          breach already recorded)
    #   age == max_age, order position >=50 -> hard fail (breach next
    #                                          round is unavoidable)
    #   age == max_age, position < 50       -> loud WARN (self-healing:
    #                                          reserved front slot)
    # Gates at 0 are new (or --reset) and run in tier 1.
    import math

    from sparkt.queries import order_key

    max_age = math.ceil(len(out) / 50)
    overdue = {
        g: max_round - r
        for g, r in out.items()
        if r > 0 and max_round - r > max_age
    }
    if overdue:
        print(
            f"INVARIANT VIOLATED: {len(overdue)} gates older than "
            f"ceil({len(out)}/50) = {max_age} rounds: "
            f"{dict(sorted(overdue.items()))}",
            file=sys.stderr,
        )
        return 1
    rot = dict(out)
    rot["_round"] = max_round
    order = sorted(out, key=order_key(rot, len(out)))
    at_risk = sorted(
        g for g, r in out.items() if r > 0 and max_round - r == max_age
    )
    unreserved = [g for g in at_risk if order.index(g) >= 50]
    if unreserved:
        print(
            f"INVARIANT VIOLATED: {len(unreserved)} window-edge gates "
            f"(age == {max_age}) have NO reserved slot in the next "
            f"50-row artifact: {unreserved} — consolidate the registry "
            "or defer same-round resets",
            file=sys.stderr,
        )
        return 1
    if at_risk:
        print(
            f"WARN: {len(at_risk)} gates at the window edge (age == "
            f"{max_age}) hold reserved first slots for the next "
            f"artifact: {at_risk}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
