"""Gate-query registry: every implemented operator surface from
SURVEY.md §2 gets a (Spark callable, DuckDB oracle SQL) pair.

Conventions for oracle parity (driver compares row-count + schema +
order-insensitive value-hash):
- every computed column is aliased identically on both sides;
- floating aggregates are rounded identically on both sides (double
  partial-aggregation order differs between engines);
- all hashing inside portable operators (minhash/simhash/fingerprints)
  uses md5 hex strings, which Spark and DuckDB produce identically.

Registry ROTATION POLICY (r5): the driver's CORRECTNESS artifact caps
at 50 entries per round (observed 45/50/50/50 across r1–r4 — an entry
cap, not a time budget), so with >50 registered gates the tail rotates
out. Gates are therefore ordered by ascending "last round with a green
official row" (ROTATION.json, maintained by scripts/update_rotation.py
at round start): gates that missed the previous artifact — or whose
implementation changed, reset to 0 — run FIRST, so every gate is green
within the union of the two most recent artifacts. r5 also merged
redundant gates (69 → 62) with zero operator-coverage loss: t1/t5→t2,
p1→p3, s2→s4, d2→d3, q4→q13, q15→q22 — mapping proven in COVERAGE.md —
then added 17 new ones (m11, m12, m13, sd1, t8, t9, mm2, d10, d11,
q31, q32, q33, p4, c2, s6, f1, s7), which enter at rotation rank 0
(never officially rowed) and so run first.

r6: 5 new gates (p5 quality buckets, p6 mixture weights, d12 bloom
decontamination, m14 streaming upsert, t10 count-min) enter at rank 0
alongside the
impl-changed resets (s4 gained its exact ANN-emulation oracle —
every registered gate is now oracle-checked; d3/d5/d8 share the
sz-carrying posting list; q31 hoists its ranked base out of the
recursion). `make verify` runs the full registry at BOTH sf0.01 and
sf0.1 under driver conf.
"""

from __future__ import annotations

import json
import os

from sparkt.queries import engine_flows, pipeline, relational, semantic_queries

_QUERIES = {}
_ORACLES = {}
for _mod in (engine_flows, semantic_queries, relational, pipeline):
    _QUERIES.update(_mod.QUERIES)
    _ORACLES.update(_mod.ORACLES)


def _rotation() -> dict:
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "ROTATION.json"
    )
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def order_key(last_rowed: dict, n_gates: int):
    """Gate run-order key (VERDICT r13 #2). Three tiers:

    0. at-risk: last rowed exactly ceil(N/50) rounds ago — the window
       edge. These hold RESERVED first slots so same-round impl resets
       can never crowd them out of the 50-row artifact again (the r13
       incident: six resets pushed t3/t19 to positions 51-52 and out
       of the documented audit window for one round).
    1. resets / never-rowed (round 0).
    2. everything else, stalest first.

    Name tie-break keeps the order deterministic for the driver and
    for check_oracles.py."""
    import math

    rounds = [
        r for g, r in last_rowed.items() if g != "_round" and r > 0
    ]
    current = last_rowed.get("_round", max(rounds, default=0))
    max_age = math.ceil(max(n_gates, 1) / 50)

    def key(k):
        r = last_rowed.get(k, 0)
        at_risk = 0 < r <= current - max_age
        tier = 0 if at_risk else (1 if r == 0 else 2)
        return (tier, r, k)

    return key


_LAST_ROWED = _rotation()
_ORDER = sorted(_QUERIES, key=order_key(_LAST_ROWED, len(_QUERIES)))
QUERIES = {k: _QUERIES[k] for k in _ORDER}
ORACLES = {k: _ORACLES[k] for k in _ORDER if k in _ORACLES}
