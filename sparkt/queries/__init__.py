"""Gate-query registry: every implemented operator surface from
SURVEY.md §2 gets a (Spark callable, DuckDB oracle SQL) pair.

Conventions for oracle parity (driver compares row-count + schema +
order-insensitive value-hash):
- every computed column is aliased identically on both sides;
- floating aggregates are rounded identically on both sides (double
  partial-aggregation order differs between engines);
- all hashing inside portable operators (minhash/simhash/fingerprints)
  uses md5 hex strings, which Spark and DuckDB produce identically.
"""

from __future__ import annotations

from sparkt.queries import engine_flows, pipeline, relational, semantic_queries

QUERIES = {}
ORACLES = {}
# Engine flows + semantic + multimodal FIRST: round 2's driver time
# budget truncated the tail of the registry, so the 12 gates that sat
# last (m1-m9, sm1, sm2, mm1) got no CORRECTNESS row. Front-loading
# them guarantees the official artifact covers the engine surface even
# if a budget cut recurs; the q/t/d/s/p gates are fast and follow.
for mod in (engine_flows, semantic_queries, relational, pipeline):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
# mm1 lives at the tail of pipeline.QUERIES; hoist it with the rest of
# the round-2 truncation victims.
for _name in ("mm1_image_meta",):
    if _name in QUERIES:
        QUERIES = {_name: QUERIES[_name], **{k: v for k, v in QUERIES.items() if k != _name}}
        if _name in ORACLES:
            ORACLES = {_name: ORACLES[_name], **{k: v for k, v in ORACLES.items() if k != _name}}
