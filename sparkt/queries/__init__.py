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
for mod in (relational, pipeline, engine_flows, semantic_queries):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
