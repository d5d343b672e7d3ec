#!/usr/bin/env python3
"""Generate an sf1 test dataset (10x sf0.1) for off-SF scale sweeps
(VERDICT r10 ask #6): the driver only ships sf0.001/0.01/0.1, so the
10x step toward the 100-TB claim is built here by deterministic
key-offset replication of sf0.1.

Replication rules (all copies deterministic, copy 0 == sf0.1 rows):
- region/nation are DIMENSIONS — they don't scale with sf.
- every entity key (custkey, orderkey, partkey, suppkey, user_id,
  event_id, doc_id, vec_id) is offset by copy * STRIDE so uniqueness
  and referential integrity hold within and across copies.
- documents: copy i > 0 suffixes every whitespace token with
  '\u00a7' + the copy index ('\u00a7' never occurs in the corpus, so a
  copy-0 token that happens to end in a digit cannot collide with a
  copy-i suffixed token — ADVICE r11), making cross-copy shingle
  overlap ZERO (a naive 10x of exact twins would inflate LSH candidate
  pairs quadratically — a DATA artifact, not a plan property) while
  WITHIN-copy near-dup structure is preserved exactly. n_chars is
  recomputed as length(text) for copies > 0 so length-weighted gates
  see consistent data (ADVICE r11: copies grew but kept the original
  n_chars).
- part: copy i > 0 suffixes p_name with '\u00a7' + the copy digit x3
  (cross-copy levenshtein >= 3 > the fuzzy-join gate's threshold, so
  replicated exact-twin names don't quadratically inflate the blocked
  fuzzy join — found r12).
- embeddings: copy i flips the sign of a deterministic md5-chosen
  half of the dimensions, so cross-copy cosine decorrelates while
  norms and within-copy geometry are preserved.

Output: .testdata/sf1/*.parquet under the repo root (gitignored).
Usage: python scripts/make_sf1.py [n_copies]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DEST = os.path.join(REPO, ".testdata", "sf1")
STRIDE = 10_000_000_000  # far above any sf0.1 key


def flip_signs(i: int, dim: int = 64) -> list[int]:
    """Deterministic +-1 pattern per copy (copy 0 = all +1)."""
    if i == 0:
        return [1] * dim
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"sf1|{i}|{d}".encode()).hexdigest()[:8], 16)
        out.append(1 if h % 2 == 0 else -1)
    return out


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DEST, exist_ok=True)
    con = duckdb.connect()

    def gen(table: str, select_for_copy) -> None:
        parts = " UNION ALL ".join(
            select_for_copy(i) for i in range(n_copies)
        )
        con.execute(
            f"COPY ({parts}) TO '{DEST}/{table}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet("
            f"'{DEST}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    # dimensions: straight copies, no scaling
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO "
            f"'{DEST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: dimension, copied")

    gen("customer", lambda i: (
        f"SELECT c_custkey + {i * STRIDE} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}"
    ))
    gen("supplier", lambda i: (
        f"SELECT s_suppkey + {i * STRIDE} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM {src('supplier')}"
    ))
    # p_name decorrelates across copies with '\u00a7' + the copy
    # digit repeated 3x: levenshtein between any two copies' names is
    # >= 3 (> the f1 gate's max_distance=2), so the brand-blocked
    # fuzzy join doesn't explode quadratically on cross-copy exact
    # twins (found r12: identical replicated names made f1 emit 23M
    # rows at sf1 — a DATA artifact, the same twin-inflation class
    # the documents rule already guards). Within-copy pairwise
    # distances are preserved exactly (a shared constant suffix).
    gen("part", lambda i: (
        f"SELECT p_partkey + {i * STRIDE} AS p_partkey, "
        + ("p_name"
           if i == 0
           else f"p_name || '\u00a7{str(i) * 3}'")
        + f" AS p_name, p_brand, p_type, p_size, p_retailprice "
        f"FROM {src('part')}"
    ))
    gen("orders", lambda i: (
        f"SELECT o_orderkey + {i * STRIDE} AS o_orderkey, "
        f"o_custkey + {i * STRIDE} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority "
        f"FROM {src('orders')}"
    ))
    gen("lineitem", lambda i: (
        f"SELECT l_orderkey + {i * STRIDE} AS l_orderkey, "
        f"l_partkey + {i * STRIDE} AS l_partkey, "
        f"l_suppkey + {i * STRIDE} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate "
        f"FROM {src('lineitem')}"
    ))
    gen("events", lambda i: (
        f"SELECT event_id + {i * STRIDE} AS event_id, ts, "
        f"user_id + {i * STRIDE} AS user_id, event_type, value, "
        f"props FROM {src('events')}"
    ))
    # the suffixed text is the most expensive per-row expression in
    # the build \u2014 compute it ONCE in a subquery and take length()
    # outside (r12 review: the old inline form evaluated it twice)
    gen("documents", lambda i: (
        f"SELECT doc_id + {i * STRIDE} AS doc_id, text, lang, "
        "source, n_chars "
        f"FROM {src('documents')}"
        if i == 0
        else (
            "SELECT doc_id, text, lang, source, "
            "length(text) AS n_chars FROM ("
            f"SELECT doc_id + {i * STRIDE} AS doc_id, "
            "list_aggregate(list_transform(string_split(text, ' '),"
            f" w -> w || '\u00a7{i}'), 'string_agg', ' ') AS text, "
            f"lang, source FROM {src('documents')})"
        )
    ))

    def emb_select(i: int) -> str:
        flips = flip_signs(i)
        if i == 0:
            expr = "embedding"
        else:
            terms = ", ".join(
                f"embedding[{d + 1}] * {float(flips[d])!r}"
                for d in range(64)
            )
            expr = f"[{terms}]::FLOAT[]"
        return (
            f"SELECT vec_id + {i * STRIDE} AS vec_id, {expr} AS "
            f"embedding, label FROM {src('embeddings')}"
        )

    gen("embeddings", emb_select)
    print(f"done -> {DEST}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
