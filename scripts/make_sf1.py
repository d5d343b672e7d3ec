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
- documents (REWRITTEN r14, VERDICT r13 #5): NOT replicated. 50k
  DISTINCT synthetic docs with controlled structure -- replication
  (even token-suffixed) systematically flattered dedup operators
  (duplicates exact, never adversarial) and made pl5's
  decontamination remove 82-87% of the corpus (sf0.1's 31-word
  vocabulary means a growing eval slice coincidentally covers most
  3-gram shingles). The new corpus draws from a ~1000-word
  vocabulary (the 31 sf0.1 base words + 961 deterministic compounds
  + per-language stopwords + CJK tokens) so the shingle space scales
  with the corpus and coincidental overlap stays negligible;
  structure is injected at known rates: ~1% exact duplicates, ~7%
  near-dups (8% token mutation), ~2% eval-contaminated docs (8-token
  splice from a bench-slice doc), lang mix matching sf0.1 marginals
  (41% en / ~15% each de,fr,es,zh with DETECTABLE stopword/CJK
  signals, unlike sf0.1's decorative lang labels). Targets: pl5's
  decontamination stage removes the documented d8-like ~2-3%, and
  dedup gates see adversarial (mutated) near-dups instead of exact
  twins.
- part: copy i > 0 suffixes p_name with '\u00a7' + the copy digit x3
  (cross-copy levenshtein >= 3 > the fuzzy-join gate's threshold, so
  replicated exact-twin names don't quadratically inflate the blocked
  fuzzy join — found r12).
- embeddings: copy i flips the sign of a deterministic md5-chosen
  half of the dimensions, so cross-copy cosine decorrelates while
  norms and within-copy geometry are preserved.

Output: .testdata/sf1/*.parquet under the repo root (gitignored).
Usage: python scripts/make_sf1.py [n_copies]
       python scripts/make_sf1.py --docs-only N DEST
         (documents.parquet only, N synthetic docs, into DEST — the
         dedup/curation scale ladder beyond sf1: 500k docs = 100x
         sf0.1 without materializing 60M lineitem rows)
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


# ------------------------------------------------------------ documents
# Distinct-doc corpus generator (VERDICT r13 #5). All randomness is
# per-doc-seeded (random.Random(f"sf1doc|{j}")), so any doc can be
# regenerated independently — near-dup/exact-dup/contamination rules
# reference other docs' BASE token streams without ordering coupling.

BENCH_MOD = 97       # pl5's eval slice: doc_id % 97 == 0
EXACT_DUP_SLOT = 99  # j % 100 == 99 -> exact duplicate       (~1%)
NEAR_DUP_SLOTS = range(92, 99)   # -> 8%-mutated near-dup     (~7%)
CONTAM_SLOTS = (88, 89)          # -> 8-token bench splice    (~2%)


def _doc_vocab(n_docs: int = 50_000):
    """Vocabulary families. BASE31 is read from the sf0.1 corpus so
    sf1 stays lexically continuous with the driver data; EXT expands
    the 3-gram shingle space to ~10^9 so a 516-doc eval slice cannot
    coincidentally cover it (the 31-word space has 29,791 trigrams —
    the root cause of the 82-87% decontamination cliff). Above the
    50k-doc rung EXT additionally grows with the corpus (Heaps' law:
    real vocabularies scale ~n^0.5-0.7) — with a FIXED vocabulary the
    eval slice's frequent-trigram coverage climbs again at 10x
    (measured r14: 9.2% decon at 500k docs vs 2.2% at 50k before this
    growth; the 50k rung is left byte-identical)."""
    import duckdb
    import itertools

    base = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM read_parquet('{SRC}/documents.parquet') ORDER BY w"
        )
        .fetchall()
    ]
    ext = [a + b for a in base for b in base]
    if n_docs > 50_000:
        n_triples = min(
            len(base) ** 3, (n_docs - 50_000) // 10
        )
        ext += [
            a + b + c
            for a, b, c in itertools.islice(
                itertools.product(base, base, base), n_triples
            )
        ]
    sys.path.insert(0, REPO)
    from sparkt.functions.text import (
        DE_STOPWORDS,
        EN_STOPWORDS,
        ES_STOPWORDS,
        FR_STOPWORDS,
    )

    # deterministic 3-char CJK tokens (>30% CJK char share triggers
    # the lang_id zh branch)
    cjk = [
        "".join(chr(0x4E00 + (37 * i + 11 * c) % 0x2000) for c in range(3))
        for i in range(40)
    ]
    return {
        "base": base,
        "ext": ext,
        "cjk": cjk,
        "stop": {
            "en": EN_STOPWORDS,
            "de": DE_STOPWORDS,
            "fr": FR_STOPWORDS,
            "es": ES_STOPWORDS,
        },
    }


def _pick_lang(rng) -> str:
    r = rng.random()
    if r < 0.41:
        return "en"
    for lang, hi in (("de", 0.5575), ("fr", 0.705), ("es", 0.8525)):
        if r < hi:
            return lang
    return "zh"


def _draw_token(rng, lang: str, vocab) -> str:
    """Mixture per language, tuned so lang_id detects the label:
    en: 15% EN stopwords / 25% base / 60% compounds;
    de/fr/es: 20% own stopwords / 25% base / 55% compounds (base
    contributes ~1.6% incidental EN-stopword hits, far below 20%);
    zh: 60% CJK (3-char -> ~37% CJK char share > the 0.3 gate) /
    40% base."""
    u = rng.random()
    if lang == "zh":
        pool = vocab["cjk"] if u < 0.60 else vocab["base"]
    elif lang == "en":
        if u < 0.15:
            pool = vocab["stop"]["en"]
        elif u < 0.40:
            pool = vocab["base"]
        else:
            pool = vocab["ext"]
    else:
        if u < 0.20:
            pool = vocab["stop"][lang]
        elif u < 0.45:
            pool = vocab["base"]
        else:
            pool = vocab["ext"]
    return pool[rng.randrange(len(pool))]


def _base_doc(j: int, vocab) -> tuple[str, list[str]]:
    """The PLAIN (pre-structure) token stream for doc j: lang + uniform
    8-100 tokens from the lang mixture. Pure function of j."""
    import random

    rng = random.Random(f"sf1doc|{j}")
    lang = _pick_lang(rng)
    n = rng.randrange(8, 101)
    return lang, [_draw_token(rng, lang, vocab) for _ in range(n)]


def _final_doc(j: int, n_docs: int, vocab) -> tuple[str, list[str]]:
    """Apply the structure rules. Bench-slice docs (j % 97 == 0) stay
    plain so the contamination rate is controlled from the corpus
    side only."""
    import random

    slot = j % 100
    block = j - slot
    if j % BENCH_MOD == 0 or j < 100:
        return _base_doc(j, vocab)
    if slot == EXACT_DUP_SLOT:
        # copy a PLAIN same-block doc (slot 10 is never special;
        # +1 dodges a bench doc so dup pairs stay corpus-internal)
        t = block + 10
        if t % BENCH_MOD == 0:
            t += 1
        return _base_doc(t, vocab)
    if slot in NEAR_DUP_SLOTS:
        # 8%-token mutation of a plain same-block doc (slots 20-26)
        t = block + 20 + (slot - NEAR_DUP_SLOTS.start)
        if t % BENCH_MOD == 0:
            t += 7
        lang, toks = _base_doc(t, vocab)
        mrng = random.Random(f"sf1mut|{j}")
        toks = [
            _draw_token(mrng, lang, vocab) if mrng.random() < 0.08 else w
            for w in toks
        ]
        return lang, toks
    if slot in CONTAM_SLOTS:
        # splice an 8-token window from a bench doc: >= 6 shared
        # 3-gram shingles -> 6/98..6/18 = 6-33% overlap >= the 5%
        # decontamination threshold at every doc length
        lang, toks = _base_doc(j, vocab)
        if len(toks) < 12:
            toks = toks + toks[: 12 - len(toks)]
        srng = random.Random(f"sf1contam|{j}")
        n_bench = (n_docs - 1) // BENCH_MOD + 1
        b = BENCH_MOD * srng.randrange(n_bench)
        _, btoks = _base_doc(b, vocab)
        if len(btoks) < 8:
            btoks = btoks + btoks
        c = srng.randrange(len(btoks) - 7)
        p = srng.randrange(len(toks) - 7)
        toks[p : p + 8] = btoks[c : c + 8]
        return lang, toks
    return _base_doc(j, vocab)


def gen_documents(con, n_docs: int = 50_000) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = _doc_vocab(n_docs)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for j in range(n_docs):
        lang, toks = _final_doc(j, n_docs, vocab)
        text = " ".join(toks)
        ids.append(j)
        texts.append(text)
        langs.append(lang)
        h = int(hashlib.md5(f"src|{j}".encode()).hexdigest()[:8], 16)
        sources.append(f"src{h % 20}")
        n_chars.append(len(text))
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(table, f"{DEST}/documents.parquet")
    print(f"documents: {n_docs} rows (synthetic distinct corpus)")


def flip_signs(i: int, dim: int = 64) -> list[int]:
    """Deterministic +-1 pattern per copy (copy 0 = all +1)."""
    if i == 0:
        return [1] * dim
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"sf1|{i}|{d}".encode()).hexdigest()[:8], 16)
        out.append(1 if h % 2 == 0 else -1)
    return out


def gen_embeddings_synthetic(n_vecs: int, dest: str, dim: int = 64,
                             n_clusters: int = 256) -> None:
    """N DISTINCT clustered vectors for the ANN/semantic-dedup scale
    ladder (VERDICT r14 ask #1): sign-flip replication of sf0.1's 2k
    vectors would hand IVF/LSH an artificially easy corpus (20 exact
    geometries repeated), the embedding analogue of the replicated-doc
    dedup artifact killed in r14. Structure:

    - ``n_clusters`` unit centroids (seeded normal), each vector =
      0.8·centroid + 0.3·noise — realistic IVF cell occupancy with
      genuine cross-cell boundary vectors (the hard case for n_probe
      pruning), not 20 point-masses.
    - ~1% engineered near-dup pairs (vec j ≡ vec j−1 + 1e-2 noise,
      cosine ≈ 0.9995) so d6/sd1 have known positives at every rung.
    - ``label`` = cluster % 8, matching the sf0.1 column's role.

    Deterministic: one seeded PCG64 stream, chunked arrow writes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260816)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cluster = rng.integers(0, n_clusters, size=n_vecs)
    writer = None
    chunk = 100_000
    for lo in range(0, n_vecs, chunk):
        hi = min(lo + chunk, n_vecs)
        vecs = (
            0.8 * cents[cluster[lo:hi]]
            + 0.3 * rng.standard_normal((hi - lo, dim))
        ).astype(np.float32)
        # near-dup pairs: every 100th vector clones its predecessor
        # (+ tiny noise); pair never spans a chunk boundary
        nd = np.arange(lo, hi)[(np.arange(lo, hi) % 100 == 99)] - lo
        nd = nd[nd >= 1]
        vecs[nd] = vecs[nd - 1] + 0.01 * rng.standard_normal(
            (len(nd), dim)
        ).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(lo, hi), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    (cluster[lo:hi] % 8).astype(np.int32), pa.int32()
                ),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                f"{dest}/embeddings.parquet", tbl.schema
            )
        writer.write_table(tbl)
    if writer is not None:
        writer.close()
    print(f"embeddings: {n_vecs} rows (synthetic clustered corpus)")


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--docs-only":
        global DEST
        n = int(sys.argv[2])
        DEST = os.path.abspath(sys.argv[3])
        os.makedirs(DEST, exist_ok=True)
        gen_documents(duckdb.connect(), n_docs=n)
        print(f"done -> {DEST}")
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--embeddings-only":
        n = int(sys.argv[2])
        dest = os.path.abspath(sys.argv[3])
        os.makedirs(dest, exist_ok=True)
        gen_embeddings_synthetic(n, dest)
        print(f"done -> {dest}")
        return 0
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
    gen_documents(con, n_docs=n_copies * 5000)

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
