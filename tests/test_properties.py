"""Property-based tests (hypothesis) for pure-Python kernels: semver
resolution, version ordering, and SQL-literal escaping. The reference
has no property testing (SURVEY.md §5); these pin the invariants the
example-based tests can't sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

versions = st.tuples(
    st.integers(0, 20), st.integers(0, 20), st.integers(0, 20)
).map(lambda t: f"{t[0]}.{t[1]}.{t[2]}")


@given(st.lists(versions, min_size=1, max_size=8), versions)
@settings(max_examples=200, deadline=None)
def test_resolve_version_is_max_satisfying(avail, lo):
    """resolve_version returns the MAXIMUM available version satisfying
    every spec — never a lower satisfying one, never an unsatisfying
    one (reference semver.resolve_to_specific_version semantics)."""
    from sparkt.deps import Version, parse_specs, resolve_version
    from sparkt.exceptions import ParsingError

    specs = parse_specs(f">={lo}")
    sat = [v for v in avail if not Version.parse(v) < Version.parse(lo)]
    try:
        got = resolve_version(specs, avail)
    except ParsingError:
        assert not sat
        return
    assert got in avail
    assert all(s.matches(Version.parse(got)) for s in specs)
    assert all(
        not Version.parse(got) < Version.parse(v) for v in sat
    )


@given(st.lists(versions, min_size=2, max_size=6))
@settings(max_examples=200, deadline=None)
def test_version_ordering_total_and_consistent(vs):
    """Version ordering is a total order consistent with tuple order
    for plain x.y.z versions."""
    from sparkt.deps import Version

    parsed = [Version.parse(v) for v in vs]
    by_semver = sorted(parsed)
    by_tuple = sorted(parsed, key=lambda v: (v.major, v.minor, v.patch))
    assert [str(v) for v in by_semver] == [str(v) for v in by_tuple]


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_prerelease_sorts_before_release(s):
    """Any prerelease of X.Y.Z sorts strictly before X.Y.Z (semver
    2.0)."""
    from sparkt.deps import Version

    pre = Version(1, 2, 3, prerelease="rc.1")
    rel = Version(1, 2, 3)
    assert pre < rel and not rel < pre


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_sql_str_escaping_never_breaks_out(s):
    """_sql_str output contains no lone quote that could terminate the
    literal: every single quote is doubled."""
    import re

    class _FakeConf:
        def get(self, k, d=None):
            return "false"

    class _FakeSpark:
        conf = _FakeConf()

    from sparkt.adapter import _sql_str

    out = _sql_str(_FakeSpark(), s)
    # strip doubled quotes; none may remain
    assert "'" not in out.replace("''", "")
    # backslashes all doubled under the default escape mode
    assert "\\" not in re.sub(r"\\\\", "", out)


# ---------------------------------------------------- microbatch math
_ts = st.datetimes(
    min_value=__import__("datetime").datetime(2020, 1, 1),
    max_value=__import__("datetime").datetime(2030, 12, 28),
)


@given(_ts, _ts, st.sampled_from(["hour", "day", "month", "year"]))
@settings(max_examples=300, deadline=None)
def test_microbatch_batches_tile_window_exactly(a, b, size):
    """Batch windows partition [start, end): contiguous, non-
    overlapping, first starts at start, last ends at end, and every
    interior boundary is a period boundary."""
    from sparkt.materializations.incremental import (
        _batch_floor,
        _batch_shift,
    )

    start, end = min(a, b), max(a, b)
    if start == end:
        return
    batches = []
    cur = _batch_floor(start, size)
    while cur < end:
        nxt = _batch_shift(cur, size, 1)
        batches.append((max(cur, start), min(nxt, end)))
        cur = nxt
    assert batches[0][0] == start and batches[-1][1] == end
    for (s1, e1), (s2, e2) in zip(batches, batches[1:]):
        assert e1 == s2  # contiguous, no gap/overlap
        assert _batch_floor(s2, size) == s2  # interior = period boundary
    assert all(s < e for s, e in batches)
    # shift is self-inverse on PERIOD BOUNDARIES (the only values the
    # materialization shifts; raw dates clamp lossily, e.g. Jan 31 +1mo)
    b0 = _batch_floor(start, size)
    assert _batch_shift(_batch_shift(b0, size, 3), size, -3) == b0
    # and raw-date shifts never raise (day clamped to month length)
    assert _batch_shift(start, size, 3) > start


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=60),
    st.integers(1, 16),
    st.integers(2, 9),
)
@settings(max_examples=25, deadline=None)
def test_pack_offsets_conserves_tokens(spark, ns, ctx, bucket):
    """Pure math of the two-phase prefix sum: offsets are the exclusive
    cumsum regardless of bucket size; bins cover exactly the token
    span."""
    from sparkt.functions.text import pack_offsets

    df = spark.createDataFrame(
        list(enumerate(ns)), ["doc_id", "n"]
    )
    got = {
        r["doc_id"]: r
        for r in pack_offsets(
            df, "doc_id", "n", ctx=ctx, bucket_size=bucket
        ).collect()
    }
    run = 0
    for i, n in enumerate(ns):
        r = got[i]
        assert r["global_start"] == run
        assert r["first_bin"] == run // ctx
        assert r["last_bin"] == (run + max(n, 1) - 1) // ctx
        assert r["start_offset"] == run % ctx
        run += n


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "zh"]),
            st.floats(
                min_value=0.0, max_value=1.0,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1, max_size=60,
    ),
    st.integers(2, 32),
)
@settings(max_examples=20, deadline=None)
def test_rank_quantile_buckets_two_phase_parity(spark, rows, coarse):
    """For ANY score distribution (ties, boundary values, single-row
    languages) and ANY coarse-grid size, the skew-safe two-phase rank
    equals the single-window formulation exactly — the p5 scale
    guarantee."""
    from sparkt.functions.sampling import rank_quantile_buckets

    df = spark.createDataFrame(
        [(lang, i, s) for i, (lang, s) in enumerate(rows)],
        ["lang", "doc_id", "q"],
    )
    fast = rank_quantile_buckets(
        df, "lang", "q", "doc_id", coarse=coarse, two_phase=True
    )
    ref = rank_quantile_buckets(
        df, "lang", "q", "doc_id", two_phase=False
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, ref.collect())
    )


@given(
    st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40),
    st.integers(64, 512).map(lambda x: x - x % 32),
    st.integers(1, 5),
)
@settings(max_examples=15, deadline=None)
def test_bloom_never_false_negative(spark, keys, m_bits, k):
    """For ANY key set (unicode, empty strings, duplicates) and filter
    geometry, every inserted key probes positive — the Bloom contract
    that makes bloom-decontamination safe (nothing contaminated ever
    escapes)."""
    from sparkt.functions.sketches import bloom_build, bloom_probe

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(keys)], ["id", "v"]
    )
    bloom = bloom_build(df, "v", m_bits=m_bits, k_hashes=k)
    probed = bloom_probe(df, "id", "v", bloom, m_bits=m_bits, k_hashes=k)
    assert probed.filter("NOT maybe_member").count() == 0


# ---------------------------------------------------------------------
# static extractor == parse-phase render (r9, the guard/extractor
# equality contract behind the reference-corpus gate)
# ---------------------------------------------------------------------

_const = st.recursive(
    st.one_of(
        st.integers(-1000, 1000),
        st.booleans(),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd"),
                whitelist_characters=" _-",
            ),
            max_size=12,
        ),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(
            st.text(
                alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1,
                max_size=8,
            ),
            inner, max_size=3,
        ),
    ),
    max_leaves=8,
)

_key = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=10
).filter(lambda k: k not in ("tags", "pre_hook", "post_hook",
                             "packages", "grants", "meta", "quoting",
                             "column_types", "docs", "contract"))


@settings(max_examples=60, deadline=None)
@given(
    cfgs=st.lists(
        st.dictionaries(_key, _const, min_size=1, max_size=3),
        min_size=1, max_size=3,
    ),
    tag_calls=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), max_size=2),
        max_size=2,
    ),
)
def test_static_extraction_equals_render_for_const_configs(
    cfgs, tag_calls
):
    """For ANY template made of constant-kwarg config() calls (plus
    appended tags calls), the static AST extraction must claim
    completeness AND produce exactly the config the parse-phase
    render would collect — the contract that lets the parser skip
    the render (the r7 bug class was a depth disagreement here)."""
    import jinja2

    from sparkt.parsing import context as ctx_mod

    def lit(v):
        # jinja-source literal for a python constant
        return repr(v)

    parts = []
    for cfg in cfgs:
        kwargs = ", ".join(f"{k}={lit(v)}" for k, v in cfg.items())
        parts.append("{{ config(%s) }}" % kwargs)
    for tags in tag_calls:
        parts.append("{{ config(tags=%s) }}" % lit(tags))
    src = "\n".join(parts) + "\nselect 1 as id"

    env = ctx_mod.build_environment()
    refs, sources, static_cfg, complete = ctx_mod.extract_statically(
        env, src
    )
    assert complete, src
    pctx, collector, r_refs, r_srcs = ctx_mod.parse_context({}, {})
    env.from_string(src).render(**pctx)
    assert static_cfg == collector.collected, src


@given(st.text(max_size=120))
@settings(max_examples=30, deadline=None)
def test_normalize_text_idempotent_and_canonical(spark, s):
    """normalize_text is idempotent (a second pass is a no-op) and its
    output never contains control chars, folded unicode punctuation,
    runs of whitespace, or leading/trailing space — over ARBITRARY
    unicode input, not just the gate corpus."""
    import re

    from pyspark.sql import functions as F

    from sparkt.functions.text import normalize_text

    df = spark.createDataFrame([(s,)], "t string")
    out = df.select(
        normalize_text(F.col("t")).alias("n1"),
        normalize_text(normalize_text(F.col("t"))).alias("n2"),
    ).first()
    assert out["n1"] == out["n2"]  # idempotent
    n = out["n1"]
    assert not re.search("[\x00-\x08\x0b-\x1f\x7f-\x9f]", n)
    assert not re.search("[‘’“”–— …]", n)
    assert "  " not in n and n == n.strip()


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 30),
                  st.sampled_from(["a", "b", "c", "x"])),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=20, deadline=None)
def test_funnel_stages_matches_greedy_reference(spark, evs):
    """funnel_stages equals the greedy strictly-increasing subsequence
    scan over arbitrary event interleavings (multiple users, ties,
    noise types)."""
    import datetime as dt

    from sparkt.functions.features import funnel_stages

    t0 = dt.datetime(2024, 6, 1)
    rows = [(u, t0 + dt.timedelta(minutes=m), t) for u, m, t in evs]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["a", "b", "c"]
    got = {r["user_id"]: r["stage"] for r in funnel_stages(
        df, "user_id", "ts", "event_type", steps).collect()}

    expect: dict = {}
    per_user: dict = {}
    for u, m, t in evs:
        per_user.setdefault(u, []).append((m, t))
    for u, seq in per_user.items():
        stage, last = 0, None
        for m, t in sorted(seq):
            if (stage < 3 and t == steps[stage]
                    and (last is None or m > last)):
                stage += 1
                last = m
        expect[u] = stage
    assert got == expect


@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=80),
    st.integers(1, 6),
)
@settings(max_examples=20, deadline=None)
def test_key_skew_report_two_phase_equals_naive(spark, keys, top_n):
    """The two-phase heavy-hitter cap (per-hash-bucket top-N then
    global top-N) equals the naive single-window formulation on
    arbitrary key multisets — the superset argument, pinned."""
    from collections import Counter

    from sparkt.functions.skew import key_skew_report

    df = spark.createDataFrame([(f"k{v}",) for v in keys], ["k"])
    got = [(r["k"], r["n_rows"], r["rank"]) for r in
           key_skew_report(df, "k", top_n=top_n)
           .orderBy("rank").collect()]

    counts = Counter(f"k{v}" for v in keys)
    naive = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:top_n]
    assert got == [(k, c, i + 1) for i, (k, c) in enumerate(naive)]


@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0, max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_triangle_count_matches_networkx_random(spark, edges):
    """triangle_count equals networkx on arbitrary multigraph edge
    lists (duplicates, reversals, self-loops) — per-vertex triangles
    AND 4dp clustering coefficient."""
    import networkx as nx

    from sparkt.functions.graph import triangle_count

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)],
        "src int, dst int",
    )
    got = {r["node"]: (r["deg"], r["triangles"], r["clustering_coeff"])
           for r in triangle_count(df).collect()}
    g = nx.Graph(list(simple))
    tri, cc = nx.triangles(g), nx.clustering(g)
    assert set(got) == set(g.nodes)
    for n in g.nodes:
        assert got[n][:2] == (g.degree(n), tri[n])
        assert abs(got[n][2] - round(cc[n], 4)) < 1e-9


@given(
    st.lists(  # two runs: (doc, in_run_a, in_run_b) over distinct docs
        st.tuples(st.integers(0, 30), st.booleans(), st.booleans()),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=30, deadline=None)
def test_rrf_fuse_matches_formula_random(spark, docs):
    """rrf_fuse equals the published formula for arbitrary two-run
    overlap patterns; fused ranking is (rrf desc, doc asc)."""
    from sparkt.functions.index import rrf_fuse

    run_a = [(d, r + 1) for r, (d, _, _) in enumerate(
        [t for t in docs if t[1]])]
    run_b = [(d, r + 1) for r, (d, _, _) in enumerate(
        [t for t in docs if t[2]])]
    if not run_a and not run_b:
        return
    mk = lambda rows: spark.createDataFrame(
        [("q", d, r) for d, r in rows] or [("q", None, None)],
        "qid string, doc int, rank int",
    ).filter("doc is not null")
    got = {r["doc"]: r for r in
           rrf_fuse([mk(run_a), mk(run_b)], k=60).collect()}
    ra, rb = dict(run_a), dict(run_b)
    exp = {}
    for d in set(ra) | set(rb):
        s = (1.0 / (60.0 + ra[d]) if d in ra else 0.0) + (
            1.0 / (60.0 + rb[d]) if d in rb else 0.0)
        exp[d] = round(s, 6)
    assert {d: r["rrf"] for d, r in got.items()} == exp
    order = [r["doc"] for r in sorted(
        got.values(), key=lambda r: r["fused_rank"])]
    assert order == sorted(exp, key=lambda d: (-exp[d], d))


@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
             min_size=1, max_size=30),
    st.sampled_from([
        {"train": 0.8, "val": 0.1, "test": 0.1},
        {"train": 1.0},
        {"a": 0.5, "b": 0.5},
    ]),
)
@settings(max_examples=20, deadline=None)
def test_cluster_safe_split_matches_u32_ladder(spark, clusters, splits):
    """cluster_safe_split equals a python reimplementation of the
    cumulative u32 ladder (same md5 arithmetic, same float cum-sum,
    last split absorbs the tail)."""
    import hashlib

    from sparkt.functions.sampling import cluster_safe_split

    rows = [(i, c) for i, c in enumerate(clusters)]
    df = spark.createDataFrame(rows, "doc_id int, cluster string")
    got = {r["doc_id"]: r["split"]
           for r in cluster_safe_split(df, "cluster", splits).collect()}

    names = list(splits)
    bounds = []
    cum = 0.0
    for n in names[:-1]:
        cum += splits[n]
        bounds.append(int(cum * (1 << 32)))
    for i, c in rows:
        u = int(hashlib.md5(f"csplit:{c}".encode()).hexdigest()[:8], 16)
        pick = names[-1]
        for n, b in zip(names, bounds):
            if u < b:
                pick = n
                break
        assert got[i] == pick


@given(
    st.lists(  # run: distinct docs with ranks 1..n; qrels: subset flags
        st.tuples(st.integers(0, 25), st.booleans()),
        min_size=1, max_size=15, unique_by=lambda t: t[0],
    ),
    st.integers(1, 12),
)
@settings(max_examples=25, deadline=None)
def test_retrieval_metrics_invariants_random(spark, docs, k):
    """retrieval_metrics invariants on random runs/qrels: counts
    bounded (n_rel_ret <= min(n_ret, n_rel)), recall/precision in
    [0,1], mrr = 1/first_rel_rank exactly, first hit inside top-k."""
    from sparkt.functions.evaluate import retrieval_metrics

    run = spark.createDataFrame(
        [("q", d, r + 1) for r, (d, _) in enumerate(docs)],
        "query_id string, corpus_id int, rank int",
    )
    rel = [d for d, flag in docs if flag] or [docs[0][0]]
    qrels = spark.createDataFrame(
        [("q", d) for d in rel], "query_id string, corpus_id int"
    )
    rows = retrieval_metrics(run, qrels, k=k).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["n_rel"] == len(rel)
    assert m["n_ret"] == min(k, len(docs))
    assert m["n_rel_ret"] <= min(m["n_ret"], m["n_rel"])
    assert 0.0 <= m["recall_at_k"] <= 1.0
    assert 0.0 <= m["precision_at_k"] <= 1.0
    ranks = {d: r + 1 for r, (d, _) in enumerate(docs)}
    in_k = sorted(ranks[d] for d in rel if d in ranks and ranks[d] <= k)
    if in_k:
        assert m["first_rel_rank"] == in_k[0]
        assert abs(m["mrr"] - round(1.0 / in_k[0], 6)) < 1e-9
        assert m["n_rel_ret"] == len(in_k)
        assert m["ndcg_at_k"] > 0.0
    else:
        assert (m["first_rel_rank"], m["mrr"], m["ndcg_at_k"]) == (
            0, 0.0, 0.0)


@given(
    st.lists(
        st.tuples(st.floats(0, 1, allow_nan=False, width=16),
                  st.integers(1, 50)),
        min_size=1, max_size=40,
    ),
    st.integers(10, 400),
)
@settings(max_examples=20, deadline=None)
def test_budget_select_two_phase_equals_naive(spark, rows, budget):
    """budget_select's two-phase prefix sum equals the naive
    single-window formulation for arbitrary score/token mixes
    (duplicate scores share a grid cell) and any budget."""
    from sparkt.functions.sampling import budget_select

    data = [(i, float(s), n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "id int, q double, n int")
    fast = {(r["id"], r["cum_tokens"]) for r in budget_select(
        df, "id", "q", "n", budget).collect()}
    naive = {(r["id"], r["cum_tokens"]) for r in budget_select(
        df, "id", "q", "n", budget, two_phase=False).collect()}
    assert fast == naive
    # prefix rule vs python
    order = sorted(data, key=lambda t: (-t[1], t[0]))
    cum, exp = 0, set()
    for i, _, n in order:
        cum += n
        if cum <= budget:
            exp.add((i, cum))
    assert fast == exp


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdef", max_size=12),
    st.text(alphabet="abcdef", max_size=12),
)
def test_jaro_winkler_ascii_parity_vs_duckdb(a, b):
    """_jaro_winkler == DuckDB's jaro_winkler_similarity on ASCII —
    the f2 oracle contract (hypothesis-explored; the fixed-sample
    pin lives in test_pipeline_ops)."""
    import duckdb

    from sparkt.functions.linkage import _jaro_winkler

    ref = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert _jaro_winkler(a, b) == ref


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="ab€漢é", max_size=8),
    st.text(alphabet="ab€漢é", max_size=8),
)
def test_jaro_winkler_unicode_unit_divergence(a, b):
    """The documented unit divergence (r12 probe): DuckDB compares
    UTF-8 BYTES, our operator compares CODE POINTS. Byte-encoding
    the inputs reproduces DuckDB exactly; and on any non-ASCII
    self-comparison our unit choice still scores identity 1.0."""
    import duckdb

    from sparkt.functions.linkage import _jaro_winkler

    ref = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    as_bytes = (a.encode("utf-8").decode("latin-1"),
                b.encode("utf-8").decode("latin-1"))
    assert _jaro_winkler(*as_bytes) == ref
    if a:
        assert _jaro_winkler(a, a) == 1.0


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde漢é ", max_size=20),
            st.text(alphabet="abcde漢é ", max_size=20),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_jw_batch_matches_scalar_reference(pairs):
    """VERDICT r14 #2: the numpy-vectorized batch comparator
    (_jw_batch, now the UDF hot path) must reproduce the scalar
    reference _jaro_winkler (itself DuckDB-pinned) bit-for-bit on
    every pair — including empties, unicode, transpositions, and
    mixed-length batches that exercise the pow2 width bucketing."""
    import numpy as np

    from sparkt.functions.linkage import _jaro_winkler, _jw_batch

    ta = np.array([p[0] for p in pairs], dtype=object)
    tb = np.array([p[1] for p in pairs], dtype=object)
    vec = _jw_batch(ta, tb)
    for i, (a, b) in enumerate(pairs):
        assert vec[i] == _jaro_winkler(a, b), (a, b)
