"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Scale design (100 TB):
- exact dedup is one hash-groupBy shuffle on the 16-byte fingerprint;
- MinHash/LSH avoids the O(n²) pair space: signatures are a narrow
  projection (no shuffle), candidate generation shuffles on band keys
  only, and verification touches only co-bucketed pairs;
- n-gram Jaccard joins on exploded shingles — only docs sharing a
  shingle ever meet, and a frequency cap drops stop-shingles that
  would produce quadratic blowup.

All hashing is md5-hex (portable: the DuckDB oracle reproduces values
bit-for-bit). Min-over-hex-strings is a valid uniform min-hash because
fixed-width lowercase-hex ordering == numeric ordering of the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkt.functions.text import fingerprint, tokens
from sparkt.sources import spread


# ------------------------------------------------------------- exact
def _keep_first(df_with_fp: DataFrame, id_col: str) -> DataFrame:
    """One representative (lowest id) per ``fp`` — the shared
    representative-selection rule of exact_dedup and
    incremental_dedup."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df_with_fp.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per normalized-text
    fingerprint."""
    return _keep_first(
        df.withColumn("fp", fingerprint(F.col(text_col))), id_col
    )


# ----------------------------------------------------------- shingles
def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles.

    NB: referencing the ``tokens(text)`` EXPRESSION inside the lambda
    re-runs the regex split per element (Spark skips CSE inside
    higher-order functions — measured 3× on the d5 explode). Hot paths
    should use ``shingle_table`` below, which materializes the token
    array as a column first."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


def shingle_table(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Exploded distinct (doc, sz, sh) shingle relation — the scale
    formulation: tokens materialize as a real column BEFORE the shingle
    lambda so the split runs once per doc, not once per shingle.

    ``sz`` (the doc's distinct-shingle count) rides along on every
    exploded row: one int costs nothing through the shuffle and lets
    Jaccard/decontamination consumers read set sizes with a
    map-side-combined ``min`` instead of a separate groupBy-by-doc
    aggregation plus re-join (removed 2 joins + 1 aggregation from the
    d5 plan, −33% measured at sf0.1)."""
    pre = spread(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size("__toks") - k, F.lit(0))
            ),
            lambda i: F.array_join(F.slice("__toks", i + 1, k), " "),
        )
    )
    # persist AT THE ARRAY GRAIN, explode AFTER the cache (r16): this
    # posting list is the shared input of minhash, LSH and Jaccard —
    # at scale you'd write it out once and join everything against it;
    # locally the CacheManager makes plan-identical calls (e.g. the d3
    # and d5 gates over the same table) reuse one build. Caching the
    # EXPLODED grain was the r15 500k bottleneck: materializing 26M
    # tiny string rows cost 458 s (exploded persist) / 449 s
    # (localCheckpoint — so it is row-object churn, not columnar
    # compression) versus 25 s to just compute them. One array row per
    # doc caches in 19 s and re-reads in 0.7 s; the explode is cheap
    # codegen on top of the cache and the output rows are identical.
    arr = pre.select("doc", sh.alias("__sh")).persist()
    return arr.select(
        "doc", F.size("__sh").alias("sz"), F.explode("__sh").alias("sh")
    )


# ------------------------------------------------------------ minhash
def _rot_offset(i: int, n_hashes: int) -> int:
    """Hex-char rotation offset for family member i (≤ 8 members get
    4-char steps; more members pack tighter). The step must be
    32 // n_hashes — the earlier ``32 // n * 2`` doubled the stride and
    WRAPPED for n_hashes ≥ 11, silently duplicating family members
    (mh8..mh15 were copies of mh0..mh7 at n_hashes=16, fully
    correlating LSH band keys)."""
    if n_hashes <= 8:
        return (4 * i) % 32
    if n_hashes > 32:
        raise ValueError(
            "minhash family derives members from 32 hex chars; "
            f"n_hashes={n_hashes} > 32 would repeat offsets"
        )
    step = max(1, 32 // n_hashes)
    return (step * i) % 32


def hash_family_member(digest: Column, i: int, n_hashes: int = 8) -> Column:
    """Member i of the min-hash family from ONE md5 digest: rotate the
    32-char hex string left by 4·i chars. Ordering by the rotated string
    == ordering by the digest bytes starting at that offset, and md5
    bytes are independent — so each member induces an (approximately)
    independent uniform order at 1/n_hashes the md5 cost of a seeded
    family. Portable: same substr/|| expression in the DuckDB oracle."""
    off = _rot_offset(i, n_hashes)
    if off == 0:
        return digest
    return F.concat(
        F.substring(digest, off + 1, 32 - off), F.substring(digest, 1, off)
    )


def _seeded_md5(seed: int):
    # retained for callers wanting an explicit seeded family (n_hashes
    # md5s per element — the rotation family above is the cheap path).
    # NB: must be a 1-arg lambda — pyspark treats a 2-parameter lambda
    # as (element, index), so a `lambda s, i=i:` closure silently
    # hashes with the POSITION as part of the captured variable
    def fn(s: Column) -> Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), s))

    return fn


def _rot_md5(i: int, n_hashes: int):
    # 1-arg factory (a 2-param lambda would be treated as (element, index))
    def fn(s: Column) -> Column:
        return hash_family_member(F.md5(s), i, n_hashes)

    return fn


def minhash_signature(text: Column, n_hashes: int = 8, k: int = 3) -> Column:
    """Array of n_hashes min-hash values (rotated md5-hex strings)."""
    sh = shingles(text, k)
    return F.array(
        *[
            F.array_min(F.transform(sh, _rot_md5(i, n_hashes)))
            for i in range(n_hashes)
        ]
    )


def lsh_bands(signature: Column, n_bands: int = 4, rows_per_band: int = 2,
              n_hashes: int | None = None) -> Column:
    """Band keys: md5 of each band's concatenated signature rows.
    Pass ``n_hashes`` (the signature length) to validate up front:
    indexing past the signature throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    at runtime under ANSI mode, mid-job instead of at build time."""
    if n_hashes is not None and n_bands * rows_per_band > n_hashes:
        raise ValueError(
            f"lsh_bands: n_bands*rows_per_band = "
            f"{n_bands * rows_per_band} exceeds the signature length "
            f"{n_hashes}"
        )
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )


def minhash_table(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """Per-doc minhash signature via explode → groupBy-min.

    This formulation — not the array-lambda one — is the scale path:
    Spark skips common-subexpression elimination inside higher-order
    functions, so nesting ``minhash_signature`` under further array ops
    re-evaluates the whole shingle pipeline per reference (measured
    ~100× blowup at sf0.1). Exploding shingles once, md5-ing each
    shingle ONCE, and taking n_hashes mins over hex rotations of that
    single digest computes one md5 per shingle occurrence total
    (previously n_hashes md5s — the dominant bench cost) and shuffles
    only on doc id."""
    ex = shingle_table(df, text_col, id_col, k).select(
        "doc", F.md5("sh").alias("h")
    )
    return ex.groupBy("doc").agg(
        *[
            F.min(hash_family_member(F.col("h"), i, n_hashes)).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.
    Returns (id_a, id_b, n_shared_bands) with id_a < id_b.

    Choosing (n_hashes, n_bands) for a target Jaccard threshold:
    :func:`lsh_tune` picks the cheapest setting from the closed-form
    S-curve; :func:`lsh_calibration` then validates the choice
    empirically on the corpus."""
    rows = n_hashes // n_bands
    mh = minhash_table(df, text_col, id_col, n_hashes)
    bands = mh.select(
        "doc",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * rows + r}")
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    # cache: the self-join would otherwise recompute the signature
    # subtree for both sides (local analogue of writing the signature
    # table out before the bucket join)
    bands = bands.persist()
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(
            F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


# ------------------------------------------------------------ simhash
def simhash_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc 16-bit SimHash via explode → groupBy bit votes — the
    scale formulation (one md5 per token, one shuffle on doc id),
    mirroring minhash_table's rationale. Returns (doc, simhash)."""
    ex = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    votes = ex.groupBy("doc").agg(
        *[
            F.sum(
                F.when(
                    F.substring("h", j + 1, 1).isin(
                        "8", "9", "a", "b", "c", "d", "e", "f"
                    ),
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    return votes.select(
        "doc",
        F.concat(
            *[F.when(F.col(f"v{j}") > 0, "1").otherwise("0") for j in range(16)]
        ).alias("simhash"),
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash as a bit-string: per token, md5's 16 hex nibbles
    vote (high-bit of each nibble = +1/-1); majority per position.

    Portable: identical nibble votes in the DuckDB oracle. Wider
    (64/128-bit) variants extend the same expression."""
    toks = tokens(text)

    def voter(j: int):
        def fn(acc: Column, t: Column) -> Column:
            return acc + F.when(
                F.substring(F.md5(t), j + 1, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                1,
            ).otherwise(-1)

        return fn

    bits = []
    for j in range(16):
        vote = F.aggregate(toks, F.lit(0), voter(j))
        bits.append(F.when(vote > 0, "1").otherwise("0"))
    return F.concat(*bits)


# ------------------------------------------------- 64-bit simhash
# hex chars whose bit w (MSB-first within the nibble, w = 0..3) is
# set — bit j of a 64-bit md5-derived hash lives in nibble j // 4 at
# within-nibble position j % 4, so membership in HEX_BIT[j % 4] IS
# the bit test, with no arithmetic (portable: the DuckDB oracle uses
# the same IN lists)
HEX_BIT = [
    [c for c in "0123456789abcdef" if (int(c, 16) >> (3 - w)) & 1]
    for w in range(4)
]


def simhash_table64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc 64-bit SimHash (Charikar 2002) as a 64-char bit
    string — the scale replacement for the 16-bit
    :func:`simhash_table` key (VERDICT r11 #1: a 16-bit hash is a
    fixed 65,536-value join space that saturates; 64 bits keep
    random-pair collisions negligible at corpus scale).

    Same explode → groupBy shape as :func:`simhash_table` (ONE md5
    per token, one shuffle on doc id — the measured HOF-re-inlining
    fix), but all 64 bits of the md5 prefix vote: bit ``j`` is the
    within-nibble bit ``j % 4`` of hex nibble ``j // 4``. Returns
    ``(doc, simhash)``.
    """
    ex = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    votes = ex.groupBy("doc").agg(
        *[
            F.sum(
                F.when(
                    F.substring("h", j // 4 + 1, 1).isin(*HEX_BIT[j % 4]),
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    return votes.select(
        "doc",
        F.concat(
            *[F.when(F.col(f"v{j}") > 0, "1").otherwise("0") for j in range(64)]
        ).alias("simhash"),
    )


def band_bounds(n_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Partition ``n_bits`` into ``n_bands`` contiguous (start, width)
    bands, widest first — the pigeonhole split: any pair within
    hamming distance ``n_bands - 1`` agrees EXACTLY on >= 1 band."""
    base, rem = divmod(n_bits, n_bands)
    bounds, start = [], 0
    for b in range(n_bands):
        width = base + (1 if b < rem else 0)
        bounds.append((start, width))
        start += width
    return bounds


def hamming_banded_pairs(
    df: DataFrame,
    bits_col: str,
    id_col: str,
    k: int = 3,
    n_bits: int = 64,
) -> DataFrame:
    """All pairs within hamming distance ``k`` over a wide bit-string
    hash column, by PIGEONHOLE BANDING (the PartEnum argument: split
    the hash into ``k + 1`` disjoint bands; <= k differing bits leave
    >= 1 band identical, so a per-band equijoin finds every
    qualifying pair with zero recall loss) — the scale replacement
    for the 16-bit one-bit-flip multi-probe (VERDICT r11 #1), whose
    fixed 65,536-value join key saturates at corpus size.

    Bands are as wide as possible (``n_bits // (k+1)``, e.g. 32 bits
    at k=1, 16 at k=3), so the join-key space GROWS with hash width
    instead of being fixed: random-pair band collisions are
    ~ n² / 2^width per band. Candidates are verified with exact
    ``bit_count`` hamming over all bands (bands partition the hash,
    so the band-xor popcounts sum to the full hamming distance).

    Input: ``(id_col, bits_col)`` where ``bits_col`` is an
    ``n_bits``-char '0'/'1' string (:func:`simhash_table64`,
    ``perceptual_hash64``). Returns ``id_a, id_b, hamming``
    (``id_a < id_b``, hamming <= k, exact integers).

    100 TB shape: (k+1)× probe explode of (id, band_idx, band_val)
    rows, one integer-pair equijoin, exact-dedup groupBy — never
    all-pairs; each qualifying pair is found once per agreeing band
    and deduped by DISTINCT.
    """
    if k < 0:
        raise ValueError(f"hamming distance bound must be >= 0, got {k}")
    # >= k+1 bands for the pigeonhole recall guarantee, AND enough
    # bands that every width is <= 63 bits: conv(x, 2, 10) of a
    # 64-bit band can exceed Long.MAX and cast('long') NULLs the join
    # key (silently dropping exact-dup pairs at k=0, found by the r12
    # review). Extra bands only WIDEN the candidate set — recall is
    # still exact because the bit_count verify filters on true
    # hamming; a 63-bit band peaks at exactly Long.MAX.
    nb = max(k + 1, -(-n_bits // 63))
    bounds = band_bounds(n_bits, nb)
    # single evaluation (r16): bands feeds BOTH self-join sides, so
    # the caller's hash subtree (simhash: tokenize+shingle+md5+majority
    # per doc; perceptual: 4 salted md5 digests) executed twice per
    # run. One row per doc of nb+1 longs: the cheap grain.
    bands = df.select(
        F.col(id_col).alias("__id"),
        *[
            F.conv(F.substring(bits_col, s + 1, w), 2, 10)
            .cast("long")
            .alias(f"b{i}")
            for i, (s, w) in enumerate(bounds)
        ],
    ).localCheckpoint(eager=False)
    left = bands.select(
        F.col("__id").alias("id_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(nb)],
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(nb)])).alias(
            "band_idx", "probe"
        ),
    )
    right = bands.select(
        F.col("__id").alias("id_b"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(nb)],
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(nb)])).alias(
            "band_idx", "probe"
        ),
    )
    ham = sum(
        (
            F.bit_count(
                F.col(f"a{i}").bitwiseXOR(F.col(f"c{i}"))
            )
            for i in range(nb)
        ),
        F.lit(0),
    )
    return (
        left.join(right, ["band_idx", "probe"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", ham.cast("int").alias("hamming")
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )


def simhash_neardup_pairs64(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Text near-duplicate pairs within hamming distance ``k`` on the
    64-bit SimHash — :func:`simhash_table64` hashes +
    :func:`hamming_banded_pairs` pigeonhole banding. Supersedes the
    16-bit :func:`simhash_neardup_pairs` at corpus scale (VERDICT
    r11 #1): the 16-bit key space saturates (bucket population grows
    linearly with the corpus), while the banded 64-bit join key space
    is 2^16..2^32 per band and collision rates stay data-driven.

    Returns ``id_a, id_b, hamming`` (exact integers, id_a < id_b).
    """
    return hamming_banded_pairs(
        simhash_table64(df, text_col, id_col), "simhash", "doc", k=k
    )


# ---------------------------------------------------------- winnowing
def winnow_table(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03): hash every character k-gram of the normalized text,
    slide a window of w consecutive hashes, keep each window's minimum.
    Guarantees any shared substring of length >= k + w - 1 yields a
    shared fingerprint, while storing only ~2/(w+1) of the k-gram
    hashes. Returns distinct (doc, fp).

    Scale shape: pure per-row projection + explode (no shuffle until
    the consumer joins on fp), same posting-list pattern as
    ``shingle_table``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    pre = spread(df).select(
        F.col(id_col).alias("doc"), norm.alias("__norm")
    ).filter(F.length("__norm") >= k)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("__norm") - (k - 1)),
        lambda i: F.md5(F.col("__norm").substr(i, F.lit(k))),
    )
    pre = pre.select("doc", grams.alias("__grams"))
    mins = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("__grams") - (w - 1), F.lit(1))
            ),
            lambda j: F.array_min(F.slice("__grams", j, w)),
        )
    )
    # (doc, fp) is already unique — array_distinct dedupes within the
    # doc and explode emits one row per surviving fp, so the old
    # trailing .distinct() was a full posting-list shuffle for nothing
    # (r16 plan audit). Fingerprint arrays cache at the ARRAY grain
    # (the shingle_table rationale: materializing the exploded grain
    # cost 18x the recompute at the 500k rung); consumers re-explode
    # from the cache per reference.
    arr = pre.select("doc", mins.alias("__fps")).persist()
    return arr.select("doc", F.explode("__fps").alias("fp"))


def winnow_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 5,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs sharing >= min_shared winnowed
    fingerprints — fp-posting equijoin, never all-pairs.
    ``max_fp_freq`` drops fingerprints present in more than that many
    docs (boilerplate headers/footers would otherwise create quadratic
    pair blowup at scale — same cap as ``ngram_jaccard_pairs``)."""
    fps = winnow_table(df, text_col, id_col, k, w)
    if max_fp_freq is not None:
        freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df_"))
        fps = fps.join(
            freq.filter(F.col("df_") <= max_fp_freq).select("fp"), "fp"
        )
        # cache the CAPPED posting list only: its freq join would
        # otherwise run once per self-join side. Without the cap the
        # winnow_table array-grain cache already covers both sides —
        # persisting the raw exploded posting list here measured 18x
        # its own recompute at the 500k rung (shingle_table note).
        fps = fps.persist()
    return (
        fps.alias("l")
        .join(
            fps.alias("r"),
            (F.col("l.fp") == F.col("r.fp")) & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------- decontamination
def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    threshold: float = 0.2,
    method: str = "semi",
    m_bits: int = 1 << 22,
    k_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose k-word
    shingles overlap a benchmark/eval set above ``threshold`` (the
    standard n-gram-overlap decontamination used for pretraining
    corpora; cf. GPT-3 appendix C / PaLM §6). Returns
    (doc, n_sh, overlap, contamination) for flagged docs.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval suites are ~1e5 docs vs 1e10), so it BROADCASTS —
    the corpus side is one shingle projection + broadcast hash join +
    one groupBy-doc shuffle. No shuffle of the corpus by shingle, no
    pair explosion.

    ``method='bloom'`` (VERDICT r14 ask #3) swaps the broadcast
    shingle SET for d12's mergeable Bloom filter
    (:func:`sparkt.functions.sketches.bloom_build`): the broadcast
    payload shrinks from every distinct bench shingle STRING to
    ``m_bits/32`` long words (512 KB at the 1<<22 default, regardless
    of bench size), and the probe joins on word_idx instead of the
    shingle value. Overlap becomes an UPPER bound (false positives at
    the filter's FPR ≈ (1-e^(-k·n/m))^k — size m_bits for the bench
    shingle count and the two methods agree exactly; the agreement is
    pytest-pinned at the default size on the test corpora). Same
    output schema either way."""
    corpus_sh = shingle_table(df, text_col, id_col, k)
    bench_sh = (
        shingle_table(bench_df, text_col, id_col, k)
        .select("sh")
        .distinct()
    )
    if method == "bloom":
        from sparkt.functions.sketches import bloom_build, bloom_probe

        bloom = bloom_build(bench_sh, "sh", m_bits, k_hashes)
        probed = bloom_probe(
            corpus_sh, "doc", "sh", bloom, m_bits, k_hashes,
            carry_cols=["sz"],
        )
        return (
            probed.groupBy("doc")
            .agg(
                F.sum(F.col("maybe_member").cast("long")).alias("overlap"),
                F.min("sz").alias("n_sh"),
            )
            .withColumn(
                "contamination",
                F.round(F.col("overlap") / F.col("n_sh"), 6),
            )
            .filter(F.col("contamination") >= threshold)
            .select("doc", "n_sh", "overlap", "contamination")
        )
    if method != "semi":
        raise ValueError(f"decontaminate method '{method}' (semi|bloom)")
    # n_sh rides the posting rows (shingle_table's sz): ONE groupBy-doc
    # shuffle total — no separate sizes aggregation, no sizes⋈hits join
    # (docs with zero overlap can't pass threshold > 0 anyway, matching
    # the previous inner join)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("overlap"),
            F.min("sz").alias("n_sh"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("overlap") / F.col("n_sh"), 6),
        )
        .filter(F.col("contamination") >= threshold)
        .select("doc", "n_sh", "overlap", "contamination")
    )


# ------------------------------------------------- n-gram Jaccard join
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over k-shingles for all pairs sharing
    at least one (non-stop) shingle. ``max_shingle_freq`` drops
    shingles appearing in more than that many docs (stop-shingle cap —
    essential at scale)."""
    # shingle_table emits array_distinct'd shingles per doc, so
    # (doc, sh) is already unique — a .distinct() here would add a
    # full extra shuffle of the posting list for nothing
    ex = shingle_table(df, text_col, id_col, k)
    if max_shingle_freq is not None:
        freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        ex = ex.join(
            freq.filter(F.col("df_") <= max_shingle_freq).select("sh"), "sh"
        )
        # the Jaccard universe is the CAPPED shingle sets: recompute sz
        # as the per-doc survivor count (one shuffle by doc, no join)
        ex = ex.drop("sz").withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc"))
        )
        ex = ex.persist()
    # set sizes ride the posting rows (shingle_table's sz), so the pair
    # aggregation reads them with a map-side-combined min — no separate
    # sizes aggregation, no re-joins of the pair table
    inter = (
        ex.alias("l")
        .join(ex.alias("r"),
              (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min(F.col("l.sz")).alias("sz_a"),
            F.min(F.col("r.sz")).alias("sz_b"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "jaccard")
    )


# ----------------------------------------------------------- clustering
def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    strict: bool = True,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs — the step after
    every pair generator (minhash/jaccard/winnowing): pairs → clusters,
    so one canonical doc per cluster survives.

    ADAPTIVE EXECUTION: the deduplicated pair set is materialized
    first (it must be, to truncate lineage for the loop), so its count
    is free — and when it is at most ``driver_threshold`` distinct
    pairs (default 1M ≈ a few MB: model-scale, the k-means-collect
    policy; an upper bound of the canonical edge count) the components
    are solved in one driver-side union-find pass over the collected
    pairs — including the singleton labels, so no further Spark job
    runs at all — instead of log-n distributed rounds, each of which
    costs two full Spark jobs of fixed latency. A 100 TB corpus whose
    pair stage emits billions of edges takes the distributed path
    automatically; ``driver_threshold=0`` forces it (the d9 gate pins
    it that way). Both paths produce identical labels (pytest-pinned).

    Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14):

    - large-star(u): over the undirected neighborhood Γ(u), attach every
      strictly-greater neighbor to ``m = min(Γ(u) ∪ {u})``;
    - small-star(u): over the smaller neighbors, attach them (and u) to
      their minimum.

    Both steps are one groupBy-min + one equijoin — the same per-round
    shuffle shape as naive label propagation — but the component
    collapses in **O(log n) rounds instead of O(diameter)**, which is
    the difference between 7 rounds and thousands on the chain-shaped
    components templated boilerplate produces at 100 TB. At fixpoint
    every component is a star rooted at its minimum id.

    Convergence is detected from the edge multiset signature
    (count + sum of xxhash64(u, v)) folded into ONE aggregate job per
    round — no extra join-and-count pass; a false "converged" would
    need a colliding 64-bit hash *sum*, which is negligible. On hitting
    ``max_iter`` unconverged this RAISES (``strict=True``, default) or
    warns — it never silently returns truncated labels (round-4 advice:
    a >20-hop chain used to be split into multiple clusters with no
    signal). With default settings, components up to ~2^20 diameter
    converge.

    Returns (doc, cluster) for every doc appearing in ``pairs``;
    cluster = min doc id of the component (deterministic).
    """
    # Materialize the id pairs ONCE: the vertex set (for the singleton
    # union below) and the edge set both derive from here. Before r15
    # the singles branch re-ran the caller's pair GENERATOR twice more
    # (union of two selects over `pairs`) — for sd1 that generator is
    # the full IVF-cell cosine equijoin, so the gate paid the pair
    # stage 3x (r15 optimization; before/after walls in
    # OPTIMIZATION_r15.md — guide §1.2 "don't compute things you
    # throw away").
    # r16 (ADVICE r15): checkpoint the DEDUPLICATED pair set, not the
    # raw multiset — banded MinHash / IVF-cell generators emit a pair
    # once per band/cell, so at billions-of-pairs scale the raw
    # checkpoint stores a large multiple of the distinct set while
    # both consumers re-apply .distinct() anyway (value-identical).
    # localCheckpoint blocks are executor-local and non-recoverable on
    # executor loss (guide §5): acceptable residue-free default for a
    # within-query intermediate; callers running on preemptible fleets
    # should persist(DISK_ONLY) their pair generator upstream instead.
    raw = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .distinct()
        .localCheckpoint()
    )

    # r16: the driver path decides on (and collects) the materialized
    # `raw` pair set directly — the previous shape built and
    # checkpointed the canonical edge table plus a 4-job
    # union/distinct/anti-join singles branch on a dataset that was
    # about to be collect()ed anyway; once the pairs are on the
    # driver, edges, union-find AND singletons are plain Python and
    # the result is ONE createDataFrame (guide §1.2 — at gate scale
    # each spared job is ~0.2 s of fixed latency). The threshold now
    # gates on distinct raw pairs rather than canonical edges — an
    # upper bound of the edge count, so the switch stays conservative.
    if driver_threshold > 0 and raw.count() <= driver_threshold:
        from pyspark.sql.types import StructField, StructType

        parent: dict = {}

        def _find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        members: set = set()
        for r in raw.collect():
            u, v = r["u"], r["v"]
            members.add(u)
            members.add(v)
            if u == v:
                continue  # self-pair: singleton unless edged elsewhere
            ra, rb = _find(u), _find(v)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # smaller id stays root -> root == min
        utype = raw.schema["u"].dataType
        schema = StructType(
            [StructField("doc", utype), StructField("cluster", utype)]
        )
        # edge-less members label themselves: the singleton clusters
        # the old anti-join branch produced, now for free
        return pairs.sparkSession.createDataFrame(
            [(x, _find(x)) for x in sorted(members)], schema
        )

    # canonical (child > parent) orientation; both star steps preserve it
    edges = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()  # truncate lineage: round N must not replay 1..N-1
    )

    def _signature(e: DataFrame) -> tuple:
        # decimal(38,0) accumulator: a plain bigint sum of 64-bit hashes
        # overflows under ANSI mode
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["c"], row["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        bidir = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            bidir.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        return (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # e is (child, parent) with parent < child
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        reattached = (
            e.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        return reattached.union(
            mins.select("u", F.col("m").alias("v"))
        ).distinct()

    sig = None  # first round always runs; no upfront signature job
    converged = False
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        new_sig = _signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        msg = (
            f"duplicate_clusters did not converge in {max_iter} rounds; "
            "labels would be incorrect for components still contracting. "
            "Raise max_iter (rounds grow O(log component_size))."
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # fixpoint is a star forest: every non-root points at its component
    # minimum; roots appear only on the parent side. Docs appearing
    # ONLY in self-pairs (u == v, dropped from the edge set) still owe
    # the caller a singleton cluster — without the union below they
    # would silently vanish from the output.
    singles = (
        raw.select(F.col("u").alias("doc"))
        .union(raw.select(F.col("v").alias("doc")))
        .distinct()
        .join(
            edges.select(F.col("u").alias("doc"))
            .union(edges.select(F.col("v").alias("doc")))
            .distinct(),
            "doc",
            "left_anti",
        )
        .select("doc", F.col("doc").alias("cluster"))
    )
    return (
        edges.select(F.col("u").alias("doc"), F.col("v").alias("cluster"))
        .union(
            edges.select(F.col("v").alias("doc"), F.col("v").alias("cluster"))
        )
        .union(singles)
        .distinct()
    )


# ------------------------------------------------- repeated-span dedup
def span_duplicates(
    df,
    text_col: str,
    id_col: str,
    window: int = 10,
    stride: int = 1,
    max_span_freq: int = 1000,
):
    """Cross-document repeated-span detection — the distributed
    formulation of exact-substring deduplication (public design: Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"; their suffix-array construction is single-machine, the
    scalable equivalent is token-window fingerprinting).

    With ``stride=1`` (default) every ``window``-token position is
    fingerprinted, so EVERY shared verbatim span of >= ``window``
    tokens is caught regardless of where it sits in each document —
    the honest exact-substring guarantee. ``stride > 1`` is the cheap
    sampled mode: it only catches spans whose window offsets happen to
    align modulo ``stride`` across documents (fine for intra-corpus
    boilerplate scans, NOT a detection guarantee — content-anchored
    sampling with a guarantee is ``winnow_pairs``). Output: one row
    per fingerprint seen in >= 2 distinct documents, with document
    count, occurrences, and the smallest doc id (the canonical
    keeper); removing spans elsewhere is a fingerprint semi-join back
    against this table.

    Scale shape: ONE posexplode (~1 row per token at stride=1 — the
    same blowup class as d5's shingle explode, partition-local, no
    shuffle) + ONE groupBy shuffle on the md5 fingerprint.
    ``max_span_freq`` drops degenerate boilerplate fingerprints (the
    stop-shingle cap of d5) so no reducer key explodes at 100 TB.
    Reference has no dedup operators (dbt delegates compute,
    ARCHITECTURE.md:34-46).
    """
    from sparkt.functions.text import chunk_table

    chunks = chunk_table(
        df, text_col, id_col, window=window, stride=stride
    ).filter(F.col("n_tokens") == window)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc").alias("keep_doc"),
        )
        .filter(
            (F.col("n_docs") >= 2) & (F.col("n_occ") <= max_span_freq)
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Lexical near-duplicate pairs by TF-IDF COSINE over sparse
    shingle vectors — the classic bag-of-ngrams similarity (Salton's
    vector space model) sitting between d5's set-Jaccard (ignores
    term frequency) and sd1's dense-embedding cosine (needs an
    encoder): repeated shingles weigh in, rare shingles dominate.

    Weights are the rational ``tf / df`` (t6's doctrine: exact IEEE
    doubles in every engine, unlike ln-idf whose last ulp differs);
    cosine = Σ w_a·w_b / (||a||·||b||), rounded 4dp (sums over
    a doc's ~10²-term vector — the s3/s11 float-sum class).
    ``max_df`` drops corpus-wide stop-shingles from the VECTORS
    (norms included — standard stop-word removal precedes
    vectorization), the d17 cap argument.

    Returns ``id_a, id_b, cosine`` (id_a < id_b, cosine >=
    threshold).

    100 TB shape: sparse posting-list self-join — only docs sharing
    a shingle ever meet (never all-pairs), the dot product is one
    map-side-combined aggregate on (id_a, id_b), norms join back at
    pair grain. The weights relation feeds four consumers (both dot
    sides + both norm branches); r16 re-audit of the EXECUTED plan
    (the r12 A/B trusted pre-execution explain) showed 8 parquet
    scans and ZERO runtime exchange reuse — the shingle projection,
    tf and df aggregations ran up to 8x per gate. ``w`` is therefore
    localCheckpointed (posting-list grain, ~|docs|·|terms per doc|
    rows — the same size class as the d3 signature persist); warm
    wall 5.2 -> 1.3 s at sf0.1.
    """
    pre = spread(df).select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )
    # docs with < k tokens get NO vector (standard shingling): the
    # old greatest(size-k, 0) fallback emitted ONE truncated shingle,
    # so every empty/whitespace doc carried the identical '' shingle
    # and all blank docs paired pairwise at cosine 1.0 — both a
    # spurious-verdict and a quadratic hot-key problem at corpus
    # scale (r12 review finding)
    sh = F.when(
        F.size("__toks") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - k),
            lambda i: F.array_join(F.slice("__toks", i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = pre.select("doc", F.explode(sh).alias("sh"))
    tf = ex.groupBy("doc", "sh").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("sh").agg(F.count(F.lit(1)).alias("dfv"))
    if max_df is not None:
        dft = dft.filter(F.col("dfv") <= max_df)
    w = tf.join(dft, "sh").select(
        "doc", "sh", (F.col("tf") / F.col("dfv")).alias("w")
    ).localCheckpoint(eager=False)
    # single evaluation (r16): norms feeds BOTH pair-side joins below —
    # without the checkpoint the per-doc norm aggregate over `w` ran
    # twice per execution (tiny relation: one row per doc; the values
    # are identical either way — `w` is checkpointed, so each branch
    # folds the same partitions in the same order)
    norms = w.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    ).localCheckpoint(eager=False)
    dots = (
        w.alias("l")
        .join(
            w.alias("r"),
            (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(
            F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b")
        )
        .agg(F.sum(F.col("l.w") * F.col("r.w")).alias("dot"))
    )
    na = norms.select(
        F.col("doc").alias("id_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("doc").alias("id_b"), F.col("nrm").alias("nb")
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def sentence_span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    max_span_freq: int = 1000,
) -> DataFrame:
    """Cross-document repeated SENTENCE-SPAN detection — C4's own
    curation step (Raffel et al. 2020 dedupe any three-sentence span
    occurring more than once in the corpus), at sentence grain where
    :func:`span_duplicates` works at token grain.

    Sentences come from the same ``[.!?]+`` splitter as
    ``sentence_stats`` (trimmed, empties dropped); every run of ``k``
    consecutive sentences fingerprints as the md5 of the
    newline-joined span, and a fingerprint groupBy surfaces spans
    seen in >= 2 distinct documents — never all-pairs. Removing the
    span elsewhere is a fingerprint semi-join back against this
    table, exactly the d10 consumption pattern.

    Returns one row per cross-document span: ``span_md5, n_docs,
    n_occ, keep_doc`` (smallest doc id — the canonical keeper).
    ``max_span_freq`` is the stop-span cap (d5's stop-shingle
    argument): a boilerplate span in millions of docs would otherwise
    explode one reducer key at 100 TB.

    Scale shape: per-row HOF chain (split → filter → transform →
    slice/md5 — no token ever leaves its row), ONE explode of ~1 row
    per sentence, ONE groupBy shuffle on the 16-byte fingerprint.
    Docs with < k sentences emit nothing (guarded: Spark's
    ``sequence(1, n)`` with n < 1 would generate DESCENDING, so the
    window list is gated on size >= k).
    """
    sents = F.transform(
        F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != "",
        ),
        lambda s: F.trim(s),
    )
    pre = spread(df).select(
        F.col(id_col).alias("doc"), sents.alias("__sents")
    )
    win = F.transform(
        F.sequence(F.lit(1), F.size("__sents") - (k - 1)),
        lambda i: F.md5(F.array_join(F.slice("__sents", i, k), "\n")),
    )
    ex = pre.select(
        "doc",
        F.explode(
            F.when(F.size("__sents") >= k, win).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("span_md5"),
    )
    return (
        ex.groupBy("span_md5")
        .agg(
            F.countDistinct("doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc").alias("keep_doc"),
        )
        .filter(
            (F.col("n_docs") >= 2) & (F.col("n_occ") <= max_span_freq)
        )
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_fps: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Deduplicate a NEW batch of documents against an EXISTING corpus
    — the daily-increment shape of a continuously-crawled training
    corpus (dedup each arrival batch against everything already
    ingested, then within itself).

    ``seen_fps`` carries one ``fp`` column — the persisted fingerprint
    table of the corpus so far (``fingerprint`` of normalized text, as
    written by :func:`exact_dedup` outputs). Two steps, both keyed on
    fp:

    1. LEFT ANTI join drops new docs whose fingerprint is already in
       the corpus — at 100 TB this is a shuffle (or bucketed) equijoin
       on the fingerprint, NOT a rescan of historical text;
    2. :func:`exact_dedup` then picks one representative per remaining
       fingerprint within the batch.

    Returns the surviving new rows (with ``fp``) — append them and
    their fingerprints to the corpus/fp tables to complete the cycle.
    """
    withfp = new_df.withColumn("fp", fingerprint(F.col(text_col)))
    unseen = withfp.join(
        seen_fps.select("fp").distinct(), "fp", "left_anti"
    )
    return _keep_first(unseen, id_col)


# ------------------------------------------------ URL canonicalization
# tracking parameters stripped during canonicalization (the public
# web-crawl convention: UTM campaign tags, click ids, referrer tags)
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|ref)="


# RFC 3986 §2.3 unreserved characters: percent-escapes of THESE (and
# only these) are semantically transparent and safe to decode during
# normalization; reserved escapes (%2F, %3F, %23, …) carry syntax and
# must stay encoded. Shared with the DuckDB oracle generator so both
# engines run the identical decode chain.
UNRESERVED_CHARS = (
    [chr(c) for c in range(ord("A"), ord("Z") + 1)]
    + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + ["-", ".", "_", "~"]
)


def _pct_decode_unreserved(col: Column) -> Column:
    """RFC 3986 §6.2.2.2 percent-decoding of unreserved characters:
    66 chained constant ``regexp_replace`` calls (hex digits either
    case via ``(?i)``) — pure codegen, no UDF. ``%25`` is never
    decoded, so no new escape sequences can form and one pass is a
    fixpoint."""
    for ch in UNRESERVED_CHARS:
        col = F.regexp_replace(col, f"(?i)%{ord(ch):02x}", ch)
    return col


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for crawl-level deduplication (the
    standard web-pipeline normalizations, all regex-expressible so the
    DuckDB oracle reproduces them exactly):

    - fragment stripped;
    - scheme and host lowercased; leading ``www.`` dropped;
    - default port dropped (``:80`` for http, ``:443`` for https);
    - trailing slash(es) stripped from the path;
    - tracking query params dropped (:data:`TRACKING_PARAM_RE`),
      remaining params sorted;
    - percent-escapes of UNRESERVED characters decoded
      (RFC 3986 §6.2.2.2 — ``%41`` → ``A``, ``%7e`` → ``~``; reserved
      escapes like ``%2F`` keep their syntax and stay encoded).

    Inputs without a ``scheme://`` prefix fall back to
    ``lower(trim(url))``.

    Pure per-row codegen expression — at 100 TB this is free relative
    to the scan, and :func:`url_dedup` adds the one hash-groupBy
    shuffle exact dedup costs.
    """
    u = _pct_decode_unreserved(F.regexp_replace(url, "#.*$", ""))
    scheme = F.lower(
        F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    rest = F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    nohost = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(nohost, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(nohost, ":443$", ""))
        .otherwise(nohost)
    )
    path = F.regexp_replace(
        F.regexp_extract(rest, "^([^?]*)", 1), "/+$", ""
    )
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    qs = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    assembled = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", F.lower(F.trim(url))).otherwise(assembled)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Crawl-frontier URL dedup: one row per canonical URL with the
    duplicate count and the lowest-id representative. One hash-groupBy
    shuffle on the canonical string (same scale shape as exact
    dedup)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min(id_col).alias("rep_id"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the data-versioning
    primitive behind "what changed since the last crawl/training mix"
    (the dataset-lineage question every reproducible-data pipeline has
    to answer): per document id, ``added`` (only in new), ``removed``
    (only in old), ``changed`` (both, content fingerprint differs) or
    ``unchanged``.

    Content identity is the whitespace-normalized md5
    (``text.fingerprint``) — the same key exact_dedup uses, so a diff
    of ``unchanged`` really means byte-equivalent-after-normalization,
    engine-portable for the oracle.

    Scale shape: two narrow (id, fp) projections and ONE full-outer
    equijoin on the id — co-partitioned if both snapshots are bucketed
    by id (the natural layout for versioned corpora); no step carries
    document text past the fingerprint projection.

    Returns ``(<id_col>, status)`` for every id in either snapshot.
    """
    from sparkt.functions.text import fingerprint

    o = old.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_old")
    )
    n = new.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("__fp_new")
    )
    return o.join(n, id_col, "full_outer").select(
        F.col(id_col),
        F.when(F.col("__fp_old").isNull(), "added")
        .when(F.col("__fp_new").isNull(), "removed")
        .when(F.col("__fp_old") == F.col("__fp_new"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )


def lsh_calibration(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    n_bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """LSH parameter calibration report: for every MinHash candidate
    pair, compare the BAND EVIDENCE (n_shared_bands) against the
    EXACT k-shingle Jaccard, bucketed into deciles — the QA table
    that answers "are my (n_hashes, n_bands) settings catching real
    near-dups or hash noise?" before a corpus-scale dedup run.
    A healthy setting concentrates high-band pairs in high-Jaccard
    deciles; mass in decile 0-2 at max bands means the banding is
    too permissive.

    Returns ``n_shared_bands, jaccard_decile, n_pairs`` (decile =
    ``floor(10·|A∩B| / |A∪B|)``, integer-exact; 10 only when the sets
    are identical).

    Scale shape: the exact Jaccard is computed ONLY for candidate
    pairs (the banded equijoin's output — never all-pairs); each
    side's distinct-shingle array rides the id join, bounded by
    document size. The final aggregate is a tiny (bands × 11) grain.

    The decision step this table validates: :func:`lsh_tune` picks
    (n_hashes, n_bands) from the closed-form S-curve before any
    distributed work runs.
    """
    pairs = minhash_candidate_pairs(
        df, text_col, id_col, n_hashes=n_hashes, n_bands=n_bands
    )
    # single evaluation (r16): the shingle-array relation feeds BOTH
    # pair-side joins — without the checkpoint the shingle HOF ran
    # twice over the corpus. Array grain (one row per doc), the cheap
    # class from the shingle_table cache note.
    sh = df.select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), k).alias("__sh"),
    ).localCheckpoint(eager=False)
    j = (
        pairs.join(
            sh.select(F.col("__id").alias("id_a"),
                      F.col("__sh").alias("__sa")), "id_a"
        )
        .join(
            sh.select(F.col("__id").alias("id_b"),
                      F.col("__sh").alias("__sb")), "id_b"
        )
        .withColumn(
            "__inter", F.size(F.array_intersect("__sa", "__sb"))
        )
        .withColumn(
            "__union",
            F.size("__sa") + F.size("__sb") - F.col("__inter"),
        )
        .withColumn(
            "jaccard_decile",
            F.floor(
                F.lit(10) * F.col("__inter")
                / F.greatest(F.col("__union"), F.lit(1))
            ).cast("int"),
        )
    )
    return j.groupBy("n_shared_bands", "jaccard_decile").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def lsh_candidate_probability(
    s: float, n_bands: int, rows_per_band: int
) -> float:
    """The public LSH S-curve (Leskovec/Rajaraman/Ullman, *Mining of
    Massive Datasets* ch. 3): probability that a pair with Jaccard
    similarity ``s`` shares at least one of ``n_bands`` bands of
    ``rows_per_band`` MinHash rows each —
    ``P = 1 - (1 - s^r)^b``. Pure closed form, driver-side."""
    return 1.0 - (1.0 - s**rows_per_band) ** n_bands


def lsh_tune(
    target_s: float,
    target_recall: float = 0.95,
    reject_s: float | None = None,
    max_fp: float = 0.05,
    max_hashes: int = 32,
) -> dict:
    """Pick ``(n_hashes, n_bands, rows_per_band)`` for
    :func:`minhash_candidate_pairs` from the closed-form S-curve —
    the decision step that :func:`lsh_calibration`'s measured
    (bands × Jaccard-decile) table validates empirically (VERDICT
    r10 ask #5). Driver-side arithmetic only, no distributed work.

    Constraints: candidate probability at ``target_s`` must be
    ``>= target_recall``; when ``reject_s`` is given (the "clearly
    not a duplicate" similarity), probability there must be
    ``<= max_fp``. Among satisfying configs the tuner returns the
    CHEAPEST — fewest total hashes (b·r), then the lowest
    false-positive probability at ``reject_s`` (or at ``target_s/2``
    when no reject point was given) — because n_hashes is the per-row
    signature cost and bands are the shuffle-key expansion at corpus
    scale.

    ``max_hashes`` defaults to 32: the rotated-md5 hash family
    (:func:`hash_family_member`) repeats offsets past 32, so larger
    signatures need a seeded family first.

    Returns ``{n_hashes, n_bands, rows_per_band, recall_at_target,
    fp_at_reject, threshold}`` where ``threshold = (1/b)^(1/r)`` is
    the curve's standard inflection approximation. Raises
    ``ValueError`` when no config within ``max_hashes`` satisfies the
    constraints (raise ``max_hashes`` or relax the targets).
    """
    if not 0.0 < target_s < 1.0:
        raise ValueError(f"target_s must be in (0, 1), got {target_s}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall}"
        )
    if reject_s is not None and not 0.0 <= reject_s < target_s:
        raise ValueError(
            f"reject_s must be in [0, target_s), got {reject_s}"
        )
    fp_point = reject_s if reject_s is not None else target_s / 2.0
    best = None
    for b in range(1, max_hashes + 1):
        for r in range(1, max_hashes // b + 1):
            recall = lsh_candidate_probability(target_s, b, r)
            if recall < target_recall:
                continue
            fp = lsh_candidate_probability(fp_point, b, r)
            if reject_s is not None and fp > max_fp:
                continue
            key = (b * r, fp)
            if best is None or key < best[0]:
                best = (key, b, r, recall, fp)
    if best is None:
        raise ValueError(
            f"no (bands, rows) with <= {max_hashes} hashes reaches "
            f"recall {target_recall} at s={target_s}"
            + (
                f" with fp <= {max_fp} at s={reject_s}"
                if reject_s is not None
                else ""
            )
        )
    _, b, r, recall, fp = best
    return {
        "n_hashes": b * r,
        "n_bands": b,
        "rows_per_band": r,
        "recall_at_target": recall,
        "fp_at_reject": fp,
        "threshold": (1.0 / b) ** (1.0 / r),
    }


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    multi_probe: bool = True,
) -> DataFrame:
    """Text near-duplicate pairs by SimHash bucket equijoin with
    hamming-1 multi-probe — the text twin of :func:`sparkt.functions
    .multimodal.perceptual_neardup_pairs` (multi-probe LSH, Lv et al.
    2007): each document's 16-bit :func:`simhash16` expands to itself
    plus its 16 one-bit flips, and probes equijoin against exact
    hashes, so every pair within hamming distance 1 surfaces without
    a pairwise hamming scan. ``multi_probe=False`` degrades to the
    exact-bucket join (hamming 0 only).

    Returns ``id_a, id_b, hamming`` (0 or 1; ``id_a < id_b``; exact
    integers). SimHash hamming distance tracks cosine similarity of
    token frequency vectors (Charikar 2002), so hamming ≤ 1 on 16
    bits is a strong near-dup signal at this width.

    SCALE CEILING (VERDICT r11 #1): the join key is a FIXED
    65,536-value space, so bucket population grows linearly with the
    corpus and the pair stage degenerates toward all-pairs
    (~N²/2^16) once N exceeds the hash space — unlike d3's band keys
    whose cardinality scales with content. Fine for small/medium
    corpora and pinned tests; at corpus scale use
    :func:`simhash_neardup_pairs64` (64-bit hash + pigeonhole
    banding, the d16 gate's path since r12).

    Plan shape: hashes from :func:`simhash_table` (explode → groupBy
    bit votes — ONE md5 per token; the inline :func:`simhash16` HOF
    column re-evaluates the token split per bit vote, the measured
    minhash_table re-inlining trap), then a 17× probe explode of
    (id, 16-bit int) rows, one integer equijoin, one exact dedup
    groupBy.
    """
    h = simhash_table(df, text_col, id_col).select(
        F.col("doc").alias("__id"),
        F.conv("simhash", 2, 10).cast("int").alias("hv"),
    )
    flips = [F.col("hv")]
    if multi_probe:
        flips += [
            F.col("hv").bitwiseXOR(F.lit(1 << b)) for b in range(16)
        ]
    left = h.select(
        F.col("__id").alias("id_a"),
        F.col("hv").alias("hv_a"),
        F.explode(F.array(*flips)).alias("probe"),
    )
    right = h.select(
        F.col("__id").alias("id_b"), F.col("hv").alias("probe")
    )
    return (
        left.join(right, "probe")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("hv_a").bitwiseXOR(F.col("probe")))
            .cast("int")
            .alias("hamming"),
        )
        .distinct()
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Shingle CONTAINMENT pairs — Broder 1997's asymmetric companion
    to resemblance: ``C(A,B) = |A∩B| / |A|``. Containment catches the
    near-SUPERSET relations symmetric Jaccard structurally misses — a
    short document quoted inside a long one scores Jaccard ≈
    |A|/|B| ≈ 0 but containment ≈ 1, the boilerplate/quotation dedup
    case in web-corpus curation.

    Returns one row per unordered candidate pair (``id_a < id_b``):
    ``id_a, id_b, inter, c_a, c_b`` (containment of each side, 6dp —
    single integer divisions, cross-engine exact), filtered to
    ``greatest(c_a, c_b) >= threshold``.

    Same scale shape as :func:`ngram_jaccard_pairs` (shared posting
    list, one equijoin, map-side-combined aggregate);
    ``max_shingle_freq`` is the stop-shingle cap — essential at
    corpus scale.
    """
    ex = shingle_table(df, text_col, id_col, k)
    if max_shingle_freq is not None:
        freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        ex = ex.join(
            freq.filter(F.col("df_") <= max_shingle_freq).select("sh"),
            "sh",
        )
        # sz must be recomputed AFTER the cap (containment denominators
        # are the capped set sizes). No per-call persist (ADVICE r11:
        # it was never released): the l/r self-join subtrees are
        # plan-identical, so the window's doc-shuffle exchange is
        # reused (ReusedExchange), and the upstream posting list is
        # shingle_table's documented shared cache.
        ex = ex.drop("sz").withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc"))
        )
    inter = (
        ex.alias("l")
        .join(
            ex.alias("r"),
            (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("id_a"),
                 F.col("r.doc").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min(F.col("l.sz")).alias("sz_a"),
            F.min(F.col("r.sz")).alias("sz_b"),
        )
    )
    out = inter.select(
        "id_a",
        "id_b",
        "inter",
        F.round(F.col("inter") / F.col("sz_a"), 6).alias("c_a"),
        F.round(F.col("inter") / F.col("sz_b"), 6).alias("c_b"),
    )
    return out.filter(F.greatest("c_a", "c_b") >= threshold)
