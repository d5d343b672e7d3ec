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


# ------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id representative per normalized-text
    fingerprint."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ----------------------------------------------------------- shingles
def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


# ------------------------------------------------------------ minhash
def _seeded_md5(seed: int):
    # NB: must be a 1-arg lambda — pyspark treats a 2-parameter lambda
    # as (element, index), so a `lambda s, i=i:` closure silently
    # hashes with the POSITION as part of the captured variable
    def fn(s: Column) -> Column:
        return F.md5(F.concat(F.lit(f"{seed}|"), s))

    return fn


def minhash_signature(text: Column, n_hashes: int = 8, k: int = 3) -> Column:
    """Array of n_hashes min-hash values (md5-hex strings), one per
    seeded hash family member."""
    sh = shingles(text, k)
    return F.array(
        *[
            F.array_min(F.transform(sh, _seeded_md5(i)))
            for i in range(n_hashes)
        ]
    )


def lsh_bands(signature: Column, n_bands: int = 4, rows_per_band: int = 2) -> Column:
    """Band keys: md5 of each band's concatenated signature rows."""
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
    ~100× blowup at sf0.1). Exploding shingles once and taking 8
    ``min(md5(seed||shingle))`` aggregates computes each hash exactly
    once and shuffles only on doc id."""
    ex = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), k)).alias("sh"),
    )
    return ex.groupBy("doc").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
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
    Returns (id_a, id_b, n_shared_bands) with id_a < id_b."""
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
    ex = df.select(
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
    ex = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), k)).alias("sh"),
    ).distinct()
    if max_shingle_freq is not None:
        freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
        ex = ex.join(
            freq.filter(F.col("df_") <= max_shingle_freq).select("sh"), "sh"
        )
    # referenced three times (self-join both sides + sizes): persist so
    # the shingle explode+distinct computes once (at scale: write the
    # posting-list table out before the pair join)
    ex = ex.persist()
    sizes = ex.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        ex.alias("l")
        .join(ex.alias("r"),
              (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "id_a")
                   .withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b")
              .withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
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
