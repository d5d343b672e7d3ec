"""Lexical search indexing: distributed inverted-index construction.

The lexical complement of the embedding-based ANN operators
(similarity.py) — posting lists are the substrate of BM25/keyword
retrieval over a corpus, and building them at 100 TB is a skew
problem: a stop-term's posting list ("the") is billions of documents.

Scale design: one (term, doc) shuffle for term frequencies, a bounded
two-phase top-cap for posting lists (no task ever materializes an
uncapped mega-term list), and a small per-term stats aggregate that
keeps EXACT document frequencies independent of the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkt.functions.text import tokens
from sparkt.sources import spread


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    max_postings: int = 1000,
) -> DataFrame:
    """Build an inverted index: one row per term with its EXACT
    document frequency / total term frequency and a doc-id-ordered
    posting list capped at ``max_postings`` (the head of the posting
    list — lowest ids first — as keyword-retrieval seeds).

    Returns ``term, df, total_tf, postings`` (``postings`` an
    ascending ``array<id>``, ``size <= max_postings``).

    SKEW-SAFE CAP (the domain_quota two-phase top-N argument): a plain
    ``collect_list(doc) over term`` materializes a stop-term's full
    posting list in ONE task — billions of entries at 100 TB. Phase 1
    ranks within (term, id mod 16) so every task keeps at most
    ``max_postings`` per sub-bucket; phase 2 ranks the ≤ 16·cap
    survivors per term. Keeping each sub-bucket's top-cap is a
    superset of the global top-cap, so the capped list EXACTLY equals
    the naive formulation. ``df``/``total_tf`` aggregate the UNCAPPED
    tf table (a count shuffle, map-side combined) so frequencies stay
    exact regardless of the cap.
    """
    tok = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    # xxhash64 bucketing is type-agnostic (string doc ids are common);
    # pmod(doc, 16) would implicit-cast and raise under ANSI mode.
    # The two-phase superset argument is independent of the bucket fn.
    sub = F.pmod(F.xxhash64("doc"), F.lit(16))
    w1 = Window.partitionBy("term", sub).orderBy(F.asc("doc"))
    w2 = Window.partitionBy("term").orderBy(F.asc("doc"))
    capped = (
        tf.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= max_postings)
        .withColumn("__rk2", F.row_number().over(w2))
        .filter(F.col("__rk2") <= max_postings)
    )
    postings = capped.groupBy("term").agg(
        F.sort_array(F.collect_list("doc")).alias("postings")
    )
    out = stats.join(postings, "term")
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out


def bm25_match(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    qtext_col: str = "qtext",
    qid_col: str = "qid",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval (public formula: Robertson/Sparck Jones,
    TREC-3): score every (query, document) pair sharing at least one
    term. Returns per pair the INTEGER match evidence — ``n_matched``
    distinct matching terms, ``sum_tf`` total matching occurrences,
    ``doc_len`` — plus the float ``bm25`` score (idf · saturated tf).
    The integers are engine-exact; the score is ln/avgdl-based —
    rank/threshold it, never hash it (t6/t11 doctrine).

    Scale shape: the corpus side is the t13 tf table (one exploded
    count shuffle) plus a per-doc length projection; ``queries`` is
    the SMALL side and BROADCASTS (a query workload is ~10³-10⁶ rows
    against 10¹⁰ docs), so the probe is a map-side join on term — the
    only large shuffle after it is the (qid, doc) aggregate. Corpus
    constants (N, avgdl) ride a 1-row broadcast hash join
    (``join_scalars``), never a driver collect.
    """
    from pyspark.sql.functions import broadcast

    tok = spread(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("doc_len"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(tokens(F.col(qtext_col))))
        .alias("term"),
    )
    from sparkt.functions import join_scalars

    joined = join_scalars(
        tf.join(broadcast(qterms), "term")
        .join(dfreq, "term")
        .join(dl, "doc"),
        consts,
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        + F.lit(1.0)
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("doc_len") / F.col("avgdl"))
    )
    return (
        joined.withColumn("__s", idf * sat)
        .groupBy("qid", "doc")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum("tf").alias("sum_tf"),
            F.max("doc_len").alias("doc_len"),
            F.sum("__s").alias("bm25"),
        )
    )


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 60,
    query_id: str = "qid",
    doc_id: str = "doc",
    rank_col: str = "rank",
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval runs (public
    formula: Cormack, Clarke & Buettcher, SIGIR 2009) — the standard
    way to combine a lexical run (:func:`bm25_match`) with a dense one
    (:func:`sparkt.functions.similarity.cosine_topk`) without score
    calibration:

        rrf(q, d) = sum over runs of 1 / (k + rank_i(q, d))

    with a run missing the pair contributing 0. Returns ``query_id,
    doc_id, rank_0..rank_{N-1}, rrf, fused_rank`` (fused_rank by
    ``rrf desc, doc asc``; ``topn`` keeps the head per query).

    Float contract: the score is ONE fixed-shape arithmetic expression
    over the pivoted per-run rank columns — never a float SUM whose
    addend order the engine picks — so any engine that evaluates the
    same expression reproduces it bit-for-bit (rounded 6dp for
    display).

    Scale shape: the inputs are top-k-sized (|Q|·k rows per run, the
    corpus is already gone), so the whole fusion is one union + one
    groupBy on (query, doc) + one per-query window. A pair appearing
    twice in one run keeps its BEST (min) rank.
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    tagged = [
        r.select(
            F.col(query_id).alias("__q"),
            F.col(doc_id).alias("__d"),
            F.col(rank_col).alias("__r"),
            F.lit(i).alias("__run"),
        )
        for i, r in enumerate(runs)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    piv = u.groupBy("__q", "__d").agg(
        *[
            F.min(F.when(F.col("__run") == i, F.col("__r")))
            .alias(f"rank_{i}")
            for i in range(len(runs))
        ]
    )
    score = None
    for i in range(len(runs)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    piv = piv.withColumn("rrf", F.round(score, 6))
    w = Window.partitionBy("__q").orderBy(F.desc("rrf"), F.asc("__d"))
    out = piv.withColumn("fused_rank", F.row_number().over(w))
    if topn is not None:
        out = out.filter(F.col("fused_rank") <= topn)
    return out.select(
        F.col("__q").alias(query_id),
        F.col("__d").alias(doc_id),
        *[f"rank_{i}" for i in range(len(runs))],
        "rrf",
        "fused_rank",
    )
