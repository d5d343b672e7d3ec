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
