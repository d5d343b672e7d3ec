"""Retrieval-quality evaluation over ranked runs + relevance labels.

The measurement half of the retrieval stack (:mod:`sparkt.functions
.similarity` produces dense runs, :mod:`sparkt.functions.index` lexical
ones): given a ranked run and a qrels table, compute per-query
recall@k / precision@k / MRR — the standard TREC-style diagnostics a
training-data pipeline runs after every embedding or chunking change.

Beyond-reference operator; formulas are the published IR definitions
(Voorhees 1999 for MRR; recall/precision@k as in every TREC track).

Float contract: every metric here is a SINGLE division of integers
(or 1/rank), computed in one expression — no float aggregation, so
cross-engine determinism needs only the display rounding (4dp ratios,
6dp MRR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    doc_id: str = "corpus_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics of ``run`` against ``qrels``.

    ``run``: ranked results — ``(query_id, doc_id, rank_col)`` with
    rank 1 = best (extra columns ignored). ``qrels``: the relevant
    ``(query_id, doc_id)`` pairs (duplicates tolerated). Duplicate
    (query, doc) rows in the run's top-k slice are also tolerated:
    they collapse to the best (min) rank before counting, so n_ret /
    n_rel_ret count DISTINCT retrieved docs — the TREC convention
    (trec_eval dedupes runs) and what keeps a doc retrieved twice
    from double-counting (ADVICE r10).

    Returns one row per query WITH RELEVANT DOCS: integer evidence
    ``n_rel, n_ret, n_rel_ret, first_rel_rank`` (first_rel_rank 0 when
    nothing relevant was retrieved) plus ``recall_at_k``,
    ``precision_at_k`` (4dp), ``mrr`` (6dp, 0.0 when no hit — the
    standard convention, and it keeps the output null-free), and
    ``ndcg_at_k`` (binary-gain nDCG, Järvelin & Kekäläinen 2002).
    nDCG is a log2-based FLOAT SUM — rank/threshold it, never hash it
    across engines (the t6/t11 doctrine); every other column is
    hash-exact.

    Scale shape: one equijoin of the top-k slice against the distinct
    qrels on (query, doc) — both sides are |Q|·k / |qrels|-sized, tiny
    next to the corpus that produced the run — then one groupBy per
    query. No step touches the corpus itself.
    """
    # single evaluation (r16): rel feeds both the per-query relevant
    # counts and the run join — without the barrier the caller's qrels
    # subtree (ev1: a corpus-wide label equijoin) executed twice per
    # run. |qrels| rows: the cheap grain.
    rel = qrels.select(
        F.col(query_id).alias("__q"), F.col(doc_id).alias("__d")
    ).distinct().localCheckpoint(eager=False)
    nrel = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("n_rel"))
    topk = (
        run.select(
            F.col(query_id).alias("__q"),
            F.col(doc_id).alias("__d"),
            F.col(rank_col).alias("__r"),
        )
        .filter(F.col("__r") <= k)
        .groupBy("__q", "__d")
        .agg(F.min("__r").alias("__r"))
    )
    marked = topk.join(rel.withColumn("__rel", F.lit(1)), ["__q", "__d"],
                       "left")
    perq = marked.groupBy("__q").agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.sum(F.coalesce(F.col("__rel"), F.lit(0))).alias("n_rel_ret"),
        F.min(F.when(F.col("__rel") == 1, F.col("__r")))
        .alias("__first"),
        F.sum(
            F.when(F.col("__rel") == 1,
                   F.lit(1.0) / F.log2(F.col("__r") + F.lit(1.0)))
        ).alias("__dcg"),
    )
    out = nrel.join(perq, "__q", "left")
    n_rel_ret = F.coalesce(F.col("n_rel_ret"), F.lit(0))
    return out.select(
        F.col("__q").alias(query_id),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce(F.col("n_ret"), F.lit(0)).cast("long").alias("n_ret"),
        n_rel_ret.cast("long").alias("n_rel_ret"),
        F.coalesce(F.col("__first"), F.lit(0)).cast("long")
        .alias("first_rel_rank"),
        F.round(n_rel_ret / F.col("n_rel"), 4).alias("recall_at_k"),
        F.round(n_rel_ret / F.lit(float(k)), 4).alias("precision_at_k"),
        F.coalesce(
            F.round(F.lit(1.0) / F.col("__first"), 6), F.lit(0.0)
        ).alias("mrr"),
        F.coalesce(
            F.round(
                F.col("__dcg")
                / F.aggregate(
                    F.sequence(
                        F.lit(1),
                        F.least(F.col("n_rel"), F.lit(k)).cast("int"),
                    ),
                    F.lit(0.0),
                    lambda acc, i: acc
                    + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
                ),
                6,
            ),
            F.lit(0.0),
        ).alias("ndcg_at_k"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Classifier calibration report — the reliability-diagram table
    (DeGroot & Fienberg 1983; Guo et al. 2017's ECE inputs): bin the
    predicted score into ``n_bins`` equal-width bins over [0, 1] and
    compare each bin's mean score (confidence) against its positive
    fraction (accuracy). The quality-classifier QA step a training
    pipeline runs before trusting scores as sampling weights (the
    t8 hashed-classifier / p5 quality-bucket consumers).

    Returns ``bin, n, n_pos, frac_pos, avg_score, gap`` — counts
    exact; ``frac_pos`` a single integer division (4dp);
    ``avg_score`` a float mean (4dp, the q1 avg contract); ``gap`` =
    the difference of the two ALREADY-ROUNDED values (deterministic
    given hash-exact operands). The scalar ECE = Σ|gap|·n/N is a
    float sum over bins — derive it downstream and treat it as
    threshold-only (the t6/t11 doctrine).

    Bin assignment ``least(floor(score·n_bins), n_bins-1)`` is
    IEEE-deterministic when the score itself is a fixed-shape
    expression (a ratio of integers): both engines compute the same
    product and floor. One map-side-combined groupBy over an
    ``n_bins`` grain — embarrassingly scalable.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins), F.lit(n_bins - 1)
    ).cast("int")
    lab = F.col(label_col).cast("long")
    out = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lab).alias("n_pos"),
        F.round(F.sum(lab) / F.count(F.lit(1)), 4).alias("frac_pos"),
        F.round(F.avg(score_col), 4).alias("avg_score"),
    )
    return out.withColumn(
        "gap", F.round(F.col("avg_score") - F.col("frac_pos"), 4)
    )


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 over (label, prediction)
    pairs — the multi-class classifier scorecard (standard
    definitions; the per-class table behind sklearn's report). The QA
    step after every lang-id / quality-classifier change, next to
    :func:`calibration_report`'s probability view.

    Returns one row per class (union of observed labels and
    predictions): integer evidence ``n_true (support), n_pred, tp``
    plus ``precision`` = tp/n_pred, ``recall`` = tp/n_true (4dp,
    single integer divisions — cross-engine exact; 0.0 when the
    denominator is 0) and ``f1`` = 2PR/(P+R) computed from the
    ALREADY-ROUNDED precision/recall (deterministic given hash-exact
    operands; 0.0 when P+R = 0).

    Scale shape: three map-side-combined groupBys over the class
    grain (support, predicted, true-positive) + two tiny outer joins
    on the class key — the corpus is touched once per count, and the
    reduce side is |classes| rows at any scale.
    """
    # single evaluation (r16): the three class-grain counts each
    # re-ran the caller's scoring chain (ev3: lang_id over every doc
    # executed 3x). Materialize the two-column (label, pred) grain
    # once; the counts read it.
    pairs = df.select(
        F.col(label_col), F.col(pred_col)
    ).localCheckpoint(eager=False)
    lab = F.col(label_col).alias("cls")
    support = pairs.groupBy(lab).agg(F.count(F.lit(1)).alias("n_true"))
    pred = pairs.groupBy(F.col(pred_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        pairs.filter(F.col(label_col) == F.col(pred_col))
        .groupBy(lab)
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    out = (
        support.join(pred, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.round(F.col("tp") / F.col("n_pred"), 4)
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.round(F.col("tp") / F.col("n_true"), 4)
    ).otherwise(F.lit(0.0))
    out = out.withColumn("precision", prec).withColumn("recall", rec)
    return out.withColumn(
        "f1",
        F.when(
            F.col("precision") + F.col("recall") > 0,
            F.round(
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
                4,
            ),
        ).otherwise(F.lit(0.0)),
    )


def cohens_kappa(
    df: DataFrame, rater_a: str, rater_b: str
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement (Cohen 1960) between
    two label columns — the label-quality QA a pipeline runs before
    trusting human or model annotations as training targets:
    ``κ = (p_o − p_e) / (1 − p_e)`` with observed agreement ``p_o``
    and chance agreement ``p_e = Σ_c (n_aᶜ/n)(n_bᶜ/n)``.

    Returns ONE row: ``n, n_agree`` (exact), ``po`` (single integer
    division, 4dp), ``pe``, and ``kappa`` (4dp). EVERY float here is
    deterministic to the bit: the pe numerator sums INTEGER-VALUED
    doubles (marginal products, total ≪ 2⁵³ — exact regardless of
    accumulation order), so pe and κ reduce to fixed-shape divisions
    of exact values. κ = 0.0 when pe = 1 (full chance agreement makes
    it undefined; 0 is the fixed-point convention).

    Scale shape: two class-grain groupBys + one |classes|-row join
    for the marginals, one map-side-combined count for agreement —
    the corpus is scanned twice, the reduce side is |classes| rows.
    """
    from sparkt.functions import join_scalars

    # single evaluation (r16): the agreement count and the two
    # marginals each re-ran the caller's scoring chain (ev4: lang_id
    # over every doc executed 3x). Two-column grain, cheap.
    pairs = df.select(
        F.col(rater_a), F.col(rater_b)
    ).localCheckpoint(eager=False)
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col(rater_a) == F.col(rater_b)).cast("long")
        ).alias("n_agree"),
    )
    ma = pairs.groupBy(F.col(rater_a).alias("cls")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mb = pairs.groupBy(F.col(rater_b).alias("cls")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    pe_tab = (
        ma.join(mb, "cls")
        .agg(F.sum(F.col("na").cast("double") * F.col("nb"))
             .alias("__pe_num"))
    )
    out = join_scalars(tot, pe_tab)
    po = F.col("n_agree") / F.col("n")
    pe = F.col("__pe_num") / (F.col("n") * F.col("n").cast("double"))
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.round(po, 4).alias("po"),
        F.round(pe, 4).alias("pe"),
        F.when(pe >= 1.0, F.lit(0.0))
        .otherwise(F.round((po - pe) / (1 - pe), 4))
        .alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, label_col: str, n_raters: int
) -> DataFrame:
    """Fleiss' kappa multi-rater agreement (Fleiss 1971) over
    long-format ratings ``(item, label)`` — the 3+-annotator
    generalization of :func:`cohens_kappa` an LLM pipeline needs for
    majority-vote label QA (ev4 covers exactly two raters; VERDICT
    r11 #5). Items must carry exactly ``n_raters`` ratings; items
    with any other count are dropped (the standard complete-case
    rule), keeping the plan fully lazy — no driver-side inference.

    Bit-determinism (the ev4 doctrine): with constant n, the mean
    per-item agreement folds to ALL-INTEGER algebra —
    ``p_bar = (Σ_ij n_ij² − N·n) / (N·n·(n−1))`` and
    ``p_e = Σ_j c_j² / (N·n)²`` — so every float is a fixed-shape
    division of exact integers (category sums-of-squares are
    integer-valued doubles, exact below 2⁵³ at any accumulation
    order). κ = 0.0 when p_e = 1 (the cohens_kappa convention).

    Returns ONE row: ``n_items, n_raters`` (exact), ``p_bar, p_e,
    kappa`` (4dp; κ from the unrounded operands).

    Scale shape: one (item, label)-grain groupBy, one item-grain
    groupBy with map-side combine, one |labels|-row aggregate — the
    reduce side is |items| + |labels| rows, never per-rating.
    """
    from sparkt.functions import join_scalars

    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    # materialize the (item, label) counts ONCE (r16, guide §1.2):
    # nij feeds the items branch AND both sides of the c2 scalar
    # subquery, and the executed plan re-ran the caller's full rating
    # construction per reference (ev5: 3 scans, zero runtime exchange/
    # subquery reuse). nij is |items|×|labels| rows — tiny at any
    # corpus size that fits an agreement study.
    nij = df.groupBy(
        F.col(item_col).alias("__item"),
        F.col(label_col).alias("__label"),
    ).agg(F.count(F.lit(1)).alias("__nij")).localCheckpoint(eager=False)
    items = (
        nij.groupBy("__item")
        .agg(
            F.sum("__nij").alias("__n_i"),
            F.sum(F.col("__nij") * F.col("__nij")).alias("__s2_i"),
        )
        .filter(F.col("__n_i") == n_raters)
    )
    stats = items.agg(
        F.count(F.lit(1)).alias("__n_items"),
        F.sum("__s2_i").alias("__s2"),
    )
    c2 = (
        nij.join(items.select("__item"), "__item")
        .groupBy("__label")
        .agg(F.sum("__nij").alias("__c_j"))
        .agg(
            F.sum(F.col("__c_j").cast("double") * F.col("__c_j"))
            .alias("__c2")
        )
    )
    out = join_scalars(stats, c2)
    nn = F.col("__n_items").cast("double") * n_raters
    p_bar = (F.col("__s2") - nn) / (nn * (n_raters - 1))
    p_e = F.col("__c2") / (nn * nn)
    return out.select(
        F.col("__n_items").cast("long").alias("n_items"),
        F.lit(n_raters).cast("int").alias("n_raters"),
        F.round(p_bar, 4).alias("p_bar"),
        F.round(p_e, 4).alias("p_e"),
        F.when(p_e >= 1.0, F.lit(0.0))
        .otherwise(F.round((p_bar - p_e) / (1 - p_e), 4))
        .alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame, item_col: str, label_col: str
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over long-format ratings
    ``(item, label)`` — the agreement coefficient that, unlike
    :func:`fleiss_kappa`, tolerates MISSING ratings: items keep
    whatever raters they have (any m_i >= 2 is pairable; m_i = 1
    drops), the standard choice for crowdsourced label QA where
    annotator counts vary per item.

    Coincidence-matrix formulation folded to per-item algebra:
    ``D_o = Σ_i (m_i² − Σ_c n_ic²)/(m_i − 1) / n`` and
    ``D_e = (n² − Σ_c n_c²)/(n(n−1))``, ``α = 1 − D_o/D_e`` computed
    as the fixed-shape ``1 − (n−1)·Σ_i(...) / (n² − Σ_c n_c²)``.

    Float determinism: every term is integer except the per-item
    ``/(m_i − 1)``. With a CONSTANT rater count per item (the gate's
    case, m_i = 3) each term is an exact dyadic rational (x/2), so
    sums are exact at any accumulation order; with varying m_i the
    D_o sum is order-sensitive in the last ulp — rounded 4dp, the
    s3/s11 float-sum class. α = 0.0 when D_e = 0 (no expected
    disagreement — single observed category).

    Returns ONE row: ``n_items, n_vals`` (exact), ``d_o, d_e, alpha``
    (4dp; α from unrounded operands).

    Scale shape: identical to fleiss_kappa — (item, label) groupBy,
    item-grain groupBy, |labels|-row aggregate, scalar-subquery
    assembly (no BNLJ).
    """
    from sparkt.functions import join_scalars

    # same single-evaluation rationale as fleiss_kappa (r16): nij is
    # referenced by items, do_tab's lineage AND the c2 subquery join
    nij = df.groupBy(
        F.col(item_col).alias("__item"),
        F.col(label_col).alias("__label"),
    ).agg(F.count(F.lit(1)).alias("__nij")).localCheckpoint(eager=False)
    items = (
        nij.groupBy("__item")
        .agg(
            F.sum("__nij").alias("__m"),
            F.sum(F.col("__nij") * F.col("__nij")).alias("__s2"),
        )
        .filter(F.col("__m") >= 2)
    )
    do_tab = items.agg(
        F.count(F.lit(1)).alias("__n_items"),
        F.sum("__m").alias("__n"),
        F.sum(
            (
                F.col("__m").cast("double") * F.col("__m")
                - F.col("__s2")
            )
            / (F.col("__m") - F.lit(1.0))
        ).alias("__do_num"),
    )
    c2 = (
        nij.join(items.select("__item"), "__item")
        .groupBy("__label")
        .agg(F.sum("__nij").alias("__n_c"))
        .agg(
            F.sum(F.col("__n_c").cast("double") * F.col("__n_c"))
            .alias("__c2")
        )
    )
    out = join_scalars(do_tab, c2)
    n = F.col("__n").cast("double")
    d_o = F.col("__do_num") / n
    d_e = (n * n - F.col("__c2")) / (n * (n - 1))
    alpha = F.lit(1.0) - ((n - 1) * F.col("__do_num")) / (
        n * n - F.col("__c2")
    )
    return out.select(
        F.col("__n_items").cast("long").alias("n_items"),
        F.col("__n").cast("long").alias("n_vals"),
        F.round(d_o, 4).alias("d_o"),
        F.round(d_e, 4).alias("d_e"),
        F.when(n * n - F.col("__c2") <= 0.0, F.lit(0.0))
        .otherwise(F.round(alpha, 4))
        .alias("alpha"),
    )
