"""Feature engineering over event streams: point-in-time trailing
windows and exponential time decay.

The batch feature-store shape (public design: the trailing-window /
time-decayed counters of Feathr/Feast-style feature pipelines, and the
exponential-decay relevance weighting of Ebadi et al.'s decay counters):
for every entity, aggregate its event history AS OF a reference time —
counts and value sums over trailing windows plus a half-life-decayed
activity score that smoothly forgets old events instead of cliff-edging
at a window boundary.

Scale design: ONE map-side-combined groupBy on the entity key — every
window is a conditional aggregate over the same scan, never one scan
per window. The reference time defaults to ``max(ts)`` attached as a
scalar subquery (``join_scalars``) so the whole thing stays a single
Catalyst plan with no driver collect. Floats follow the q1 contract:
trailing sums round at 2dp, decay scores at 4dp; exact integer counts
carry the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkt.functions import join_scalars

#: ln 2 as a shared literal so engine and oracle compute bit-identical
#: decay exponents (F.log(2.0) would fold to the same value, but a
#: spelled-out constant keeps the SQL side trivially identical)
LN2 = 0.6931471805599453


def decay_features(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    windows_days: tuple[int, ...] = (1, 7, 30),
    half_life_days: float = 7.0,
) -> DataFrame:
    """Per-entity trailing-window counts + exponentially-decayed
    activity score, as of the table's ``max(ts)``.

    Returns one row per key:
      ``<key>, n_{d}d`` for each window (exact integers),
      ``v_{d}d`` value sums (2dp) when ``value_col`` is given, and
      ``decay`` = ``round(sum(0.5 ^ (age / half_life)), 4)`` — a
      smooth recency-weighted event count (an event ``half_life`` ago
      contributes 0.5, two half-lives ago 0.25, ...).

    All windows aggregate in ONE pass: conditional aggregates over a
    single scan + a single map-side-combined shuffle on the key. At
    100 TB the only sized object is the per-key output table.
    """
    ref = events.agg(F.max(ts_col).alias("__ref"))
    base = join_scalars(events, ref)
    age_s = F.col("__ref").cast("double") - F.col(ts_col).cast("double")
    aggs = []
    for d in windows_days:
        in_win = F.col(ts_col) >= F.col("__ref") - F.expr(
            f"INTERVAL {int(d)} DAY"
        )
        aggs.append(
            F.sum(in_win.cast("long")).alias(f"n_{d}d")
        )
        if value_col:
            aggs.append(
                F.round(
                    F.sum(F.when(in_win, F.col(value_col)).otherwise(0.0)),
                    2,
                ).alias(f"v_{d}d")
            )
    aggs.append(
        F.round(
            F.sum(F.exp(-F.lit(LN2) * age_s
                        / F.lit(half_life_days * 86400.0))),
            4,
        ).alias("decay")
    )
    return base.groupBy(key_col).agg(*aggs)


def funnel_stages(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis — how deep each entity progressed
    through ``steps`` (view → click → purchase), the product-analytics
    primitive behind conversion reporting. Stage k is reached iff the
    entity has a STRICTLY time-increasing event subsequence matching
    ``steps[:k]``, taken greedily (earliest qualifying event per step —
    the standard funnel semantics, equal to the iterative
    min-ts-after-previous formulation the oracle runs).

    Scale shape: one groupBy on the entity key collecting its sorted
    (ts, type) event list, then a single codegen ``aggregate`` HOF scan
    — no joins, no per-step passes (an n-step funnel in SQL costs n
    self-joins; here it is one shuffle regardless of n). Assumes
    per-entity history fits a task (the collect_list contract shared
    with sessionization); unbounded keys should be pre-sessionized.

    Returns ``(<key_col>, stage)`` with ``0 <= stage <= len(steps)``.
    """
    if not steps:
        # element_at(steps_lit, 0) below would raise under ANSI mode
        # (Column & does not short-circuit), so guard before planning
        return events.select(key_col).distinct().withColumn(
            "stage", F.lit(0).cast("int")
        )
    n = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    seq = F.sort_array(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t"))
        )
    )
    init = F.struct(
        F.lit(0).cast("int").alias("st"),
        F.lit(None).cast("timestamp").alias("lt"),
    )

    def advance(acc, e):
        # least() keeps element_at in-bounds when the funnel already
        # completed (ANSI mode raises on index past the array)
        want = F.element_at(
            steps_lit, F.least(acc["st"] + 1, F.lit(n))
        )
        ok = (
            (acc["st"] < n)
            & (e["t"] == want)
            & (acc["lt"].isNull() | (e["ts"] > acc["lt"]))
        )
        return F.when(
            ok,
            F.struct(
                (acc["st"] + 1).cast("int").alias("st"),
                e["ts"].alias("lt"),
            ),
        ).otherwise(acc)

    return events.groupBy(key_col).agg(
        F.aggregate(seq, init, advance)["st"].alias("stage")
    )


def cohort_retention(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    anchor_filter=None,
) -> DataFrame:
    """Cohort retention — the companion report to :func:`funnel_stages`:
    group entities by the week of their anchor event (first event, or
    first event matching ``anchor_filter`` — e.g. ``F.col("event_type")
    == "signup"``), then count how many are active in each subsequent
    week. The classic retention-triangle input.

    Returns ``cohort_week (date), week_offset, n_cohort, n_active``
    with ``week_offset >= 0`` (activity before the anchor is not
    retention) and exact integer counts.

    Scale shape: one groupBy-min for anchors, one equijoin on the
    entity key (co-partitioned with the anchor aggregate's output
    partitioning — AQE reuses the exchange), a distinct on
    (entity, cohort, week) and two map-side-combined counts. Weeks are
    ``date_trunc('week')`` Mondays — identical across engines.
    """
    src = events.filter(anchor_filter) if anchor_filter is not None else events
    anchors = (
        src.groupBy(key_col)
        .agg(F.min(ts_col).alias("__t0"))
        .withColumn("__cohort", F.date_trunc("week", F.col("__t0")))
        .localCheckpoint(eager=False)
    )
    # ^ single evaluation (r16): anchors feeds the activity join AND
    # the cohort sizes — the anchor events scan + groupBy executed
    # twice per run. One row per entity: the cheap grain.
    acts = (
        events.join(anchors, key_col)
        .filter(F.col(ts_col) >= F.col("__t0"))
        .select(
            F.col(key_col),
            F.col("__cohort"),
            (
                F.datediff(
                    F.date_trunc("week", F.col(ts_col)), F.col("__cohort")
                ) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    sizes = anchors.groupBy("__cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        acts.groupBy("__cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "__cohort")
        .select(
            F.col("__cohort").cast("date").alias("cohort_week"),
            "week_offset", "n_cohort", "n_active",
        )
    )


def count_anomalies(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust anomaly flags over daily event volumes — the
    data-quality monitor every ingestion pipeline runs (public recipe:
    the median/MAD robust z-score of Iglewicz & Hoaglin 1993; mean/std
    would let the anomaly itself inflate the threshold).

    Per (group, day): the exact day count, the group's median daily
    count, the MAD, and ``is_anomaly`` = modified z-score
    ``0.6745 · |n − median| / MAD`` above ``z_threshold`` (MAD 0 →
    flag any deviation from the median).

    Scale shape: one map-side-combined count shuffle to (group, day)
    grain — everything after runs on grain rows, not raw events: two
    grouped EXACT percentiles (fine at grain scale; swap
    ``percentile`` for ``approx_percentile`` if groups×days itself is
    huge) and one broadcast-sized join back. Counts are engine-exact;
    median/MAD of integer counts interpolate identically across
    engines.
    """
    # single evaluation (r16): g feeds the median, the deviation join
    # (twice — MAD and the output), so the full events scan + groupBy
    # executed 3x per run. (group, day) grain: the cheap grain.
    g = events.groupBy(
        F.col(group_col).alias("grp"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    med = g.groupBy("grp").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    dev = g.join(F.broadcast(med), "grp").withColumn(
        "__ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = dev.groupBy("grp").agg(
        F.percentile("__ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .select(
            F.col("grp").alias(group_col),
            "day", "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.when(
                F.col("mad") == 0, F.col("__ad") > 0
            ).otherwise(
                0.6745 * F.col("__ad") / F.col("mad") > z_threshold
            ).alias("is_anomaly"),
        )
    )


def attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    touch_types: tuple[str, ...] = ("click", "view"),
    conv_type: str = "purchase",
) -> DataFrame:
    """First- and last-touch revenue attribution — the marketing
    analytics primitive (the shape of the dbt attribution packages):
    each conversion's value is credited to the FIRST touch event
    STRICTLY BEFORE it in the entity's history (brand discovery) and,
    separately, to the LAST touch strictly before it (closing
    channel). Conversions with no strictly-earlier touch credit the
    ``(none)`` channel.

    Tie rule (pinned by test): a touch at EXACTLY the conversion's
    timestamp never gets credit — the window frame is a RANGE frame
    over epoch-micros ending 1 µs before the conversion, so the rule
    is time-based and independent of type-name ordering. Two touches
    at the same earlier micro-second tie-break on the type string
    inside the encoded key (max picks the lexicographically larger
    type for last-touch, min the smaller for first-touch).

    Returns ``model ('first'|'last'), touch_type, n_conversions,
    total_value`` (value summed then rounded 2dp — the q1 float
    contract).

    ONE per-entity ordered window pass: each touch encodes to a
    sortable ``zero-padded-biased-epoch-micros|type`` key (micros
    biased by +2^62 so pre-1970 timestamps stay lexicographically
    ordered, padded to 20 digits so any |micros| < 2^62 — roughly
    ±146,000 years — never truncates); running ``min`` / ``max`` over
    range-unbounded-preceding-to-(-1 µs) carry the first/last
    strictly-earlier touch to every row, so no self-join, no as-of
    join, and conversion count per entity doesn't change the plan.
    Per-entity history sorts within one task (the sessionization
    contract); the final aggregate is map-side combined over the tiny
    (model × type) grain.
    """
    is_touch = F.col(type_col).isin(*touch_types)
    # bias epoch micros into a non-negative range before zero-padding:
    # a raw negative micros value would put its '-' sign first and
    # break lexicographic ordering (ADVICE r10).
    biased = F.unix_micros(F.col(ts_col)) + F.lit(1 << 62)
    tkey = F.when(
        is_touch,
        F.concat(
            F.lpad(biased.cast("string"), 20, "0"),
            F.lit("|"),
            F.col(type_col),
        ),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        events.withColumn("__lastk", F.max(tkey).over(w))
        .withColumn("__firstk", F.min(tkey).over(w))
        .filter(F.col(type_col) == conv_type)
    )

    def touch_of(col):
        return F.coalesce(
            F.element_at(F.split(F.col(col), r"\|"), 2), F.lit("(none)")
        )

    models = conv.select(
        F.lit("last").alias("model"),
        touch_of("__lastk").alias("touch_type"),
        F.col(value_col).alias("__v"),
    ).unionByName(
        conv.select(
            F.lit("first").alias("model"),
            touch_of("__firstk").alias("touch_type"),
            F.col(value_col).alias("__v"),
        )
    )
    return models.groupBy("model", "touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum("__v"), 2).alias("total_value"),
    )


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """Set co-occurrence mining — support counts for item pairs
    sharing a group: market-basket pairs (parts per order), entity
    co-mentions (terms per document), co-engagement (items per user).
    The support-counting step of association mining, and the set
    generalization of :func:`sparkt.functions.text.collocations`'
    ADJACENT pairs.

    Returns ``item_a, item_b, support`` with ``item_a < item_b``
    (exact integers; duplicate (group, item) rows collapse first so
    support counts GROUPS, not row multiplicity).

    Scale shape: one distinct, one self-equijoin on the group key,
    one map-side-combined count. The self-join is quadratic IN THE
    GROUP — a mega-group (a crawler user with 10^6 items) emits 10^12
    pairs, so ``max_group_size`` drops oversized groups BEFORE the
    join (the d5 stop-shingle cap argument: at corpus scale always
    set it; excluded groups are knowably degenerate for association
    mining anyway).
    """
    items = df.select(group_col, item_col).distinct()
    if max_group_size is not None:
        sizes = items.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("__gsz")
        )
        items = (
            items.join(sizes, group_col)
            .filter(F.col("__gsz") <= int(max_group_size))
            .drop("__gsz")
        )
    # materialize ONCE (r16, guide §1.2): both self-join sides
    # reference items, and the executed ft6 plan re-ran the distinct
    # shuffle + size-cap aggregate per side (4 fact-table scans; warm
    # 15.7 s at sf0.1). (group, item) pairs after the cap are the
    # smallest relation in the query — the usual within-query
    # localCheckpoint class (executor-local blocks, guide §5).
    items = items.localCheckpoint(eager=False)
    left = items.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("item_a")
    )
    right = items.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("item_b")
    )
    pairs = left.join(right, "__g").filter(
        F.col("item_a") < F.col("item_b")
    )
    out = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("support")
    )
    if min_count > 1:
        out = out.filter(F.col("support") >= min_count)
    return out


def event_transitions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    max_gap_minutes: float | None = 30.0,
    value_col: str | None = None,
) -> DataFrame:
    """Path analysis — first-order transition counts between
    consecutive event types per entity (the Markov-chain input behind
    "what do users do after X" product analytics). A transition
    counts only when the gap to the next event is within
    ``max_gap_minutes`` (session semantics, same gap contract as
    sessionization; ``None`` disables the gap cut).

    Returns ``src_type, dst_type, n_transitions`` (exact integers)
    plus ``avg_gap_s`` (mean seconds between the pair, rounded 4dp —
    the q1 avg contract). With ``value_col`` set, adds ``sum_value``
    — the SOURCE event's value summed per transition, rounded 2dp
    (q1 sum contract): "how much value flows along each edge".

    ONE per-entity ordered window pass (``lead`` over (ts, type)) —
    no self-join; the count aggregate is map-side combined over the
    (src × dst) grain. Per-entity history sorts in one task (the
    sessionization contract).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(type_col)
    )
    nxt_t = F.lead(type_col).over(w)
    nxt_ts = F.lead(ts_col).over(w)
    gap_s = nxt_ts.cast("double") - F.col(ts_col).cast("double")
    cols = [
        F.col(type_col).alias("src_type"),
        nxt_t.alias("dst_type"),
        gap_s.alias("__gap"),
    ]
    if value_col is not None:
        cols.append(F.col(value_col).alias("__v"))
    pairs = events.select(*cols).filter(F.col("dst_type").isNotNull())
    if max_gap_minutes is not None:
        pairs = pairs.filter(
            F.col("__gap") <= F.lit(float(max_gap_minutes) * 60.0)
        )
    aggs = [
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(F.avg("__gap"), 4).alias("avg_gap_s"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum("__v"), 2).alias("sum_value"))
    return pairs.groupBy("src_type", "dst_type").agg(*aggs)


def rfm_segments(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    conv_type_filter=None,
    quantiles: int = 5,
) -> DataFrame:
    """RFM segmentation (Recency / Frequency / Monetary — the classic
    customer-value coding): per entity, score each dimension 1..q by
    rank quantile (q = best: most recent last event, most events,
    highest spend) and emit the concatenated segment code.

    Returns ``<key>, last_ts, n_events, monetary, r_code, f_code,
    m_code, rfm`` (monetary rounded 2dp BEFORE ranking so rank
    tie-breaks never sit on a float-sum boundary; codes are exact
    integers; ``rfm`` is the 'RFM' digit string).

    Scale shape: one map-side-combined groupBy per entity, then three
    skew-safe two-phase quantile rankings via
    :func:`sparkt.functions.sampling.rank_quantile_buckets` (coarse
    score grid — no whole-population single-task sort) joined back on
    the entity key. Cuts are rank-based (``ceil(n·k/q)``), so both
    engines derive codes from the same integers.
    """
    from sparkt.functions.sampling import rank_quantile_buckets

    src = (
        events.filter(conv_type_filter)
        if conv_type_filter is not None
        else events
    )
    per = src.groupBy(key_col).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("monetary"),
    ).withColumn("__part", F.lit("all")).localCheckpoint(eager=False)
    # ^ single evaluation (r16): per feeds the output spine AND three
    # two-phase quantile rankings (each needing two references) — the
    # executed plan re-ran the full events scan + groupBy SEVEN times
    # per run. One row per entity: the cheap grain to materialize.
    cuts = tuple(k / quantiles for k in range(1, quantiles))
    labels = tuple(str(quantiles - k) for k in range(quantiles))
    scored = (
        per.withColumn("__r_ts", F.col("last_ts").cast("double"))
        .withColumn("__f", F.col("n_events").cast("double"))
        .withColumn("__m", F.col("monetary").cast("double"))
    )
    # grid bounds only balance the two-phase work (values outside
    # clamp to the edge cells; correctness never depends on them) —
    # epoch seconds / per-entity counts / 2dp spend sums
    out = per
    for score, name, lo, hi in (
        ("__r_ts", "r_code", 1.0e9, 2.2e9),
        ("__f", "f_code", 0.0, 1000.0),
        ("__m", "m_code", 0.0, 1.0e5),
    ):
        b = rank_quantile_buckets(
            scored, "__part", score, key_col,
            cuts=cuts, labels=labels, lo=lo, hi=hi,
        ).select(
            F.col(key_col), F.col("bucket").cast("int").alias(name)
        )
        out = out.join(b, key_col)
    return out.select(
        key_col, "last_ts", "n_events", "monetary",
        "r_code", "f_code", "m_code",
        F.concat(
            F.col("r_code").cast("string"),
            F.col("f_code").cast("string"),
            F.col("m_code").cast("string"),
        ).alias("rfm"),
    )


def active_users(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling active-user engagement (DAU / WAU and stickiness —
    the DAU/WAU ratio, the standard product-engagement KPI): per
    calendar day, the count of entities active THAT day and the
    distinct count active in the trailing ``window_days`` window.

    Returns ``day (ISO string — the cross-engine date contract),
    dau, wau`` (exact integers) and ``stickiness`` = dau/wau (4dp,
    single integer division). Only days with activity appear
    (trailing windows over silent days have no DAU row to anchor);
    early days cover partial windows — the standard convention.

    Scale shape — NO sliding distinct-over-window state: dedupe to
    (entity, day) once (one shuffle), then each active day EXPLODES
    to the ``window_days`` target days it contributes to (a bounded
    ×7 row expansion of tiny pairs) and one exact distinct count per
    target day. Both aggregates shuffle on (day[, entity]) — bounded
    by |entities × days|, never by raw event volume.
    """
    daily = events.select(
        F.to_date(F.col(ts_col)).alias("__day"),
        F.col(key_col).alias("__k"),
    ).distinct()
    dau = daily.groupBy("__day").agg(F.count(F.lit(1)).alias("dau"))
    targets = daily.select(
        F.explode(
            F.sequence(
                F.col("__day"),
                F.date_add(F.col("__day"), window_days - 1),
            )
        ).alias("__day"),
        "__k",
    )
    wau = targets.groupBy("__day").agg(
        F.countDistinct("__k").alias("wau")
    )
    return (
        dau.join(wau, "__day")
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
        )
    )
