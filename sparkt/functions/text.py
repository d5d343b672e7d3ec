"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All Column-expression builders (JVM-side, codegen-friendly). At 100 TB
these run as a single narrow projection over the scan — no shuffle, no
Python. The DuckDB-portable formulations (same md5/regex semantics)
make them oracle-checkable.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves the
# stringified 'pd.Series' type hints against the function's globals
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

# stopword lists used by quality scoring + language ID; deliberately
# small and embedded so engine and oracle share one definition
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"]
ES_STOPWORDS = ["el", "la", "los", "las", "y", "es", "un", "una", "de", "en"]

CJK_RANGE = f"{chr(0x4E00)}-{chr(0x9FFF)}"


def tokens(text: Column) -> Column:
    """NB: split of empty/whitespace-only text yields [''] — ONE
    phantom empty token (so token_count('') == 1). This mirrors
    DuckDB's regexp_split_to_array exactly, and every oracle gate
    depends on the two engines agreeing; treat it as the deliberate
    cross-engine contract, not a bug to fix on one side."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: alphanumeric runs plus one extra split per
    letter→digit transition (no lookaround — portable to RE2 engines).
    """
    base = F.size(
        F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")
    )
    # non-overlapping [a-z][0-9] occurrence count
    transitions = (
        F.length(F.lower(text))
        - F.length(F.regexp_replace(F.lower(text), "[a-z][0-9]", ""))
    ) / 2
    return (base + transitions).cast("int")


def bpe_tokens_udf(merges: list[tuple[str, str]]):
    """REAL byte-pair-encoding tokenizer (opt-in; VERDICT r6 ask #7):
    the classic Sennrich et al. 2016 greedy merge loop over a fixed
    merges table, so chunking/packing token counts match a production
    tokenizer instead of the ``bpe_ish_token_count`` regex proxy.

    The merges table ships as a plain Python literal inside the UDF
    closure — broadcast with the task binary, no network, no files.
    Iterative pairwise merging cannot be expressed with Spark's
    built-in columns, so this is the documented Arrow-batched
    pandas-UDF slow path (SURVEY §"UDFs are the slow path"): one
    vectorized batch per Arrow block, per-word results memoized per
    batch (Zipf makes the hit rate high). Pre-tokenization =
    lowercased alphanumeric runs, matching ``bpe_ish_token_count``'s
    base split so the two paths are comparable.

    Returns a callable Column transform: text → array<string>.
    """
    import re as _re

    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    word_re = _re.compile(r"[a-z0-9]+")

    def encode(word: str) -> list[str]:
        parts = list(word)
        while len(parts) > 1:
            best_rank, best_i = None, None
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            parts[best_i:best_i + 2] = [
                parts[best_i] + parts[best_i + 1]
            ]
        return parts

    @pandas_udf("array<string>")
    def fn(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def tokenize(t):
            out: list[str] = []
            for w in word_re.findall((t or "").lower()):
                enc = cache.get(w)
                if enc is None:
                    enc = encode(w)
                    cache[w] = enc
                out.extend(enc)
            return out

        return texts.map(tokenize)

    return fn


def _stopword_hits(text: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(words)))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / alpha ratios (classic quality
    filters for pretraining corpora)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alpha_chars = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    punct_chars = F.length(
        F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")
    )
    stop_hits = _stopword_hits(text, EN_STOPWORDS)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(alpha_chars / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(punct_chars / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            stop_hits / F.greatest(n_tokens, F.lit(1)), 6
        ),
        "avg_token_len": F.round(
            F.length(F.regexp_replace(text, r"\s+", ""))
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score (monotone in signals a curation
    pipeline keys on; fixed weights so it is reproducible).

    Built from UNROUNDED ratios: combining pre-rounded 6-decimal terms
    puts ~10% of values exactly on a .xxxxxx5 boundary where engines'
    round() algorithms (HALF_UP vs nearest-double) disagree."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop = _stopword_hits(text, EN_STOPWORDS) / F.greatest(n_tokens, F.lit(1))
    length_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * alpha + 0.3 * stop, 6)


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: CJK character share, else stopword-hit
    argmax with fixed tie order en > de > fr > es.

    ``toks``: pass an already-materialized :func:`tokens` column to
    avoid re-splitting the document once per language — the four
    stopword filters otherwise each embed their own ``tokens(text)``
    (lambda-bearing expressions are exempt from codegen subexpression
    elimination, so that is four full regex splits per row; r15
    measurement in OPTIMIZATION_r15.md). Values identical either way.
    """
    cjk = F.length(F.regexp_replace(text, f"[^{CJK_RANGE}]", ""))
    n_chars = F.greatest(F.length(text), F.lit(1))

    def hits(words):
        if toks is not None:
            return F.size(F.filter(toks, lambda t: t.isin(words)))
        return _stopword_hits(text, words)

    en = hits(EN_STOPWORDS)
    de = hits(DE_STOPWORDS)
    fr = hits(FR_STOPWORDS)
    es = hits(ES_STOPWORDS)
    return (
        F.when(cjk / n_chars > 0.3, "zh")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 document fingerprint (rolling-hash
    class of dedup keys)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


# ----------------------------------------------------------------- PII
# Patterns restricted to syntax valid in BOTH java.util.regex and RE2
# (no lookaround), so the DuckDB oracle matches byte-for-byte.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document PII match counts (emails / IPv4 / phone-shaped).
    Pure codegen projection — zero Python, no shuffle at any scale."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)),
        "n_ips": F.regexp_count(text, F.lit(PII_IPV4_RE)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)),
    }


def redact_pii(text: Column) -> Column:
    """Replace PII spans with typed placeholder tokens. Email first
    (it may contain digit runs), then phone, then IP — the order is
    part of the operator contract and mirrored in the oracle."""
    red = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(red, PII_IPV4_RE, "<IP>")


# ---------------------------------------------------------- repetition
# ------------------------------------------- run-length repetition HOFs
def dup_token_count(sorted_arr: Column) -> Column:
    """Number of element occurrences belonging to values appearing
    more than once, computed as a run-length scan over a SORTED array
    with the ``aggregate`` HOF: count(x) > 1 is equivalent to
    adjacent-equal runs after a sort. Per-row codegen work — the
    shuffle-free replacement for explode -> groupBy(doc, token)."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("dup"), F.lit(False).alias("started"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.started & (x == acc.prev), acc.run + 1)
            .otherwise(F.lit(1)).alias("run"),
            (
                acc.dup
                + F.when(
                    acc.started & (x == acc.prev),
                    # a run reaching 2 counts both members retroactively
                    F.when(acc.run == 1, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(F.lit(0)).cast("long")
            ).alias("dup"),
            F.lit(True).alias("started"),
        ),
        lambda acc: acc.dup,
    )


def max_adjacent_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — the
    max multiplicity of any value, as a single ``aggregate`` HOF scan
    (shuffle-free top-bigram occupancy)."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("best"), F.lit(False).alias("started"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.started & (x == acc.prev), acc.run + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(acc.started & (x == acc.prev), acc.run + 1)
                .otherwise(F.lit(1)).cast("long"),
            ).alias("best"),
            F.lit(True).alias("started"),
        ),
        lambda acc: acc.best,
    )


def bigram_array(toks: Column) -> Column:
    """Adjacent-bigram array ('' joined by spaces); empty for < 2
    tokens (ANSI-safe: the element_at branch is guarded)."""
    n = F.size(toks)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        )
    )


def repetition_table(df, text_col: str, id_col: str):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of token occurrences belonging to tokens that repeat
    within the document, and the fraction of bigram occurrences taken
    by the document's single most frequent bigram.

    Scale shape (r5 rewrite): run-length ``aggregate`` HOF scans over
    the sorted token/bigram arrays — ONE narrow codegen projection,
    zero shuffles, zero Python (was explode -> two doc-keyed
    double-groupBys + a join). A 100 TB corpus scores at scan speed.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bg = bigram_array(toks)
    return df.select(
        F.col(id_col).alias("doc"),
        n.cast("long").alias("n_tokens"),
        F.round(
            dup_token_count(F.array_sort(toks)) / F.greatest(n, F.lit(1)), 6
        ).alias("dup_token_ratio"),
        F.round(
            max_adjacent_run(F.array_sort(bg))
            / F.greatest(F.size(bg), F.lit(1)),
            6,
        ).alias("top_bigram_ratio"),
    )


# -------------------------------------------------------------- tf-idf
def tfidf_top_terms(df, text_col: str, id_col: str, top_k: int = 3):
    """Top-k characteristic terms per document, ranked by tf·(1/df)
    (inverse-document-frequency weighting; the rational tf/df score is
    an exact IEEE double in every engine, unlike ln-based idf whose
    last-ulp can differ — output columns are all integers so the
    oracle hash is exact).

    Scale shape: token explode → (doc,term) count shuffle → term df
    shuffle (both map-side combined) → per-doc window top-k. df is a
    per-term aggregate over the whole corpus; N broadcasts as a
    1-row literal join."""
    from pyspark.sql import Window

    from sparkt.sources import spread

    tok = spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_t, "term")
    w = Window.partitionBy("doc").orderBy(
        (F.col("tf") / F.col("df")).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("doc", "term", "tf", "df", "rnk")
    )


# ------------------------------------------------------------ chunking
def chunk_table(
    df, text_col: str, id_col: str, window: int = 50, stride: int = 40,
    bpe_merges: list[tuple[str, str]] | None = None,
):
    """Overlapping token-window chunking — the unit-of-work transform
    for LLM training pipelines (documents → fixed-size training
    chunks with ``window - stride`` tokens of overlap).

    Spark shape: one narrow projection + ``posexplode`` of the start
    offsets — NO shuffle, no Python; a 100 TB corpus chunks at scan
    speed and the output stays partition-aligned with its input
    (reference has no chunking; this is a BASELINE.json extension
    operator like dedup/similarity).

    Returns (doc, chunk_idx, n_tokens, chunk_md5); the md5 is over the
    space-joined window, so chunk identity is engine-portable.

    ``bpe_merges`` (opt-in, r7): chunk on REAL BPE subword tokens via
    ``bpe_tokens_udf`` instead of whitespace tokens — counts then
    match a production tokenizer; the windowing/explode shape is
    identical, only the token array source changes (Arrow-batched
    UDF projection instead of a codegen split).
    """
    if bpe_merges is not None:
        toks = bpe_tokens_udf(bpe_merges)(F.col(text_col))
    else:
        toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col).alias("doc"),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, window)
    return exploded.select(
        "doc",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# ------------------------------------------- hashed linear classifier
def hashed_classifier_score(text: Column) -> dict[str, Column]:
    """fastText-style hashed linear quality classifier (public design:
    Joulin et al. 2016; the CCNet/Gopher quality-filter pipelines):
    tokens hash into weight buckets and the document score is the sum
    of bucket weights — here the weight table is a deterministic
    function of the bucket hash so the DuckDB oracle reproduces it
    exactly (a trained model would broadcast a real weight array; the
    distributed shape is identical).

    weight(token) = (first 4 md5 hex nibbles as int) % 2001 - 1000, an
    integer milli-weight in [-1000, 1000] — exact in any engine.
    The score accumulates through the ``aggregate`` higher-order
    function: ONE narrow JVM-side projection — no shuffle, no Python,
    no explode. At 100 TB this runs at scan speed beside the parquet
    reader. Reference has no classifier (dbt delegates all compute,
    ARCHITECTURE.md:34-46); BASELINE.json extension operator.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(text)), "[^a-z0-9]+"), lambda t: t != ""
    )
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + (
            F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long") % 2001
            - 1000
        ),
    )
    return {
        "n_toks": F.size(toks).cast("int"),
        "score_milli": score,
        "keep": (score > 0).cast("int"),
    }


# -------------------------------------------- char-trigram familiarity
def char_trigrams(text: Column) -> Column:
    """Array of character trigrams over the lowercased a-z/space
    normalization of ``text`` (the CCNet-style character-LM feature
    space). Bounded vocabulary: ≤ 27³ ≈ 20k distinct trigrams."""
    s = F.regexp_replace(
        F.regexp_replace(F.lower(text), "[^a-z ]", ""), " +", " "
    )
    n = F.length(s)
    return F.when(n < 3, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n - 2), lambda i: F.substr(s, i, F.lit(3)))
    )


def trigram_familiarity(df, text_col: str, id_col: str):
    """Corpus-level character-LM familiarity (the distributed shape of
    CCNet's perplexity filter, public design: Wenzek et al. 2019):
    pass 1 builds the corpus trigram frequency table, pass 2 scores
    each document by the total corpus frequency of its trigrams. A
    real deployment swaps the count for a log-probability from a
    trained LM; the integer-count formulation keeps the oracle
    comparison exact while pinning the identical two-pass plan.

    Scale: the trigram vocabulary is bounded (≤ ~20k rows) so the
    frequency table is BROADCAST — pass 2 is a map-side join, and the
    per-document aggregate map-side-combines on doc id. No all-pairs
    work anywhere: a 100 TB corpus scans twice, shuffles once on the
    bounded vocab and once on doc id.
    """
    from pyspark.sql.functions import broadcast

    # single evaluation (r16): the normalize+trigram chain feeds both
    # the corpus frequency table and the scoring join side — without a
    # barrier it executes twice per run. Materialize at the ARRAY
    # grain (one row per doc — the W9 lesson: exploded tiny-row caches
    # cost more to build than to compute) and explode after.
    arr = df.select(
        F.col(id_col).alias("doc"),
        char_trigrams(F.col(text_col)).alias("__tri"),
    ).localCheckpoint(eager=False)
    tri = arr.select("doc", F.explode("__tri").alias("tri"))
    freq = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("corpus_freq"))
    return (
        tri.join(broadcast(freq), "tri")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum("corpus_freq").alias("familiarity"),
        )
    )


# ----------------------------------------------- word-bigram LM score
def word_bigrams(text: Column) -> Column:
    """Array of space-joined word bigrams over the lowercased a-z/space
    normalization of ``text`` (same feature-space normalization as
    :func:`char_trigrams`). Words are the non-empty space splits; a
    document with < 2 words yields an empty array (explicit guard —
    Spark's ``sequence(1, 0)`` would otherwise count DOWN)."""
    s = F.regexp_replace(
        F.regexp_replace(F.lower(text), "[^a-z ]", ""), " +", " "
    )
    ws = F.filter(F.split(s, " "), lambda w: w != F.lit(""))
    return _bigrams_of(ws)


def _bigrams_of(ws: Column) -> Column:
    """Bigram array from a words array. Callers on the hot path pass a
    materialized column reference, NOT an inline expression — the
    array subtree appears 4× below, and Catalyst duplicates non-cheap
    subtrees wholesale (measured: inlining the normalize+split chain
    here cost ~7 s of analysis/codegen per cold query at sf0.001)."""
    n = F.size(ws)
    return F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)
            ),
        )
    )


def bigram_lm_table(df, text_col: str, id_col: str):
    """Corpus-fit word-bigram language-model score per document — the
    distributed shape of CCNet/KenLM perplexity filtering (public
    design: Wenzek et al. 2019; Heafield 2011) with the corpus itself
    as the training set. Pass 1 fits the model (bigram counts +
    bigram-prefix context counts); pass 2 scores every document.

    Returns one row per document:
      ``doc, n_bigrams, bc_sum, ctx_sum, avg_logp``
    where ``bc_sum``/``ctx_sum`` are the integer sums of corpus bigram
    and context counts over the document's bigrams (exact in every
    engine — the oracle compares these), and ``avg_logp`` is the mean
    MLE log-probability ``avg(ln(bc/ctx))`` (≤ 0; higher = more
    corpus-typical). ``avg_logp`` is ln-based and therefore carries
    engine-specific last-ulp noise — downstream filters should
    threshold it, not hash it (same doctrine as tfidf_top_terms).

    Scale shape: explode → two map-side-combined count shuffles (bigram
    vocab can reach |V|² so the bc join is a plain shuffle equijoin;
    the unigram-prefix context table is bounded by word vocab and
    BROADCASTS) → one per-doc aggregate. A 100 TB corpus scans twice
    and never does all-pairs work.
    """
    s = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
        " +", " ",
    )
    words = df.select(
        F.col(id_col).alias("doc"),
        F.filter(F.split(s, " "), lambda w: w != F.lit("")).alias("__ws"),
    )
    bg = words.select(
        "doc", F.explode(_bigrams_of(F.col("__ws"))).alias("bg")
    ).withColumn("w1", F.substring_index("bg", " ", 1))
    # context counts come from a WINDOW over the aggregated vocab
    # table (sum of bc across bigrams sharing a prefix), not a third
    # pass over the corpus: the corpus explodes exactly twice (fit +
    # probe), and the window shuffles only |bigram types| rows. The
    # probe is then a single equijoin carrying both counts.
    vocab = (
        bg.groupBy("bg", "w1")
        .agg(F.count(F.lit(1)).alias("bc"))
        .withColumn("cc", F.sum("bc").over(Window.partitionBy("w1")))
    )
    return (
        bg.select("doc", "bg")
        .join(vocab.select("bg", "bc", "cc"), "bg")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bc").alias("bc_sum"),
            F.sum("cc").alias("ctx_sum"),
            F.avg(F.log(F.col("bc") / F.col("cc"))).alias("avg_logp"),
        )
    )


def collocations(df, text_col: str, min_count: int = 5):
    """PMI collocation mining — corpus-level phrase detection (public
    design: the word2vec phrase-join scoring of Mikolov et al. 2013;
    PMI from Church & Hanks 1990). Adjacent word pairs that co-occur
    far more often than their unigram frequencies predict are phrases
    ("new york", "machine learning") worth joining into single tokens
    before LM tokenizer training.

    Returns one row per surviving bigram type:
      ``w1, w2, pair_count, c1, c2, pmi``
    where the counts are exact integers (engine-exact — the oracle
    compares these) and ``pmi = ln(pair_count · N / (c1 · c2))`` is
    ln-based and carries engine last-ulp noise — rank/threshold it,
    never hash it (tfidf/bigram_lm doctrine). Normalization is the
    shared a-z/space feature space of :func:`word_bigrams`.

    Scale shape: the corpus explodes exactly twice (pair counts +
    unigram counts), both map-side-combined count shuffles whose
    output is VOCABULARY-sized, not corpus-sized. ``min_count``
    prunes the pair table BEFORE any join (Zipf tail: most bigram
    types are hapax — at 100 TB this drops ~90% of rows). The unigram
    table is bounded by word vocab and BROADCASTS (same argument as
    bigram_lm_table's context table); the corpus token total rides a
    1-row broadcast cross join, never a driver collect.
    """
    from sparkt.sources import spread

    s = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
        " +", " ",
    )
    # single evaluation (r16): words feeds the pair AND unigram
    # explodes — the normalize+split chain executed twice per run.
    # Array grain, one row per doc (the W9 lesson), explode after.
    words = spread(df).select(
        F.filter(F.split(s, " "), lambda w: w != F.lit("")).alias("__ws")
    ).localCheckpoint(eager=False)
    pairs = words.select(F.explode(_bigrams_of(F.col("__ws"))).alias("bg"))
    pc = (
        pairs.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
        .select(
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
            "pair_count",
        )
    )
    uni = (
        words.select(F.explode("__ws").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from sparkt.functions import join_scalars

    tot = uni.agg(F.sum("c").alias("__n"))
    out = join_scalars(
        pc.join(
            F.broadcast(uni.select(F.col("word").alias("w1"),
                                   F.col("c").alias("c1"))), "w1")
        .join(
            F.broadcast(uni.select(F.col("word").alias("w2"),
                                   F.col("c").alias("c2"))), "w2"),
        tot,
    )
    return out.select(
        "w1", "w2", "pair_count", "c1", "c2",
        F.log(
            F.col("pair_count") * F.col("__n")
            / (F.col("c1") * F.col("c2"))
        ).alias("pmi"),
    )


def normalize_text(text: Column) -> Column:
    """Pipeline step-0 text normalization, entirely in codegen (one
    narrow projection, no shuffle, no UDF):

    1. strip C0/C1 control characters (keep \\t \\n — they are
       whitespace and fall to step 3),
    2. fold common unicode punctuation to ASCII (curly quotes,
       en/em-dash, ellipsis, NBSP — the characters that fragment
       tokenizer vocab; a ``translate`` table + one ellipsis regex,
       not a per-char loop),
    3. collapse runs of whitespace to one space and trim.

    Deterministic and DuckDB-expressible (same regex/translate
    semantics), so normalized-text operators stay oracle-checkable.
    Full NFKC lives in ICU, which neither engine ships by default —
    this is the deliberately-portable subset, not a stub.
    """
    folded = F.translate(
        text,
        "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0",
        "''" + '"' + '"' + "-- ",
    )
    folded = F.regexp_replace(folded, "\u2026", "...")
    stripped = F.regexp_replace(
        folded, "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]", ""
    )
    return F.trim(F.regexp_replace(stripped, "\\s+", " "))


# --------------------------------------------- char stats / gibberish
def char_stats(text: Column) -> dict[str, Column]:
    """Character-distribution statistics for gibberish/junk filtering
    (the C4/Gopher-style "remove binary junk and low-diversity text"
    signals): total length, distinct-character count, max single-char
    frequency, Shannon character entropy (nats), and an integer-exact
    low-diversity flag (≤ 10 distinct chars, or one char ≥ ¼ of a
    ≥ 20-char doc).

    SHUFFLE-FREE: the histogram comes from a higher-order transform
    over the doc's DISTINCT characters (count via
    ``len − len(replace(s, c, ''))``) — O(alphabet · len) codegen per
    row, no explode of one row per character (which at 100 TB of text
    would be 10¹⁴ shuffle rows). ``entropy`` is ln-based — threshold
    it, never hash it across engines (t6/t11 doctrine); the integer
    columns are oracle-exact.
    """
    n = F.length(text)
    chars = F.filter(
        F.array_distinct(F.split(text, "")), lambda c: c != F.lit("")
    )
    freqs = F.transform(
        chars, lambda c: n - F.length(F.replace(text, c, F.lit("")))
    )
    nd = n.cast("double")
    entropy = -F.aggregate(
        freqs,
        F.lit(0.0),
        lambda acc, x: acc + (x / nd) * F.log(x / nd),
    )
    max_freq = F.coalesce(F.array_max(freqs), F.lit(0)).cast("int")
    n_distinct = F.size(chars)
    return {
        "n_len": n.cast("int"),
        "n_distinct_chars": n_distinct.cast("int"),
        "max_char_freq": max_freq,
        "entropy": F.when(n > 0, entropy).otherwise(F.lit(0.0)),
        "low_diversity": (
            (n_distinct <= 10)
            | ((max_freq * 4 >= n) & (n >= 20))
        ).cast("int"),
    }


# ------------------------------------------------- sequence packing
def pack_offsets(
    df,
    id_col: str,
    n_tokens_col: str,
    ctx: int = 2048,
    bucket_size: int = 4096,
):
    """Context-window packing offsets: the "concatenate every document
    and split every ``ctx`` tokens" layout LLM pretraining uses to
    waste zero sequence positions. For each document (in ``id_col``
    order) this computes its global token offset and which context
    windows (bins) it lands in:
    ``global_start, first_bin, last_bin, start_offset``.

    SCALE SHAPE — prefix sum WITHOUT a global single-partition window:
    a plain ``sum() over (order by id)`` pulls the whole corpus
    through ONE task. Instead, the classic two-phase scan:

    1. per-bucket sums (``bucket = id // bucket_size``) — one
       map-side-combined groupBy producing n/bucket_size rows;
    2. the tiny exclusive cumsum over bucket sums runs in one
       partition (n/4096 rows — at 10B docs that is 2.4M longs; nest
       another level of bucketing if that ever dominates);
    3. broadcast-join bucket offsets back and window the intra-bucket
       cumsum partitioned BY BUCKET — every task handles ≤ bucket_size
       rows regardless of corpus size.

    The result equals the single-window formulation exactly (integers,
    same order), which is what the DuckDB oracle computes.
    """
    bucket = (F.col(id_col) / bucket_size).cast("bigint").alias("__bucket")
    base = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("bigint").alias("__n"),
        bucket,
    )
    bucket_sums = base.groupBy("__bucket").agg(F.sum("__n").alias("__bsum"))
    w_buckets = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucket_offsets = bucket_sums.select(
        "__bucket",
        (F.sum("__bsum").over(w_buckets) - F.col("__bsum"))
        .alias("__boff"),
    )
    w_intra = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gs = (
        F.col("__boff") + F.sum("__n").over(w_intra) - F.col("__n")
    ).alias("global_start")
    out = base.join(F.broadcast(bucket_offsets), "__bucket").select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        gs,
    )
    return out.select(
        id_col,
        "n_tokens",
        "global_start",
        F.floor(F.col("global_start") / ctx).cast("bigint")
        .alias("first_bin"),
        F.floor(
            (F.col("global_start") + F.greatest("n_tokens", F.lit(1)) - 1)
            / ctx
        ).cast("bigint").alias("last_bin"),
        (F.col("global_start") % ctx).alias("start_offset"),
    )


def strip_html(text: Column) -> Column:
    """HTML-to-text extraction, entirely in codegen (one narrow
    projection, no shuffle, no UDF) — the step-0 of a web-crawl
    pipeline before any quality/dedup operator sees the text:

    1. drop ``<script>``/``<style>`` ELEMENTS wholesale (their
       contents are code, not text; case-insensitive, dot-matches-
       newline, non-greedy) and comments ``<!-- -->``,
    2. replace every remaining tag with a space (so ``a</p><p>b``
       doesn't fuse into ``ab``),
    3. decode the high-frequency entities (&amp; &lt; &gt; &quot;
       &#39; &nbsp;) — the portable subset; full entity tables are a
       lookup join, not a regex,
    4. collapse whitespace and trim.

    Deterministic and DuckDB-expressible (RE2 and Java regex agree on
    every construct used: ``(?is)``, non-greedy ``.*?``, char
    classes; script/style are SEPARATE patterns because RE2 has no
    backreferences), so stripped-text operators stay oracle-checkable.
    Malformed markup degrades gracefully: an unclosed ``<`` strips to
    the next ``>`` or survives as text — same in both engines.
    """
    s = F.regexp_replace(text, "(?is)<script\\b.*?</script\\s*>", " ")
    s = F.regexp_replace(s, "(?is)<style\\b.*?</style\\s*>", " ")
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, "<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, "\\s+", " "))


def readability_stats(text: Column) -> dict[str, Column]:
    """Flesch reading-ease inputs + score (Flesch 1948; the quality
    feature education-filtered corpora key on), entirely in codegen:

    - ``n_words``: whitespace tokens,
    - ``n_sentences``: ``[.!?]+`` runs (min 1),
    - ``n_syllables``: vowel-group count over the lowercased text —
      the standard portable heuristic (``[aeiouy]+`` runs; word
      boundaries split groups for free since spaces aren't vowels),
    - ``flesch``: ``206.835 − 1.015·(words/sents) − 84.6·(syll/words)``
      floor-quantized to 4dp — one fixed-shape expression over three
      exact integers, so it is engine-deterministic (NOT the ln-sum
      class). FLOOR, not round (r14: the new sf1 corpus produced
      w=64, s=1, sy=154 → −61.693749999999994, a value whose round(4)
      differs between Spark and DuckDB — the t2 quantization doctrine;
      floor of the same IEEE double is engine-identical).

    All counts floor at 1 so empty/degenerate docs score instead of
    ANSI-dividing by zero.
    """
    n_words = F.greatest(F.size(tokens(text)), F.lit(1))
    n_sents = F.greatest(F.regexp_count(text, F.lit("[.!?]+")), F.lit(1))
    n_syll = F.greatest(
        F.regexp_count(F.lower(text), F.lit("[aeiouy]+")), F.lit(1)
    )
    flesch = (
        F.floor(
            (
                F.lit(206.835)
                - F.lit(1.015) * (n_words.cast("double") / n_sents)
                - F.lit(84.6) * (n_syll.cast("double") / n_words)
            )
            * 10_000
        )
        / 10_000
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sents,
        "n_syllables": n_syll,
        "flesch": flesch,
    }


def content_lines(
    text: Column,
    min_tokens: int = 5,
    min_stop_frac: float = 0.2,
) -> Column:
    """jusText-style boilerplate line filter (Pomikálek 2011 shape):
    keep the lines that read like natural language — at least
    ``min_tokens`` tokens AND a stopword fraction of at least
    ``min_stop_frac`` (nav bars, footers, and link lists are short
    and stopword-poor; prose is neither). Returns the array of
    surviving lines in document order.

    Pure codegen HOF chain (split → per-line token/stopword struct,
    computed ONCE per line → filter → extract): no shuffle, no UDF,
    no explode — the document never leaves its row. The stopword
    fraction compares INTEGER-EXACTLY (``n_stop·q >= p·n_tokens``
    with p/q the exact rational of ``min_stop_frac``), so every
    engine keeps the identical line set.
    """
    from fractions import Fraction

    frac = Fraction(min_stop_frac).limit_denominator(10000)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])

    def line_stats(line):
        toks = F.filter(
            F.split(F.lower(F.trim(line)), r"\s+"),
            lambda t: t != F.lit(""),
        )
        return F.struct(
            line.alias("l"),
            F.size(toks).alias("n"),
            F.size(
                F.filter(toks, lambda t: F.array_contains(stop, t))
            ).alias("ns"),
        )

    staged = F.transform(F.split(text, "\n"), line_stats)
    kept = F.filter(
        staged,
        lambda s: (s["n"] >= F.lit(int(min_tokens)))
        & (
            s["ns"] * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * s["n"]
        ),
    )
    return F.transform(kept, lambda s: s["l"])


def sentence_stats(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Sentence segmentation statistics per document — the
    sentence-level quality features (avg/max sentence length) the
    Gopher/C4-style filters threshold on, and the denominator for
    per-sentence dedup. Sentences split on ``[.!?]+`` runs; empty
    segments (leading punctuation, trailing terminator) drop.

    Returns ``<id>, n_sentences, n_words, avg_sentence_words (4dp —
    one integer division, cross-engine exact), max_sentence_words``.

    Pure HOF chain (split → filter → transform → aggregate): the
    document never leaves its row, no explode, no shuffle before the
    final narrow projection — the t19 shape.

    r15 (guide §1.2 "don't compute things you throw away"): the
    word-count array is materialized ONCE in an inner projection and
    the four stats read the materialized column. Expressions containing
    lambda variables are exempt from Spark's codegen common-
    subexpression elimination, so the previous single-projection form
    re-ran the whole split→filter→transform chain over the raw text
    for EVERY reference (4×/row). CollapseProject keeps the two
    projections apart because the producer is non-cheap and multiply
    referenced (the t2 __toks pattern). Values are bit-identical —
    same expressions, evaluated once.
    """
    sents = F.filter(
        F.split(F.col(text_col), r"[.!?]+"),
        lambda s: F.trim(s) != "",
    )
    wc = F.transform(
        sents, lambda s: F.size(F.split(F.trim(s), r"\s+"))
    )
    base = df.select(F.col(id_col), wc.alias("__wc"))
    n_sent = F.size("__wc")
    n_words = F.aggregate(
        F.col("__wc"), F.lit(0), lambda acc, x: acc + x
    )
    return base.select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        F.round(
            n_words.cast("double") / F.greatest(n_sent, F.lit(1)), 4
        ).alias("avg_sentence_words"),
        F.coalesce(F.array_max("__wc"), F.lit(0)).alias(
            "max_sentence_words"
        ),
    )


# ------------------------------------------------- lexical diversity
def diversity_stats(text: Column) -> dict[str, Column]:
    """Lexical-diversity quality signals: type–token ratio and the
    Gini–Simpson index over the document's unigram distribution —
    the low-diversity detectors (SEO keyword stuffing, template spam,
    generation loops) that complement :func:`repetition_table`'s
    adjacency-based signals (Rae et al. 2021 §A1.1 filter by exactly
    this family).

    Returned columns:

    - ``n_tokens`` / ``n_distinct`` — exact integers.
    - ``ttr`` — type–token ratio ``n_distinct / n_tokens``,
      floor-quantized to 6dp (the t2 doctrine: round()'s half-way
      handling differs between Spark and DuckDB on exact .xxxxxx5
      decimals, which a rational like Σc²/n² CAN hit; floor of the
      same IEEE double is engine-identical).
    - ``simpson`` — Gini–Simpson ``1 − Σ (c/n)²`` computed as the
      RATIONAL ``1 − Σc² / n²`` (floor 6dp): both operands exact
      integers, so the double is engine-independent (the t6 tf/df
      doctrine — no ln in the hashed columns).
    - ``token_entropy`` — Shannon entropy in bits,
      ``log2(n) − (Σ c·log2 c)/n``. THRESHOLD-ONLY (the t12/t14
      doctrine: ln's last ulp differs across engines — exclude from
      oracle hashes, compare by threshold or drop).

    Scale shape (the repetition_table rewrite doctrine): one
    run-length ``aggregate`` HOF scan over the SORTED token array
    computes Σc², the distinct count, and Σ c·log2 c incrementally
    ((r+1)² − r² = 2r+1; the entropy delta is the two-term log
    difference) — ONE narrow codegen projection, zero shuffles, zero
    Python, no per-token explode. A 100 TB corpus scores at scan
    speed.
    """
    toks = F.array_sort(tokens(text))
    n = F.size(toks)
    scan = F.aggregate(
        toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("s2"),
            F.lit(0).cast("long").alias("nd"),
            F.lit(0.0).alias("sce"),
            F.lit(False).alias("started"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.started & (x == acc.prev), acc.run + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (
                acc.s2
                + F.when(
                    acc.started & (x == acc.prev), 2 * acc.run + 1
                ).otherwise(F.lit(1))
            ).alias("s2"),
            (
                acc.nd
                + F.when(acc.started & (x == acc.prev), 0).otherwise(1)
            ).alias("nd"),
            (
                acc.sce
                + F.when(
                    acc.started & (x == acc.prev),
                    (acc.run + 1) * F.log2(acc.run + 1)
                    - acc.run * F.log2(acc.run),
                ).otherwise(F.lit(0.0))
            ).alias("sce"),
            F.lit(True).alias("started"),
        ),
        lambda acc: F.struct(
            acc.s2.alias("s2"), acc.nd.alias("nd"), acc.sce.alias("sce")
        ),
    )
    nn = F.greatest(n, F.lit(1)).cast("double")

    def q6(c):
        return F.floor(c * 1_000_000) / 1_000_000

    return {
        "n_tokens": n.cast("long"),
        "n_distinct": scan["nd"],
        "ttr": q6(scan["nd"] / nn),
        "simpson": q6(F.lit(1.0) - scan["s2"] / (nn * nn)),
        "token_entropy": F.round(
            F.log2(nn) - scan["sce"] / nn, 4
        ),
    }
