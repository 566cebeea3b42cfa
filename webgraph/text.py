"""Text analysis for large-scale corpus pipelines (task brief: language-ID,
quality scoring, token counting, fingerprinting).

All Column-in/Column-out built-ins — no Python in the hot path; these run
inside whole-stage codegen over a 100 TB documents table with only the
`text` column read (column pruning).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker sets (function-word n-grams): the classic
# low-cost language-ID heuristic. Real pipelines swap in fastText/CLD3 via
# a pandas UDF; the Spark-side shape (score-per-language -> argmax) is the
# same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with"),
    "de": ("der", "die", "und", "ist", "nicht", "mit"),
    "es": ("el", "la", "que", "de", "los", "con"),
    "fr": ("le", "la", "les", "est", "que", "dans"),
    "pt": ("o", "a", "que", "de", "os", "com"),
}

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols —
# the shape GPT-style byte-pair pretokenizers use.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as"
).split()


def tokens(text: Column) -> Column:
    """Whitespace tokens (array)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Pretokenizer-style count: words + numbers + symbols counted
    separately (approximates BPE token budgets within ~1.3x)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def _count_markers(text_lc: Column, words: tuple[str, ...]) -> Column:
    """Whitespace-token occurrences of the marker words (duplicates count).

    Deliberately lookbehind-free: token-equality counting is expressible
    verbatim in any engine (DuckDB oracle: len(list_filter(tokens, ...))),
    unlike the regex `(?<=\\s)w(?=\\s)` formulation RE2 rejects."""
    toks = tokens(text_lc)
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def language_scores(text: Column) -> Column:
    """Map<lang, marker-hits> for the heuristic language-ID."""
    lc = F.lower(text)
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in LANG_MARKERS]),
        F.array(*[_count_markers(lc, ws) for ws in LANG_MARKERS.values()]),
    )


def detect_language(text: Column, default: str = "und") -> Column:
    """argmax over marker hits; 'und' when no marker fires. Deterministic
    tie-break by language code order in LANG_MARKERS."""
    lc = F.lower(text)
    scores = [(k, _count_markers(lc, ws)) for k, ws in LANG_MARKERS.items()]
    best = F.lit(default)
    best_score = F.lit(0).cast("long")
    for k, s in scores:  # later langs win only on strictly greater score
        cond = s > best_score
        best = F.when(cond, F.lit(k)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append standard quality-filter features (Gopher/C4-style):
    length, token count, mean token length, alpha ratio, stopword ratio,
    punctuation ratio, max line length, digit ratio."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS))
    )
    lines = F.split(t, "\n")
    return (
        df.withColumn("n_chars_", n_char.cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "mean_token_len",
            F.length(F.regexp_replace(t, r"\s", "")) / F.greatest(n_tok, F.lit(1)),
        )
        .withColumn(
            "alpha_ratio",
            F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
            / F.greatest(n_char, F.lit(1)),
        )
        .withColumn("stopword_ratio", stop_hits / F.greatest(n_tok, F.lit(1)))
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", ""))
            / F.greatest(n_char, F.lit(1)),
        )
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(t, r"[^0-9]", ""))
            / F.greatest(n_char, F.lit(1)),
        )
        .withColumn(
            "max_line_len",
            F.array_max(F.transform(lines, F.length)).cast("long"),
        )
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Gopher-style rule filter over quality_features; returns kept rows
    with features attached."""
    feats = quality_features(df, text_col)
    return feats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("mean_token_len") >= min_mean_token_len)
        & (F.col("mean_token_len") <= max_mean_token_len)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )


def token_prefix_sums(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """(id, n_tokens, cum_tokens): exact running token totals over the
    corpus in seeded pseudo-random order — the shared core of
    sample_to_token_budget and pack_sequences.

    Distributed EXACT prefix sum — no single-task global window:
      1. order key = portable hash of the id (seeded; same arithmetic is
         the DuckDB oracle's ORDER BY);
      2. repartitionByRange on the key, then one tiny per-partition token
         subtotal (<= #partitions rows) -> driver prefix offsets ->
         broadcast back;
      3. within-partition cumulative-sum window + the partition's offset.
    The frame is persisted between steps 2 and 3 so both passes see the
    same physical partitioning. Global order (and therefore the result) is
    partition-independent: ties broken by id."""
    from pyspark.sql import Window

    from webgraph.dedup import _MIX_BASE, POLY_MOD

    spark = df.sparkSession
    key = ((F.col(id_col) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD
    parts = partitions or spark.sparkContext.defaultParallelism
    d = (
        df.select(
            F.col(id_col), key.alias("_k"), token_count(F.col(text_col)).alias("n_tokens")
        )
        .repartitionByRange(parts, "_k", id_col)
        .withColumn("_p", F.spark_partition_id())
        .persist()
    )
    psums = sorted(
        (r["_p"], r["s"])
        for r in d.groupBy("_p").agg(F.sum("n_tokens").alias("s")).collect()
    )
    offsets, acc = [], 0
    for p, s in psums:
        offsets.append((p, acc))
        acc += s
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_p int, _off long")
    w = (
        Window.partitionBy("_p")
        .orderBy("_k", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(off_df), "_p")
        .withColumn("cum_tokens", F.col("_off") + F.sum("n_tokens").over(w))
        .select(id_col, "n_tokens", "cum_tokens")
    )


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus sampling to a token budget (the standard
    pretraining-mix primitive): visit documents in a seeded pseudo-random
    order and keep the prefix whose running token total fits the budget.
    Returns (id, n_tokens, cum_tokens) for the kept prefix. See
    token_prefix_sums for the distributed exact-prefix-sum protocol."""
    return token_prefix_sums(df, id_col, text_col, seed, partitions).filter(
        F.col("cum_tokens") <= budget_tokens
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing (the final step of every
    pretraining data pipeline): documents are laid out in seeded
    pseudo-random order and the token stream is cut into fixed
    `seq_len`-token training sequences; a document's sequence id is the
    chunk containing its FIRST token (documents may span a boundary —
    the standard concat-then-chunk packing, not bin packing).

    Returns (id, n_tokens, cum_tokens, seq_id) with
    seq_id = (cum_tokens - n_tokens) DIV seq_len — pure integer
    arithmetic over the exact distributed prefix sum, so assignment is
    deterministic across partitionings and engines."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sums = token_prefix_sums(df, id_col, text_col, seed, partitions)
    return sums.withColumn(
        "seq_id", F.expr(f"(cum_tokens - n_tokens) DIV {seq_len}")
    )


def fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint over normalized content
    (whitespace-collapsed, lowercased) — the exact-dedup key."""
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.xxhash64(norm)


def rolling_fingerprints(text: Column, window_tokens: int = 16) -> Column:
    """Array of rolling window fingerprints (winnowing-style): hash of
    every `window_tokens`-token window. Basis for containment / partial-dup
    detection; built-ins only (transform over a token-index sequence).

    Two-level portable hash: each token is char-folded ONCE
    (webgraph.dedup.token_hash), then a window fingerprint folds the
    window's token hashes — O(chars + windows*W) instead of re-hashing
    every character W times. Plain integer arithmetic throughout, so the
    containment contract query has an exact DuckDB oracle (collisions,
    ~1e-9 per pair, are mirrored on both engines)."""
    from webgraph.dedup import POLY_MOD, token_hash

    toks = tokens(F.lower(text))
    th = F.transform(toks, token_hash)
    n = F.size(toks)
    idx = F.sequence(
        F.lit(0), F.greatest(n - window_tokens, F.lit(0))
    )

    def window_fp(hs):
        return F.aggregate(
            hs, F.lit(0).cast("long"), lambda acc, h: (acc * 31 + h) % POLY_MOD
        )

    return F.when(n < window_tokens, F.array(window_fp(th))).otherwise(
        F.transform(idx, lambda i: window_fp(F.slice(th, i + 1, window_tokens)))
    )


def deterministic_split(
    df: DataFrame,
    splits: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Assign every row a stable train/valid/test split label (the
    standard dataset-partitioning primitive for training pipelines).

    ``splits`` maps label -> percentage (must sum to 100); default
    {"train": 80, "valid": 10, "test": 10}. Bucket ranges follow the
    dict's insertion order, so the mapping itself is part of the spec:
    the same dict always yields the same assignment. The bucket is the portable
    hash of the id (same seeded arithmetic as sample_to_token_budget's
    order key) mod 100, so the assignment is deterministic across runs,
    engines, partitionings, and cluster sizes — re-running the pipeline
    never migrates a document between splits. Pure integer Column
    expressions: whole-stage codegen, exactly reproducible in the DuckDB
    oracle.
    """
    from webgraph.dedup import _MIX_BASE, POLY_MOD

    splits = splits or {"train": 80, "valid": 10, "test": 10}
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100, got {splits}")
    bucket = (
        ((F.col(id_col) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD
    ) % 100
    expr = None
    lo = 0
    for label, pct in splits.items():
        cond = bucket < lo + pct
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += pct
    return df.withColumn("split", expr)


def top_tokens(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Global top-k vocabulary: lowercased whitespace tokens by frequency,
    ties broken lexicographically. The explode->count aggregate
    partial-aggregates map-side (one shuffle of (token, partial_count)
    pairs, NOT raw tokens) and the top-k compiles to TakeOrderedAndProject
    — no global sort materializes the full vocabulary."""
    toks = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .filter(F.col("token") != "")
    )
    counted = toks.groupBy("token").agg(F.count("*").alias("n"))
    if min_count > 1:
        counted = counted.filter(F.col("n") >= min_count)
    return counted.orderBy(F.desc("n"), F.asc("token")).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by tf-idf (the classic keyword-extraction /
    relevance primitive). Returns (id, term, tf, df, tfidf_e6) with rank
    by (tfidf desc, term asc) within each document.

    tfidf = tf * ln(N / df) with N = total documents; emitted as integer
    micro-units so the contract comparison never touches float formatting.
    Two partial-aggregating counts (term frequency per doc, document
    frequency per term), N as a LAZY 1-row aggregate broadcast into the
    plan (the pagerank dangling-mass pattern — no eager scan at call
    time), and a bounded per-doc ranking window (rank <= k), never a
    global sort."""
    from pyspark.sql import Window

    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .filter(F.col("term") != "")
    )
    nd = df.agg(
        F.countDistinct(F.col(id_col)).cast("double").alias("_n")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf_e6",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("df")) * 1e6
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf_e6"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf_e6")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group sampling to an exact quota (the standard
    stratified corpus-mix primitive: "k documents per language/source").
    Keeps the `quota` rows with the smallest seeded portable hash within
    each group — a uniform without-replacement draw for a fixed seed, and
    reproducible across runs, engines, partitionings, and cluster sizes
    (same arithmetic as sample_to_token_budget's order key). Returns the
    input row plus `sample_rank` (1-based within group).

    Scale: a single rank window — Spark's rank-limit pushdown
    (WindowGroupLimit) applies the quota cut PARTIALLY on the map side
    before the group shuffle, so each input partition ships at most
    `quota` rows per group: a billion-row group moves <= quota x P rows,
    never the group. The plan test pins the Partial WindowGroupLimit so a
    regression (e.g. an expression change defeating the pushdown) fails
    loudly rather than silently shuffling whole groups.
    """
    from pyspark.sql import Window

    from webgraph.dedup import _MIX_BASE, POLY_MOD

    key = ((F.col(id_col) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD
    w = Window.partitionBy(group_col).orderBy("_k", id_col)
    return (
        df.withColumn("_k", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
        .drop("_k")
    )


def mix_sources(
    df: DataFrame,
    target_rows: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: str | float = "sqrt",
    seed: int = 42,
) -> DataFrame:
    """Temperature-flattened source mixing — the GPT-3/PaLM data-mixing
    primitive: per-source quotas proportional to n_s^alpha (alpha < 1
    up-weights small sources relative to their raw share), then a
    deterministic without-replacement draw per source. Returns the
    selected rows plus ``mix_rank`` (1-based within source).

    alpha: "uniform" (equal quotas), "sqrt" (n^0.5), "linear" (raw
    proportions), or a float exponent. The three named modes use exact
    integer weights — "sqrt" is floor(sqrt(n)*1000), and IEEE sqrt is
    correctly rounded — so quotas are bit-reproducible across engines
    and an ANSI-SQL oracle can replay them; a float alpha goes through
    Python pow on the driver and is reproducible across runs/partitions
    but not SQL-replayable (libm pow is not correctly rounded).

    Scale: one count aggregate, a driver-side quota computation over ONE
    ROW PER SOURCE (sources are bounded like languages — same documented
    economics as kmeans_centroids' k x dim), a broadcast quota join, and
    the stratified_sample rank window. Quota arithmetic is Python
    arbitrary-precision integers: quota_s = min(n_s, target*w_s // W)
    never overflows and never rounds, unlike in-plan DECIMAL division.
    The draw keys on the seeded portable hash, so membership is stable
    across runs, partitionings, and cluster sizes.
    """
    from pyspark.sql import Window

    from webgraph.dedup import _MIX_BASE, POLY_MOD

    counts = df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    if alpha == "uniform":
        weights = {r[source_col]: 1 for r in counts}
    elif alpha == "sqrt":
        weights = {r[source_col]: int(math.sqrt(r["n"]) * 1000) for r in counts}
    elif alpha == "linear":
        weights = {r[source_col]: r["n"] for r in counts}
    else:
        weights = {r[source_col]: int(r["n"] ** float(alpha) * 1000) for r in counts}
    total_w = sum(weights.values()) or 1
    quotas = [
        (r[source_col], min(r["n"], target_rows * weights[r[source_col]] // total_w))
        for r in counts
    ]
    spark = df.sparkSession
    src_type = df.schema[source_col].dataType.simpleString()
    qdf = spark.createDataFrame(quotas, f"{source_col} {src_type}, _quota long")
    key = ((F.col(id_col) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD
    w = Window.partitionBy(source_col).orderBy("_k", id_col)
    return (
        df.join(F.broadcast(qdf), source_col)
        .withColumn("_k", key)
        .withColumn("mix_rank", F.row_number().over(w))
        # literal bound first: quota_s <= target_rows always, so the
        # rank-limit pushdown can cut map-side at the literal before the
        # exact per-source quota cut applies post-shuffle
        .filter(
            (F.col("mix_rank") <= F.lit(int(target_rows)))
            & (F.col("mix_rank") <= F.col("_quota"))
        )
        .drop("_k", "_quota")
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality score: per-document mean
    negative log-likelihood under a self-trained add-one-smoothed unigram
    LM (p(t) = (cnt(t)+1)/(N+V)). Low score = stereotypical text, high =
    rare-token-heavy (gibberish/boilerplate outliers) — the standard
    perplexity-bucket signal for corpus filtering, here without an
    external model artifact. Returns (id, nll_e6) in micro-nats;
    documents with no tokens get NULL.

    Scale: explode -> one token-count hash aggregate (map-side combine
    absorbs hot-token skew) -> one token-keyed shuffle join of instances
    to counts (vocabulary-partitioned; AQE splits residual hot keys) ->
    one per-doc average. The (N, V) totals ride along as a broadcast
    1-row cross join. Everything is codegen built-ins; the float path is
    division + ln whose cross-engine wobble (<= 1 ulp) is orders of
    magnitude inside the micro-unit rounding."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).filter(F.col("tok") != "")  # split('') == [''] in Spark AND DuckDB
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_total"), F.count("*").alias("v_size")
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    -F.log(
                        (F.col("cnt") + 1)
                        / (F.col("n_total") + F.col("v_size"))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("nll_e6")
        )
    )
    return df.select(id_col).join(scored, id_col, "left")


def repetition_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Repeated-n-gram fraction (the Gopher-style repetition filter: the
    single strongest boilerplate/spam signal after exact dedup). For each
    document: rep_e6 = 1e6 * (occurrences of the MOST repeated n-gram) /
    (total n-grams), exact integer micro-units. Documents with fewer than
    n tokens have no n-grams: (0, 0, 0).

    One explode -> two hash aggregates; the n-gram count agg partial-
    aggregates map-side so repeated grams collapse before the shuffle
    (which is exactly the skew the operator measures)."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = df.select(F.col(id_col), F.explode(grams).alias("t"))
    cnt = tri.groupBy(id_col, "t").agg(F.count("*").alias("c"))
    agg = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"), F.max("c").alias("max_rep")
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce(F.col("max_rep"), F.lit(0)).cast("long").alias("max_rep"),
            F.when(
                F.col("n_ngrams") > 0,
                F.expr("(1000000 * max_rep) DIV n_ngrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rep_e6"),
        )
    )


# PII patterns chosen for Java-regex / RE2 parity (no lookarounds, no
# backrefs): the operator's contract query pins byte-identical redaction
# on both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Email/phone redaction — the standard pre-training scrub pass.
    Returns (id, n_emails, n_phones, clean_text) with matches replaced by
    <EMAIL>/<PHONE>. Pure codegen'd regexp built-ins (no UDF): at 100 TB
    this runs at scan speed and pushes no shuffle at all."""
    emails = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), 0))
    phones = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PHONE_RE), 0))
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        emails.cast("long").alias("n_emails"),
        phones.cast("long").alias("n_phones"),
        clean.alias("clean_text"),
    )


def inverted_index(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Capped inverted index: for every token, the top-k postings by term
    frequency (ties by id ascending) — the IR primitive behind keyword
    retrieval and the bounded counterpart of a full posting list (a
    stopword's postings would otherwise be corpus-sized; the cap is the
    documented, deterministic bound — not a silent drop, the `df` column
    reports the TRUE document frequency regardless of the cap).

    Plan: explode -> (token, doc) tf aggregate -> per-token rank window.
    Spark's rank-limit pushdown (WindowGroupLimit) caps each map
    partition's shipment at k rows per token, so stopword skew never
    ships whole posting lists."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("token", id_col).agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    if min_df > 1:
        docfreq = docfreq.filter(F.col("df") >= min_df)
    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc(id_col))
    ranked = (
        tf.join(docfreq, "token", "inner")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        "token", id_col,
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.col("rank").cast("long").alias("rank"),
    )


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """(id, bucket) — one row per hashed uni/bigram feature INSTANCE.

    The DSIR feature map (Xie et al. 2023: data selection via importance
    resampling works on hashed n-gram bag models): lowercase whitespace
    unigrams plus consecutive-token bigrams, each mapped to one of
    `buckets` slots via the repo's engine-portable char-fold hash
    (bigram = (h1*31 + h2) mod POLY_MOD, the same fold rolling
    fingerprints use at token level). Everything is codegen built-ins —
    transform/element_at over the token-hash array, no Python in the
    row path — and integer-exact, so a SQL oracle replays the bucket
    assignment bit-for-bit."""
    from webgraph.dedup import POLY_MOD, token_hash

    toks = tokens(F.lower(F.col(text_col)))
    th = F.transform(toks, token_hash)
    bi = F.when(
        F.size(th) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(th) - 1),
            lambda i: (F.element_at(th, i) * 31 + F.element_at(th, i.cast("int") + 1))
            % POLY_MOD,
        ),
    ).otherwise(F.array().cast("array<long>"))
    return df.select(
        F.col(id_col), F.explode(F.concat(th, bi)).alias("h")
    ).select(id_col, (F.col("h") % buckets).alias("bucket"))


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    n_select: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style data selection: score every raw document by how much
    more likely its hashed n-gram bag is under a model of the TARGET
    distribution than under the raw distribution, then keep the top
    `n_select`. Returns one row per raw document:
    (id, dsir_e6, selected) with dsir_e6 = sum over the document's
    feature instances of the per-bucket log-likelihood ratio
    lambda(b) = ln((ct_b+1)/(Nt+B)) - ln((cr_b+1)/(Nr+B)) in micro-nats.

    Determinism/oracle: lambda is rounded to integer micro-nats PER
    BUCKET (B values, each a single ln whose cross-engine wobble is <=
    1 ulp — flipping a rounding needs the true value within ~1e-9 of a
    half-boundary), and document scores are INTEGER SUMS of those bucket
    values, so the top-n selection never rides on float summation order.
    Ties break by id.

    Scale: two explode->hash-aggregate passes build the <= `buckets`-row
    score table (counts + a broadcast 1-row totals cross join); the raw
    corpus then makes ONE pass — explode, broadcast-join the score
    table, per-doc integer sum. Selection is a global
    TakeOrderedAndProject of the top n ids (never a full sort), flagged
    back onto the score frame with one more broadcast join. Unknown
    buckets are add-one smoothed, never dropped."""
    spark = raw.sparkSession
    tfeat = hashed_ngram_features(target, id_col, text_col, buckets)
    rfeat = hashed_ngram_features(raw, id_col, text_col, buckets)
    tb = tfeat.groupBy("bucket").agg(F.count("*").alias("ct"))
    rb = rfeat.groupBy("bucket").agg(F.count("*").alias("cr"))
    tot = tfeat.agg(F.count("*").alias("nt")).crossJoin(
        rfeat.agg(F.count("*").alias("nr"))
    )
    base = spark.range(0, buckets).select(F.col("id").alias("bucket"))
    lam = (
        base.join(F.broadcast(tb), "bucket", "left")
        .join(F.broadcast(rb), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("nt") + F.lit(buckets))
                    )
                    - F.log(
                        (F.coalesce(F.col("cr"), F.lit(0)) + 1)
                        / (F.col("nr") + F.lit(buckets))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lam_e6"),
        )
    )
    scored = (
        rfeat.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lam_e6").cast("long").alias("dsir_e6"))
    )
    allv = (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("dsir_e6"), F.lit(0)).cast("long").alias("dsir_e6"),
        )
        # both the top-n probe and the flagged output read the scores:
        # materialize ONCE so the explode->join->agg scoring pass never
        # re-executes (lineage truncation, ContextCleaner reclaims it)
        .localCheckpoint(eager=True)
    )
    topn = (
        allv.orderBy(F.desc("dsir_e6"), F.asc(id_col))
        .limit(n_select)
        .select(F.col(id_col), F.lit(True).alias("_sel"))
    )
    return allv.join(F.broadcast(topn), id_col, "left").select(
        id_col, "dsir_e6", F.coalesce(F.col("_sel"), F.lit(False)).alias("selected")
    )


# ------------------------------------------- main-content extraction ----

# Block-boundary tags (jusText/trafilatura's segmentation unit). The
# split REMOVES the boundary tags, so only inline markup (<a>, <b>, ...)
# survives inside a block. Non-capturing group: capture groups change
# what some engines' split returns.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|section|article|main|td|th|tr|table|ul|ol|li|nav"
    r"|footer|header|aside|h[1-6]|blockquote|form|br)[^>]*>"
)
# two patterns, not one with a backreference: RE2 (the oracle engine)
# has no backreferences, and mixed <script>...</style> nesting is invalid
# HTML anyway
_DROP_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_DROP_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_ANCHOR_TEXT_RE = r"(?is)<a[^>]*>([^<]*)</a>"
_TAG_RE = r"<[^>]*>"


def main_content(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = 5,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Boilerplate removal from HTML pages — the first stage of every
    web-corpus pipeline (trafilatura / jusText shape): drop script/style
    containers, segment the page into blocks at block-level tag
    boundaries, score each block by word count and LINK DENSITY (chars of
    anchor text / chars of text — nav bars and footers are link-dense,
    body prose is not), keep prose blocks, rejoin with newlines.

    Entirely split/transform/filter/aggregate codegen over one string
    column — the comment_ratio (code.py) economics: no UDF, no shuffle,
    column-pruned scan, embarrassingly parallel over a 100 TB corpus.
    Entity unescaping is deliberately out of scope (a fixed replace chain
    if a corpus needs it); matching is tag-level, not a DOM parse — the
    standard trade the density heuristics make.

    Returns (id, main_text, n_blocks, n_kept): n_blocks counts blocks
    with any text at all, n_kept the prose blocks that survived.
    """
    raw = F.regexp_replace(
        F.regexp_replace(F.col(html_col), _DROP_SCRIPT_RE, " "), _DROP_STYLE_RE, " "
    )
    blocks = F.split(raw, _BLOCK_TAG_RE)

    def block_struct(b):
        txt = F.trim(F.regexp_replace(F.regexp_replace(b, _TAG_RE, " "), r"\s+", " "))
        link_chars = F.aggregate(
            F.transform(
                F.regexp_extract_all(b, F.lit(_ANCHOR_TEXT_RE), 1),
                lambda a: F.length(F.trim(F.regexp_replace(a, r"\s+", " "))),
            ),
            F.lit(0),
            lambda acc, n: acc + n,
        )
        words = F.when(txt == "", F.lit(0)).otherwise(F.size(F.split(txt, " ")))
        return F.struct(
            txt.alias("txt"), words.alias("words"), link_chars.alias("lc")
        )

    scored = F.transform(blocks, block_struct)
    nonempty = F.filter(scored, lambda s: s["words"] > 0)
    kept = F.filter(
        nonempty,
        lambda s: (s["words"] >= F.lit(int(min_words)))
        & (
            s["lc"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["txt"]).cast("double")
        ),
    )
    return docs.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["txt"]), "\n").alias("main_text"),
        F.size(nonempty).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
    )


# ------------------------------------------------ Gopher quality rules ----

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_e2: int = 300,
    max_mean_word_len_e2: int = 1000,
    max_symbol_ratio_e4: int = 1000,
    max_bullet_frac_e4: int = 9000,
    max_ellipsis_frac_e4: int = 3000,
    min_alpha_frac_e4: int = 8000,
    min_stop_hits: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1, the
    standard document-level filter every LLM data pipeline starts from):
    word-count range, mean word length 3-10 chars, symbol-to-word ratio
    ('#'/ellipsis), bullet- and ellipsis-line fractions, fraction of
    words containing an alphabetic character, and >= 2 distinct
    stopwords present. Returns the per-rule metrics AND the combined
    keep flag so a pipeline can either filter or audit — the audit
    companion to quality_filter above, which keeps float features and
    drops rows; this one is the complete paper battery with every
    metric an engine-exact scaled integer.

    Ratio thresholds are taken scaled (e2/e4 integers) and every
    reported ratio is a scaled long, not a raw double — the metrics are
    engine-exact (same int inputs, same IEEE division, same half-up
    round on both sides of the oracle). All split/transform/filter
    codegen over one column: no UDF, no shuffle, prunes to (id, text).
    """
    txt = F.col(text_col)
    words = F.split(F.trim(txt), r"\s+")
    n_words = F.when(F.trim(txt) == "", F.lit(0)).otherwise(F.size(words))
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_e2 = F.when(n_words == 0, F.lit(0)).otherwise(
        F.round(F.lit(100.0) * char_sum / n_words).cast("long")
    )
    n_symbols = F.size(F.regexp_extract_all(txt, F.lit(r"#|\.\.\.|…"), 0))
    symbol_e4 = F.when(n_words == 0, F.lit(0)).otherwise(
        F.round(F.lit(10000.0) * n_symbols / n_words).cast("long")
    )
    lower_words = F.transform(words, F.lower)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_e4 = F.when(n_words == 0, F.lit(0)).otherwise(
        F.round(F.lit(10000.0) * n_alpha / n_words).cast("long")
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    ).cast("long")
    lines = F.split(txt, line_sep)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    bullet_e4 = F.round(F.lit(10000.0) * n_bullet / n_lines).cast("long")
    ellipsis_e4 = F.round(F.lit(10000.0) * n_ellipsis / n_lines).cast("long")
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_e2 >= min_mean_word_len_e2)
        & (mean_e2 <= max_mean_word_len_e2)
        & (symbol_e4 <= max_symbol_ratio_e4)
        & (bullet_e4 <= max_bullet_frac_e4)
        & (ellipsis_e4 <= max_ellipsis_frac_e4)
        & (alpha_e4 >= min_alpha_frac_e4)
        & (stop_hits >= min_stop_hits)
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_e2.alias("mean_word_len_e2"),
        symbol_e4.alias("symbol_ratio_e4"),
        bullet_e4.alias("bullet_frac_e4"),
        ellipsis_e4.alias("ellipsis_frac_e4"),
        alpha_e4.alias("alpha_frac_e4"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


# ------------------------------------------------ C4 cleaning rules -------

C4_POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def c4_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
    line_sep: str = "\n",
) -> DataFrame:
    """The C4 line + page cleaning battery (Raffel et al. 2020 §2.2, the
    other canonical web-corpus filter next to Gopher — gopher_rules above
    scores whole documents, this one REWRITES them line-by-line first):

    line rules (a line survives only if ALL hold):
      * ends in a terminal punctuation mark (. ! ? or a closing quote)
      * has at least ``min_line_words`` words
      * does not mention "javascript" (case-insensitive)
      * does not contain a cookie/policy boilerplate phrase

    page rules (computed on the REBUILT text):
      * at least ``min_sentences`` sentences, where a sentence is counted
        as a terminal-punctuation occurrence in the kept text (the paper
        uses an NLTK tokenizer; this count is the deterministic,
        engine-exact proxy — documented, not hidden)
      * page mentions "lorem ipsum" (case-insensitive) -> drop
      * page contains a curly bracket -> drop (code, not prose)

    Returns ``(id, clean_text, n_lines, n_lines_kept, n_sentences, keep)``
    — the rebuilt text plus audit counts, so a pipeline can filter
    (``WHERE keep``) or measure retention.

    Plan shape: one split + array filter + array_join over the text
    column, all codegen lambda expressions — zero UDFs, zero shuffles,
    prunes to (id, text). The same family as gopher_rules/main_content:
    a per-row rewrite that scales linearly with corpus bytes.
    """
    txt = F.col(text_col)
    lines = F.split(txt, line_sep)

    def line_ok(l):
        trimmed = F.trim(l)
        lower = F.lower(l)
        ok = trimmed.rlike('[.!?"”]$')
        # >= min_line_words whitespace-separated runs
        word_pat = r"\S+" + r"\s+\S+" * (min_line_words - 1)
        ok = ok & trimmed.rlike(word_pat)
        ok = ok & ~lower.contains("javascript")
        for phrase in C4_POLICY_PHRASES:
            ok = ok & ~lower.contains(phrase)
        return ok

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, line_sep)
    n_sentences = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    keep = (
        (n_sentences >= min_sentences)
        & ~F.lower(txt).contains("lorem ipsum")
        & ~txt.contains("{")
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        keep.alias("keep"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted without-replacement sample of k rows (Efraimidis &
    Spirakis 2006): each row gets key u^(1/w) for u ~ Uniform(0,1); the
    k largest keys are a without-replacement draw proportional to the
    weights. Ordering by ln(u)/w (monotone in u^(1/w), numerically tame)
    with u from the seeded portable hash makes the draw deterministic
    across runs, engines, partitionings, and cluster sizes — the corpus-
    mixing primitive "sample k documents proportional to token count"
    with a reproducibility guarantee.

    Returns the sampled rows plus ``sample_rank`` (1-based, best key
    first). Rows with non-positive weight are excluded (zero-probability
    mass by definition).

    Scale: a global top-k on a computed key — compiles to
    TakeOrderedAndProject (per-partition partial top-k, only k rows per
    partition reach the driver-side final ordering), never a full sort.
    """
    from pyspark.sql import Window

    from webgraph.dedup import _MIX_BASE, POLY_MOD

    h = ((F.col(id_col) % POLY_MOD) * F.lit(_MIX_BASE) + F.lit(seed)) % POLY_MOD
    u = (h + 1.0) / (POLY_MOD + 1.0)  # in (0, 1]: ln defined, key finite
    key = F.log(u) / F.col(weight_col)
    out = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
    return (
        out.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .drop("_es_key")
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked retrieval for one query: top-k documents by
    summed per-term score (Robertson et al., TREC-3), the ranking
    function behind Lucene/Elasticsearch and the standard lexical
    baseline a corpus-curation pipeline uses for targeted retrieval
    (e.g. pulling eval-adjacent documents before decontamination).

        idf(t)     = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d,q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with dl = document token count and avgdl its corpus mean. Returns
    (id, score_e6, n_hits) with score in integer micro-units, rounded
    PER TERM and summed as integers (the tfidf_top_terms convention,
    strengthened: float summation order varies across engines, so the
    exact-comparable quantity is the sum of per-term rounded scores) and
    n_hits = number of distinct query terms present.
    Ties break by id ascending. Matching is lowercased whitespace-token
    exact — the same tokenization as the tf-idf/inverted-index family,
    so oracles replay it verbatim.

    Scale shape: the explode is filtered to QUERY terms before the tf
    aggregate (isin over a literal array — pushed into the generator's
    filter, so only query-term postings ever shuffle, not the corpus
    vocabulary). dl is a per-row codegen size() — no explode, no
    shuffle. avgdl/N ride in as a LAZY 1-row aggregate broadcast (the
    pagerank dangling-mass pattern) and df_t as a broadcast of at most
    len(query_terms) rows. Final top-k compiles to
    TakeOrderedAndProject. No UDFs anywhere.
    """
    if not query_terms:
        raise ValueError("bm25_search: need at least one query term")
    q = sorted({t.lower() for t in query_terms})

    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term").isin(q))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    stats = df.agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(token_count(F.lower(F.col(text_col)))).alias("_avgdl"),
    )
    dl = df.select(
        F.col(id_col), token_count(F.lower(F.col(text_col))).alias("dl")
    )

    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(idf * F.col("tf") * (k1 + 1.0) / denom * 1e6)
            .cast("long")
            .alias("s_e6"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(
            F.sum("s_e6").alias("score_e6"),
            F.count("*").alias("n_hits"),
        )
        .orderBy(F.desc("score_e6"), F.asc(id_col))
        .limit(k)
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over consecutive
    token pairs (Church & Hanks 1990) — the corpus-analysis primitive
    behind phrase detection and multi-word tokenizer entries:

        pmi(x, y) = ln( (n_xy / B) / ((n_x / T) * (n_y / T)) )

    with T = total tokens, B = total bigram slots. Returns
    (x, y, n_xy, pmi_e6) for pairs with n_xy >= min_count, ranked by
    (pmi desc, x, y) — micro-unit rounding keeps the ranking integer-
    exact across engines (the tfidf/bm25 convention). ``min_count``
    matters: PMI without a support floor surfaces hapax noise.

    Scale shape: bigrams come from an in-row array transform (empty
    tokens filtered BEFORE pairing so adjacency is over real words) —
    no positional self-join; both count aggregates partial-aggregate
    map-side; T and B ride in as a lazy 1-row broadcast; the final
    top-k compiles to TakeOrderedAndProject."""
    if min_count < 1:
        raise ValueError(f"pmi_collocations: min_count must be >= 1, got {min_count}")
    t = F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i.cast("int")).alias("x"),
                F.element_at(t, i.cast("int") + 1).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))

    toks = df.select(t.alias("t"))
    totals = toks.agg(
        F.sum(F.size("t")).cast("double").alias("_t"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("double").alias("_b"),
    )
    uni = (
        toks.select(F.explode("t").alias("x"))
        .groupBy("x")
        .agg(F.count("*").alias("n"))
    )
    bi = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    scored = (
        bi.join(uni.withColumnRenamed("n", "n_x"), "x")
        .join(
            uni.withColumnRenamed("n", "n_y").withColumnRenamed("x", "y"), "y"
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "x",
            "y",
            "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy") / F.col("_b"))
                    / ((F.col("n_x") / F.col("_t")) * (F.col("n_y") / F.col("_t")))
                )
                * 1e6
            )
            .cast("long")
            .alias("pmi_e6"),
        )
    )
    return scored.orderBy(F.desc("pmi_e6"), F.asc("x"), F.asc("y")).limit(k)


def bigram_lm_score(
    df: DataFrame,
    k: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model quality score, the order-2 upgrade of
    lm_score's unigram NLL (CCNet-style perplexity bucketing): every
    document is scored under an add-k-smoothed bigram model trained on
    the corpus itself,

        p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + k) / (c(w_{i-1}) + k * V)

    with V = unigram vocabulary size. Returns (id, nll_e6, n_bigrams):
    nll_e6 = SUM of per-bigram -ln p rounded to micro-nats PER BIGRAM
    before the integer sum (the bm25 convention — float summation order
    never touches the result), NULL-free: documents with < 2 tokens are
    absent (no bigram evidence, not zero surprise).

    Scale shape: ONE in-row bigram transform (no positional self-join),
    one bigram-count and one unigram-count hash aggregate (map-side
    combine absorbs hot pairs), one pair-keyed join of instances to
    counts, V as a lazy 1-row broadcast. Repetitive boilerplate scores
    LOW (its bigrams dominate the corpus counts), rare-token gibberish
    scores HIGH — the filter reads both tails."""
    t = F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i.cast("int")).alias("x"),
                F.element_at(t, i.cast("int") + 1).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))

    inst = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.x", "p.y"
    )
    bi_cnt = inst.groupBy("x", "y").agg(F.count("*").alias("c_xy"))
    uni = (
        df.select(F.explode(t).alias("x"))
        .groupBy("x")
        .agg(F.count("*").alias("c_x"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("_v"))

    nll = -F.log(
        (F.col("c_xy") + F.lit(float(k)))
        / (F.col("c_x") + F.lit(float(k)) * F.col("_v"))
    )
    return (
        inst.join(bi_cnt, ["x", "y"])
        .join(uni, "x")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum(F.round(nll * 1e6).cast("long")).alias("nll_e6"),
            F.count("*").alias("n_bigrams"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    k: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    score every document under the self-trained add-k bigram LM
    (bigram_lm_score), order the corpus by per-bigram perplexity, and cut
    it into ``n_buckets`` equal-population strata — head (lowest
    perplexity = most fluent), middle, tail. Returns
    ``(id, ppl_mnat, bucket)``: ppl_mnat is the integer micro-nats-per-
    bigram readout (``nll_e6 DIV n_bigrams``, engine-exact) and bucket is
    'head'/'middle'/'tail' for the default 3, the stratum index as a
    string otherwise. Documents with < 2 tokens are absent (no bigram
    evidence — bigram_lm_score's contract).

    Scale shape: NO single-task global window. The global rank reuses the
    token_prefix_sums protocol: repartitionByRange on the (ppl, id) sort
    key, one per-partition row count (<= #partitions rows) -> driver
    offsets -> broadcast back, row_number within partitions + offset.
    Ordering is by IEEE-double division nll_e6 / n_bigrams — bit-identical
    rounding in any engine — with ties broken by id, so the stratum
    assignment is deterministic and partition-independent.
    """
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"ccnet_buckets: n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    sc = bigram_lm_score(df, k=k, id_col=id_col, text_col=text_col).select(
        id_col,
        (F.col("nll_e6").cast("double") / F.col("n_bigrams")).alias("_ppl"),
        F.expr("nll_e6 DIV n_bigrams").alias("ppl_mnat"),
    )
    parts = partitions or spark.sparkContext.defaultParallelism
    d = (
        sc.repartitionByRange(parts, "_ppl", id_col)
        .withColumn("_p", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_p"], r["c"])
        for r in d.groupBy("_p").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for p, c in counts:
        offsets.append((p, acc))
        acc += c
    n_total = acc
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_p int, _off long")
    w = Window.partitionBy("_p").orderBy("_ppl", id_col)
    ranked = d.join(F.broadcast(off_df), "_p").withColumn(
        "_r", F.col("_off") + F.row_number().over(w)
    )
    idx = F.expr(f"((_r - 1) * {int(n_buckets)}) DIV {max(int(n_total), 1)}")
    if n_buckets == 3:
        bucket = (
            F.when(idx == 0, F.lit("head"))
            .when(idx == 1, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        bucket = idx.cast("string")
    return ranked.select(id_col, "ppl_mnat", bucket.alias("bucket"))


def dup_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate-n-gram fraction (the WIMBD-style corpus
    diagnostic; Elazar et al. 2023): per document, the fraction of its
    n-gram INSTANCES whose n-gram occurs in >= ``min_docs`` distinct
    documents. Complements repetition_score (within-doc repeats) and the
    dedup family (which REMOVES duplicates — this MEASURES residual
    cross-doc duplication, the number you check after a dedup pass).

    Returns (id_col, n_ngrams, dup_ngrams, dup_frac_e6); docs with fewer
    than n tokens report (0, 0, 0). Exact integer ratio, one rounding.

    Plan: one explode -> per-(doc, gram) count (map-side combine collapses
    within-doc repeats before the shuffle) -> gram document-frequency agg
    over those collapsed rows -> one semi-join-shaped reaggregation. Gram
    strings shuffle once; for 100-TB corpora swap the join key for the
    portable shingle hash (dedup.shingles) — same plan, 8-byte keys.
    """
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    inst = df.select(F.col(id_col), F.explode(grams).alias("t"))
    pdg = inst.groupBy(id_col, "t").agg(F.count("*").alias("c"))
    dfg = pdg.groupBy("t").agg(F.count("*").alias("nd"))
    per = (
        pdg.join(dfg, "t")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.sum(F.when(F.col("nd") >= min_docs, F.col("c")).otherwise(0)).alias(
                "dup_ngrams"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
            F.when(F.coalesce("n_ngrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.round(F.lit(1e6) * F.col("dup_ngrams") / F.col("n_ngrams")))
            .cast("long")
            .alias("dup_frac_e6"),
        )
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int = 24,
    return_state: bool = False,
) -> DataFrame:
    """Learn the first ``n_merges`` byte-pair-encoding merge rules from a
    corpus (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
    Rare Words with Subword Units" — the standard LLM tokenizer-training
    loop). Returns ``(round, lhs, rhs, merged, n_pairs)``: per round, the
    most frequent adjacent symbol pair (ties broken lexicographically, so
    the result is deterministic and engine-portable) and its corpus count.

    Corpus representation is RELATIONAL, not array-valued: one row per
    symbol ``(doc_id, pos, sym)``. Pair counting is a lead() window plus a
    hash aggregate (map-side combine absorbs the Zipfian pair skew —
    partial counts collapse at the mappers exactly like min-label CC).
    The winning pair is a driver scalar (TakeOrdered limit 1); merge
    application is the windows-only greedy left-to-right pass:

      * re-number surviving symbols per doc (``seq``) so sequence
        adjacency survives earlier rounds' deletions,
      * match positions where ``(sym, lead(sym)) == (lhs, rhs)``,
      * gaps-and-islands (``seq - row_number``) groups CONSECUTIVE
        matches; within an island the 1st, 3rd, ... match merges — the
        exact greedy scan semantics ("aaaa" + (a,a) -> "aa","aa") without
        any sequential driver loop,
      * merge starts rewrite their symbol to ``lhs || rhs``; the symbol at
        the following sequence position drops.

    Every window partitions by doc_id (documents are small; the shuffle
    key is uniform), so at 100 TB each round is a fixed number of
    doc-partitioned exchanges regardless of vocabulary size. State is
    lineage-truncated per round (the iterative-loop rule from
    algos/common.truncate_lineage). Only lowercase a-z of the first
    ``prefix_chars`` chars feed training, which bounds per-doc cost while
    keeping counts integer-exact for the contract oracle."""
    from pyspark.sql import Window

    from webgraph.algos.common import truncate_lineage

    spark = docs.sparkSession
    s = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""), 1, prefix_chars
    )
    base = docs.select(F.col(id_col).alias("doc_id"), s.alias("s")).filter(
        F.length("s") > 0
    )
    cur = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("s")),
                lambda i: F.col("s").substr(i, F.lit(1)),
            )
        ).alias("pos", "sym"),
    )
    cur = truncate_lineage(cur)

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    merges: list[tuple] = []
    for rnd in range(1, n_merges + 1):
        paired = cur.withColumn("seq", F.row_number().over(w_doc)).withColumn(
            "nxt", F.lead("sym").over(w_doc)
        )
        top = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("lhs"), F.col("nxt").alias("rhs"))
            .agg(F.count("*").alias("n_pairs"))
            .orderBy(F.desc("n_pairs"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, n = top[0]["lhs"], top[0]["rhs"], int(top[0]["n_pairs"])
        merges.append((rnd, lhs, rhs, lhs + rhs, n))

        w_seq = Window.partitionBy("doc_id").orderBy("seq")
        islands = (
            paired.filter((F.col("sym") == lhs) & (F.col("nxt") == rhs))
            .withColumn("isl", F.col("seq") - F.row_number().over(w_seq))
        )
        w_isl = Window.partitionBy("doc_id", "isl").orderBy("seq")
        starts = (
            islands.withColumn("k", F.row_number().over(w_isl))
            .filter(F.col("k") % 2 == 1)
            .select("doc_id", "seq")
        )
        drops = starts.select("doc_id", (F.col("seq") + 1).alias("seq"))
        cur = (
            paired.join(
                starts.withColumn("_st", F.lit(True)), ["doc_id", "seq"], "left"
            )
            .join(drops.withColumn("_dr", F.lit(True)), ["doc_id", "seq"], "left")
            .filter(F.col("_dr").isNull())
            .select(
                "doc_id",
                "pos",
                F.when(F.col("_st").isNotNull(), F.lit(lhs + rhs))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
        cur = truncate_lineage(cur)

    merges_df = spark.createDataFrame(
        merges, "round int, lhs string, rhs string, merged string, n_pairs long"
    )
    if return_state:
        # (merges, final symbol state): ``cur`` IS the corpus tokenized
        # under the learned merge sequence — the serving half of the
        # tokenizer at zero extra rounds (the loop maintained it anyway).
        return merges_df, cur
    return merges_df


def bpe_tokenize_stats(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_chars: int = 24,
) -> DataFrame:
    """Tokenizer APPLICATION: run the learned BPE merge sequence over the
    corpus and report per-document compression — ``(doc_id, n_chars,
    n_tokens)`` with n_chars the normalized-prefix character count and
    n_tokens the surviving symbol count after all merges (n_chars -
    n_tokens = merge operations that landed in the document). This is
    the serving-side half of bpe_learn_merges, which already maintains
    the merged symbol state per round — application costs zero extra
    iteration rounds, just one per-doc count aggregate. Documents whose
    normalized prefix is empty are absent (they carry no symbols).

    Scale shape: inherits the training loop's doc-partitioned windows
    (uniform shuffle key, fixed exchanges per round) plus ONE map-side-
    combining count aggregate at the end."""
    _, cur = bpe_learn_merges(
        docs, n_merges, text_col, id_col, prefix_chars, return_state=True
    )
    s = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", ""), 1, prefix_chars
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.length(s).cast("long").alias("n_chars")
    ).filter(F.col("n_chars") > 0)
    return base.join(
        cur.groupBy("doc_id").agg(F.count("*").alias("n_tokens")), "doc_id"
    )


def corpus_datasheet(
    docs: DataFrame,
    by: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Corpus composition report — the "datasheet" table every corpus
    release publishes (Gebru et al. 2021 datasheets; the composition
    tables in public corpus papers): per group, document and token
    counts plus each group's share of the whole, micro-rounded to
    integers so the report is engine-exact. The shares are what mixing
    (t_mix_sources) and token-budget sampling consume as targets, so
    this is the first query run against any new corpus drop.

    Plan: one hash aggregate over the grouping keys, then a broadcast
    cross join against the single-row totals frame (no second scan, no
    window-over-everything sort)."""
    toks = token_count(F.col(text_col))
    per = docs.groupBy(*by).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
    )
    totals = per.agg(
        F.sum("n_docs").alias("_td"), F.sum("n_tokens").alias("_tt")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        *by,
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_chars",
        F.round(F.lit(1e6) * F.col("n_docs") / F.col("_td"))
        .cast("long")
        .alias("docs_share_e6"),
        F.round(F.lit(1e6) * F.col("n_tokens") / F.col("_tt"))
        .cast("long")
        .alias("tokens_share_e6"),
    )


def zipf_fit(df: DataFrame, text_col: str = "text", top_n: int = 500) -> DataFrame:
    """Zipf-exponent fit over the corpus vocabulary: least-squares slope
    of ln(frequency) against ln(rank) for the top-``top_n`` tokens —
    alpha = -slope, with the regression R^2 as the fit quality. The
    corpus-statistics readout that calibrates CMS widths, heavy-hitter
    thresholds and salting cutoffs (a steeper alpha = hotter hot keys).
    Returns one row ``(n_points, alpha_e6, r2_e6)``.

    Scale shape: token counts collapse map-side (one hash aggregate);
    only the top-N CONSTANT-size frame leaves it (TakeOrderedAndProject),
    so the rank window and the regression aggregate run over N rows
    regardless of corpus size — N is a constant, not a data fraction."""
    from pyspark.sql import Window

    tok = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("t")
    ).filter(F.col("t") != "")
    top = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("c"), F.asc("t"))
    ranked = top.withColumn("r", F.row_number().over(w))
    return ranked.agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(-F.expr("regr_slope(ln(c), ln(r))") * 1e6)
        .cast("long")
        .alias("alpha_e6"),
        F.round(F.expr("regr_r2(ln(c), ln(r))") * 1e6)
        .cast("long")
        .alias("r2_e6"),
    )


def readability_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948; the readability
    prior web-corpus quality pipelines stack next to stopword/length
    heuristics — e.g. the C4/Gopher family's "easy English" filters).

    Syllables use the standard vowel-group heuristic (count of maximal
    [aeiouy]+ runs — exact syllabification needs a dictionary; the
    heuristic is monotone with it and is what makes the score a pure
    codegen projection: three regexp counts + one arithmetic expression,
    zero Exchange at any scale). Sentences = [.!?]+ runs, floored at 1.
    Scores are emitted in 1e-4 units and the band is derived from the
    ROUNDED integer, so band edges are engine-exact."""
    words = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    sents = F.greatest(F.lit(1), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")))
    sylls = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+"))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (sylls.cast("double") / words.cast("double"))
    )
    flesch_e4 = F.when(words > 0, F.round(flesch * 1e4).cast("long")).otherwise(
        F.lit(None).cast("long")
    )
    band = (
        F.when(flesch_e4.isNull(), F.lit("empty"))
        .when(flesch_e4 >= 900000, F.lit("very_easy"))
        .when(flesch_e4 >= 700000, F.lit("easy"))
        .when(flesch_e4 >= 500000, F.lit("medium"))
        .when(flesch_e4 >= 300000, F.lit("hard"))
        .otherwise(F.lit("very_hard"))
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        flesch_e4.alias("flesch_e4"),
        band.alias("band"),
    )


# --- unicode normalization (the CCNet/C4 pre-cleaning stage) -----------
# Pattern notes: the control class uses \xNN escapes (raw control bytes
# are illegal inside SQL string literals on either engine); the space/
# zero-width classes embed the real characters (legal UTF-8 in both);
# newline patterns and replacements use REAL newline characters — Java's
# regexp_replace treats backslash sequences in the REPLACEMENT specially
# (\n would become a literal "n"), RE2's rewrite rejects them, and a real
# '\n' character sidesteps both dialects.
NORM_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"
NORM_WS_RE = "[   -   　]"
NORM_ZW_RE = "[​-‍﻿]"
NORM_TRAIL_RE = "[ \t]+\n"
NORM_NL3_RE = "\n{3,}"


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Unicode cleanup every web/code corpus runs before any filter sees
    the text: strip control characters (keep \\n and \\t), fold the
    unicode space variants to ' ', drop zero-width characters, NFC
    compose, strip trailing whitespace per line, collapse 3+ blank lines
    to one, trim. Everything is whole-stage-codegen regexp except NFC,
    which is an Arrow-batched pandas UDF over unicodedata (Spark has no
    built-in normalizer; one vectorized column pass, no per-row Python).
    DuckDB replays the exact chain via nfc_normalize + regexp_replace —
    both implement the same Unicode NFC, so outputs are byte-identical."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: t if t is None else unicodedata.normalize("NFC", t)
        )

    c = F.col(text_col)
    c = F.regexp_replace(c, NORM_CTRL_RE, "")
    c = F.regexp_replace(c, NORM_WS_RE, " ")
    c = F.regexp_replace(c, NORM_ZW_RE, "")
    c = _nfc(c)
    c = F.regexp_replace(c, NORM_TRAIL_RE, "\n")
    c = F.regexp_replace(c, NORM_NL3_RE, "\n\n")
    return df.withColumn(out_col, F.trim(c))


def kl_shift(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Per-source unigram distribution shift against the whole corpus,
    KL(P_source || P_corpus) — the domain-shift readout that calibrates
    mixing weights and flags a crawl slice whose vocabulary drifted
    (the corpus-selection framing of DSIR/DoReMi-style pipelines):

        kl(s) = sum_tok P_s(tok) * ln(P_s(tok) / Q(tok))

    with P_s the per-source relative token frequency and Q the
    corpus-wide one. Every source token is also a corpus token, so
    Q > 0 wherever P_s > 0 and the sum is finite. Returns one row per
    source: (source, n_tokens, vocab, kl_e6). EACH addend is rounded to
    integer micro-nats before the sum (the tfidf/pmi micro-unit
    convention, applied per-addend because this sum crosses a shuffle —
    integer addition is order-independent, float addition is not).

    ``min_count`` drops tokens whose CORPUS count is below the floor
    from both distributions before normalizing (hapax noise dominates
    KL otherwise); totals are re-derived from the surviving counts.

    Scale shape: one explode -> (source, tok) counts; the corpus-wide
    count is a second partial aggregate on the SAME tok key, so the
    join back is co-partitioned; per-source totals and the corpus total
    ride in as tiny broadcast frames (one row per source / one row).
    All products stay below 2^53, so the double arithmetic is exact up
    to the final ln + divide on both engines."""
    if min_count < 1:
        raise ValueError(f"kl_shift: min_count must be >= 1, got {min_count}")
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
        ).alias("tok"),
    )
    per = toks.groupBy("source", "tok").agg(F.count("*").alias("c_s"))
    glob = (
        per.groupBy("tok")
        .agg(F.sum("c_s").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    kept = per.join(glob, "tok")
    nsrc = kept.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    ntot = kept.agg(F.sum("c_s").cast("double").alias("_n"))
    return (
        kept.join(F.broadcast(nsrc), "source")
        .crossJoin(F.broadcast(ntot))
        .select(
            "source",
            "n_s",
            F.round(
                (F.col("c_s") / F.col("n_s"))
                * F.log(
                    (F.col("c_s") * F.col("_n")) / (F.col("n_s") * F.col("c"))
                )
                * 1e6
            )
            .cast("long")
            .alias("term_e6"),
        )
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum("term_e6").alias("kl_e6"),
        )
    )


def heaps_curve(
    df: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int | None = None,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cut the corpus (ordered by id)
    into ``n_bins`` equal-population strata and report, per stratum, the
    CUMULATIVE docs, tokens, and distinct-vocabulary size — V(N), the
    curve whose V = K·N^beta fit sizes tokenizer vocabularies and
    predicts marginal new-vocab yield of more crawl (Heaps 1978; the
    growth-side companion of t_zipf_fit's frequency-side exponent).

    Returns (bin, n_docs, n_tokens_cum, vocab_cum), bin in 0..n_bins-1.
    Tokenization matches zipf_fit (lowercased whitespace split, empties
    dropped) so the two fits describe the same token stream.

    Scale shape: NO single-task global window over docs or tokens. The
    doc rank reuses the token_prefix_sums protocol (repartitionByRange
    on id, per-partition counts -> driver offsets -> broadcast); a
    token's first-appearance stratum is one hash aggregate
    min(bin-of-doc) — bin is monotone in rank, so min bin == bin of min
    rank without carrying ranks through the explode; the only window
    runs over the n_bins-row aggregate (the sketches.py histogram
    pattern). Deterministic for unique ids under any partitioning."""
    from pyspark.sql import Window

    if n_bins < 1:
        raise ValueError(f"heaps_curve: n_bins must be >= 1, got {n_bins}")
    spark = df.sparkSession
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    parts = partitions or spark.sparkContext.defaultParallelism
    d = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .repartitionByRange(parts, id_col)
        .withColumn("_p", F.spark_partition_id())
        .persist()
    )
    counts = sorted(
        (r["_p"], r["c"])
        for r in d.groupBy("_p").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for p, c in counts:
        offsets.append((p, acc))
        acc += c
    n_total = max(acc, 1)
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_p int, _off long")
    w = Window.partitionBy("_p").orderBy(id_col)
    ranked = (
        d.join(F.broadcast(off_df), "_p")
        .withColumn("_r", F.col("_off") + F.row_number().over(w))
        .withColumn("bin", F.expr(f"((_r - 1) * {int(n_bins)}) DIV {n_total}"))
        .persist()
    )
    # Materialize both (<= n_bins)-row aggregates eagerly so the big token
    # caches can be released NOW — previously d and ranked stayed persisted
    # for the session's lifetime (one leaked cache pair per call).
    per_bin = ranked.groupBy("bin").agg(
        F.count("*").alias("docs"),
        F.sum(F.size("_toks")).alias("toks"),
    ).localCheckpoint(eager=True)
    first_bin = (
        ranked.select("bin", F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.min("bin").alias("fb"))
        .groupBy(F.col("fb").alias("bin"))
        .agg(F.count("*").alias("new_vocab"))
    ).localCheckpoint(eager=True)
    d.unpersist()
    ranked.unpersist()
    wc = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        per_bin.join(first_bin, "bin", "left")
        .select(
            "bin",
            "docs",
            "toks",
            F.coalesce(F.col("new_vocab"), F.lit(0)).alias("nv"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.sum("docs").over(wc).cast("long").alias("n_docs"),
            F.sum("toks").over(wc).cast("long").alias("n_tokens_cum"),
            F.sum("nv").over(wc).cast("long").alias("vocab_cum"),
        )
    )
    return out
