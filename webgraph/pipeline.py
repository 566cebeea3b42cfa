"""End-to-end training-corpus cleaning — the whole pretraining data
pipeline as one composable call, every stage one of this repo's
oracle-checked operators:

    raw docs
      -> quality gate        (token floor + alpha ratio, integer-exact)
      -> exact dedup         (first-wins per normalized text)
      -> near-dup clustering (MinHash-LSH + CC, keep canonical)
      -> decontamination     (n-gram overlap vs the eval set)
      -> stratified sampling (per-group quota, seeded hash order)
      -> sequence packing    (concat-and-chunk over exact prefix sums)

Every rule is integer/portable arithmetic, so the ENTIRE composition has
one exact DuckDB oracle (contract query d_clean_corpus) — not just the
stages in isolation: stage ordering and hand-off are verified too.

Scale: the stages keep their individual economics (hash aggregates,
bucketed LSH joins, tiny CC on the pair graph, broadcast eval grams,
rank-limit-pushed windows, distributed prefix sums); composition adds no
new shuffle shapes. Each stage consumes the previous stage's surviving
rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph.text import tokens


def clean_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    min_tokens: int = 5,
    min_alpha_pct10: int = 3,
    near_threshold: float = 0.9,
    near_max_iter: int = 8,
    quota: int = 50,
    seq_len: int = 2000,
    seed: int = 42,
    strict: bool = False,
) -> tuple[DataFrame, dict]:
    """Returns (final DataFrame, manifest). Final columns:
    (id, group, sample_rank, n_tokens, cum_tokens, seq_id) — the packed
    training set. Manifest maps stage -> surviving row count (the
    drop accounting a production pipeline reports; counts are actions,
    computed once per stage boundary).

    The quality gate uses cross-multiplied integers (10 * alpha_chars >=
    min_alpha_pct10 * total_chars) — no float ratio, no boundary drift
    between engines."""
    from webgraph.dedup import decontaminate, dedup_clusters
    from webgraph.text import pack_sequences, stratified_sample

    manifest = {"input": docs.count()}

    # 1. quality gate
    t = F.col(text_col)
    n_tok = F.size(tokens(t))
    alpha = F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
    q = docs.filter(
        (n_tok >= min_tokens) & (10 * alpha >= min_alpha_pct10 * F.length(t))
    ).persist()
    manifest["quality"] = q.count()

    # 2. exact dedup: first-wins per normalized text (portable string key,
    # not a 64-bit hash — the oracle groups on the identical expression)
    norm = F.regexp_replace(F.lower(t), r"\s+", " ")
    from pyspark.sql import Window

    w = Window.partitionBy(norm).orderBy(id_col)
    ex = (
        q.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    manifest["exact_dedup"] = ex.count()

    # 3. near-dup clustering: keep the canonical representative
    clusters = dedup_clusters(
        ex, id_col=id_col, text_col=text_col, threshold=near_threshold,
        max_iter=near_max_iter, strict=strict,
    )
    nd = ex.join(
        clusters.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    ).persist()
    manifest["near_dedup"] = nd.count()

    # 4. decontamination against the eval set (skipped when eval_df None)
    if eval_df is not None:
        flags = decontaminate(nd, eval_df, id_col=id_col, text_col=text_col)
        dc = nd.join(
            flags.filter(~F.col("contaminated")).select(id_col), id_col, "left_semi"
        ).persist()
    else:
        dc = nd
    manifest["decontaminated"] = dc.count()

    # 5. stratified sampling to a per-group quota
    st = stratified_sample(dc, group_col, quota, id_col=id_col, seed=seed).persist()
    manifest["sampled"] = st.count()

    # 6. sequence packing over the sampled set
    packed = pack_sequences(st, seq_len, id_col=id_col, text_col=text_col, seed=seed)
    final = st.select(id_col, group_col, "sample_rank").join(packed, id_col)
    manifest["sequences"] = (
        packed.agg((F.max(F.expr(f"cum_tokens DIV {seq_len}")) + 1)).collect()[0][0]
    )
    return final.select(
        id_col, group_col,
        F.col("sample_rank").cast("long").alias("sample_rank"),
        "n_tokens", "cum_tokens", "seq_id",
    ), manifest


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-delta table between two corpus snapshots — the incremental-
    recrawl primitive (what changed since the last crawl decides what
    re-enters the cleaning pipeline). Returns ``(id, status)`` with
    status in {'added', 'removed', 'changed', 'unchanged'}: presence is
    the full outer join on the id, change detection is sha256 content
    equality (the reference's content invariant, input_hint's per-row
    sha256 contract).

    Scale shape: contents collapse to 32-byte digests at the scan
    projection — the join shuffles (id, digest) pairs, never document
    bodies; one id-keyed sort-merge/hash join, no window, no UDF."""
    o = old.select(
        F.col(id_col).alias("_id"), F.sha2(F.col(text_col), 256).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.sha2(F.col(text_col), 256).alias("_hn")
    )
    return o.join(n, "_id", "full_outer").select(
        F.col("_id").alias(id_col),
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
