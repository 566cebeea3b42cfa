"""Distributed classifier training for corpus quality filtering —
the "train a lightweight quality classifier, then filter the corpus
with it" stage of an LLM data pipeline (the role fastText linear
classifiers play in public pipeline descriptions; cf. the CCNet /
Gopher filtering setups already mirrored in text.py).

The trainer is the POCKET perceptron (Gallant 1990): run the batch
perceptron rule (Rosenblatt update summed over the whole misclassified
set per round) and keep the weights with the fewest training mistakes
seen anywhere along the trajectory — the plain batch rule oscillates
on unscaled count features (measured on the contract corpus: the
trajectory visits a 0-mistake separator at round 15 and leaves it),
so the pocket is what turns the oscillation into a usable classifier.
Everything is INTEGER arithmetic — counts in, integer weights and
margins out — so training is deterministic across runs, partitionings
and engines, and a DuckDB oracle replays it round-for-round (real
pipelines swap in logistic loss; this variant is the one whose
training run is bit-reproducible).

Scale: the weight vector lives on the driver (k+1 integers — the
kmeans_centroids convention); each round is ONE map-side-combinable
aggregate over the corpus (mistake count + sum of y*x over
misclassified rows in the same pass), so at 100 TB a round costs a
single scan-and-reduce with no row-shaped shuffle. Feature columns
stay pure codegen expressions."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_perceptron(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    iters: int = 20,
    id_col: str = "doc_id",
) -> tuple[list[int], DataFrame, list[int]]:
    """Pocket perceptron over integer features. ``label_col`` holds
    +1/-1; features must be integral (counts). Returns ``(weights,
    scored, mistakes)``: ``weights`` is the pocket (fewest training
    mistakes, ties to the earliest round — index 0 is the bias),
    ``scored`` is ``(id_col, score, pred, label)`` under the pocket
    weights (score the exact integer margin; ``pred`` is the sign with
    0 predicting -1, the training rule's margin <= 0 convention), and
    ``mistakes[r]`` is the mistake count of the round-r weight vector
    (r = 0 is the all-zero init, r = iters the post-final-update one).
    """
    y = F.col(label_col).cast("long")
    xs = [F.lit(1).cast("long")] + [F.col(c).cast("long") for c in feature_cols]

    def dot(weights):
        return reduce(
            lambda a, b: a + b, (F.lit(int(wi)) * xi for wi, xi in zip(weights, xs))
        )

    w = [0] * len(xs)
    candidates: list[list[int]] = []
    mistakes: list[int] = []
    for _ in range(iters):
        margin = y * dot(w)
        miss = margin <= 0
        row = df.select(
            F.sum(F.when(miss, 1).otherwise(0)).cast("long").alias("m"),
            *[
                F.sum(F.when(miss, y * xi).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"d{i}")
                for i, xi in enumerate(xs)
            ],
        ).collect()[0]
        candidates.append(w)
        mistakes.append(int(row["m"] or 0))
        w = [wi + int(row[f"d{i}"] or 0) for i, wi in enumerate(w)]
    final_m = df.select(
        F.sum(F.when(y * dot(w) <= 0, 1).otherwise(0)).cast("long").alias("m")
    ).collect()[0]["m"]
    candidates.append(w)
    mistakes.append(int(final_m or 0))

    best = min(range(len(candidates)), key=lambda r: (mistakes[r], r))
    pocket = candidates[best]
    score = dot(pocket)
    scored = df.select(
        F.col(id_col),
        score.cast("long").alias("score"),
        F.when(score > 0, F.lit(1)).otherwise(F.lit(-1)).alias("pred"),
        y.alias("label"),
    )
    return pocket, scored, mistakes
