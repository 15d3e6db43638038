"""Distributed model training for corpus curation: an exact-integer
batch perceptron that learns a quality-classifier from labeled documents
(SURVEY.md §2.C — the step where a training-data pipeline trains its OWN
filter model, fasttext-style, instead of hand-tuning thresholds).

Algorithm (batch/parallel perceptron, lr = 1): per epoch, every example
is scored against the CURRENT weights and the summed update
``w += Σ_{misclassified} y_i · x_i`` applies once — the classic
map-reduce-friendly variant of the sequential perceptron.  All features,
labels, margins, and updates are int64, so the 3-epoch trajectory is
bit-replayable by a DuckDB oracle (chained CTEs, one per epoch).

Scale shape, 100 TB honest: per epoch = ONE corpus scan + ONE
map-side-combinable aggregate of d+1 integer sums; driver state is the
weight vector (d+1 ints — the same bounded-iterative-state contract as
integer PageRank and the k-means trainers).  The feature DataFrame is
localCheckpoint-ed once so the epochs do not re-derive corpus lineage
(the bigram-LM r5 lesson).  Overflow headroom: |x_j| <= 100, so even at
10^10 documents an epoch update stays ~1e12 and w·x ~1e15 << 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PERCEPTRON_EPOCHS = 16


def quality_features(qf: DataFrame) -> DataFrame:
    """quality_filter output -> (y, x0..x4) training examples: bias plus
    the four binary gate-check indicators (length ok, diversity ok, has
    stopwords, language known); label +1 iff the rule-based gate said
    KEEP.  Because the label is (approximately) the AND of the
    indicators, the set is linearly separable — so the batch perceptron
    PROVABLY converges, and the gated confusion matrix shows it reaching
    zero training error (tp+tn = n at the default epoch budget on the
    gate corpus): the distillation of the rule into weights is itself the
    verified artifact.  Magnitude-capped raw features (token counts etc.)
    were measured to stall — the 445:55 class imbalance swamps the
    minority updates (r6 bench note)."""
    from .text import QF_MIN_TOKENS, QF_MIN_UNIQ_MILLI
    ind = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")
    return qf.select(
        F.when(F.col("verdict") == "KEEP", F.lit(1)).otherwise(F.lit(-1))
         .cast("long").alias("y"),
        F.lit(1).cast("long").alias("x0"),
        ind(F.col("n_tokens") >= QF_MIN_TOKENS).alias("x1"),
        ind(F.col("uniq_milli") >= QF_MIN_UNIQ_MILLI).alias("x2"),
        ind(F.col("n_stopwords") >= 1).alias("x3"),
        ind(F.col("lang_pred") != "und").alias("x4"))


def _dot(w: list[int], d: int):
    out = F.lit(int(w[0])) * F.col("x0")
    for j in range(1, d):
        out = out + F.lit(int(w[j])) * F.col(f"x{j}")
    return out


def perceptron_train(feats: DataFrame, n_features: int = 5,
                     epochs: int = PERCEPTRON_EPOCHS) -> DataFrame:
    """Train and evaluate: returns ONE row
    (w0..w{d-1}, tp, fp, fn, tn, n) — final weights after `epochs`
    batch updates plus the confusion matrix of the trained model on the
    training set (prediction = +1 iff w·x > 0; ties predict -1, matching
    the update rule's margin <= 0 misclassification test)."""
    d = int(n_features)
    feats = feats.localCheckpoint()  # epochs must not replay corpus lineage
    w = [0] * d
    for _ in range(int(epochs)):
        margin = F.col("y") * _dot(w, d)
        upd = feats.agg(*[
            F.sum(F.when(margin <= 0, F.col("y") * F.col(f"x{j}")))
             .alias(f"u{j}") for j in range(d)]).collect()[0]
        # d+1 ints of driver state per epoch — the bounded-iterative
        # contract (pagerank/k-means precedent), never a data collect
        w = [w[j] + int(upd[f"u{j}"] or 0) for j in range(d)]
    pos = _dot(w, d) > 0
    y_pos = F.col("y") == 1
    conf = feats.agg(
        F.sum(F.when(y_pos & pos, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(~y_pos & pos, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(y_pos & ~pos, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~y_pos & ~pos, 1).otherwise(0)).cast("long").alias("tn"),
        F.count(F.lit(1)).cast("long").alias("n"))
    return conf.select(
        *[F.lit(int(w[j])).cast("long").alias(f"w{j}") for j in range(d)],
        "tp", "fp", "fn", "tn", "n")
