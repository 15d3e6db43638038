"""Distributed BPE vocabulary training (SURVEY.md §2.C — the tokenizer
half of an LLM data pipeline: learn the merge table itself, not just
count tokens with a fixed one).

Algorithm (classic byte-pair encoding, Sennrich-style, on the
word-frequency table): words are lowercase ascii runs, each starts as
its character sequence; per merge round, count adjacent symbol pairs
weighted by word frequency, pick the most frequent pair (ties broken
lexicographically — fully deterministic), and rewrite every word by the
greedy left-to-right non-overlapping merge of that pair.  The result is
the ranked merge table (merge_rank, a, b, n) — the artifact a real BPE
trainer ships.

Exactness: counts are int64 sums of int64 word frequencies; the merge
rewrite is a pure left-fold over the symbol array (Spark ``aggregate``
HOF vs DuckDB ``list_reduce`` — both engines run the identical greedy
automaton, so the whole n-round trajectory is bit-replayable by chained
CTEs, one pair of CTEs per round).  Greedy-fold note: merging (a,b)
never creates a new (a,b) adjacency (the merged symbol ``a||b`` is
strictly longer than either side), so fold-left non-overlap equals the
reference implementation's scan-and-skip.

Scale shape, 100 TB honest: the corpus is scanned ONCE (word counts —
one map-side-combinable aggregate whose output is Zipf-bounded by the
VOCABULARY, not the corpus); every merge round then runs on the
word-frequency table only — O(vocab) rows per round, pure Column HOFs,
one exchange for the pair aggregate, and ONE (a, b) row of driver state
per round (the bounded-iterative contract shared with PageRank,
k-means, and the perceptron).  localCheckpoint per round keeps lineage
flat (the bigram-LM r5 lesson); real BPE trainers work on exactly this
word-frequency dict for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BPE_MERGES = 6

_MERGE_SCHEMA = T.StructType([
    T.StructField("merge_rank", T.IntegerType(), False),
    T.StructField("a", T.StringType(), False),
    T.StructField("b", T.StringType(), False),
    T.StructField("n", T.LongType(), False)])


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c): lowercase ascii-run tokenization + frequency — the one
    corpus-wide pass; everything after is vocabulary-sized."""
    words = F.explode(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)))
    return (docs.select(words.alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c")))


def _apply_merge(a: str, b: str):
    """Greedy left-to-right non-overlapping merge of the pair (a, b) as a
    pure Column left-fold over the staged ``toks`` array column.  Symbols
    are [a-z]+ only, so literal embedding needs no escaping."""
    return F.expr(
        "aggregate(slice(toks, 2, size(toks) - 1), slice(toks, 1, 1), "
        "(acc, x) -> CASE WHEN element_at(acc, -1) = '{a}' AND x = '{b}' "
        "THEN concat(slice(acc, 1, size(acc) - 1), array('{m}')) "
        "ELSE concat(acc, array(x)) END)".format(a=a, b=b, m=a + b))


def _train_merges(w: DataFrame, n_merges: int):
    """Shared merge-training loop over a word table carrying at least
    (c, toks); extra columns (e.g. the word string for the apply pass)
    ride through every rewrite.  Returns (merges, final word table)."""
    keep = [c for c in w.columns if c != "toks"]
    merges = []
    for r in range(1, int(n_merges) + 1):
        pairs = w.select(
            "c", F.expr("transform(slice(toks, 1, size(toks) - 1), "
                        "(t, i) -> struct(t AS a, toks[i + 1] AS b))")
            .alias("ps"))
        best = (pairs.select("c", F.explode("ps").alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("c").cast("long").alias("n"))
                .orderBy(F.desc("n"), "a", "b").limit(1).collect())
        if not best:  # every word is a single symbol already
            break
        row = best[0]
        # ONE (a, b, n) row of driver state per round — never data
        merges.append((r, row["a"], row["b"], int(row["n"])))
        w = (w.select(*keep, _apply_merge(row["a"], row["b"]).alias("toks"))
             .localCheckpoint())
    return merges, w


def bpe_train(docs: DataFrame, text_col: str = "text",
              n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn the ranked BPE merge table: (merge_rank, a, b, n) with n the
    weighted adjacent-pair count that won round merge_rank.  Ties break
    by (a, b) ascending — deterministic whatever the partitioning."""
    spark = SparkSession.getActiveSession()
    w = (word_counts(docs, text_col)
         .select("c", F.expr("filter(split(word, ''), x -> x <> '')")
                 .alias("toks"))
         .localCheckpoint())
    merges, _ = _train_merges(w, n_merges)
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def bpe_piece_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     n_merges: int = BPE_MERGES) -> DataFrame:
    """Train-then-ENCODE: learn the n-merge vocabulary on the corpus,
    apply it back, and return per-document (id, n_words, n_pieces) — the
    token-budget accounting an LLM pipeline runs with its OWN learned
    tokenizer rather than a fixed one.  Compression ratio
    n_pieces/n_words falls as merges land on that document's words.

    Scale shape: the (id, word) occurrence table is localCheckpointed
    ONCE and feeds both the word-count derivation and the final
    join-back (the bigram-LM r5 lesson — never re-tokenize per
    consumer); training runs on the vocab-sized table as in bpe_train;
    the apply side is word-occurrences ⨝ vocab-sized piece counts + one
    per-doc aggregate.  Docs with zero ascii words report (0, 0)."""
    words = F.explode(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)))
    occ = (docs.select(F.col(id_col).alias("id"), words.alias("word"))
           .localCheckpoint())
    w = (occ.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c"))
         .select("word", "c",
                 F.expr("filter(split(word, ''), x -> x <> '')")
                 .alias("toks"))
         .localCheckpoint())
    _, wf = _train_merges(w, n_merges)
    pieces = wf.select("word", F.size("toks").cast("long").alias("np"))
    per_doc = (occ.join(pieces, "word")
               .groupBy("id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                    F.sum("np").cast("long").alias("n_pieces")))
    return (docs.select(F.col(id_col).alias("id")).distinct()
            .join(per_doc, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_pieces", F.lit(0)).cast("long")
                    .alias("n_pieces")))
