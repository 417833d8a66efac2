"""Corpus-trained n-gram language-model perplexity — the classic
quality-filtering signal of LLM data pipelines (CCNet trains a 5-gram
KenLM on Wikipedia and drops high-perplexity web text; Gopher/MassiveText
uses the same shape). This is the jar-free Spark-native version: an
add-k-smoothed BIGRAM model trained with two grouped aggregates and
scored with two shuffle joins — no model file, no UDF, pure codegen.

Scale shape (the part that matters at 100 TB):

- **Training is two aggregates** over the tokenized corpus (unigram and
  bigram counts) — map-side-combined shuffles keyed by token/bigram,
  the same cost as any word-count.
- **Scoring is a join, not a broadcast.** The LM tables are
  corpus-derived (vocab and vocab² scale with the data), so candidates
  score against them with shuffle joins on ``w1``/``(w1, w2)`` —
  co-partitioned by Catalyst, never collected. A fixed small reference
  LM could broadcast; a corpus-sized one cannot, and this path never
  assumes it can.
- **Cross-engine determinism**: each bigram's −log₂ p is rounded to
  6 decimals and scaled to an exact integer BEFORE summing (float sums
  are order-dependent; integer sums are not), the same scaled-decimal
  trick the relational layer's ``dsum`` uses.

Smoothing: ``p(w2|w1) = (c12 + k) / (c1 + k·V)`` with add-k (k=0.5
default), V = unigram vocabulary size. Every bigram of a SELF-scored
corpus exists in the counts; the left joins + coalesce keep the same
formula exact for held-out documents whose bigrams (or even first
tokens) were never seen in training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-term fixed-point scale: −log₂ p is rounded to 6 decimals and
#: summed as integers, so the per-doc sum is exact and order-free
_SCALE = 1_000_000


def _tokens(
    docs: DataFrame, text_col: str, id_col: str, min_len: int = 2
) -> DataFrame:
    """(id, w: array<string>) for docs with ≥ ``min_len`` tokens (an
    n-gram needs n). Split on the single-space convention the
    documents table and its oracles use throughout this repo."""
    return docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    ).where(F.size("w") >= min_len)


def _doc_bigrams(toks: DataFrame, id_col: str) -> DataFrame:
    return (
        toks.select(
            id_col,
            # total expression: sequence(1, 0) is DESCENDING in Spark
            # ([1, 0] → out-of-bounds under ANSI), and optimizer
            # rewrites may evaluate this projection on rows the ≥2
            # filter would drop — guard inside the expression itself
            F.expr(
                "CASE WHEN size(w) >= 2 THEN "
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i-1] as w1, w[i] as w2)) "
                "ELSE array() END"
            ).alias("bg"),
        )
        .select(id_col, F.explode("bg").alias("g"))
        .select(id_col, F.col("g.w1"), F.col("g.w2"))
    )


def bigram_lm_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """Train: ``(unigrams(w1, c1), bigrams(w1, w2, c12), V)``. Two
    grouped aggregates; ``V`` is one count — the only driver value.

    ``persist=True`` materializes BOTH count tables (and caches the
    tokenized corpus only for the duration of training): a scoring
    plan that references the model then reads the aggregates instead
    of re-deriving them — without it, self-scoring tokenized the
    corpus ~4× in one query (the round-8 bench's slowest entry was
    mostly this). The caller owns eviction (``uni.unpersist()`` /
    ``big.unpersist()``) — or writes the tables to storage, which the
    ``lm=`` parameter accepts just the same."""
    toks = _tokens(docs, text_col, id_col)
    if persist:
        toks = toks.persist()
    uni = (
        toks.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    big = (
        _doc_bigrams(toks, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    if persist:
        uni, big = uni.persist(), big.persist()
        v = uni.count()
        big.count()  # materialize now, while toks is cached
        toks.unpersist()
        return uni, big, v
    return uni, big, uni.count()


def perplexity_scores(
    docs: DataFrame,
    lm: tuple[DataFrame, DataFrame, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document bigram cross-entropy (bits/bigram) and perplexity
    under ``lm`` (or a model trained on ``docs`` itself when omitted —
    the self-scoring shape that flags a corpus's own outliers).
    Returns ``(id_col, n_bigrams, cross_entropy, perplexity)``."""
    # self-scoring trains with persist=True: the scoring joins read
    # the materialized count tables instead of re-tokenizing the
    # corpus inside the same plan (round-9 fix — the scoring pass
    # itself still tokenizes once, which is its own ∝-corpus cost)
    uni, big, v = (
        lm
        if lm is not None
        else bigram_lm_counts(docs, text_col, id_col, persist=True)
    )
    grams = _doc_bigrams(_tokens(docs, text_col, id_col), id_col)
    joined = grams.join(big, ["w1", "w2"], "left").join(uni, ["w1"], "left")
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.lit(v)
    )
    term = F.round(-F.log2(p) * _SCALE).cast("long")
    out = (
        joined.select(id_col, term.alias("t"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("t").cast("double") / (F.lit(float(_SCALE)) * F.count(F.lit(1))),
                6,
            ).alias("cross_entropy"),
        )
    )
    return out.withColumn(
        "perplexity", F.round(F.pow(F.lit(2.0), F.col("cross_entropy")), 4)
    )


def _doc_ngrams(toks: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, ctx: string, wn: string) — every n-gram as its space-joined
    (n−1)-token CONTEXT plus final token. The same total-expression
    guard as ``_doc_bigrams``: ``sequence(n, size(w))`` is DESCENDING
    when the doc is short, so the CASE must gate inside the expression
    (optimizer rewrites can evaluate projections on pre-filter rows)."""
    return (
        toks.select(
            id_col,
            F.expr(
                f"CASE WHEN size(w) >= {n} THEN "
                f"transform(sequence({n}, size(w)), "
                f"j -> struct(array_join(slice(w, j - {n} + 1, {n} - 1), ' ')"
                f" AS ctx, w[j - 1] AS wn)) "
                "ELSE array() END"
            ).alias("g"),
        )
        .select(id_col, F.explode("g").alias("g"))
        .select(id_col, F.col("g.ctx"), F.col("g.wn"))
    )


def ngram_lm_counts(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """Train a general add-k n-gram model (CCNet's production filter is
    a 5-gram; the bigram fast path keeps its dedicated twin above):
    ``(full(ctx, wn, c_full), ctx_counts(ctx, c_ctx), V)``. The context
    normalizer is derived FROM the full counts (``c_ctx = Σ_w
    c(ctx, w)``) — one rollup aggregate instead of a second corpus
    pass, and exactly the denominator that makes the conditional
    distribution sum to 1 under add-k. V is the distinct-unigram count
    over docs long enough to carry an n-gram. Same scale shape as the
    bigram trainer: grouped map-side-combined aggregates, counts
    joined at score time, never broadcast."""
    if n < 2:
        raise ValueError(f"n-gram order must be >= 2, got {n}")
    toks = _tokens(docs, text_col, id_col, min_len=n)
    if persist:
        toks = toks.persist()
    full = (
        _doc_ngrams(toks, id_col, n)
        .groupBy("ctx", "wn")
        .agg(F.count(F.lit(1)).alias("c_full"))
    )
    ctxc = full.groupBy("ctx").agg(F.sum("c_full").alias("c_ctx"))
    vq = toks.select(F.explode("w").alias("u")).agg(
        F.countDistinct("u").alias("v")
    )
    if persist:
        full, ctxc = full.persist(), ctxc.persist()
        v = int(vq.collect()[0]["v"])
        full.count(), ctxc.count()  # materialize while toks is cached
        toks.unpersist()
        return full, ctxc, v
    return full, ctxc, int(vq.collect()[0]["v"])


def ngram_perplexity_scores(
    docs: DataFrame,
    n: int = 3,
    lm: tuple[DataFrame, DataFrame, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document n-gram cross-entropy (bits/gram) and perplexity
    under ``lm`` (or a model trained on ``docs`` itself when omitted).
    ``p(wn|ctx) = (c_full + k) / (c_ctx + k·V)`` — LEFT joins +
    coalesce keep the formula exact for held-out text whose contexts
    were never seen. Same exact-integer term summing as the bigram
    scorer, so the numbers are order-free and engine-portable.
    Returns ``(id_col, n_grams, cross_entropy, perplexity)``."""
    full, ctxc, v = (
        lm
        if lm is not None
        else ngram_lm_counts(docs, n, text_col, id_col, persist=True)
    )
    grams = _doc_ngrams(_tokens(docs, text_col, id_col, min_len=n), id_col, n)
    joined = grams.join(full, ["ctx", "wn"], "left").join(ctxc, ["ctx"], "left")
    p = (F.coalesce(F.col("c_full"), F.lit(0)) + F.lit(add_k)) / (
        F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(add_k) * F.lit(v)
    )
    term = F.round(-F.log2(p) * _SCALE).cast("long")
    out = (
        joined.select(id_col, term.alias("t"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum("t").cast("double")
                / (F.lit(float(_SCALE)) * F.count(F.lit(1))),
                6,
            ).alias("cross_entropy"),
        )
    )
    return out.withColumn(
        "perplexity", F.round(F.pow(F.lit(2.0), F.col("cross_entropy")), 4)
    )


def perplexity_filter(
    docs: DataFrame,
    max_perplexity: float,
    lm: tuple[DataFrame, DataFrame, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """The CCNet gate: keep documents whose perplexity under the model
    is ≤ ``max_perplexity`` (high-perplexity text is boilerplate,
    gibberish, or wrong-language — the classic pretraining drop)."""
    scores = perplexity_scores(docs, lm, text_col, id_col, add_k)
    keep = scores.where(F.col("perplexity") <= max_perplexity).select(id_col)
    return docs.join(keep, id_col, "left_semi")
