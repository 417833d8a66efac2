"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting.

All pure built-in expressions (split / regexp / md5) — JVM-side,
whole-stage-codegen, linear scans with no shuffle: the shape that runs
unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_data_workflow_spark.session import ensure_parallelism

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents are single-spaced word salad)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish counting: alpha runs + digit runs + solo symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def stopword_ratio(text: Column) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))
    return n_stop.cast("double") / token_count(text).cast("double")


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    # nullif: empty strings yield NULL rather than an ANSI divide error
    return n_punct.cast("double") / F.nullif(F.length(text).cast("double"), F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    sane stopword density (the C4-style cheap filters)."""
    n_tok = token_count(text).cast("double")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop = stopword_ratio(text)
    stop_ok = F.when((stop >= 0.01) & (stop <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit count per language (deterministic, tie-break by
    language code order in ``sorted(LANG_MARKERS)``)."""
    out = {}
    lowered = F.lower(text)
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lowered, F.lit(pat), F.lit(0)))
    return out


def lang_id(text: Column) -> Column:
    """argmax over ``lang_scores`` with deterministic tie-breaking:
    highest score wins, ties go to the alphabetically-first language;
    all-zero scores → 'und'."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(scores)
        ]
    )
    # pick max score, then min lang among the maxes (deterministic tie-break)
    max_score = F.array_max(F.transform(pairs, lambda p: p.score))
    winner = F.array_min(
        F.transform(F.filter(pairs, lambda p: p.score == max_score), lambda p: p.lang)
    )
    return F.when(max_score > 0, winner).otherwise(F.lit("und"))


# PII masking patterns — deliberately inside the Java-regex ∩ RE2 common
# subset (no lookaround, no backrefs) so a SQL oracle applies the SAME
# pattern text byte-for-byte; ordered so the broad number pattern runs
# after the structured ones it would otherwise eat into
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()./ -]{7,14}\d\b", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Mask emails / IPv4s / phone-shaped numbers with typed placeholders —
    the pre-training redaction pass. A chain of codegen ``regexp_replace``
    calls: linear scan, no shuffle, no Python; patterns replace globally
    on both Spark and SQL engines (DuckDB needs the explicit 'g' flag)."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_token_frac`` — 1 − distinct/total tokens (how much of the doc
      is repeated words);
    - ``top_bigram_share`` — occurrences of the most frequent bigram over
      all bigram occurrences (near 1 ⇒ degenerate loop-generated text).

    Shape: one codegen array projection for the token stats + explode →
    per-(doc, gram) hash count → per-doc hash aggregate for the bigram
    share, joined back on the id — linear, partial-aggregating, no
    global sort. Single-token docs have no bigrams → NULL share (kept:
    a filter decision, not the operator's)."""
    toks = tokens(F.col(text_col))
    stats = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            1.0
            - F.size(F.array_distinct(toks)).cast("double")
            / F.nullif(F.size(toks).cast("double"), F.lit(0.0)),
            6,
        ).alias("dup_token_frac"),
        toks.alias("__w"),
    )
    # raw (non-distinct) bigrams: repetition is the signal, dedup would erase it
    grams = stats.select(
        id_col,
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__w") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__w", i + 1), F.element_at("__w", i + 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    share = per_gram.groupBy(id_col).agg(
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top_bigram_share"
        )
    )
    return stats.drop("__w").join(share, id_col, "left")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text. md5 is byte-stable across engines (oracle parity) and a rolling/
    content-defined variant can swap in without changing the pipeline."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → + token counts, quality, language guess, fingerprint."""
    t = F.col(text_col)
    return ensure_parallelism(df).select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    explode → two hash aggregates (term frequency per doc, document
    frequency per term) → shuffle-join on term → per-doc ranking window.
    The docf side is vocabulary-sized (unbounded at corpus scale), so it
    is NOT force-broadcast — AQE auto-broadcasts it when it is actually
    small. The only global number is N (corpus size): pass ``n_docs``
    when the pipeline already knows it (action-free plan build), else it
    is collected as one scalar. idf = ln(N/df), score = tf·idf.
    """
    from pyspark.sql.window import Window

    if n_docs is None:
        n_docs = df.count()
    terms = ensure_parallelism(df).select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(docf, "term").select(
        F.col(id_col),
        "term",
        (F.col("tf").cast("double") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(id_col, "term", F.round("score", 6).alias("score"), F.col("rk").cast("long").alias("rk"))
    )


def bigram_doc_freq(df: DataFrame, text_col: str = "text", top_n: int = 20) -> DataFrame:
    """Corpus-wide bigram document frequency, top-N (n-gram generation →
    explode → count; per-doc distinct shingles so a repeated bigram in one
    doc counts once)."""
    from simple_data_workflow_spark.llmdata.dedup import shingles

    grams = df.select(F.explode(shingles(F.col(text_col), 2)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("gram"))
        .limit(top_n)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """RAG-style chunking: overlapping windows of ``chunk_tokens``
    whitespace tokens, stride ``chunk_tokens - overlap``.

    One output row per (document, chunk): ``chunk_id`` (0-based window
    index), ``chunk_text``, ``chunk_n_tokens``. The final window may be
    short; a window that would sit entirely inside the previous one
    (start ≥ n_tokens - overlap) is not emitted. Pure codegen array
    expressions — tokens → filtered ``sequence`` of starts → ``slice`` +
    ``concat_ws`` → ``posexplode`` — so the scan stays linear and
    JVM-side at any corpus size; chunking is a flatMap, no shuffle.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    w = tokens(F.col(text_col))
    n = F.size(w)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s < n - overlap),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(w, s + 1, chunk_tokens)).alias("chunk_text"),
            F.least(n - s, F.lit(chunk_tokens)).cast("long").alias("chunk_n_tokens"),
        ),
    )
    exploded = ensure_parallelism(df).select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_n_tokens").alias("chunk_n_tokens"),
    )


# GPT-2-style pretokenizer pattern, restricted to the Java-regex ∩ RE2
# common subset (the real GPT-2 pattern's \s+(?!\S) lookahead is dropped —
# RE2 has no lookaround): contractions, space-prefixed letter runs, digit
# runs, punctuation runs, residual whitespace.
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-style pretokenizer — the budget number a
    real pipeline reports (whitespace counts undercount code/punctuation
    heavy text badly). One codegen ``regexp_count``: linear scan, no
    shuffle, no Python; the pattern is engine-portable so a SQL oracle
    counts identically."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    ``window`` over consecutive hashes keeping each window's minimum, and
    emit the distinct selected hashes as (id, fingerprint) rows. The
    guarantee: two documents sharing a run of ≥ k + window − 1 tokens
    share at least one fingerprint — localized near-dup/plagiarism
    detection that whole-document md5 cannot give.

    Shape: all array codegen per row (k-gram transform → md5 32-bit
    hashes → windowed ``array_min`` → ``array_distinct``) then one
    explode — linear, shuffle-free; ~|tokens|/density fingerprints per
    doc. md5 keeps the selection engine-portable (ties in VALUE collapse
    in the distinct set, so no positional tie-break is needed).
    Downstream, a groupBy on the fingerprint column finds collisions —
    same scale shape as the banded LSH joins.

    The hash array materializes in its OWN projection before the
    windowed-min step: the min lambda references it once per window, and
    inside a single projection Catalyst would inline the whole
    md5-per-gram computation into every slice — O(m·window) md5 chains
    per document instead of O(m) (measured 30.8 s → 0.9 s at sf0.1;
    CollapseProject spares multiply-referenced non-cheap expressions
    across separate selects)."""
    w = F.split(F.col(text_col), " ")
    m = F.size(w) - F.lit(k - 1)
    grams = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(off + 1)) for off in range(k)]),
    )
    with_hashes = ensure_parallelism(df).select(
        F.col(id_col),
        F.when(
            m >= 1,
            F.transform(
                grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            ),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("__h"),
    )
    n_sel = F.size("__h") - F.lit(window - 1)
    sel = F.transform(
        F.sequence(F.lit(0), n_sel - 1),
        lambda j: F.array_min(F.slice(F.col("__h"), j + 1, window)),
    )
    fps = F.when(n_sel >= 1, F.array_distinct(sel)).otherwise(
        F.array().cast("array<long>")
    )
    return with_hashes.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    counters: int = 4096,
    min_len: int = 1,
) -> DataFrame:
    """Approximate-then-exact corpus heavy hitters: the top-``k`` most
    frequent tokens, found with bounded memory per executor.

    The scale problem: an exact term-frequency top-k needs a hash
    aggregate over the FULL vocabulary — fine until the vocabulary
    itself (URLs, ids, typos at 100 TB) outgrows executor memory. The
    classic fix is a two-phase sketch:

    1. Per-partition Misra-Gries summaries (``counters`` slots) via
       ``mapInPandas`` — the generator sees every Arrow batch of its
       partition, so one dict spans the partition; decrements happen at
       overflow, giving each summary the MG guarantee (undercount ≤
       n_partition/(counters+1)). Output is ≤ ``counters`` rows per
       partition, regardless of vocabulary size.
    2. The candidate set (union of all partial summaries, ≤
       counters x n_partitions rows) is re-counted EXACTLY with a
       semi-join + hash aggregate — sketch error never reaches the
       reported numbers; the sketch only bounds which terms are
       *considered*. A true top-k term is missed only if it fell out of
       every partition's summary, impossible when its global frequency
       exceeds N/(counters+1) (sum the per-partition MG bounds).

    Output: (term, n_occurrences), count-desc with term tie-break —
    deterministic, and exact whenever the frequency floor above holds
    (Zipfian corpora clear it by orders of magnitude). All counting is
    JVM-side; only the bounded summaries cross the Python boundary.
    """
    import pandas as pd

    toks = (
        ensure_parallelism(df)
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
        .where(F.length("term") >= min_len)
    )

    n_slots = counters

    def mg_summary(batches):
        counts: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counts:
                    counts[t] += 1
                elif len(counts) < n_slots:
                    counts[t] = 1
                else:
                    # decrement-all step, amortized via dict rebuild
                    counts = {u: c - 1 for u, c in counts.items() if c > 1}
        if counts:
            yield pd.DataFrame({"term": list(counts.keys())})

    candidates = toks.mapInPandas(mg_summary, "term string").distinct()
    # exact re-count of candidates only; AQE broadcasts the candidate
    # side when small, falls back to shuffle when counters*partitions
    # is genuinely large
    exact = (
        toks.join(candidates, "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return exact.orderBy(F.desc("n_occurrences"), "term").limit(k)


GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_ratio": 0.8,
    "min_stopword_hits": 2,
}


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", §A1.1 — the
    repetition rules live in ``repetition_stats``): per-doc rule
    metrics plus the conjunctive ``passes`` verdict.

    - word count within ``[min_words, max_words]``
    - mean word length within ``[min_mean_word_len, max_mean_word_len]``
    - symbol-to-word ratio (``#`` / ``...``) ≤ ``max_symbol_word_ratio``
    - fraction of words containing an alphabetic char ≥
      ``min_alpha_word_ratio``
    - at least ``min_stopword_hits`` stopword occurrences

    Everything is a JVM-side expression over the token array (split /
    filter / aggregate / regexp) — one scan, zero shuffles, zero
    Python; the 100 TB cost is the read. The metric columns surface so
    the filter is auditable (which rule killed a doc), the pretraining
    dashboard staple."""
    t = {**GOPHER_DEFAULTS, **thresholds}
    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    w = tokens(F.col(text_col))
    n_words = F.size(w)
    char_sum = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.round(
        char_sum.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), F.lit(0))
    )
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    alpha_ratio = F.round(
        n_alpha.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    stop_hits = F.size(F.filter(w, lambda x: F.lower(x).isin(STOPWORDS)))
    symbol_ratio = F.round(
        n_symbols.cast("double") / F.nullif(n_words.cast("double"), F.lit(0.0)), 6
    )
    passes = (
        (n_words >= t["min_words"])
        & (n_words <= t["max_words"])
        & (mean_wl >= t["min_mean_word_len"])
        & (mean_wl <= t["max_mean_word_len"])
        & (symbol_ratio <= t["max_symbol_word_ratio"])
        & (alpha_ratio >= t["min_alpha_word_ratio"])
        & (stop_hits >= t["min_stopword_hits"])
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        passes.alias("passes"),
    )


# C4 cleaning (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning with a Unified Text-to-Text Transformer", §2.2). The
# published bad-word filter uses the "List of Dirty, Naughty, Obscene
# …" wordlist; a tiny deterministic stand-in ships here — swap in the
# real list via the ``bad_words`` parameter.
C4_BAD_WORDS = ("obscenity", "slur")

C4_TERMINAL_RE = r'[.!?"]\s*$'


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020 §2.2), the other
    canonical pretraining filter next to ``gopher_quality``:

    line level (the ``cleaned_text`` output keeps only lines that):
      - end in a terminal punctuation mark (``. ! ? "``),
      - contain at least ``min_line_words`` words,
      - do not contain the word "javascript" (case-insensitive);
    page level (the conjunctive ``passes`` verdict):
      - at least ``min_sentences`` sentences survive the line filter
        (sentence ≈ terminal-punct occurrence, C4's own proxy),
      - no "lorem ipsum", no curly brace ``{``,
      - no word from the bad-word list.

    Everything is JVM-side codegen (split / filter / regexp) — one
    scan, zero shuffles, zero Python; per-rule metric columns surface
    so the filter is auditable. The DuckDB oracle replays every rule
    with list lambdas (``c4_clean_docs`` driver query)."""
    lines = F.split(F.col(text_col), "\n")

    def line_ok(line):
        return (
            line.rlike(C4_TERMINAL_RE)
            & (F.size(F.split(F.trim(line), " ")) >= min_line_words)
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    cleaned = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), F.lit(0)))
    low = F.lower(F.col(text_col))
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    has_bad = F.exists(
        F.split(low, r"[\s\n]+"), lambda x: x.isin(*bad_words)
    )
    passes = (
        (n_sent >= min_sentences) & ~has_lorem & ~has_brace & ~has_bad
    )
    return df.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_bad_word"),
        cleaned.alias("cleaned_text"),
        passes.alias("passes"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance scores for one query over the corpus
    (Robertson & Zaragoza 2009, with Lucene's non-negative idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``) — the lexical-retrieval
    baseline every RAG/data-curation stack keeps next to embedding
    search. Returns ``(id, n_terms_hit, score)`` for every document
    containing at least one query term.

    Shape, and why it holds at 100 TB: term frequencies collapse to
    per-(doc, term) rows with ONE map-side-combined aggregate over the
    exploded tokens, but only AFTER filtering to the query's terms —
    the explode stream drops to ~|q| rows per doc before anything
    shuffles (a corpus-wide tf table would be the LM posture; a
    single query never needs it). Document lengths are a second
    map-side agg; document frequencies aggregate over the
    already-collapsed (doc, term) rows; N and avgdl are two scalars
    joined in as literals. Everything is JVM codegen."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "),
        lambda x: x.isin(*q),
    )
    dl = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("double").alias("__dl"),
        toks.alias("__qt"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
    tf = (
        dl.select(F.col(id_col), "__dl", F.explode("__qt").alias("__t"))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "__t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.round(F.sum(term_score), 6).alias("score"),
        )
    )
