"""Distributed BPE tokenizer training — the word-frequency formulation.

The naive BPE loop re-scans the corpus once per merge; the scalable
formulation (the one real tokenizer trainers use) touches the corpus
EXACTLY ONCE:

1. one scan → word-frequency table (groupBy word, count) — corpus-sized
   work happens here and only here;
2. each merge iteration runs on the |vocab|-sized table: count
   frequency-weighted adjacent symbol pairs (explode + hash aggregate),
   take the argmax, splice the winning pair in every word's symbol
   string. At 100 TB the corpus scan dominates and the merge loop cost
   is independent of corpus size (vocab is bounded by distinct words).

Spark shape per iteration: one explode+agg over |vocab| rows, one
1-row collect (the argmax — the only driver action), one codegen
``regexp_replace`` to apply the merge. Lineage is cut with
``localCheckpoint`` every few merges so plan depth stays constant.
Everything is deterministic: ties on pair frequency break on the pair
string, so the merge sequence is reproducible across partitionings and
engines (pinned against a pure-Python reference in
``tests/test_llmdata.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan → (symbols, n) where symbols is the word spelled
    as space-separated characters plus the end-of-word marker."""
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.length("w") > 0)
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # "low" -> "l o w </w>"
    symbols = F.concat(
        F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" " + END)
    )
    return wf.select(symbols.alias("symbols"), "n")


def _pair_counts(wf: DataFrame) -> DataFrame:
    syms = F.split(F.col("symbols"), " ")
    # guard: a fully-merged word has ONE symbol and sequence(1, 0)
    # would count DOWN (same trap as dedup.shingles)
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wf.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("count"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    checkpoint_every: int = 8,
) -> list[tuple[str, int]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge list as
    (pair, weighted_count). Each merge costs one |vocab|-table aggregate
    and a single-row collect; the corpus is never re-read."""
    wf = _word_freq(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, int]] = []
    for it in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, count = top[0]["pair"], top[0]["count"]
        merges.append((pair, count))
        a, b = pair.split(" ")
        # splice "a b" -> "ab" on symbol boundaries; tokens are regex-
        # quoted because corpus characters can be regex metacharacters
        pat = rf"(?<=^|\s)\Q{a}\E \Q{b}\E(?=\s|$)"
        # Spark regex (Java) supports \Q..\E and lookarounds; the
        # replacement is literal, $ and \ escaped
        repl = (a + b).replace("\\", "\\\\").replace("$", "\\$")
        wf = wf.select(
            F.regexp_replace(F.col("symbols"), pat, repl).alias("symbols"), "n"
        )
        if (it + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint(eager=True)
    return merges


def bpe_segment(token: str, merges: list[tuple[str, int]]) -> list[str]:
    """Apply a learned merge list to one word (reference/driver-side
    helper for tests and vocabulary inspection — batch encoding at scale
    would precompute the vocab into a codegen longest-match, as
    ``text.bpe_ish_token_count`` approximates)."""
    syms = list(token) + [END]
    for pair, _ in merges:
        a, b = pair.split(" ")
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str = "bpe_tokens",
) -> DataFrame:
    """Distributed BPE encoding with the learned merge list, via
    distinct-word memoization: BPE is a pure function of the WORD, so
    each distinct word is encoded exactly once (Arrow-batched pandas
    UDF over the |vocab|-sized table) and the corpus gets its pieces
    back through a join — encoding cost is ∝ |vocab|, not corpus
    tokens. The corpus-sized work is two explode passes (vocabulary
    extraction, then the join-back + grouped reassembly) — both plain
    codegen scans; materializing the exploded corpus to save the
    second pass would cost more than it saves at any scale. This is
    the memoization every production tokenizer
    pipeline applies; a per-token UDF over the corpus would repeat the
    merge loop for every occurrence of "the".

    Returns (id_col, ``token_col`` array<string>, ``n_tokens``). Word
    order is preserved via posexplode + an array_sort on (pos, pieces)
    structs. The word→pieces side is vocabulary-sized — typically
    broadcastable; left to AQE rather than forced, since a 100 TB
    corpus's vocabulary can exceed the broadcast threshold and the
    shuffle join on the word is then the right plan."""
    from pyspark.sql.functions import pandas_udf

    # legacy (annotation-free) pandas_udf form: this module has
    # ``from __future__ import annotations``, which stringifies type
    # hints and breaks hint-inferred eval types (same trap documented
    # in functions/aggregates.py). merges ride into the executors once
    # per task via the closure.
    enc = pandas_udf(
        lambda words: words.map(lambda w: bpe_segment(w, merges)),
        "array<string>",
    )

    words = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
        )
        .where(F.length("w") > 0)
    )
    encoded = words.select("w").distinct().withColumn("pieces", enc(F.col("w")))
    grouped = (
        words.join(encoded, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias(token_col)
        )
    )
    # wordless documents (empty/whitespace text) have no exploded rows
    # and would silently vanish from an inner reassembly — a row-count
    # contract violation; rejoin to the id set so they surface with
    # zero tokens (the join is aggregate-sized, one extra id shuffle)
    return (
        df.select(id_col)
        .distinct()
        .join(grouped, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col(token_col), F.array().cast("array<string>")
            ).alias(token_col),
        )
        .withColumn("n_tokens", F.size(F.col(token_col)))
    )
