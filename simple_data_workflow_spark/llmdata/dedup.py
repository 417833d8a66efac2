"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the 100 TB story):
- **exact**: groupBy(key) + min(id) — one shuffle on the dedup key,
  map-side partial aggregation; never a global sort.
- **ngram-jaccard**: exact pairwise similarity is O(n²) — only run the
  all-pairs form under a row-count guard; above it, MinHash+LSH produces
  candidate pairs (banding → only colliding docs meet) and the exact
  Jaccard verifies candidates. The shuffle is on (band, band-hash), i.e.
  proportional to candidates, not n².
- **simhash**: 64-bit signature per doc from per-token hash bit-voting;
  near-dups = signatures equal on all-but-k bands — joinable, linear.
- **embedding cosine**: see ``llmdata.similarity`` (LSH-bucketed path).

Hashing note: shingle/token hashing uses xxhash64 (JVM-side, seeded) for
the LSH internals — cross-engine parity is not needed for candidate
generation because the *verified* output is exact Jaccard, which IS
engine-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_data_workflow_spark.session import ensure_parallelism


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row id per exact key: min(id) per group.

    Equivalent to row_number()==1 but cheaper: a partial-aggregating
    groupBy instead of a per-group sort window.
    """
    return df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col)).select(id_col, *key_cols)


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as a distinct array (codegen-side).

    Documents shorter than k words produce an empty array (guarded:
    ``sequence(0, negative)`` would otherwise count DOWN)."""
    w = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(w) - F.lit(k))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(off + 1)) for off in range(k)])
    )
    return F.when(F.size(w) >= k, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """|a∩b| / |a∪b|; NULL when both sets are empty (the nullif guard
    keeps ANSI mode from raising DIVIDE_BY_ZERO on degenerate docs).

    array_intersect appears ONCE in the tree (|a∪b| = |a|+|b|-|a∩b|
    would duplicate it and Catalyst inlines within a projection);
    array_union is the second — two set ops total, each evaluated once.
    Hot-path callers (``ngram_jaccard_pairs``) hoist the intersect size
    into a prior projection instead."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / F.nullif(union, F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
    max_rows_all_pairs: int = 20_000,
    mode: str = "auto",
) -> DataFrame:
    """Pairs (id_a, id_b, jaccard) with k-gram Jaccard ≥ threshold.

    ``mode='exact'``: all-pairs (range-join on id to halve the matrix) —
    O(n²), caller asserts the scale. ``mode='lsh'``: MinHash/LSH
    candidates first, exact Jaccard verification after — same output
    contract, candidate recall < 1 traded for linear scaling, and no
    action runs while the plan is built. ``mode='auto'`` (default,
    interactive use) spends ONE ``count()`` to pick a side of
    ``max_rows_all_pairs``.
    """
    if mode not in ("auto", "exact", "lsh"):
        raise ValueError(f"mode must be 'auto', 'exact' or 'lsh', got {mode!r}")
    if mode == "auto":
        mode = "exact" if df.count() <= max_rows_all_pairs else "lsh"
    sh = ensure_parallelism(df).select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    if mode == "exact":
        a = sh.alias("a")
        b = sh.alias("b")
        pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        cand = minhash_lsh_candidates(df, id_col=id_col, text_col=text_col, k=k)
        a = sh.alias("a")
        b = sh.alias("b")
        pairs = (
            cand.join(a, cand.id_a == F.col(f"a.{id_col}"))
            .join(b, cand.id_b == F.col(f"b.{id_col}"))
        )
    # two projections so the expensive array_intersect is evaluated once
    # per pair (Catalyst inlines duplicated exprs within one projection
    # but CollapseProject spares multiply-referenced non-cheap ones)
    sized = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double").alias("__i"),
        (F.size(F.col("a.sh")) + F.size(F.col("b.sh"))).cast("double").alias("__sz"),
    )
    out = sized.select(
        "id_a",
        "id_b",
        F.round(
            F.col("__i") / F.nullif(F.col("__sz") - F.col("__i"), F.lit(0.0)), 6
        ).alias("jaccard"),
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """The LSH banding index: one (id, band, bucket) row per document
    per band. Extracted so the A/B evidence script measures the SAME
    pipeline the candidate join runs (``scripts/minhash_ab.py`` counts
    bucket-collision volume from this index; an inline copy would
    silently diverge when the hashing changes)."""
    rows_per_band = num_hashes // bands
    exploded = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("__g"))
        .select(id_col, F.xxhash64(F.col("__g")).alias("__h"))
    )
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(s), F.col("__h"))).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    )
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.col(f"m{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: docs sharing any (band, band-signature) bucket become a
    candidate pair. Shuffle key = (band, hash(band slice)) — collision
    volume, not n². Output: distinct (id_a, id_b).

    Signatures via explode + ONE codegen hash aggregate: each shingle is
    string-hashed once, every stream minimum is a MIN() expression over
    the exploded (doc, hash) rows — whole-stage codegen end to end,
    replacing ``num_hashes`` interpreted array folds per row. Explode
    keeps a doc's shingles co-located, so the aggregate merge shuffles
    one partial row of ``num_hashes`` longs per doc. Shingle-less docs
    (< k words) drop out: they cannot be shingle near-dups and would
    otherwise all meet in one degenerate bucket."""
    banded = (
        minhash_band_index(
            df, id_col=id_col, text_col=text_col, k=k,
            num_hashes=num_hashes, bands=bands,
        )
        # the LSH index is materialized once: the self-join would otherwise
        # recompute every shingle/minhash on BOTH sides (2× the whole
        # signature cost). Size is n_docs × bands rows of (id, int, int).
        .persist()
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def _simhash_sigs(
    df: DataFrame, id_col: str, text_col: str, token_hash, n_bits: int
) -> DataFrame:
    """(id, sig) SimHash signatures via explode + ONE codegen hash
    aggregate: per-bit votes are ``n_bits`` SUM(CASE) expressions over
    the exploded (doc, token-hash) rows, all inside whole-stage codegen.

    A per-row array-fold form would evaluate ``n_bits`` INTERPRETED
    ``aggregate()`` lambdas per document — ~n_bits×tokens boxed ops/row
    (that shape survives only as the brute-force oracle in
    tests/test_llmdata.py); this shape replaces it with a single hash aggregate
    whose shuffle is one partial row of ``n_bits`` longs per doc per
    partition (explode keeps a doc's tokens co-located, so the merge is
    nearly free). Exact same signatures: votes are order-insensitive
    integer sums.
    """
    toks = F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("__tok")
    hashed = ensure_parallelism(df).select(F.col(id_col), toks).select(
        id_col, token_hash(F.col("__tok")).alias("__h")
    )
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.col("__h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"__v{b}")
            for b in range(n_bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        bit = F.when(F.col(f"__v{b}") > 0, F.lit(1)).otherwise(F.lit(0))
        # shiftleft(1, 63) wraps to Long.MIN_VALUE — the sign bit
        sig = sig + bit.cast("long") * F.shiftleft(F.lit(1).cast("long"), b)
    return votes.select(id_col, sig.alias("sig"))


def simhash_near_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dups = SimHash signatures within ``max_hamming`` bits.

    Band count is DERIVED from the threshold: ``max_hamming + 1`` bands
    of ~``64/(max_hamming+1)`` bits each, so by pigeonhole any pair with
    ≤ max_hamming differing bits shares at least one identical band —
    recall is exactly 1 by construction (an exact Hamming filter via
    bit_count(xor) removes band-collision false positives). More bands
    ⇒ narrower chunks ⇒ more collisions: callers trade threshold
    leniency for candidate volume explicitly, never silently losing
    recall."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_bands = max_hamming + 1
    sig = _simhash_sigs(df, id_col, text_col, lambda t: F.xxhash64(t), 64)

    def chunk(b: int) -> Column:
        start = b * 64 // n_bands
        width = (b + 1) * 64 // n_bands - start
        if width >= 64:
            return F.col("sig")
        # arithmetic shiftright sign-extends; the mask strips the fill
        mask = (1 << width) - 1
        return F.shiftright("sig", start).bitwiseAND(F.lit(mask))

    bands = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), chunk(b).alias("chunk"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.chunk")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: drop corpus docs whose normalized
    fingerprint appears in the benchmark set (exact-match stage of an
    eval-leakage filter; the near-dup stage reuses minhash/jaccard).

    Broadcast anti-join on md5 fingerprints — the benchmark side is
    small by construction; the corpus streams through unshuffled.
    """
    from simple_data_workflow_spark.llmdata.text import fingerprint

    tainted = benchmark.select(fingerprint(F.col(text_col)).alias("__fp")).distinct()
    marked = corpus.withColumn("__fp", fingerprint(F.col(text_col)))
    return marked.join(F.broadcast(tainted), "__fp", "left_anti").drop("__fp")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    keep_of: int = 5,
    keep: int = 1,
) -> DataFrame:
    """Deterministic stratified downsampling: keep ``keep``/``keep_of`` of
    every stratum, chosen by a hash of (stratum, id) — reproducible under
    any partitioning/retry (unlike ``sample()``'s per-partition RNG), and
    a pure filter: no shuffle at all.

    Hashing the stratum INTO the selection key decorrelates selection
    from raw id structure: the keep ratio holds per stratum even when ids
    are assigned in blocks per stratum (a plain ``id % keep_of`` keeps
    0% or 100% of such a block). md5 (not xxhash64) so the DuckDB oracle
    can reproduce the exact selection; the first 8 hex chars (32 bits)
    are plenty of entropy for a modulus draw.

    A NULL stratum is a real stratum: it is keyed by the sentinel
    ``'\\x00null'`` (a NUL byte cannot appear in real text keys), NOT
    silently skipped — ``concat_ws`` alone would hash such rows on the
    id only, while a SQL twin's ``col || '|' || id`` would drop them
    (NULL-propagating), a cross-engine divergence. Oracle twins must
    apply ``coalesce(col, chr(0) || 'null')`` identically.
    """
    stratum = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00null"))
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", stratum, F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return df.where(F.pmod(bucket, F.lit(keep_of)) < keep)


def minhash_md5_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Per-stream universal-hash coefficients ``(a_s, b_s)`` for the
    md5 MinHash family, derived from md5 of the stream index so the
    ``num_hashes`` streams are decorrelated (tiny sequential multipliers
    like ``2s+1`` make the streams strongly correlated, degrading
    min-wise independence and LSH candidate recall). Pure integer
    arithmetic over p = 2^31-1; any engine reproduces the constants by
    embedding them as literals (see MINHASH_MD5_SQL in the entry)."""
    import hashlib

    p = 2_147_483_647
    out = []
    for s in range(num_hashes):
        a = int(hashlib.md5(f"minhash-a-{s}".encode()).hexdigest()[:8], 16) % (p - 1) + 1
        b = int(hashlib.md5(f"minhash-b-{s}".encode()).hexdigest()[:8], 16) % p
        out.append((a, b))
    return out


def minhash_md5_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicates with an ENGINE-PORTABLE hash family.

    ``minhash_lsh_candidates`` uses xxhash64 (fast, but the seeding is
    engine-internal, so no external oracle can reproduce it). This twin
    hashes each shingle ONCE with md5 (32 bits via the first 8 hex
    chars) and derives the ``num_hashes`` min-hash streams with linear
    mixes ``((h mod p)·a_s + b_s) mod p`` (p = 2^31-1; a_s/b_s are
    md5-derived per-stream constants, ``minhash_md5_coeffs``, so the
    streams are decorrelated) — every step is plain integer/md5
    arithmetic any engine reproduces bit-for-bit, making the full LSH
    pipeline oracle-checkable end to end. The ``h mod p`` pre-reduction
    keeps ``h·a`` under 2^62 (no 64-bit overflow on either engine).
    Banding (``num_hashes/bands`` rows per band, string bucket key)
    produces candidates; exact Jaccard over the shingle sets verifies
    them. Same banded-join scale shape as the xxhash64 path; md5 costs
    more per shingle, which is why the engine-seeded variant remains the
    default perf path.

    The banded LSH index is ``persist()``-ed (the self-join would
    otherwise recompute every signature on both sides) and stays cached
    until LRU eviction — callers running many corpora in one session can
    reclaim it eagerly with ``spark.catalog.clearCache()``.
    """
    p = 2_147_483_647
    coeffs = minhash_md5_coeffs(num_hashes)
    rows_per_band = num_hashes // bands
    base = ensure_parallelism(df).select(
        F.col(id_col), shingles(F.col(text_col), k).alias("sh")
    # shingle-less docs (shorter than k words) can't be near-dups and
    # would all share one degenerate empty-bucket key — drop them here
    ).where(F.size("sh") > 0)
    # same explode + single codegen hash aggregate shape as the xxhash64
    # path: one md5 per shingle, stream minima as MIN() expressions
    exploded = base.select(
        id_col, F.explode("sh").alias("__g")
    ).select(
        id_col,
        F.conv(F.substring(F.md5(F.col("__g")), 1, 8), 16, 10).cast("long").alias("__h"),
    )
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min(
                ((F.col("__h") % F.lit(p)) * F.lit(a) + F.lit(b)) % F.lit(p)
            ).alias(f"m{s}")
            for s, (a, b) in enumerate(coeffs)
        ]
    )
    banded = (
        sig.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"m{b * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        )
        .select(id_col, "bb.band", "bb.bucket")
        .persist()
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh_side = base
    sa, sb = sh_side.alias("sa"), sh_side.alias("sb")
    sized = (
        cand.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh"))).cast("double").alias("__i"),
            (F.size(F.col("sa.sh")) + F.size(F.col("sb.sh"))).cast("double").alias("__sz"),
        )
    )
    out = sized.select(
        "id_a",
        "id_b",
        F.round(F.col("__i") / F.nullif(F.col("__sz") - F.col("__i"), F.lit(0.0)), 6).alias(
            "jaccard"
        ),
    )
    return out.where(F.col("jaccard") >= threshold)


def simhash_md5_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bits: int = 60,
) -> DataFrame:
    """SimHash near-dups with an ENGINE-PORTABLE hash: the oracle twin of
    ``simhash_near_dups`` (whose xxhash64 seeding no external engine can
    reproduce).

    Token hash = first 15 md5 hex chars → 60 bits, deliberately below
    the BIGINT sign bit so shifts/XOR behave identically everywhere.
    Same construction otherwise: per-bit ±1 voting → sign bits →
    ``max_hamming+1`` derived bands (pigeonhole recall 1) → banded
    candidate join → exact ``bit_count(xor)`` filter. Signatures come
    from the shared explode+hash-aggregate shape (``_simhash_sigs``):
    one md5 per token, votes as codegen SUM(CASE) expressions.

    The banded signature index is ``persist()``-ed for the self-join and
    stays cached until LRU eviction — reclaim eagerly with
    ``spark.catalog.clearCache()`` when processing many corpora in one
    session."""
    if n_bits % (max_hamming + 1) != 0:
        raise ValueError("n_bits must divide evenly into max_hamming+1 bands")
    n_bands = max_hamming + 1
    width = n_bits // n_bands
    mask = (1 << width) - 1

    sig = _simhash_sigs(
        df,
        id_col,
        text_col,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        n_bits,
    )

    bands_df = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.chunk").persist()
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def _cluster_pairs_driver(spark, edges: DataFrame) -> DataFrame:
    """Capped driver twin of the distributed min-label loop: one Arrow
    transfer of the (symmetrized, already-materialized) edge list, then
    vectorized min-label propagation with pointer jumping in numpy —
    identical labels (cluster_id = min id reachable), no per-round Spark
    job latency. Only called by ``cluster_pairs`` under its edge cap."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    tab = edges.toArrow()
    src = tab.column("src").to_numpy(zero_copy_only=False)
    dst = tab.column("dst").to_numpy(zero_copy_only=False)
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)], inv[len(src):]
    # np.unique sorts ascending, so index order == id order and the
    # min-index label IS the min-id label for any orderable id type
    labels = np.arange(len(ids), dtype=np.int64)
    while True:
        prev = labels
        nl = labels.copy()
        np.minimum.at(nl, d, labels[s])  # one relax round over all edges
        while True:  # full pointer jumping to this round's fixpoint
            hop = nl[nl]
            if np.array_equal(hop, nl):
                break
            nl = hop
        if np.array_equal(nl, prev):
            break
        labels = nl
    out = pd.DataFrame({"id": ids, "cluster_id": ids[labels]})
    id_type = edges.schema["src"].dataType
    schema = StructType(
        [StructField("id", id_type, True), StructField("cluster_id", id_type, True)]
    )
    return spark.createDataFrame(out, schema=schema)


def cluster_pairs(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair list: every doc
    that appears in a pair gets the component's canonical label —
    ``cluster_id`` = the MINIMUM doc id in its component. Pair emitters
    (`minhash_*`, `simhash_*`, `ngram_jaccard_pairs`,
    ``similarity.cosine_near_dup_pairs``) give edges; real dedup keeps
    one doc per CLUSTER, not per pair — A~B, B~C must collapse {A,B,C}
    to A even when (A, C) was never emitted as a pair.

    Shape: min-label propagation with POINTER JUMPING to a fixpoint.
    Each round does (a) one hash-aggregate over the (symmetrized) edge
    list joined with the current labels — a neighbor's label can only
    lower yours — then (b) path halving, ``label ← label(label)``, one
    self-join that doubles how far a round reaches, so convergence is
    O(log diameter) rounds, not O(diameter) (a chained dup family of
    depth 17 converges in 5 rounds, measured, vs 18 without halving).
    Every shuffle is keyed on doc id, never a global sort; a
    ``localCheckpoint`` per round keeps the plan depth constant (the
    MICE lesson). The convergence probe is a single-row sum aggregate,
    monotonically decreasing, so termination is exact, not heuristic —
    and hitting ``max_iters`` without converging RAISES rather than
    returning silently-partial clusters (with halving, 20 rounds covers
    diameters past 2^19, so that is a guard, not a limit). Min-label is
    engine-portable: a recursive-CTE oracle reproduces the exact labels.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    # LAZY checkpoints: the convergence-probe aggregate right after is
    # the action that materializes them, so every round runs ONE job
    # (materialize + sum) instead of two (guide §1.2 — fewer passes)
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=False)
    # Size-gated driver fast path (the same capped-transfer-with-
    # distributed-fallback posture as the DV DML packed path): below
    # the cap the whole edge list is two integer columns small enough
    # to label in one vectorized numpy pass, where the distributed
    # loop pays O(log diameter) full Spark job round-trips mostly in
    # scheduler latency. Above the cap (the 100 TB posture — pair
    # lists scale with the corpus) nothing changes.
    # cap derives from the driver's actual memory budget (an edge is
    # two int64 cells ≈ 16 B plus Arrow/unique/label overhead; heap/2048
    # keeps the whole labeling pass a small fraction of the heap):
    # 8 GiB driver → 4M edges (the previously hardcoded value),
    # 2 GiB → 1M. The env override keeps the knob explicit for
    # deployments that know better.
    cap_env = os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGE_CAP")
    if cap_env is not None:
        cap = int(cap_env)
    else:
        from simple_data_workflow_spark.session import driver_memory_bytes

        cap = driver_memory_bytes(pairs.sparkSession) // 2048
    n_edges = edges.count()  # materializes the checkpoint either way
    if n_edges <= cap:
        return _cluster_pairs_driver(pairs.sparkSession, edges)
    labels = (
        edges.select(F.col("src").alias("id")).distinct().select("id", F.col("id").alias("cluster_id"))
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0]
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("__nbr"))
        )
        stepped = labels.join(nbr, labels.id == nbr.dst, "left").select(
            "id",
            F.least(F.col("cluster_id"), F.coalesce("__nbr", F.col("cluster_id"))).alias(
                "cluster_id"
            ),
        )
        # path halving: a label is itself a clustered node id (the min id
        # seen so far in the component), so chase one hop of labels —
        # label(label(id)) — turning O(diameter) rounds into O(log d)
        parent = stepped.select(
            F.col("id").alias("__pid"), F.col("cluster_id").alias("__plabel")
        )
        labels = (
            stepped.join(parent, stepped.cluster_id == parent.__pid, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("__plabel", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"cluster_pairs did not converge in {max_iters} rounds — component "
        "diameter beyond 2^{max_iters-1}; raise max_iters"
    )


def dedup_by_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep ONE doc per near-duplicate cluster: the minimum-id member.

    Because ``cluster_pairs`` labels every clustered doc with its
    component's min id, the kept set is simply {docs not in any pair}
    ∪ {docs whose id == their cluster label} — one anti-join of the
    corpus against the (tiny: one row per REMOVED doc) non-canonical
    label set. The corpus streams through unshuffled."""
    labels = cluster_pairs(pairs, id_a=id_a, id_b=id_b)
    doomed = labels.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(doomed, id_col, "left_anti")


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop corpus docs sharing ≥ ``min_hits`` distinct word n-grams with
    a benchmark/eval set — overlap-based decontamination (the method
    used for GPT-3-style training-set hygiene), catching partial
    inclusions that the exact-fingerprint ``decontaminate`` misses.

    Shape: both sides explode to distinct n-gram md5 fingerprints (md5:
    engine-portable for the oracle). The benchmark gram set is small by
    construction (eval sets are), so the probe is a BROADCAST semi-join
    — the corpus grams never shuffle; with ``min_hits > 1`` the matches
    take one partial-aggregating count per doc. The final anti-join
    keys on the (small) contaminated-id set, also broadcast-eligible —
    the corpus itself streams through unshuffled either way.
    """
    def gram_fps(text: Column) -> Column:
        return F.transform(shingles(text, n), lambda g: F.substring(F.md5(g), 1, 16))

    bench_grams = benchmark.select(
        F.explode(gram_fps(F.col(text_col))).alias("__g")
    ).distinct()
    corpus_grams = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(gram_fps(F.col(text_col))).alias("__g")
    )
    hit = corpus_grams.join(F.broadcast(bench_grams), "__g", "left_semi")
    if min_hits <= 1:
        contaminated = hit.select(id_col).distinct()
    else:
        contaminated = (
            hit.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__hits"))
            .where(F.col("__hits") >= min_hits)
            .select(id_col)
        )
    return corpus.join(contaminated, id_col, "left_anti")


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    bits_per_gram: int = 10,
    n_hashes: int = 7,
) -> DataFrame:
    """``ngram_decontaminate`` with a Bloom-filter prefilter — the
    FEASIBILITY path when the benchmark gram set is too large to
    broadcast as strings (a 1 B-gram eval suite is ~30 GB of md5
    fingerprints but only ~1.25 GB of Bloom bits at 10 bits/gram,
    fpp≈0.8%). When the benchmark DOES fit a broadcast, use the exact
    path: profiled at the 8x local rung (1.9 M corpus grams, 2.4 k
    bench grams), the Arrow bitmap probe costs about the same per gram
    as the JVM broadcast-hash semi-join (10.0 s vs 9.1 s stage time),
    so the prefilter+confirm structure only adds passes — bloom wins
    nothing on speed at small benchmark sizes, by measurement, and is
    ~2x slower end-to-end there. Its niche is the regime where the
    exact broadcast cannot exist.

    Result is EXACTLY equal to ``ngram_decontaminate`` (same oracle):
    Bloom filters have no false negatives, and every Bloom candidate is
    re-verified by the exact broadcast semi-join — run only over the
    (tiny) candidate slice of the corpus, where the gram set fits
    because the candidate slice's contaminating grams are
    benchmark-overlap-sized.

    Shape, in order:
    1. benchmark grams → 2 base hashes → ``n_hashes`` bit positions via
       Kirsch-Mitzenmacher double hashing ((h1 + i*h2) mod m), all
       JVM-side (seeded xxhash64, both bases pre-reduced mod m so the
       arithmetic never overflows ANSI longs); ONE collect of the
       distinct position list (benchmark-sized) builds the bitmap
       driver-side via ``np.bitwise_or.at`` (unbuffered scatter — plain
       fancy-index ``|=`` silently drops bits on duplicate byte
       indices), shipped once per executor via ``sc.broadcast`` — it
       rides the broadcast, never the query plan (a multi-MB plan
       literal would blow up codegen).
    2. corpus grams → the same 2 JVM-side base hashes, gram string
       dropped in the projection (rows queued around the Python node
       carry every retained column — keeping the text would push it
       through that queue just to be discarded) → Arrow-batched pandas
       UDF re-derives the k positions in numpy and does the vectorized
       bitmap probe. The corpus never shuffles: explode + probe +
       local distinct-per-doc only.
    3. Bloom-surviving GRAMS (not docs) → exact confirm via a SHUFFLE
       semi-join of their 64-bit fingerprints (xxhash64, carried
       through the probe as one extra int64 — 8 B/gram in the Arrow
       queue) against the benchmark gram fingerprints. Confirming only
       the surviving grams is exact: Bloom has no false negatives, so
       every truly-matching gram occurrence reaches the confirm and the
       per-doc ``min_hits`` occurrence count equals
       ``ngram_decontaminate``'s. The corpus is never re-scanned,
       re-grammed, or shuffled — confirm volume is surviving grams
       (true contaminations + fpp x corpus grams) + one pass of
       benchmark grams. NOT a broadcast on either side: in the regime
       where bloom earns its keep, the benchmark gram set cannot be
       broadcast as strings; when it IS small (the tested regime), AQE
       converts the declared shuffle join to a broadcast at runtime —
       optimizer's choice, not a baked-in hint.

    At 100 TB: corpus-side cost is one codegen gram/hash projection and
    a memory-speed bitmap probe per gram; shuffle volume is the
    surviving-gram fingerprints plus one scan-and-shuffle of the
    benchmark grams in the confirm. Doc-match guarantee is the same
    class as the exact path's md5-16 fingerprints: a false doc match
    needs a 64-bit hash collision (~2^-64 per gram pair).
    """
    import numpy as np

    def gram_fps(text: Column) -> Column:
        return shingles(text, n)

    bench_grams = benchmark.select(
        F.explode(gram_fps(F.col(text_col))).alias("__g")
    ).distinct()
    # size the filter off the benchmark (one count over the small side)
    n_grams = bench_grams.count()
    m_bits = max(64, n_grams * bits_per_gram)

    # Kirsch-Mitzenmacher double hashing: all n_hashes positions derive
    # from TWO base hashes as (h1 + i*h2) mod m, so the corpus side ships
    # 2 int64 columns to the probe instead of n_hashes (the Arrow
    # transfer is the probe's dominant cost). Both hashes pre-reduced mod
    # m so h1 + i*h2 can't overflow ANSI-mode long arithmetic.
    def base_hash_cols(col: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m_bits)).alias("h1"),
            F.pmod(F.xxhash64(col, F.lit(2)), F.lit(m_bits)).alias("h2"),
        ]

    def km_positions(h1: Column, h2: Column) -> Column:
        return F.array(
            *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(n_hashes)]
        )

    pos_rows = (
        bench_grams.select(*base_hash_cols(F.col("__g")))
        .select(F.explode(km_positions(F.col("h1"), F.col("h2"))).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    pos = np.fromiter((r["p"] for r in pos_rows), dtype=np.int64, count=len(pos_rows))
    # unbuffered scatter: plain `bitmap[idx] |= v` loses bits on duplicate
    # byte indices (gather-or-scatter is last-write-wins per unique index)
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(bitmap.tobytes())

    from pyspark.sql.functions import pandas_udf

    # struct input → the UDF receives a flat pandas DataFrame: Arrow
    # ships exactly two plain int64 columns per gram; numpy re-derives
    # the n_hashes positions. (A first cut shipped array<bigint> of all
    # positions per gram — the transfer volume made the probe slower
    # than the exact join at the 8x rung.)
    m = m_bits
    k = n_hashes

    @pandas_udf("boolean")
    def might_contain(hashes):
        import pandas as pd

        bm = np.frombuffer(bc.value, dtype=np.uint8)
        if len(hashes) == 0:
            return pd.Series([], dtype=bool)
        base = hashes.to_numpy()  # (rows, 2) int64
        # (rows, k) positions via double hashing — same formula as the
        # JVM-side bitmap build above
        mat = (base[:, 0:1] + np.arange(k, dtype=np.int64) * base[:, 1:2]) % m
        hit = (bm[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    # hash in a projection and DROP the gram string before the Python
    # node: rows buffered in the JVM queue around ArrowEvalPython carry
    # every retained column, so keeping '__g' would push the whole gram
    # text through that queue (hundreds of MB at the 8x rung) just to be
    # discarded after the filter
    corpus_hashes = (
        ensure_parallelism(corpus)
        .select(F.col(id_col), F.explode(gram_fps(F.col(text_col))).alias("__g"))
        .select(
            F.col(id_col),
            F.struct(*base_hash_cols(F.col("__g"))).alias("__h"),
            # 64-bit confirm fingerprint, seed disjoint from the bloom
            # bases — carried through the Arrow node (8 B/gram) so the
            # confirm never has to re-scan/re-gram the corpus
            F.xxhash64(F.col("__g"), F.lit(3)).alias("__fp"),
        )
    )
    bloom_hits = corpus_hashes.where(might_contain(F.col("__h"))).select(
        id_col, "__fp"
    )
    # exact confirm over the surviving gram occurrences only. Bloom has
    # no false negatives, so every truly-matching occurrence is present
    # and the min_hits count matches ngram_decontaminate's; false
    # positives die in the semi-join. Declared SHUFFLE join, no
    # broadcast hint on either side: this path exists precisely for
    # benchmarks too large to broadcast, and AQE re-plans it as a
    # broadcast at runtime whenever the benchmark side is in fact small.
    bench_fps = bench_grams.select(
        F.xxhash64(F.col("__g"), F.lit(3)).alias("__fp")
    ).distinct()
    confirmed = bloom_hits.join(bench_fps, "__fp", "left_semi")
    if min_hits <= 1:
        contaminated = confirmed.select(id_col).distinct()
    else:
        contaminated = (
            confirmed.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__hits"))
            .where(F.col("__hits") >= min_hits)
            .select(id_col)
        )
    return corpus.join(contaminated, id_col, "left_anti")


def drop_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Line-level dedup across the corpus: delete every line that occurs
    in ≥ ``min_docs`` DISTINCT documents (headers, footers, cookie
    banners, nav chrome — the pre-training boilerplate pass), keeping
    each document's remaining lines in their original order.

    Shape: posexplode to (doc, pos, line) → the boilerplate set is one
    two-level aggregate (distinct (line, doc) partial, then count per
    line) → a plain shuffle anti-join on the line value (the boilerplate
    set is corpus-sized in the worst case, so it is NOT broadcast) → one
    hash-aggregate per doc re-assembles survivors with
    ``array_sort(collect_list(struct(pos, line)))`` — per-doc arrays,
    bounded by document size, never a global sort. Docs whose every
    line was boilerplate come back as empty strings (kept: dropping
    them is a filter decision for the caller)."""
    lines = ensure_parallelism(df).select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    boiler = (
        lines.select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .where(F.col("__docs") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic data mixing: each source/stratum keeps its OWN
    fraction of rows (e.g. upweight wiki, downweight crawl) — the
    per-source sampling-rate step of a pretraining mixture. Strata
    missing from ``rates`` keep ``default_rate``.

    Selection draws a uniform u ∈ [0,1) from md5(stratum|id) — exactly
    the ``stratified_sample`` construction (reproducible under any
    partitioning/retry, decorrelated from id block structure,
    engine-portable for the oracle, NULL stratum keyed by the
    ``'\\x00null'`` sentinel) — generalized from a k-of-n modulus to an
    arbitrary per-stratum fraction: keep iff u < rate. u is a 32-bit
    integer over 2^32 and every rate is a double literal baked into one
    codegen CASE chain, so the comparison is bit-identical on any
    engine. A pure stateless filter: no shuffle, no action.

    Rates must lie in [0, 1]: replication (rate > 1) is packing's job,
    not sampling's."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    stratum = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00null"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", stratum, F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(stratum == F.lit(s), F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    score_col: str | None = None,
) -> DataFrame:
    """Keep at most ``k`` rows per group — the per-domain/per-source CAP
    step of a pretraining mixture ("no more than 100k docs from any one
    domain"), complementing ``mixture_sample``'s rate-based thinning:
    rates scale each stratum, caps bound the heavy tail of a zipfian
    source distribution where no fixed rate fits both head and tail.

    With ``score_col``, keeps the k BEST rows (score descending — cap +
    quality selection in one pass); without, keeps a deterministic
    uniform sample via md5(id) order, so survivors are stable under
    reruns/retries and uncorrelated with id assignment order (a plain
    "first k by id" would bias toward the oldest crawl records).

    Shape: one ``row_number`` window partitioned by group — shuffle on
    the group key only, per-group sort bounded by group size, never a
    global sort. For zipfian domains the hot group lands on one task;
    that is inherent to exact per-group ranking (an approximate
    cap-by-rate for the head + exact tail is ``mixture_sample`` + this).
    Ties (equal scores) break on md5(id) then id — fully deterministic,
    engine-portable (DuckDB oracle: QUALIFY over the same ordering).
    """
    tag = F.md5(F.col(id_col).cast("string"))
    order = (
        [F.col(score_col).desc(), tag, F.col(id_col)]
        if score_col
        else [tag, F.col(id_col)]
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edit: int = 1,
) -> DataFrame:
    """String pairs within Levenshtein distance ``max_edit`` (1 or 2),
    found WITHOUT an all-pairs comparison — SymSpell-style
    deletion-variant blocking.

    The blocking identity (the SymSpell guarantee): if
    ``lev(a, b) ≤ d`` then the sets of strings reachable by deleting
    UP TO ``d`` characters from ``a`` and from ``b`` intersect — a
    substitution at position i makes both i-deletions equal; an
    insertion/deletion makes one string a deletion variant of the
    other; equality matches on s itself; and at d=2 every mixed case
    reduces to a shared double-deletion. So candidates come from an
    equi-join on the variant value, and every candidate is re-verified
    with the exact ``levenshtein`` — no false positives survive, and
    the blocking guarantee means no false negatives exist.

    All codegen: variants are built with ``sequence`` + ``transform`` +
    ``substring`` (no Python), exploded, and joined on the variant.
    Shuffle volume is rows × (len+1) variant keys at d=1 and
    rows × ~len²/2 at d=2 (round 10, VERDICT r9 #5 — still bounded and
    linear in rows, vs the n² of a naive cross join); at 100 TB this
    is the same explode-join-verify shape as the n-gram LSH paths.
    Variant groups are skew-bounded: a variant matches only strings
    within ``2·max_edit`` of each other, so group sizes track true
    near-duplicate density (plus hash-join AQE skew handling for
    pathological columns of near-identical strings).

    Output: (id_a, id_b, dist), id_a < id_b, distinct (a pair can meet
    under several shared variants — e.g. equal strings meet on every
    deletion — so this dedup is NOT structural, unlike the LSH probe
    masks).

    ``id_col`` must be a UNIQUE key of ``df`` (every caller passes a
    primary key). Pairs are deduped on bare ids BEFORE the strings
    re-attach by id; a duplicated id would re-multiply the joined-back
    strings and emit one row per copy, violating the distinct
    guarantee above.
    """
    if max_edit not in (1, 2):
        raise NotImplementedError(
            "deletion-variant blocking implemented for max_edit in (1, 2)"
        )
    s = F.col(text_col)
    # {s} ∪ deletions(s): element 0 is s itself, element i>0 deletes
    # char i. Empty strings guard the sequence (sequence(1, 0) counts
    # DOWN — the dedup.shingles trap) and contribute just {""}.
    deletions = F.when(
        F.length(s) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                F.substring(s, 1, (i - 1).cast("int")),
                s.substr(i + 1, F.length(s)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # array_distinct matters for join volume, not just tidiness: a run
    # of k equal characters (e.g. the zero-padding in synthetic keys)
    # yields k IDENTICAL deletion variants, and two near-dup strings
    # each carrying k copies meet k x k times in the join before the
    # pair distinct — quadratic fan-out on exactly the strings fuzzy
    # matching is pointed at. Measured 14 s -> ~2 s at sf0.1 customer.
    variants = F.concat(F.array(s), deletions)
    if max_edit == 2:
        # order-2 deletions: drop chars i < j in one pass — i's prefix,
        # the i..j gap, j's suffix. Outer sequence stops at len-1 so
        # the inner sequence(i+1, len) never counts DOWN (the
        # descending-sequence trap); strings shorter than 2 contribute
        # nothing extra.
        del2 = F.when(
            F.length(s) >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.length(s)),
                        lambda j: F.concat(
                            F.substring(s, 1, (i - 1).cast("int")),
                            s.substr(i + 1, (j - i - 1).cast("int")),
                            s.substr(j + 1, F.length(s)),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        variants = F.concat(variants, del2)
    variants = F.array_distinct(variants)
    # without this the whole verify stage inherits the source file's
    # partition count (1 for a small parquet) and a million levenshteins
    # run on one core — measured 8 s -> <1 s at sf0.1
    #
    # the join key is xxhash64(variant), not the variant string: the
    # exploded side shuffles 8 bytes per candidate key instead of a
    # near-full-length string (guide §2.3 — shuffle keys, not payloads).
    sides = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__id"),
            # generators must sit at the top level of a projection, so
            # explode first and hash in the next Project
            F.explode(variants).alias("__v"),
        )
        .withColumn("__v", F.xxhash64("__v"))
    )
    a, b = sides.alias("a"), sides.alias("b")
    # decide on small rows, attach the payload once (guide §8): the
    # variant join carries ONLY (id, variant-hash). A pair CAN meet
    # under several shared variants (equal strings share all; near-dup-
    # dense columns meet on ~len of them), so the candidate stream is
    # many times the true pair set (31.7M meets vs 4.08M pairs on the
    # sf0.1 d=2 customer bench). Deduping the bare (id_a, id_b) pairs
    # FIRST means the strings join back and the levenshtein verify runs
    # ONCE per distinct pair instead of once per meet. The re-attach
    # joins key on the row id — the planner broadcasts the (id, string)
    # projection when small and falls back to a shuffle keyed on ids
    # (pair-set-sized, never meet-sized) when it is not.
    # The verify is levenshtein WITH the threshold argument: the banded
    # O(d·n) DP instead of the full O(n²) table, returning -1 past the
    # bound — exact for every surviving row, so a hash COLLISION only
    # adds a candidate pair the verify then drops: no false negatives,
    # no surviving false positives. (Restructure measured
    # 13.0/9.7/10.3 s → 8.0/6.9/5.3 s over three interleaved reps on
    # the sf0.1 d=2 customer bench, identical 4,083,571 output rows.)
    cand = (
        a.join(
            b,
            (F.col("a.__v") == F.col("b.__v")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
        )
        .distinct()
    )
    names = df.select(F.col(id_col), s.alias("__s"))
    return (
        cand.join(
            names.select(F.col(id_col).alias("id_a"), F.col("__s").alias("__sa")),
            "id_a",
        )
        .join(
            names.select(F.col(id_col).alias("id_b"), F.col("__s").alias("__sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("__sa"), F.col("__sb"), max_edit).alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )


def dup_ngram_fraction(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-corpus duplication measure (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the diagnostic behind substring-level dedup):
    the fraction of a doc's word n-gram INSTANCES whose gram also
    occurs in at least one OTHER document. Near-1 scores flag
    boilerplate/mirror content that doc-level exact/minhash dedup
    misses because the containing documents differ.

    Shape, and why it holds at 100 TB: grams are built with the
    codegen ``zip_with`` shifted-slice chain (the indexed
    ``transform(sequence(...))`` form measured ~10× slower — see
    ``lm._doc_ngrams``), then collapsed to per-(doc, gram) counts with
    one map-side-combined aggregate BEFORE anything corpus-wide
    happens — the explode never shuffles raw. Document frequency is a
    second aggregate over that (already-distinct-per-doc) table, and
    the score join is gram-keyed between two corpus-derived tables —
    deliberately NOT broadcast, the same posture as LM scoring
    (``lm.py``): the gram table scales with the corpus. Docs shorter
    than n words surface with zero instances and a NULL fraction
    rather than dropping out."""
    from simple_data_workflow_spark.session import ensure_parallelism

    m = f"greatest(0, size(__w) - {n - 1})"
    parts = [F.expr(f"slice(__w, {i + 1}, {m})") for i in range(n)]
    gram = parts[0]
    for p in parts[1:]:
        gram = F.zip_with(gram, p, lambda x, y: F.concat(x, F.lit(" "), y))
    inst = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
        .select(F.col(id_col), F.explode(gram).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # one row per (doc, gram) ⇒ COUNT(*) == distinct-doc frequency
    freq = inst.groupBy("__g").agg(F.count(F.lit(1)).alias("__nd"))
    per_doc = (
        inst.join(freq, "__g")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_gram_insts"),
            F.sum(F.when(F.col("__nd") > 1, F.col("__cnt")).otherwise(F.lit(0))).alias(
                "dup_gram_insts"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_gram_insts", F.lit(0)).alias("n_gram_insts"),
            F.coalesce("dup_gram_insts", F.lit(0)).alias("dup_gram_insts"),
            F.round(
                F.col("dup_gram_insts").cast("double")
                / F.nullif(F.col("n_gram_insts").cast("double"), F.lit(0.0)),
                6,
            ).alias("dup_fraction"),
        )
    )


def remove_dup_substrings(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — their ExactSubstr variant, re-expressed
    relationally): every word ``n``-gram INSTANCE whose gram occurs
    more than once in the corpus is removed, except the single
    canonical occurrence (the minimal ``(doc_id, position)``), and each
    document's text is rebuilt from its surviving token positions.
    ``dup_ngram_fraction`` is the diagnostic; this is the edit.

    Shape, and why it holds at 100 TB (the paper uses a suffix array,
    which is a single-machine construction; the relational equivalent
    below is the distributed shape):

    - gram instances keep their START POSITION via one ``posexplode``
      over the codegen ``zip_with`` shifted-slice gram array (the
      indexed ``transform(sequence(...))`` form measured ~10× slower);
    - one aggregate per gram computes ``(instance count, canonical
      occurrence)`` — ``min(struct(doc_id, pos))`` is a map-side
      combinable agg, so raw instances collapse before shuffling;
    - duplicate instances expand to covered token positions
      (``pos .. pos+n-1``) and collapse to ONE array per doc
      (``collect_set`` bounded by the doc's own length — never
      corpus-sized);
    - the rebuild is per-row codegen: ``arrays_zip`` tokens with their
      indexes, filter out covered positions, re-join. No token-level
      corpus shuffle: tokens never leave their document row.

    Docs shorter than ``n`` words pass through untouched. Output:
    ``(id, n_tokens, n_removed, dedup_text)``."""
    from simple_data_workflow_spark.session import ensure_parallelism

    m = f"greatest(0, size(__w) - {n - 1})"
    parts = [F.expr(f"slice(__w, {i + 1}, {m})") for i in range(n)]
    gram = parts[0]
    for p in parts[1:]:
        gram = F.zip_with(gram, p, lambda x, y: F.concat(x, F.lit(" "), y))
    base = ensure_parallelism(df).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__w")
    )
    inst = base.select(
        F.col(id_col), F.posexplode(gram).alias("__pos", "__g")
    )
    canon = inst.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__first"),
    )
    covered = (
        inst.join(canon, "__g")
        .where(
            (F.col("__cnt") > 1)
            & ~(
                (F.col(f"__first.{id_col}") == F.col(id_col))
                & (F.col("__first.__pos") == F.col("__pos"))
            )
        )
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + F.lit(n - 1))
            ).alias("__tp"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__tp").alias("__rm"))
    )
    joined = base.join(covered, id_col, "left").select(
        F.col(id_col),
        F.col("__w"),
        F.coalesce(F.col("__rm"), F.array().cast("array<int>")).alias("__rm"),
    )
    zipped = F.arrays_zip(
        F.col("__w"), F.sequence(F.lit(0), F.size("__w") - 1).alias("__i")
    )
    keep = F.filter(
        zipped, lambda s: ~F.array_contains(F.col("__rm"), s["__i"])
    )
    return joined.select(
        F.col(id_col),
        F.size("__w").alias("n_tokens"),
        F.size("__rm").alias("n_removed_positions"),
        F.array_join(
            F.transform(keep, lambda s: s["__w"]), " "
        ).alias("dedup_text"),
    )
