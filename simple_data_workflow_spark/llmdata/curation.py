"""Composed corpus-curation pipeline — the end-to-end LLM-data flow as
one reusable operator instead of per-query glue.

Stage order matters at scale and is fixed deliberately:

1. **filter** (length bounds) first — a pure pushdown-able predicate
   that shrinks everything downstream;
2. **exact dedup** (min id per text key) — one shuffle on the dedup key;
3. **decontaminate** against a benchmark slice — broadcast anti-join on
   normalized fingerprints (the benchmark side is small by
   construction);
4. **stratified downsample** — a stateless hash filter, no shuffle.

Each stage is the already-tested operator from ``llmdata.dedup``; this
module only owns the composition, so the whole flow stays one lazy
Catalyst plan (stages fuse where possible; nothing materializes between
steps). The driver query ``corpus_curation`` runs exactly this and is
DuckDB-oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_data_workflow_spark.llmdata import dedup


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int | None = None,
    max_chars: int | None = None,
    chars_col: str = "n_chars",
    strata_col: str | None = None,
    keep_of: int | None = None,
    keep: int = 1,
) -> DataFrame:
    """Filter → exact-dedup → decontaminate → stratified-sample.

    Every stage is optional (pass ``None`` to skip it); the result keeps
    the input schema — downstream accounting/packing/splitting compose
    on top. Deterministic under any partitioning/retry."""
    out = df
    if min_chars is not None:
        out = out.where(F.col(chars_col) >= min_chars)
    if max_chars is not None:
        out = out.where(F.col(chars_col) <= max_chars)
    keep_ids = dedup.exact_dedup(out, key_cols=[text_col], id_col=id_col).select(id_col)
    out = out.join(keep_ids, id_col)
    if benchmark is not None:
        out = dedup.decontaminate(out, benchmark, id_col=id_col, text_col=text_col)
    if strata_col is not None and keep_of is not None:
        out = dedup.stratified_sample(out, strata_col, id_col, keep_of=keep_of, keep=keep)
    return out
